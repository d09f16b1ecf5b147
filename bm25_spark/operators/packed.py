"""Packed physical index: delta+varint postings blobs + block-max metadata,
and the scoring paths over them.

Why this layout scales (the reference's flat Uint32List postings,
lib/src/bm25.dart:437-468, re-thought for a 1000-executor cluster):

- one row per (pk, term, shard): a Zipf-hot term is split across doc-range
  shards, so no single row explodes; parquet/Iceberg min-max + bloom on
  ``term`` prune the scan to exactly the query's rows;
- a doc's postings for ALL query terms live in the same shard (shards are
  contiguous doc_id ranges), so per-(query, pk, shard) scoring is complete
  and a per-shard top-k merges into an EXACT global top-k — the distributed
  analog of the reference's single-threaded bounded heap (bm25.dart:744-790);
- scoring is pure numpy over Arrow batches: varint-decode, sparse
  accumulate (np.add.at over doc slots), argpartition top-k. No per-row
  Python, no JVM<->Python chatter beyond the ≤|q| blobs/shard.

Two physical strategies, chosen per query:

1. **Driver path** (interactive): when the candidate volume (Σ df over the
   query's terms) is small enough to fetch, the driver probes the term
   dictionary (cached), applies SHARD-LEVEL BLOCK-MAX PRUNING — shards whose
   score upper bound ub(shard) = Σ_t qtf·idf_t·max_b block_max(t, shard, b)
   cannot beat the running k-th score are never fetched nor decoded (the
   WAND bound at shard granularity; safe ⇒ exact top-k) — and scores the
   surviving blobs in-process. This is what a search head does; Spark serves
   as the index store (predicate pushdown on term reads only those rows).
2. **Cluster path** (batch / huge postings): ship blobs to executors,
   score per (pk, shard) group in a vectorized applyInPandas — ALL queries
   in the batch are scored inside one pass over each shard's blobs (the
   query plan is tiny and travels in the UDF closure), so a hot Zipf term's
   blob crosses the shuffle ONCE, not once per query. When the index has
   fewer shard groups than the cluster has slots, the query side is split
   into a bounded number of buckets (blob replication = min(buckets,
   queries-that-use-the-term), chosen at plan time — never Q). Per-shard
   top-k merges globally. Metadata filters become a doc-id mask INSIDE the
   numpy scorer (reference semantics: filtered docs skipped during
   traversal, bm25.dart:644).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bm25_spark.functions import codec
from bm25_spark.functions.analyzer import query_term_counts
from bm25_spark.operators.indexer import BM25Index
from bm25_spark.operators.searcher import (
    RESULT_SCHEMA,
    _filter_predicate,
    _stats_map,
    empty_result,
)

PACKED_FIELDS = StructType(
    [
        StructField("n", IntegerType(), False),
        StructField("data", BinaryType(), False),
        StructField("block_last", ArrayType(LongType()), False),
        StructField("block_max", ArrayType(DoubleType()), False),
        StructField("block_off", ArrayType(IntegerType()), False),
    ]
)

# Above this many candidate postings the driver path would pull too much —
# score on the cluster instead. Overridable for experiments.
DRIVER_PATH_MAX_POSTINGS = int(
    os.environ.get("BM25_DRIVER_PATH_MAX_POSTINGS", "20000000")
)
# The blob FETCH is shared across a batch's queries, but driver SCORING is
# per-query single-threaded WAND — a batch of Q hot queries costs
# ~Σ_q Σ_{t∈q} df(t) score-visits even when every blob is cached. Bound
# that work independently of the fetch bound, or a large-Q batch of hot
# terms silently serializes on the driver while 4N executors idle.
# ~100M visits ≈ 1 s of driver numpy at 2026 single-core speed — the
# measured floor of one cluster batch job; past it the cluster path wins.
DRIVER_PATH_MAX_WORK = int(
    os.environ.get("BM25_DRIVER_PATH_MAX_WORK", "100000000")
)
# Metadata filters: the driver path materializes the allowed doc-id set
# locally only below this cardinality; bigger filters score on the cluster.
DRIVER_PATH_MAX_ALLOWED = int(
    os.environ.get("BM25_DRIVER_PATH_MAX_ALLOWED", "2000000")
)


def pack_index(index: BM25Index) -> BM25Index:
    """Derive ``index.packed`` from an array-layout postings table. The
    builder packs directly (indexer._packed_postings), so this is a no-op
    for freshly built indexes; it remains for legacy-layout loads."""
    if index.packed is not None:
        return index
    k1, b = index.k1, index.b
    shard_size = index.shard_size

    @F.pandas_udf(PACKED_FIELDS)
    def pack(
        doc_ids: pd.Series,
        tfs: pd.Series,
        dls: pd.Series,
        shards: pd.Series,
        avgdls: pd.Series,
    ) -> pd.DataFrame:
        out = {
            "n": [], "data": [], "block_last": [], "block_max": [],
            "block_off": [],
        }
        for ids, tf, dl, shard, avgdl in zip(doc_ids, tfs, dls, shards, avgdls):
            ids = np.asarray(ids, dtype=np.int64)
            tf = np.asarray(tf, dtype=np.int64)
            dl = np.asarray(dl, dtype=np.int64)
            data, n, bl, bm, off = codec.pack_postings(
                ids, tf, dl, int(shard) * shard_size, k1, b, float(avgdl)
            )
            out["n"].append(n)
            out["data"].append(data)
            out["block_last"].append(bl)
            out["block_max"].append(bm)
            out["block_off"].append(off)
        return pd.DataFrame(out)

    p = index.postings.join(F.broadcast(index.stats.select("pk", "avgdl")), "pk")
    packed = p.select(
        "pk",
        "term",
        "shard",
        pack(
            F.col("postings.doc_id"),
            F.col("postings.tf"),
            F.col("postings.dl"),
            F.col("shard"),
            F.col("avgdl"),
        ).alias("z"),
    ).select(
        "pk", "term", "shard", "z.n", "z.data", "z.block_last",
        "z.block_max", "z.block_off",
    )
    index.packed = packed
    # the physical postings just changed in place -> warmed caches (if
    # any) would serve the OLD postings; see BM25Index.invalidate_caches
    index.invalidate_caches()
    return index


def _qrows(index: BM25Index, queries, stopwords):
    stop = stopwords if stopwords is not None else index.stopwords
    out = []
    for qid, qtext in queries:
        for term, qtf in query_term_counts(qtext, stop).items():
            out.append((qid, term, qtf))
    return out


# ---------------------------------------------------------------------------
# Driver fast path
# ---------------------------------------------------------------------------


def warm_query_caches(
    index: BM25Index,
    max_terms: int = 100_000,
    preload_blobs: bool = True,
    max_blob_bytes: int = 4 << 30,
) -> bool:
    """Preload the term dictionary + shard metadata — and, when the packed
    postings fit ``max_blob_bytes``, the blobs themselves — into the driver
    caches (what a search head does at startup: the index becomes RAM-
    resident). After warming, a query pays ZERO Spark jobs on the hot
    path — probe, prune, decode, and score are all in-process numpy; the
    cluster path remains the route for oversized indexes/filters. Skipped
    (returns False) when the vocabulary exceeds ``max_terms``; per-term
    lazy probes with parquet term-pushdown remain the scale path."""
    if index.terms.count() > max_terms:
        return False
    tcache: dict = {}
    for r in index.terms.select("pk", "term", "idf", "df").collect():
        tcache.setdefault(r["term"], {})[r["pk"]] = (float(r["idf"]), int(r["df"]))

    do_blobs = False
    if preload_blobs:
        total = index.packed.agg(
            F.sum(F.length("data")).alias("b")
        ).first()["b"]
        do_blobs = total is not None and int(total) <= max_blob_bytes
    has_off = "block_off" in index.packed.columns
    cols = ["pk", "term", "shard", "n", "block_last", "block_max"]
    if has_off:
        cols.append("block_off")
    if do_blobs:
        cols.append("data")
    scache: dict = {}
    rcache: dict = {}
    for r in index.packed.select(*cols).collect():
        scache.setdefault(r["term"], {}).setdefault(r["pk"], []).append(
            (int(r["shard"]), int(r["n"]), float(max(r["block_max"])))
        )
        if do_blobs:
            rcache[(r["pk"], r["term"], int(r["shard"]))] = (
                int(r["n"]),
                bytes(r["data"]),
                np.asarray(r["block_last"], dtype=np.int64),
                np.asarray(r["block_max"], dtype=np.float64),
                (
                    np.asarray(r["block_off"], dtype=np.int64)
                    if has_off and r["block_off"] is not None
                    else None
                ),
            )
    # wholesale replace — appending onto entries from earlier lazy probes
    # would duplicate shard meta (and double scores)
    index.__dict__["_term_meta_cache"] = tcache
    index.__dict__["_shard_meta_cache"] = scache
    if do_blobs:
        index.__dict__["_raw_blob_cache"] = rcache
        index.__dict__["_blobs_complete"] = True
    from bm25_spark.operators.searcher import _stats_map

    _stats_map(index, None)
    index.__dict__["_dict_complete"] = True
    return True


def _term_meta(index: BM25Index, terms_needed, partition_keys):
    """(pk, term) -> (idf, df) via the term dictionary, cached on the index
    (the driver-side analog of the reference's dictionary probe,
    bm25.dart:637)."""
    cache = index.__dict__.setdefault("_term_meta_cache", {})
    missing = [t for t in terms_needed if t not in cache]
    if missing and index.__dict__.get("_dict_complete"):
        for t in missing:
            cache[t] = {}
        missing = []
    if missing:
        for t in missing:
            cache[t] = {}
        rows = (
            index.terms.filter(F.col("term").isin(missing))
            .select("pk", "term", "idf", "df")
            .collect()
        )
        for r in rows:
            cache[r["term"]][r["pk"]] = (float(r["idf"]), int(r["df"]))
    out = {}
    for t in terms_needed:
        for pk, meta in cache[t].items():
            if partition_keys is None or pk in partition_keys:
                out[(pk, t)] = meta
    return out


def _shard_meta(index: BM25Index, terms_needed, partition_keys):
    """(pk, term) -> list of (shard, n, ub_partial) where ub_partial =
    max block_max over the shard. Cached; blobs are NOT fetched here."""
    cache = index.__dict__.setdefault("_shard_meta_cache", {})
    missing = [t for t in terms_needed if t not in cache]
    if missing and index.__dict__.get("_dict_complete"):
        for t in missing:
            cache[t] = {}
        missing = []
    if missing:
        for t in missing:
            cache[t] = {}
        rows = (
            index.packed.filter(F.col("term").isin(missing))
            .select("pk", "term", "shard", "n", "block_max")
            .collect()
        )
        for r in rows:
            cache[r["term"]].setdefault(r["pk"], []).append(
                (int(r["shard"]), int(r["n"]), float(max(r["block_max"])))
            )
    out = {}
    for t in terms_needed:
        for pk, lst in cache[t].items():
            if partition_keys is None or pk in partition_keys:
                out[(pk, t)] = lst
    return out


def _fetch_raw_blobs(index: BM25Index, wanted: set[tuple[str, str, int]]) -> None:
    """Fetch packed blobs (raw bytes) for the given (pk, term, shard) keys
    into the driver cache — ONE Spark collect for all of them (the scan is
    pruned by the term IN (...) predicate: parquet min-max + dictionary).
    Decoding happens lazily per shard in ``_decoded`` so block-max pruning
    skips the decode cost of shards it rules out."""
    cache = index.__dict__.setdefault("_raw_blob_cache", {})
    if not index.__dict__.get("_blobs_complete") and len(cache) > 65536:
        # bound driver memory for lazily-fetched blobs; refetch is cheap.
        # A complete preload (warm_query_caches) is size-gated instead.
        cache.clear()
        index.__dict__.get("_decoded_cache", {}).clear()
        index.__dict__.get("_partial_decode_cache", {}).clear()
        index.__dict__["_partial_decode_blocks"] = 0
    missing = [k for k in wanted if k not in cache]
    if missing:
        terms_m = sorted({t for _, t, _ in missing})
        pks_m = sorted({p for p, _, _ in missing})
        shards_m = sorted({s for _, _, s in missing})
        has_off = "block_off" in index.packed.columns
        cols = ["pk", "term", "shard", "n", "data", "block_last", "block_max"]
        if has_off:
            cols.append("block_off")
        rows = (
            index.packed.filter(
                F.col("term").isin(terms_m)
                & F.col("pk").isin(pks_m)
                # shard predicate: ub-ordered fetch waves (see _driver_topk)
                # must not drag in every shard of a term the moment one
                # shard of it is wanted — bytes collected track the WAND
                # frontier, not the whole term
                & F.col("shard").isin(shards_m)
            )
            .select(*cols)
            .collect()
        )
        for r in rows:
            key = (r["pk"], r["term"], int(r["shard"]))
            cache[key] = (
                int(r["n"]),
                bytes(r["data"]),
                np.asarray(r["block_last"], dtype=np.int64),
                np.asarray(r["block_max"], dtype=np.float64),
                (
                    np.asarray(r["block_off"], dtype=np.int64)
                    if has_off and r["block_off"] is not None
                    else None  # legacy blobs: no offsets -> full decode
                ),
            )


def _decoded(index: BM25Index, key: tuple[str, str, int]):
    """Decoded (doc_ids, tfs, dls) for one (pk, term, shard), from cache."""
    dcache = index.__dict__.setdefault("_decoded_cache", {})
    hit = dcache.get(key)
    if hit is not None:
        return hit
    raw = index.__dict__.get("_raw_blob_cache", {}).get(key)
    if raw is None:
        return None
    n, data = raw[0], raw[1]
    out = codec.unpack_postings(data, n, key[2] * index.shard_size)
    dcache[key] = out
    return out


def _decoded_blocks_driver(
    index: BM25Index,
    key: tuple[str, str, int],
    raw,
    need: np.ndarray,
):
    """(ids, tfs, dls) for the given block ids of one (pk, term, shard)
    blob, via a per-BLOCK cache on the index (the same structure the
    cluster scorer keeps task-locally): a block reached through different
    ``need`` shapes across queries decodes exactly once."""
    n, data, bl, _bm, off = raw
    pcache = index.__dict__.setdefault("_partial_decode_cache", {})
    ct = pcache.setdefault(key, {})
    nl = need.tolist()
    new = [b_ for b_ in nl if b_ not in ct]
    if new:
        n_blocks = index.__dict__.get("_partial_decode_blocks", 0)
        if n_blocks > 65536:  # bound driver memory; re-decode is cheap
            pcache.clear()
            ct = pcache.setdefault(key, {})
            n_blocks = 0
            new = nl
        i_n, t_n, d_n = codec.unpack_blocks(
            data, n, key[2] * index.shard_size, bl, off,
            np.asarray(new, np.int64),
        )
        o = 0
        for b_ in new:
            s_ = min((b_ + 1) * codec.BLOCK, n) - b_ * codec.BLOCK
            ct[b_] = (i_n[o : o + s_], t_n[o : o + s_], d_n[o : o + s_])
            o += s_
        index.__dict__["_partial_decode_blocks"] = n_blocks + len(new)
    if len(nl) == 1:
        return ct[nl[0]]
    return (
        np.concatenate([ct[b_][0] for b_ in nl]),
        np.concatenate([ct[b_][1] for b_ in nl]),
        np.concatenate([ct[b_][2] for b_ in nl]),
    )


def _driver_topk(
    index: BM25Index,
    qrows,
    limit: int,
    partition_keys,
    per_partition_limit,
    prune: bool = True,
    allowed_by_pk: dict[str, np.ndarray] | None = None,
) -> list[tuple]:
    """Exact top-k on the driver with shard-level block-max pruning.
    Pruning applies to the FETCH as well as the decode: blobs are pulled in
    ub-descending geometric waves, so a shard theta rules out never crosses
    the wire. Returns result tuples (query_id, pk, doc_id, score, rank)."""
    k1, b = index.k1, index.b
    terms_needed = sorted({t for _, t, _ in qrows})
    tmeta = _term_meta(index, terms_needed, partition_keys)
    smeta = _shard_meta(index, terms_needed, partition_keys)
    from bm25_spark.operators.searcher import _stats_map

    stats = _stats_map(index, partition_keys)

    by_query: dict[int, list[tuple[str, int]]] = {}
    for qid, term, qtf in qrows:
        by_query.setdefault(qid, []).append((term, qtf))

    # Blobs are fetched LAZILY in shard-upper-bound order (geometric waves
    # inside the per-pk loop below): once theta rules a shard out, its blob
    # is never collected at all — fetch bytes track the WAND frontier, not
    # Σ df. Warmed indexes (_blobs_complete) skip fetching entirely; blobs
    # shared across the batch's queries are fetched once (_raw_blob_cache).
    blobs_complete = bool(index.__dict__.get("_blobs_complete"))

    results: list[tuple] = []
    for qid, tq in sorted(by_query.items()):
        # per pk: candidate shards with upper bounds
        pks = sorted(
            {pk for (pk, t) in tmeta if any(t == tt for tt, _ in tq)}
        )
        per_pk: list[tuple[str, np.ndarray, np.ndarray]] = []
        for pk in pks:
            st = stats.get(pk)
            if st is None:
                continue
            if allowed_by_pk is not None:
                allow = allowed_by_pk.get(pk)
                if allow is None or len(allow) == 0:
                    continue
            avgdl = st[1]
            # shard -> ub accumulation over query terms (with multiplicity)
            shard_ub: dict[int, float] = {}
            shard_terms: dict[int, list[tuple[str, int, float]]] = {}
            for term, qtf in tq:
                meta = tmeta.get((pk, term))
                if meta is None:
                    continue
                idf = meta[0]
                for shard, n, ub_partial in smeta.get((pk, term), ()):
                    shard_ub[shard] = shard_ub.get(shard, 0.0) + qtf * idf * ub_partial
                    shard_terms.setdefault(shard, []).append((term, qtf, idf))
            if not shard_ub:
                continue
            # WAND, two granularities (both bounds are TRUE upper bounds,
            # pruning is strict '< theta', so the top-k stays exact even on
            # score ties at the boundary):
            # 1. shard level: visit shards in ub-descending order; stop
            #    when the running k-th score strictly beats a shard's bound
            #    (this shard and all remaining are never decoded).
            # 2. block level, inside a surviving shard: the union of every
            #    term's block_last boundaries partitions the shard's doc-id
            #    space into segments, each covered by exactly one block per
            #    term; a segment whose summed block maxima cannot reach
            #    theta is dead, and a block ALL of whose segments are dead
            #    is never varint-decoded (codec.unpack_blocks jumps over it
            #    via block_off). Docs in dead segments are masked out of
            #    straddling blocks — their true score is < theta, so
            #    dropping them cannot change the top-k; every kept doc has
            #    all of its blocks decoded, so kept scores are exact.
            order = sorted(shard_ub, key=lambda s: -shard_ub[s])
            k_eff = per_partition_limit or limit
            theta = -np.inf
            kept_ids: list[np.ndarray] = []
            kept_scores: list[np.ndarray] = []
            n_kept = 0
            # running top-k_eff score buffer: theta updates cost
            # O(shard_candidates + k) per shard, not a partition over the
            # whole accumulated candidate set every shard
            top_buf = np.empty(0, dtype=np.float64)
            cache = index.__dict__.setdefault("_raw_blob_cache", {})
            fetch_hi = 0  # shards order[:fetch_hi] have been ensured
            for si, shard in enumerate(order):
                if prune and n_kept >= k_eff and shard_ub[shard] < theta:
                    break
                if not blobs_complete and si >= fetch_hi:
                    # geometric fetch wave in ub-descending order: the
                    # first wave covers enough shards to plausibly fill
                    # the heap, later waves double — O(log #shards) jobs
                    # worst case, zero jobs for shards theta prunes
                    hi = min(len(order), max(si + 1, 2 * fetch_hi, 4))
                    want = {
                        (pk, t, s)
                        for s in order[fetch_hi:hi]
                        for t, _, _ in shard_terms[s]
                    }
                    if any(k not in cache for k in want):
                        _fetch_raw_blobs(index, want)
                    fetch_hi = hi
                entries = []
                for term, qtf, idf in shard_terms[shard]:
                    raw = cache.get((pk, term, shard))
                    if raw is not None:
                        entries.append((term, qtf, idf, raw))
                if not entries:
                    continue
                use_blocks = (
                    prune
                    and n_kept >= k_eff
                    and np.isfinite(theta)
                    and all(e[3][4] is not None for e in entries)
                )
                if use_blocks:
                    bounds = np.unique(
                        np.concatenate([e[3][2] for e in entries])
                    )
                    seg_ub = np.zeros(len(bounds))
                    cover = []
                    for term, qtf, idf, (n, data, bl, bm, off) in entries:
                        ci = np.searchsorted(bl, bounds)
                        valid = ci < len(bl)
                        seg_ub[valid] += qtf * idf * bm[ci[valid]]
                        cover.append((ci, valid))
                    alive = seg_ub >= theta
                    if not alive.any():
                        continue
                docs_l, contrib_l = [], []
                for ei, (term, qtf, idf, raw) in enumerate(entries):
                    n, data, bl, bm, off = raw
                    if use_blocks:
                        ci, valid = cover[ei]
                        need = np.unique(ci[alive & valid])
                        if len(need) == 0:
                            continue
                        if len(need) == len(bl):
                            ids, tfs, dls = _decoded(index, (pk, term, shard))
                        else:
                            ids, tfs, dls = _decoded_blocks_driver(
                                index, (pk, term, shard), raw, need
                            )
                        seg_id = np.searchsorted(bounds, ids)
                        keep = alive[seg_id]
                        if allowed_by_pk is not None:
                            pos = np.searchsorted(allow, ids).clip(
                                max=len(allow) - 1
                            )
                            keep &= allow[pos] == ids
                        if not keep.any():
                            continue
                        ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                    else:
                        blob = _decoded(index, (pk, term, shard))
                        if blob is None:
                            continue
                        ids, tfs, dls = blob
                        if allowed_by_pk is not None:
                            # reference semantics: filtered docs skipped
                            # during traversal (bm25.dart:644); mask-only ⇒
                            # the upper bounds stay valid (pruning exact)
                            pos = np.searchsorted(allow, ids).clip(
                                max=len(allow) - 1
                            )
                            keep = allow[pos] == ids
                            if not keep.any():
                                continue
                            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                    tfs = tfs.astype(np.float64)
                    norm = (1.0 - b) + b * dls.astype(np.float64) / avgdl
                    # float-association contract with the WAND bounds: the
                    # per-posting partial is computed EXACTLY as
                    # codec.pack_postings computes block_max (same ops, same
                    # order), then scaled by w = qtf*idf — the same product
                    # the bounds use. IEEE rounding is monotonic, so
                    # score <= bound holds in floats, not just in math; a
                    # different association can put a true score 1 ulp ABOVE
                    # its "upper bound" and mask an equal-scored doc.
                    w = qtf * idf
                    contrib_l.append(w * (tfs * (k1 + 1.0) / (tfs + k1 * norm)))
                    docs_l.append(ids)
                if not docs_l:
                    continue
                docs_cat = np.concatenate(docs_l)
                contribs = np.concatenate(contrib_l)
                # dense accumulate over shard-local slots (no sort): every
                # contribution is > 0, so touched slots are exactly the
                # nonzero ones (reference's sparse `touched`, bm25.dart:633)
                slots = docs_cat - shard * index.shard_size
                dense = np.bincount(slots, weights=contribs)
                nz = np.flatnonzero(dense)
                kept_ids.append(nz + shard * index.shard_size)
                kept_scores.append(dense[nz])
                n_kept += len(nz)
                top_buf = np.concatenate((top_buf, kept_scores[-1]))
                if len(top_buf) > k_eff:
                    top_buf = np.partition(top_buf, -k_eff)[-k_eff:]
                if len(top_buf) >= k_eff:
                    theta = top_buf.min()
            if not kept_ids:
                continue
            ids = np.concatenate(kept_ids)
            scores = np.concatenate(kept_scores)
            k_trim = per_partition_limit if per_partition_limit is not None else limit
            if len(ids) > k_trim:
                # exact top-k with (score desc, doc_id asc) tie-break
                sel = np.lexsort((ids, -scores))[:k_trim]
                ids, scores = ids[sel], scores[sel]
            per_pk.append((pk, ids, scores))
        if not per_pk:
            continue
        # global merge across pks (≤ limit·n_pk candidates — tiny)
        ids_cat = np.concatenate([x[1] for x in per_pk])
        scores_cat = np.concatenate([x[2] for x in per_pk])
        pk_cat = np.concatenate(
            [np.full(len(x[1]), i) for i, x in enumerate(per_pk)]
        )
        order = np.lexsort((ids_cat, -scores_cat))[:limit]
        for rank, j in enumerate(order, start=1):
            results.append(
                (
                    qid,
                    per_pk[int(pk_cat[j])][0],
                    int(ids_cat[j]),
                    float(scores_cat[j]),
                    rank,
                )
            )
    return results


def _local_result_df(spark, rows_out: list[tuple]) -> DataFrame:
    """Driver-built result rows -> DataFrame as a LocalRelation.

    Small results go through an inline SQL VALUES literal: ~30ms end-to-end
    vs ~0.2-0.3s for the Arrow createDataFrame round-trip — that difference
    IS the residual per-query latency once the whole index is RAM-resident.
    Scores are emitted with repr() + the 'D' double suffix (repr round-trips
    binary64 exactly). Big results fall back to the Arrow path."""
    if not rows_out:
        return empty_result(spark)
    if len(rows_out) <= 10_000:
        vals = ", ".join(
            "(%d, '%s', %d, %rD, %d)"
            % (q, pk.replace("\\", "\\\\").replace("'", "\\'"), d, s, r)
            for q, pk, d, s, r in rows_out
        )
        return spark.sql(
            "SELECT CAST(query_id AS BIGINT) AS query_id, pk, "
            "CAST(doc_id AS BIGINT) AS doc_id, score, "
            "CAST(rank AS INT) AS rank FROM (VALUES "
            + vals
            + ") AS t(query_id, pk, doc_id, score, rank)"
        )
    pdf = pd.DataFrame(
        rows_out, columns=["query_id", "pk", "doc_id", "score", "rank"]
    ).astype(
        {
            "query_id": "int64",
            "doc_id": "int64",
            "score": "float64",
            "rank": "int32",
        }
    )
    return spark.createDataFrame(pdf, RESULT_SCHEMA)


# ---------------------------------------------------------------------------
# Cluster path
# ---------------------------------------------------------------------------

_SCORED_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("pk", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)


def _cluster_scored(
    index: BM25Index,
    qrows,
    partition_keys,
    allowed: DataFrame | None,
    group_limit: int,
    stats: dict | None = None,
) -> DataFrame:
    """(query_id, pk, doc_id, score): per-(pk, shard) vectorized scoring of
    the WHOLE query batch with per-(query, shard) top-``group_limit``
    (exact — shards are disjoint doc ranges, so per-shard top-k ⊇ global
    top-k members).

    Shuffle shape: each packed blob crosses the exchange once per QUERY
    BUCKET that needs its term — NOT once per query. The bucket count is
    chosen at plan time as ceil(default parallelism / shard groups), capped
    at the batch size, so a 1000-query batch over Zipf-hot terms on a big
    index (shards >= slots) ships every blob exactly once and scores all
    1000 queries in one pass per shard, sharing the varint block decodes
    across queries."""
    shard_size = index.shard_size
    k1, b = index.k1, index.b
    spark = index.spark

    needed = sorted({t for _, t, _ in qrows})
    p = index.packed.filter(F.col("term").isin(needed))
    if "block_off" not in p.columns:  # legacy layout: full decode fallback
        p = p.withColumn("block_off", F.lit(None).cast("array<int>"))
    if partition_keys is not None:
        p = p.filter(F.col("pk").isin(partition_keys))

    # Tiny driver-side query plan, shipped to executors in the UDF closure
    # (Spark broadcasts the serialized command): idf per (pk, term) from
    # the cached dictionary probe, avgdl per pk from the stats table. The
    # executor-side join with a per-(query, term) frame — which replicated
    # every blob row once per query containing its term — is gone.
    tmeta = _term_meta(index, needed, partition_keys)
    smap = _stats_map(index, partition_keys)
    idf_map = {key: meta[0] for key, meta in tmeta.items()}
    avgdl_map = {
        pk_: float(st[1]) for pk_, st in smap.items() if st is not None
    }

    by_query: dict[int, list[tuple[str, int]]] = {}
    for qid, term, qtf in qrows:
        by_query.setdefault(qid, []).append((term, qtf))
    qids = sorted(by_query)

    # Query-bucket fan-out: with fewer (pk, shard) groups than task slots
    # (small corpus / interactive cluster), one task per group would
    # serialize the batch; splitting the query side into n_buckets groups
    # restores parallelism at a replication cost of at most n_buckets per
    # blob. Blobs are routed ONLY to buckets whose queries use the term
    # (broadcast (term, qb) join), so replication is additionally capped by
    # the number of queries using the term — the worst case equals the old
    # per-query grouping, the big-index case (n_buckets=1) ships each blob
    # once.
    n_groups = sum(
        -(-int(st[0]) // shard_size)
        for pk_, st in smap.items()
        if st is not None
        and (partition_keys is None or pk_ in partition_keys)
    ) or 1
    target = spark.sparkContext.defaultParallelism
    n_buckets = min(len(qids), max(1, -(-target // n_groups)))
    bucket_of = {qid: i % n_buckets for i, qid in enumerate(qids)}
    queries_by_bucket: dict[int, list] = {}
    for qid in qids:
        queries_by_bucket.setdefault(bucket_of[qid], []).append(
            (qid, by_query[qid])
        )
    term_bucket_rows = sorted(
        {
            (term, bucket_of[qid])
            for qid, tq in by_query.items()
            for term, _ in tq
        }
    )
    tb = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame(term_bucket_rows, columns=["term", "qb"]),
            "term string, qb int",
        )
    )
    rows = p.join(tb, "term")

    if stats is not None:
        # opt-in instrumentation (tests / telemetry): plan-time bucket
        # facts are free; per-task input row counts cost one extra agg job
        # over the joined blob rows. Replication per blob = number of
        # buckets whose queries use its term — capped by n_buckets AND by
        # the number of queries containing the term.
        repl: dict[str, int] = {}
        for term, _qb in term_bucket_rows:
            repl[term] = repl.get(term, 0) + 1
        stats["n_groups"] = n_groups
        stats["n_buckets"] = n_buckets
        stats["n_queries"] = len(qids)
        stats["max_term_replication"] = max(repl.values(), default=0)
        per_task = (
            rows.groupBy("pk", "shard", "qb")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        stats["n_tasks"] = len(per_task)
        stats["max_task_rows"] = max(
            (int(r["c"]) for r in per_task), default=0
        )
        stats["total_joined_rows"] = sum(int(r["c"]) for r in per_task)

    has_filter = allowed is not None
    if has_filter:
        # the allowed set ships to scorers as a PACKED BITMAP per
        # (pk, shard): shard_size/8 bytes regardless of selectivity (128 KB
        # at the default 1M shard), instead of a collect_list array that
        # bloats to 8 MB/row for low-selectivity filters
        def to_bitmap(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pk_, shard_ = key[0], int(key[1])
            slots = (
                pdf["doc_id"].to_numpy(np.int64) - shard_ * shard_size
            )
            bits = np.zeros(shard_size, dtype=bool)
            bits[slots] = True
            return pd.DataFrame(
                {
                    "pk": [pk_],
                    "shard": [shard_],
                    "allowed_bm": [np.packbits(bits).tobytes()],
                }
            )

        allowed_bm = (
            allowed.withColumn(
                "shard", (F.col("doc_id") / F.lit(shard_size)).cast("int")
            )
            .groupBy("pk", "shard")
            .applyInPandas(
                to_bitmap, schema="pk string, shard int, allowed_bm binary"
            )
        )
        rows = rows.join(allowed_bm, ["pk", "shard"])

    def _empty_scored() -> pd.DataFrame:
        return pd.DataFrame(
            {"query_id": [], "pk": [], "doc_id": [], "score": []}
        ).astype({"query_id": np.int64, "doc_id": np.int64, "score": np.float64})

    def score_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        """Score every query of this bucket against one shard's blobs with
        BLOCK-MAX WAND inside the executor task: per query, segments (the
        partition of the shard's doc-id space induced by the query terms'
        block boundaries) are scored in upper-bound order against a running
        local theta; once the query's top-k is full, segments — and
        therefore blocks — that cannot beat theta are never varint-decoded.
        Block decodes are cached PER TERM and shared across all queries in
        the task (a hot term's postings decode once per shard, not once per
        query). Same safety argument as the driver path: bounds are true
        upper bounds in the SAME float association as the scorer, pruning
        is strict, segments are disjoint so every kept doc's score is
        complete."""
        pk, shard, qb = key[0], int(key[1]), int(key[2])
        shard_base = shard * shard_size
        avgdl = avgdl_map.get(pk)
        queries = queries_by_bucket.get(qb)
        if avgdl is None or not queries:
            return _empty_scored()
        mask_bits = None
        if has_filter:
            mask_bits = np.unpackbits(
                np.frombuffer(pdf["allowed_bm"].iloc[0], dtype=np.uint8)
            ).astype(bool)
        term_rows: dict[str, tuple] = {}
        for term, data, n, bl, bm, off in zip(
            pdf["term"], pdf["data"], pdf["n"],
            pdf["block_last"], pdf["block_max"], pdf["block_off"],
        ):
            term_rows[term] = (
                bytes(data),
                int(n),
                np.asarray(bl, dtype=np.int64),
                np.asarray(bm, dtype=np.float64),
                (
                    np.asarray(off, dtype=np.int64)
                    if off is not None
                    else None
                ),
            )
        dec_cache: dict[str, dict] = {}

        def decoded_blocks(term: str, need: np.ndarray | None):
            """(ids, tfs, dls) for the given block ids of one term (None =
            full decode for legacy blobs without offsets), via the per-term
            cache shared across every query in this task."""
            data, n, bl, _bm, off = term_rows[term]
            cache_t = dec_cache.setdefault(term, {})
            if need is None or off is None:
                full = cache_t.get("full")
                if full is None:
                    full = codec.unpack_postings(data, n, shard_base)
                    cache_t["full"] = full
                return full
            nl = need.tolist()
            new = [b_ for b_ in nl if b_ not in cache_t]
            if new:
                i_n, t_n, d_n = codec.unpack_blocks(
                    data, n, shard_base, bl, off, np.asarray(new, np.int64)
                )
                o = 0
                for b_ in new:
                    s_ = min((b_ + 1) * codec.BLOCK, n) - b_ * codec.BLOCK
                    cache_t[b_] = (
                        i_n[o : o + s_],
                        t_n[o : o + s_],
                        d_n[o : o + s_],
                    )
                    o += s_
            if len(nl) == 1:
                return cache_t[nl[0]]
            ids = np.concatenate([cache_t[b_][0] for b_ in nl])
            tfs = np.concatenate([cache_t[b_][1] for b_ in nl])
            dls = np.concatenate([cache_t[b_][2] for b_ in nl])
            return ids, tfs, dls

        frames = []
        for qid, tq in queries:
            entries = []
            for term, qtf in tq:
                idf = idf_map.get((pk, term))
                if idf is None or term not in term_rows:
                    continue
                entries.append((float(qtf) * float(idf), term))
            if not entries:
                continue
            bounds = np.unique(
                np.concatenate([term_rows[t][2] for _, t in entries])
            )
            nseg = len(bounds)
            seg_ub = np.zeros(nseg)
            covers = []
            for w, t in entries:
                bl, bm = term_rows[t][2], term_rows[t][3]
                ci = np.searchsorted(bl, bounds)
                valid = ci < len(bl)
                seg_ub[valid] += w * bm[ci[valid]]
                covers.append((ci, valid))
            order = np.argsort(-seg_ub, kind="stable")

            theta = -np.inf
            top_buf = np.empty(0, dtype=np.float64)
            kept_ids, kept_scores = [], []
            count = 0
            CHUNK = 64
            pos = 0
            while pos < nseg:
                chunk = order[pos : pos + CHUNK]
                pos += CHUNK
                if count >= group_limit:
                    chunk = chunk[seg_ub[chunk] >= theta]
                    if len(chunk) == 0:
                        break  # order is ub-descending: the rest is dead too
                sel_mask = np.zeros(nseg, dtype=bool)
                sel_mask[chunk] = True
                docs_l, contrib_l = [], []
                for t_i, (w, t) in enumerate(entries):
                    ci, valid = covers[t_i]
                    need = np.unique(ci[sel_mask & valid])
                    if len(need) == 0:
                        continue
                    legacy = term_rows[t][4] is None
                    ids, tfs, dls = decoded_blocks(
                        t, None if legacy else need
                    )
                    keep = sel_mask[np.searchsorted(bounds, ids)]
                    if mask_bits is not None:
                        # reference semantics: non-allowed docs skipped
                        # during traversal (bm25.dart:644); mask-only,
                        # bounds stay valid
                        keep = keep & mask_bits[ids - shard_base]
                    if not keep.any():
                        continue
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                    tfs = tfs.astype(np.float64)
                    norm = (1.0 - b) + b * dls.astype(np.float64) / avgdl
                    contrib_l.append(
                        w * (tfs * (k1 + 1.0) / (tfs + k1 * norm))
                    )
                    docs_l.append(ids)
                if not docs_l:
                    continue
                docs_cat = np.concatenate(docs_l)
                contrib = np.concatenate(contrib_l)
                dense = np.bincount(docs_cat - shard_base, weights=contrib)
                nz = np.flatnonzero(dense)
                kept_ids.append(nz + shard_base)
                kept_scores.append(dense[nz])
                count += len(nz)
                top_buf = np.concatenate((top_buf, dense[nz]))
                if len(top_buf) > group_limit:
                    top_buf = np.partition(top_buf, -group_limit)[-group_limit:]
                if len(top_buf) >= group_limit:
                    theta = top_buf.min()
            if not kept_ids:
                continue
            uniq = np.concatenate(kept_ids)  # segments disjoint -> unique
            acc = np.concatenate(kept_scores)
            k = min(group_limit, len(uniq))
            if k < len(uniq):
                # exact cut with the global (score desc, doc_id asc)
                # tie-break: an equal-scored doc at the k boundary must not
                # be dropped by an order-agnostic partition
                idx = np.lexsort((uniq, -acc))[:k]
            else:
                idx = np.arange(len(uniq))
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.int64(qid),
                        "pk": pk,
                        "doc_id": uniq[idx],
                        "score": acc[idx],
                    }
                )
            )
        if not frames:
            return _empty_scored()
        return pd.concat(frames, ignore_index=True)

    return rows.groupBy("pk", "shard", "qb").applyInPandas(
        score_group, schema=_SCORED_SCHEMA
    )


def search_packed(
    index: BM25Index,
    queries: list[tuple[int, str]],
    limit: int = 10,
    flt: dict | None = None,
    stopwords=None,
    partition_keys: list[str] | None = None,
    per_partition_limit: int | None = None,
    prune: bool = True,
    force_cluster: bool = False,
    cluster_stats: dict | None = None,
) -> DataFrame:
    """Top-k over the packed index. Same semantics/schema as
    searcher.search_batch. Chooses the driver fast path (with shard-level
    block-max pruning when ``prune``) or the cluster path automatically.
    ``cluster_stats``: pass a dict to capture the cluster path's shuffle
    shape (bucket counts, per-task input rows — one extra agg job)."""
    if index.packed is None:
        raise ValueError("index is not packed — call pack_index() first")
    if limit < 1:
        raise ValueError("limit must be >= 1")
    spark = index.spark
    qrows = _qrows(index, queries, stopwords)
    if not qrows:
        return empty_result(spark)

    allowed = None
    if flt:
        pred = _filter_predicate(index, flt)
        allowed = index.docs.filter(pred).select("pk", "doc_id")

    if not force_cluster:
        terms_needed = sorted({t for _, t, _ in qrows})
        tmeta = _term_meta(index, terms_needed, partition_keys)
        total_df = sum(df for _, df in tmeta.values())
        term_df: dict = {}
        for (_pk, t), (_idf, df) in tmeta.items():
            term_df[t] = term_df.get(t, 0) + df
        # per-query scoring work (df re-counted once per query using the
        # term, unlike total_df which bounds the one-time fetch volume)
        work = sum(term_df.get(t, 0) for _, t, _ in qrows)
        allowed_by_pk = None
        driver_ok = (
            total_df <= DRIVER_PATH_MAX_POSTINGS
            and work <= DRIVER_PATH_MAX_WORK
        )
        if driver_ok and allowed is not None:
            # one CollectLimit job probes size AND fetches the ids (the
            # sentinel +1 row detects overflow); the materialized per-pk
            # arrays are cached per canonical filter — a repeated filter
            # (the common tenant/source scoping pattern) costs zero jobs
            fkey = tuple(
                sorted(
                    (
                        k,
                        tuple(sorted(map(repr, v)))
                        if isinstance(v, (list, tuple, set))
                        else (repr(v),),
                    )
                    for k, v in flt.items()
                )
            )
            acache = index.__dict__.setdefault("_allowed_cache", {})
            if fkey in acache:
                allowed_by_pk = acache[fkey]
            else:
                apdf = allowed.limit(DRIVER_PATH_MAX_ALLOWED + 1).toPandas()
                if len(apdf) > DRIVER_PATH_MAX_ALLOWED:
                    driver_ok = False
                else:
                    allowed_by_pk = {
                        pk: np.sort(g["doc_id"].to_numpy(np.int64))
                        for pk, g in apdf.groupby("pk", sort=False)
                    }
                    if len(acache) > 64:
                        acache.clear()
                    acache[fkey] = allowed_by_pk
            if driver_ok and not allowed_by_pk:
                return empty_result(spark)
        if driver_ok:
            rows_out = _driver_topk(
                index, qrows, limit, partition_keys, per_partition_limit,
                prune=prune, allowed_by_pk=allowed_by_pk,
            )
            return _local_result_df(spark, rows_out)

    group_limit = max(limit, per_partition_limit or 0)
    scored = _cluster_scored(
        index, qrows, partition_keys, allowed, group_limit,
        stats=cluster_stats,
    )

    if per_partition_limit is not None:
        w_pk = Window.partitionBy("query_id", "pk").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        scored = (
            scored.withColumn("prank", F.row_number().over(w_pk))
            .filter(F.col("prank") <= per_partition_limit)
            .drop("prank")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
        .select("query_id", "pk", "doc_id", "score", "rank")
    )
