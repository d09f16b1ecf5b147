"""Deduplication operators for training-data pipelines.

Scale design: every variant is candidate-generation (cheap, hash-bucketed,
shuffle-on-small-keys) followed by verification (exact measure on candidate
pairs only). Hot shingles are capped (``max_shingle_df``) — the standard
web-scale guard against quadratic blowup on boilerplate n-grams; the cap is
logged as a coverage caveat rather than applied silently.

Determinism across Spark / DuckDB / Python comes from md5 (bit-identical in
all three) — hash values are hex strings or 60-bit ints derived from them.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25_spark.operators.textstats import _tokens_col

logger = logging.getLogger("bm25_spark.dedup")


def _hex60(col: F.Column) -> F.Column:
    """First 15 hex chars of md5 -> non-negative 60-bit BIGINT (same value
    DuckDB gets from ('0x'||substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(col, 1, 15), 16, 10).cast("long")


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, group_id, group_size, keep): md5-normalized exact dedup.
    group_id = min doc_id of the group; keep = is that representative.
    One hash-shuffle on the 16-byte key; no text comparison."""
    norm = F.concat_ws(" ", _tokens_col(text_col))
    keyed = docs.select("doc_id", F.md5(norm).alias("k"))
    groups = keyed.groupBy("k").agg(
        F.min("doc_id").alias("group_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        keyed.join(groups, "k")
        .select(
            "doc_id",
            "group_id",
            F.col("group_size").cast("long").alias("group_size"),
            (F.col("doc_id") == F.col("group_id")).alias("keep"),
        )
    )


def shingle_df(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle): distinct word n-gram shingles per doc."""
    toks = _tokens_col(text_col)
    # Spark sequence(0, -1) descends — guard short docs with an empty array
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return (
        docs.select("doc_id", F.explode(shingles).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
    stats: dict | None = None,
) -> DataFrame:
    """(a, b, jaccard): n-gram Jaccard near-dup pairs (a < b, jaccard >= t).

    Inverted-index candidate generation: pairs share >=1 shingle; hot
    shingles above max_shingle_df are dropped from candidate GENERATION
    only (boilerplate guard) — the verify stage recounts intersections
    over the FULL shingle sets, so every emitted pair carries its exact
    jaccard. The cap's sole effect is coverage: a pair whose overlap is
    hot shingles ONLY is never generated. The default cap of 1000 bounds
    the worst single shingle's contribution to ~5·10^5 candidate pairs
    (df·(df-1)/2); for corpora where that still admits too much,
    ``minhash_lsh_pairs`` is the scale route (its bucket keys are
    full-signature slices, not shared n-grams).

    Telemetry: pass ``stats={}`` to eagerly compute and log the coverage
    counters — ``dropped_hot_shingles`` (distinct shingles excluded by the
    cap), ``kept_shingles``, and ``candidate_pairs`` (sum of df·(df-1)/2
    over kept shingles: the exact number of join rows the verify stage
    sees). Runs one cheap aggregation job over the shingle index (keys
    only); the returned DataFrame is unaffected."""
    sh = shingle_df(docs, n, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    if max_shingle_df is not None and stats is None:
        # zero-cost visibility for default callers (counting the dropped
        # shingles costs a job — pass stats={} to pay for exact numbers):
        # the cap bounds candidate GENERATION, so pairs overlapping ONLY
        # in hotter-than-cap shingles are never emitted
        default_note = (
            " (the DEFAULT, tightened from 10000 in r4 — see CHANGELOG.md)"
            if max_shingle_df == 1000
            else ""
        )
        logger.info(
            "jaccard_pairs: hot-shingle cap active (max_shingle_df=%d%s); "
            "pairs whose overlap is exclusively hotter shingles are not "
            "generated. Pass stats={} for exact dropped/kept/candidate "
            "counts.",
            max_shingle_df, default_note,
        )
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh_cand = sh.join(
            hot.filter(F.col("df") <= max_shingle_df).select("shingle"),
            "shingle",
        )
        if stats is not None:
            row = hot.select(
                F.sum(
                    (F.col("df") > max_shingle_df).cast("long")
                ).alias("dropped"),
                F.sum(
                    (F.col("df") <= max_shingle_df).cast("long")
                ).alias("kept"),
                F.sum(
                    F.when(
                        F.col("df") <= max_shingle_df,
                        F.col("df") * (F.col("df") - 1) / 2,
                    ).otherwise(F.lit(0))
                ).cast("long").alias("cand"),
            ).collect()[0]
            stats["dropped_hot_shingles"] = int(row["dropped"] or 0)
            stats["kept_shingles"] = int(row["kept"] or 0)
            stats["candidate_pairs"] = int(row["cand"] or 0)
            logger.info(
                "jaccard_pairs: max_shingle_df=%d dropped_hot_shingles=%d "
                "kept_shingles=%d candidate_pairs=%d",
                max_shingle_df, stats["dropped_hot_shingles"],
                stats["kept_shingles"], stats["candidate_pairs"],
            )
    else:
        sh_cand = sh
        if stats is not None:
            row = (
                sh.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df"))
                .select(
                    F.count(F.lit(1)).alias("kept"),
                    F.sum(F.col("df") * (F.col("df") - 1) / 2)
                    .cast("long")
                    .alias("cand"),
                )
                .collect()[0]
            )
            stats["dropped_hot_shingles"] = 0
            stats["kept_shingles"] = int(row["kept"] or 0)
            stats["candidate_pairs"] = int(row["cand"] or 0)
            logger.info(
                "jaccard_pairs: uncapped (max_shingle_df=None) "
                "kept_shingles=%d candidate_pairs=%d",
                stats["kept_shingles"], stats["candidate_pairs"],
            )
    a, b = sh_cand.alias("a"), sh_cand.alias("b")
    if max_shingle_df is not None and sh_cand is not sh:
        # candidates from sub-cap shingles; EXACT verify over the full
        # shingle sets (hot shingles count toward inter — the cap bounds
        # generation volume, never the emitted pair's jaccard)
        cand = (
            a.join(b, "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b")
            )
            .distinct()
        )
        sha = sh.select(F.col("doc_id").alias("a"), "shingle")
        shb = sh.select(F.col("doc_id").alias("b"), "shingle")
        inter = (
            cand.join(sha, "a")
            .join(shb, ["b", "shingle"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        inter = (
            a.join(b, "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b")
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sza") + F.col("szb") - F.col("inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    num_perm: int = 16,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig: array<string>): MinHash signature — per permutation i,
    min over shingles of md5(i || '|' || shingle). Lexicographic min over
    hex strings == min over the underlying 128-bit ints, and is identical
    in DuckDB SQL.

    Plan shape (one shuffle, no per-perm row explosion): ONE
    groupBy(doc_id) carrying ``num_perm`` partially-aggregatable MIN
    columns — map-side combine collapses each task to one partial row per
    doc before the exchange, so the shuffle moves ~docs rows of num_perm
    hashes instead of docs × shingles × num_perm exploded rows, and the
    former second (doc_id, perm) aggregation pass is gone."""
    sh = shingle_df(docs, n, text_col)
    mins = [
        F.min(
            F.md5(F.concat_ws("|", F.lit(str(p)), F.col("shingle")))
        ).alias(f"m{p}")
        for p in range(num_perm)
    ]
    return (
        sh.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            F.array(*[F.col(f"m{p}") for p in range(num_perm)]).alias("sig"),
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """(a, b, jaccard): LSH candidate pairs (same band bucket) verified with
    exact shingle Jaccard >= threshold. bands must divide num_perm; rows per
    band r = num_perm/bands tunes the S-curve."""
    assert num_perm % bands == 0
    r = num_perm // bands
    sig = minhash_signatures(docs, num_perm, n, text_col)
    band = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    bucketed = sig.select("doc_id", band, "sig").select(
        "doc_id",
        "band",
        F.md5(
            F.concat_ws(",", F.slice("sig", F.col("band") * r + 1, r))
        ).alias("bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b")
        )
        .distinct()
    )
    # verify candidates with exact jaccard
    sh = shingle_df(docs, n, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sha = sh.select(F.col("doc_id").alias("a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        cand.join(sha, "a").join(shb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash(docs: DataFrame, bits: int = 60, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): b-bit SimHash over analyzer tokens (tf-weighted).
    Bit i of md5-hex60(token) votes ±tf; sign of the sum sets the bit.
    Default 60 bits (the full hex60 width) — narrow hashes collide far too
    often at corpus scale and make ``simhash_pairs`` band keys degenerate.

    Plan shape (one shuffle, no per-bit row explosion): each token
    OCCURRENCE votes ±1 per bit — summed per doc that is exactly the
    ±tf-per-unique-token vote, in exact integer arithmetic — so the whole
    signature is ONE groupBy(doc_id) carrying ``bits`` partially-
    aggregatable SUM columns. Map-side combine collapses each task's rows
    to one partial row per doc BEFORE the exchange, so the shuffle moves
    ~docs rows of ``bits`` longs instead of docs × tokens × bits vote
    rows (the previous per-bit explode), and the earlier (doc_id, tok)
    pre-aggregation shuffle is gone entirely."""
    if not 1 <= bits <= 60:
        raise ValueError(f"simhash: bits must be in 1..60 (got {bits})")
    occ = docs.select(
        "doc_id", F.explode(_tokens_col(text_col)).alias("tok")
    ).withColumn("h", _hex60(F.md5(F.col("tok"))))
    votes = [
        F.sum(
            F.when(F.expr(f"(h >> {i}) & 1") == 1, F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    per_doc = occ.groupBy("doc_id").agg(*votes)
    sig = None
    for i in range(bits):
        bitval = F.when(
            F.col(f"v{i}") > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = bitval if sig is None else sig + bitval
    return per_doc.select("doc_id", sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    bits: int = 60,
    max_hamming: int = 2,
    text_col: str = "text",
    stats: dict | None = None,
    allow_narrow_bands: bool = False,
) -> DataFrame:
    """(a, b, hamming): near-dup pairs with hamming(simhash) <= max_hamming.
    Candidate generation by band blocking (split bits into max_hamming+1
    bands; pigeonhole: any pair within distance shares >=1 exact band).

    Scale note: the self-join key space per band is 2^(bits//(max_hamming+1))
    — at the default bits=60, max_hamming=2 that is 2^20 buckets per band, so
    bucket occupancy (and thus candidate volume) stays O(dup pairs) rather
    than O(N^2/buckets). Narrow widths (e.g. bits=16 -> 5-bit keys -> 32
    buckets) degenerate to a near-all-pairs join at corpus scale; a band key
    narrower than 15 bits is rejected loudly unless
    ``allow_narrow_bands=True`` (small-corpus tests only) — use wider
    ``bits`` or smaller ``max_hamming`` instead.

    Telemetry: pass ``stats={}`` to eagerly compute and log per-band bucket
    and candidate-pair counts (``per_band`` list of dicts with band,
    buckets, candidate_pairs; plus total ``candidate_pairs``). One cheap
    aggregation over (band, key); the returned DataFrame is unaffected."""
    nb = max_hamming + 1
    width = bits // nb
    if width < 15 and not allow_narrow_bands:
        raise ValueError(
            f"simhash_pairs: band key width {width} bits "
            f"(bits={bits} // {nb} bands) gives only {1 << width} buckets "
            "per band — the candidate self-join degenerates to near-all-"
            "pairs at corpus scale. Use bits >= 15*(max_hamming+1) "
            f"(e.g. the default bits=60 for max_hamming<=3)."
        )
    s = simhash(docs, bits, text_col)
    band = F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("band")
    keyed = s.select("doc_id", "simhash", band).withColumn(
        "key",
        F.expr(f"(simhash >> (band * {width})) & {(1 << width) - 1}"),
    )
    if stats is not None:
        per_band = (
            keyed.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("band")
            .agg(
                F.count(F.lit(1)).alias("buckets"),
                F.sum(F.col("c") * (F.col("c") - 1) / 2)
                .cast("long")
                .alias("candidate_pairs"),
            )
            .orderBy("band")
            .collect()
        )
        stats["per_band"] = [
            {
                "band": int(r["band"]),
                "buckets": int(r["buckets"]),
                "candidate_pairs": int(r["candidate_pairs"] or 0),
            }
            for r in per_band
        ]
        stats["candidate_pairs"] = sum(
            e["candidate_pairs"] for e in stats["per_band"]
        )
        for e in stats["per_band"]:
            logger.info(
                "simhash_pairs: band=%d buckets=%d candidate_pairs=%d "
                "(key width %d bits)",
                e["band"], e["buckets"], e["candidate_pairs"], width,
            )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a"),
            F.col("b.doc_id").alias("b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    n_blocks: int | None = None,
    n_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(a, b, cosine): embedding near-dup pairs with round(cosine,4) >=
    threshold, a < b. ``id_col`` must be an integer column (ids are block
    keys and pair members; a silent cast of string keys to NULL would drop
    pairs, so non-integer ids are rejected loudly).

    ``method="auto"`` picks the scale-appropriate strategy so a 100 TB run
    with default arguments gets the right plan: true near-dup thresholds
    (>= 0.8) route to the banded-LSH path (candidate generation + exact
    verify — no exhaustive comparison); lower thresholds, where no metric
    pruning exists, route to the exact block-GEMM with
    ``n_blocks ~= max(8, N / 10k)`` derived from a cheap count so per-task
    score tiles stay ~100 MB at any corpus size. Passing an explicit
    ``n_blocks`` forces the exact block path at any threshold.

    Two scale paths (neither is a row-level crossJoin):

    - ``block`` (default, EXACT): block-pair matrix multiply. Vectors are
      hashed into ``n_blocks`` blocks; each of the B(B+1)/2 unordered block
      pairs is one applyInPandas task doing a normalized numpy GEMM
      (A_hat @ B_hat.T), so the O(N^2) dot products run at BLAS speed
      across the cluster instead of as exploded join rows. Data moved is
      O(N * B) (each vector joins B tasks); per-task memory is
      O((N/B)^2) doubles — pick n_blocks ~= N / 10k so score tiles stay
      ~100 MB at any corpus size. Exhaustive comparison is unavoidable for
      LOW thresholds (no metric pruning exists at cosine ~0.3); this makes
      it vectorized and distributed rather than impossible.
    - ``lsh`` (approximate, for true near-dup thresholds >= ~0.8): sign
      signatures from similarity.lsh_buckets, banded into
      ``bands`` blocks of n_planes/bands bits; pairs sharing >= 1 exact
      band are candidates (pigeonhole: any pair with signature hamming
      distance < bands is ALWAYS a candidate), verified with exact cosine.
      Misses only pairs whose signatures differ in >= bands of the
      ``n_planes`` bits — vanishingly rare for high-cosine pairs
      (P(bit differs) = acos(cos)/pi ~ 0.1 at cosine 0.95).
    """
    id_type = dict(embeddings.dtypes).get(id_col)
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"embedding_neardup_pairs: id column {id_col!r} has type "
            f"{id_type!r}; integer ids are required (a silent cast would "
            "turn string keys into NULLs and drop pairs)"
        )
    if method == "auto":
        method = (
            "block"
            if n_blocks is not None
            else ("lsh" if threshold >= 0.8 else "block")
        )
        # auto is approximate at near-dup thresholds — say so, visibly,
        # so callers on default args know exact vs approximate was chosen
        # for them (pass method="block" to force the exact path)
        logger.info(
            "embedding_neardup_pairs: method='auto' selected %r "
            "(threshold=%s; 'lsh' is approximate candidate-gen + exact "
            "verify, 'block' is exact block-GEMM)",
            method, threshold,
        )
    if method == "lsh":
        return _embedding_neardup_lsh(
            embeddings, threshold, id_col, vec_col, n_planes, bands
        )
    if method != "block":
        raise ValueError(f"unknown method {method!r}")
    if n_blocks is None:
        # per-task GEMM tiles stay ~(10k)^2 doubles regardless of N
        n = embeddings.count()
        n_blocks = max(8, -(-n // 10_000))
    return _embedding_neardup_block(
        embeddings, threshold, id_col, vec_col, n_blocks
    )


def _embedding_neardup_block(
    embeddings: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    n_blocks: int,
) -> DataFrame:
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    v = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("blk", F.pmod(F.hash(F.col("id")), F.lit(n_blocks)))
    tasks = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    # each vector is shipped to every task touching its block; an unordered
    # pair (x, y) lands in exactly one task: (min(blk), max(blk))
    side_a = v.join(F.broadcast(tasks), F.col("blk") == F.col("bi")).select(
        "bi", "bj", "id", "v", F.lit(0).alias("side")
    )
    side_b = v.join(F.broadcast(tasks), F.col("blk") == F.col("bj")).select(
        "bi", "bj", "id", "v", F.lit(1).alias("side")
    )
    both = side_a.unionByName(side_b)

    def gemm(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(key[0]), int(key[1])
        a = pdf[pdf["side"] == 0]
        if a.empty:
            return pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
                {"a": np.int64, "b": np.int64, "cosine": np.float64}
            )
        ids_a = a["id"].to_numpy(np.int64)
        A = np.stack(a["v"].to_numpy())
        na = np.sqrt((A * A).sum(axis=1))
        # dot / (|a| * |b|) — same float structure as the SQL/driver-side
        # cosine expression (divide AFTER the dot, not pre-normalized rows)
        if bi == bj:
            S = (A @ A.T) / np.outer(na, na)
            iu, ju = np.triu_indices(len(A), k=1)
            cos = np.round(S[iu, ju], 4)
            lo = np.minimum(ids_a[iu], ids_a[ju])
            hi = np.maximum(ids_a[iu], ids_a[ju])
        else:
            b_ = pdf[pdf["side"] == 1]
            if b_.empty:
                return pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
                    {"a": np.int64, "b": np.int64, "cosine": np.float64}
                )
            ids_b = b_["id"].to_numpy(np.int64)
            B = np.stack(b_["v"].to_numpy())
            nb = np.sqrt((B * B).sum(axis=1))
            S = (A @ B.T) / np.outer(na, nb)
            cos_all = np.round(S, 4)
            ii, jj = np.nonzero(cos_all >= threshold)
            cos = cos_all[ii, jj]
            lo = np.minimum(ids_a[ii], ids_b[jj])
            hi = np.maximum(ids_a[ii], ids_b[jj])
        keep = cos >= threshold
        return pd.DataFrame(
            {"a": lo[keep], "b": hi[keep], "cosine": cos[keep]}
        )

    return both.groupBy("bi", "bj").applyInPandas(
        gemm, schema="a long, b long, cosine double"
    )


def _embedding_neardup_lsh(
    embeddings: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    n_planes: int,
    bands: int,
) -> DataFrame:
    from bm25_spark.operators.similarity import lsh_buckets

    assert n_planes % bands == 0
    width = n_planes // bands
    dim = len(embeddings.select(vec_col).first()[0])
    sig = lsh_buckets(embeddings, n_planes, dim, id_col, vec_col)
    band = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    keyed = sig.select("id", "v", "nrm", "bucket", band).withColumn(
        "key",
        F.expr(f"(bucket >> (band * {width})) & {(1 << width) - 1}"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a"),
            F.col("b.id").alias("b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
            F.col("a.nrm").alias("na"),
            F.col("b.nrm").alias("nb"),
        )
        .dropDuplicates(["a", "b"])
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
