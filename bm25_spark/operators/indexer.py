"""Distributed inverted-index build — the tokenize → tf → stats → postings
pipeline (reference operators O1-O9, SURVEY.md §2), expressed as DataFrame
dataflow so Catalyst handles pushdown/pruning/partial-agg.

Index data model (a small star of tables, all carrying ``pk`` — the
partition key; a non-partitioned index uses pk = ''):

- docs     (pk, doc_id, <original cols>, dl)          one row per document
- terms    (pk, term, df, idf)                        dictionary
- postings (pk, term, shard, postings:array<struct<doc_id,tf,dl>>)
- stats    (pk, n_docs, avgdl)                        per-partition scalars

Design notes vs the reference (lib/src/bm25.dart:423-501):

- dl is stored INSIDE each posting (doc_id, tf, dl) so the query path never
  joins a 10^12-row doclens table — norm is recomputed as a fused JVM
  expression from (tf, dl, avgdl). Rank-identical; pure layout choice.
- ``shard = doc_id // shard_size`` splits each term's postings into
  contiguous doc-id ranges. This is the skew salt for Zipfian hot terms
  (a stopword-like term appearing in 30% of 10^12 docs cannot be one
  collect_list row) AND the unit of query-time parallelism. Because shards
  are contiguous ranges, per-shard doc-sorted order concatenates to global
  doc-sorted order with no merge (delta-encoding in the packed codec stays
  per-shard).
- IDF = ln((N - df + 0.5)/(df + 0.5) + 1), N/df/avgdl all per-pk
  (partitioned_bm25.dart:15-17: per-partition stats).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
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

from bm25_spark.functions.analyzer import make_dl_udf
from bm25_spark.operators.docids import assign_doc_ids

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75
DEFAULT_SHARD_SIZE = 1 << 20  # docs per posting shard


@dataclass
class BM25Index:
    spark: SparkSession
    docs: DataFrame
    terms: DataFrame
    postings: DataFrame
    stats: DataFrame
    k1: float = DEFAULT_K1
    b: float = DEFAULT_B
    index_fields: tuple[str, ...] = ()
    stopwords: frozenset[str] | None = None
    partitioned: bool = False
    packed: DataFrame | None = None  # set by packed.pack_index
    text_col: str = "text"
    shard_size: int = DEFAULT_SHARD_SIZE
    flat: DataFrame | None = None  # (pk, term, doc_id, dl, tf) pre-postings
    enc: DataFrame | None = None  # tokenized docs (with per-doc term counts)

    def _physical(self) -> tuple[DataFrame, ...]:
        """Index tables in DEPENDENCY order (stats -> postings -> terms ->
        docs). Spark's CacheManager freezes a persisted plan's physical form
        at registration time, so a downstream table must be registered
        AFTER its upstream or its frozen plan will recompute the upstream
        instead of reading the cache (terms derives from packed, packed
        from stats)."""
        post = self.packed if self.packed is not None else self.postings
        return (self.stats, post, self.terms, self.docs)

    def persist(self) -> "BM25Index":
        for df in self._physical():
            df.persist(StorageLevel.MEMORY_AND_DISK)
        return self

    def materialize(self) -> "BM25Index":
        """Force the build. ``enc`` (the tokenize output) is pinned and
        computed BEFORE the index tables are even marked for caching:
        Spark's CacheManager freezes a persisted plan's physical form at
        registration time, so registering docs/terms/postings/stats first
        would capture plans WITHOUT the enc InMemoryRelation substitution
        and the tokenizer UDF would re-run once per derived table."""
        pin = self.enc if self.enc is not None else self.flat
        if pin is not None:
            pin.persist(StorageLevel.MEMORY_AND_DISK)
            pin.count()
        self.persist()
        for df in self._physical():
            df.count()
        if pin is not None and pin is not self.docs:
            pin.unpersist()
        return self

    def unpersist(self) -> None:
        for df in self._physical():
            df.unpersist()


def build_index(
    transcripts: DataFrame,
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    index_fields: tuple[str, ...] = ("role", "tool", "conv_id"),
    partition_col: str | None = None,
    stopwords=None,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    shard_size: int = DEFAULT_SHARD_SIZE,
    docid_method: str = "range",
    id_col: str | None = None,
    chunk_postings: int = 1 << 21,
) -> BM25Index:
    """Build the inverted index over a transcripts-shaped DataFrame.

    ``partition_col``: column acting as the PartitionedBM25 key
    (partitioned_bm25.dart:61-81) — all stats become per-key. None = single
    logical partition (pk='').

    ``id_col``: use an existing unique integer column as doc_id instead of
    deriving dense ids from ``order_cols`` (e.g. a corpus that already
    carries stable ids).
    """
    stop = frozenset(stopwords) if stopwords else None

    if id_col is not None:
        base = transcripts.withColumn("doc_id", F.col(id_col).cast("long"))
    else:
        base = assign_doc_ids(transcripts, order_cols=order_cols, method=docid_method)
    pk_expr = (
        F.col(partition_col).cast("string") if partition_col else F.lit("")
    )
    src = base.withColumn("pk", pk_expr)
    # Single pass over the text for the whole index critical path: the
    # fused tokenize+count+pack map stage also emits per-task doc-count /
    # Σdl sentinel rows, so corpus statistics (n_docs, avgdl) come from the
    # SAME scan — no separate tokenize pass before packing can start.
    runs, stats, packed = _pack_pipeline(
        src, shard_size, k1, b, text_col, stop, chunk_postings=chunk_postings
    )
    # the docs table's per-doc dl is a scalar-only UDF pass, off the
    # critical path (query-time metadata filters read this table)
    docs_out = src.withColumn("dl", make_dl_udf(stop)(F.col(text_col)))
    return _finish_index(
        docs_out,
        stats,
        packed,
        k1=k1,
        b=b,
        index_fields=index_fields,
        stopwords=stop,
        partitioned=partition_col is not None,
        text_col=text_col,
        shard_size=shard_size,
        pin=runs,
    )


def _finish_index(
    docs_out: DataFrame,
    stats: DataFrame,
    packed: DataFrame,
    k1: float,
    b: float,
    index_fields: tuple[str, ...],
    stopwords,
    partitioned: bool,
    text_col: str,
    shard_size: int,
    pin: DataFrame | None = None,
) -> BM25Index:
    spark = docs_out.sparkSession
    # df(t) = Σ_shard n — read off the packed index (30 rows per term·shard,
    # not another pass over the (doc, term) relation).
    terms = (
        packed.groupBy("pk", "term")
        .agg(F.sum("n").alias("df"))
        .join(F.broadcast(stats.select("pk", "n_docs")), "pk")
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .drop("n_docs")
    )
    postings = decoded_postings_view(packed, shard_size)
    # (pk, term, doc_id, dl, tf) debug/contract view, decoded on demand
    flat = postings.select(
        "pk", "term", F.explode("postings").alias("p")
    ).select(
        "pk",
        "term",
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.dl").alias("dl"),
        F.col("p.tf").alias("tf"),
    )
    return BM25Index(
        spark=spark,
        docs=docs_out,
        terms=terms,
        postings=postings,
        stats=stats,
        k1=k1,
        b=b,
        index_fields=tuple(index_fields),
        stopwords=stopwords,
        partitioned=partitioned,
        text_col=text_col,
        shard_size=shard_size,
        flat=flat,
        enc=pin,
        packed=packed,
    )


PACKED_SCHEMA = StructType(
    [
        StructField("pk", StringType(), False),
        StructField("term", StringType(), False),
        StructField("shard", IntegerType(), False),
        StructField("n", IntegerType(), False),
        StructField("data", BinaryType(), False),
        StructField("block_last", ArrayType(LongType()), False),
        StructField("block_max", ArrayType(DoubleType()), False),
    ]
)

_RUN_SCHEMA = StructType(
    [
        StructField("pk", StringType(), False),
        StructField("term", StringType(), False),
        StructField("shard", IntegerType(), False),
        StructField("n", IntegerType(), False),
        StructField("data", BinaryType(), False),
        StructField("sum_dl", LongType(), False),
    ]
)

# sentinel term for per-task doc-stats rows in the runs table; real tokens
# are always >= 2 chars (bm25.dart:712), so "" cannot collide
_STATS_TERM = ""


def _pack_pipeline(
    src: DataFrame,
    shard_size: int,
    k1: float,
    b: float,
    text_col: str = "text",
    stopwords=None,
    chunk_postings: int = 1 << 21,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Two-stage pack-merge postings build (the index build's only wide
    shuffle, Lucene-segment style):

    1. map side (narrow, ``mapInArrow`` straight off the corpus): tokenize +
       per-doc TF count (the reference's per-doc map, bm25.dart:426-433)
       and pack in ONE fused stage — text crosses the Arrow boundary once,
       token arrays never materialize JVM-side. Grouping is a term-code
       lexsort; ONE bulk varint encode is sliced into per-(pk, term, shard)
       run blobs. The shuffle then moves COMPRESSED RUNS — orders of
       magnitude less than shuffling raw posting rows, and hot Zipf terms
       are already split by doc-range shard so no single reducer key
       explodes.
    2. reduce side: repartition the runs by (pk, term, shard) and
       merge-sort each group's runs + re-pack with block-max metadata
       (codec.pack_postings).

    The reference's analog is the single-threaded posting builder
    (lib/src/bm25.dart:437-468); shards (contiguous doc-id ranges) make the
    merge exact: per-shard doc order concatenates to global doc order."""
    import pyarrow as pa

    from bm25_spark.functions import codec
    from bm25_spark.functions.analyzer import tokenize_text

    stop = frozenset(stopwords) if stopwords else None

    # flush partial runs every ~chunk_postings postings: task memory stays
    # O(chunk) regardless of partition size (a 100 TB build cannot buffer a
    # whole input split in Python) — the merge happily unions multiple runs
    # per (pk, term, shard) from the same task

    def partial_pack(batches):
        from array import array
        from collections import Counter

        term_code: dict[str, int] = {}
        vocab: list[str] = []
        pk_code: dict[str, int] = {}
        pk_vals: list[str] = []
        # per-pk doc stats for this task's slice — emitted as sentinel rows
        # so n_docs/avgdl derive from this same pass (empty docs count too)
        pk_ndocs: dict[str, int] = {}
        pk_sumdl: dict[str, int] = {}

        def fresh():
            return array("q"), array("q"), [], [], []

        codes_a, tfs_a, docs_l, dls_l, pks_l = fresh()

        def flush():
            codes = np.frombuffer(codes_a, dtype=np.int64)
            tf_flat = np.frombuffer(tfs_a, dtype=np.int64)
            doc_flat = np.concatenate(docs_l)
            dl_flat = np.concatenate(dls_l)
            pk_codes = np.concatenate(pks_l)
            shard = (doc_flat // shard_size).astype(np.int64)
            order = np.lexsort((doc_flat, shard, codes, pk_codes))
            doc_s, tf_s, dl_s = doc_flat[order], tf_flat[order], dl_flat[order]
            code_s, pk_s, shard_s = codes[order], pk_codes[order], shard[order]
            bmask = np.empty(len(order), dtype=bool)
            bmask[0] = True
            bmask[1:] = (
                (pk_s[1:] != pk_s[:-1])
                | (code_s[1:] != code_s[:-1])
                | (shard_s[1:] != shard_s[:-1])
            )
            starts = np.flatnonzero(bmask)
            ends = np.append(starts[1:], len(order))
            bases = shard_s[starts] * shard_size
            blobs = codec.pack_runs_bulk(doc_s, tf_s, dl_s, starts, ends, bases)
            return pa.RecordBatch.from_arrays(
                [
                    pa.array([pk_vals[c] for c in pk_s[starts]], pa.string()),
                    pa.array([vocab[c] for c in code_s[starts]], pa.string()),
                    pa.array(shard_s[starts].astype(np.int32), pa.int32()),
                    pa.array((ends - starts).astype(np.int32), pa.int32()),
                    pa.array(blobs, pa.binary()),
                    pa.array([0] * len(starts), pa.int64()),
                ],
                names=["pk", "term", "shard", "n", "data", "sum_dl"],
            )

        for rb in batches:
            cols = dict(zip(rb.schema.names, rb.columns))
            texts = cols[text_col].to_pylist()
            ids = cols["doc_id"].to_numpy().astype(np.int64)
            pks = cols["pk"].to_pylist()
            for text, doc_id, pk in zip(texts, ids, pks):
                c = Counter(tokenize_text(text, stop))
                dl = sum(c.values())
                pk_ndocs[pk] = pk_ndocs.get(pk, 0) + 1
                pk_sumdl[pk] = pk_sumdl.get(pk, 0) + dl
                if not c:
                    continue
                pc_ = pk_code.get(pk)
                if pc_ is None:
                    pc_ = pk_code[pk] = len(pk_vals)
                    pk_vals.append(pk)
                for term, tf in c.items():
                    tc = term_code.get(term)
                    if tc is None:
                        tc = term_code[term] = len(vocab)
                        vocab.append(term)
                    codes_a.append(tc)
                    tfs_a.append(tf)
                docs_l.append(np.full(len(c), doc_id, dtype=np.int64))
                dls_l.append(np.full(len(c), dl, dtype=np.int64))
                pks_l.append(np.full(len(c), pc_, dtype=np.int64))
            if len(codes_a) >= chunk_postings:
                yield flush()
                codes_a, tfs_a, docs_l, dls_l, pks_l = fresh()
        if pk_ndocs:
            sent_pks = sorted(pk_ndocs)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(sent_pks, pa.string()),
                    pa.array([_STATS_TERM] * len(sent_pks), pa.string()),
                    pa.array([0] * len(sent_pks), pa.int32()),
                    pa.array([pk_ndocs[p] for p in sent_pks], pa.int32()),
                    pa.array([b""] * len(sent_pks), pa.binary()),
                    pa.array([pk_sumdl[p] for p in sent_pks], pa.int64()),
                ],
                names=["pk", "term", "shard", "n", "data", "sum_dl"],
            )
        if len(codes_a):
            yield flush()

    runs = src.select("pk", "doc_id", F.col(text_col)).mapInArrow(
        partial_pack, schema=_RUN_SCHEMA
    )

    stats = (
        runs.filter(F.col("term") == _STATS_TERM)
        .groupBy("pk")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            (F.sum("sum_dl") / F.sum("n")).alias("avgdl"),
        )
    )

    def merge_runs(batches):
        groups: dict[tuple, list] = {}
        avgdls: dict[str, float] = {}
        for rb in batches:
            cols = dict(zip(rb.schema.names, rb.columns))
            pk_a = cols["pk"].to_pylist()
            term_a = cols["term"].to_pylist()
            shard_a = cols["shard"].to_pylist()
            n_a = cols["n"].to_pylist()
            data_a = cols["data"].to_pylist()
            av_a = cols["avgdl"].to_pylist()
            for pk, term, shard, n, data, av in zip(
                pk_a, term_a, shard_a, n_a, data_a, av_a
            ):
                groups.setdefault((pk, term, shard), []).append((n, data))
                avgdls[pk] = av
        if not groups:
            return
        pks, terms_o, shards_o, ns, datas, bls, bms = [], [], [], [], [], [], []
        for (pk, term, shard), lst in groups.items():
            base = int(shard) * shard_size
            ids_l, tfs_l, dls_l = [], [], []
            for n, data in lst:
                i, t, d = codec.unpack_run(bytes(data), int(n), base)
                ids_l.append(i)
                tfs_l.append(t)
                dls_l.append(d)
            ids = np.concatenate(ids_l)
            tfs = np.concatenate(tfs_l).astype(np.int64)
            dls = np.concatenate(dls_l).astype(np.int64)
            order = np.argsort(ids, kind="stable")
            data, n, bl, bm = codec.pack_postings(
                ids[order], tfs[order], dls[order], base, k1, b,
                float(avgdls[pk]),
            )
            pks.append(pk)
            terms_o.append(term)
            shards_o.append(shard)
            ns.append(n)
            datas.append(data)
            bls.append(bl)
            bms.append(bm)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(pks, pa.string()),
                pa.array(terms_o, pa.string()),
                pa.array(np.asarray(shards_o, np.int32), pa.int32()),
                pa.array(np.asarray(ns, np.int32), pa.int32()),
                pa.array(datas, pa.binary()),
                pa.array(bls, pa.list_(pa.int64())),
                pa.array(bms, pa.list_(pa.float64())),
            ],
            names=["pk", "term", "shard", "n", "data", "block_last", "block_max"],
        )

    # explicit partition count: AQE would coalesce this exchange to ~1 task
    # (compressed runs LOOK tiny) and serialize the decode+merge work
    spark = src.sparkSession
    n_merge = int(spark.conf.get("spark.sql.shuffle.partitions"))
    packed = (
        runs.filter(F.col("term") != _STATS_TERM)
        .join(F.broadcast(stats.select("pk", "avgdl")), "pk")
        .repartition(n_merge, "pk", "term", "shard")
        .mapInArrow(merge_runs, schema=PACKED_SCHEMA)
    )
    return runs, stats, packed


def decoded_postings_view(packed: DataFrame, shard_size: int) -> DataFrame:
    """(pk, term, shard, postings: array<struct<doc_id,tf,dl>>) — the
    logical array view of the packed blobs, decoded on demand (contract
    cross-checks, debugging; the query path reads the blobs directly)."""
    from bm25_spark.functions import codec

    out_t = ArrayType(
        StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("tf", IntegerType(), False),
                StructField("dl", IntegerType(), False),
            ]
        )
    )

    @F.pandas_udf(out_t)
    def dec(data: pd.Series, n: pd.Series, shard: pd.Series) -> pd.Series:
        out = []
        for d, nn, s in zip(data, n, shard):
            ids, tfs, dls = codec.unpack_postings(
                bytes(d), int(nn), int(s) * shard_size
            )
            out.append(
                [
                    {"doc_id": int(i), "tf": int(t), "dl": int(l)}
                    for i, t, l in zip(ids, tfs, dls)
                ]
            )
        return pd.Series(out)

    return packed.select(
        "pk", "term", "shard", dec("data", "n", "shard").alias("postings")
    )


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self):
        return f"{self.root}/docs"

    @property
    def terms(self):
        return f"{self.root}/terms"

    @property
    def postings(self):
        return f"{self.root}/postings"

    @property
    def stats(self):
        return f"{self.root}/stats"


def write_index(index: BM25Index, root: str, mode: str = "overwrite") -> None:
    """Persist the index star. Parquet locally; on a cluster these writers
    target Iceberg tables partitioned by (pk) [postings additionally
    bucketed by term] — same layout, swap ``parquet`` for ``saveAsTable``.
    The postings table is the PACKED form (delta+varint blobs + block-max);
    readers re-derive the array view lazily."""
    p = IndexPaths(root)

    def w(df, path):
        # hive partitioning treats pk='' (the single-partition sentinel) as
        # NULL on read — only layout by pk for genuinely partitioned indexes
        wr = df.write.mode(mode)
        if index.partitioned:
            wr = wr.partitionBy("pk")
        wr.parquet(path)

    w(index.docs, p.docs)
    w(index.terms, p.terms)
    w(index.packed if index.packed is not None else index.postings, p.postings)
    index.stats.write.mode(mode).parquet(p.stats)


def read_index(
    spark: SparkSession,
    root: str,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    index_fields: tuple[str, ...] = ("role", "tool", "conv_id"),
    stopwords=None,
    partitioned: bool = False,
    shard_size: int = DEFAULT_SHARD_SIZE,
) -> BM25Index:
    p = IndexPaths(root)
    post = spark.read.parquet(p.postings)
    packed = post if "data" in post.columns else None
    return BM25Index(
        spark=spark,
        docs=spark.read.parquet(p.docs),
        terms=spark.read.parquet(p.terms),
        postings=(
            decoded_postings_view(packed, shard_size)
            if packed is not None
            else post
        ),
        packed=packed,
        stats=spark.read.parquet(p.stats),
        k1=k1,
        b=b,
        index_fields=tuple(index_fields),
        stopwords=frozenset(stopwords) if stopwords else None,
        partitioned=partitioned,
        shard_size=shard_size,
    )
