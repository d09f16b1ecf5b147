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

from bm25_spark.functions.analyzer import make_doc_terms_udf
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
        post = self.packed if self.packed is not None else self.postings
        return (self.docs, self.terms, post, self.stats)

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
        docs, terms, post, stats = self._physical()
        for df in (stats, post, terms, docs):
            df.count()
        if pin is not None:
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
    doc_terms = make_doc_terms_udf(stop)

    if id_col is not None:
        base = transcripts.withColumn("doc_id", F.col(id_col).cast("long"))
    else:
        base = assign_doc_ids(transcripts, order_cols=order_cols, method=docid_method)
    pk_expr = (
        F.col(partition_col).cast("string") if partition_col else F.lit("")
    )
    # per-doc term counts come out of the tokenizer UDF itself, so the
    # (doc, term, tf) relation below is a NARROW explode — no shuffle of raw
    # token occurrences (the reference's per-doc TF map, bm25.dart:426-433).
    enc = (
        base.withColumn("pk", pk_expr)
        .withColumn("z", doc_terms(F.col(text_col)))
        .select("*", F.col("z.dl").alias("dl"), F.col("z.terms").alias("terms"), F.col("z.tfs").alias("tfs"))
        .drop("z")
    )
    return assemble_index(
        enc,
        k1=k1,
        b=b,
        index_fields=index_fields,
        stopwords=stop,
        partitioned=partition_col is not None,
        text_col=text_col,
        shard_size=shard_size,
    )


def assemble_index(
    enc: DataFrame,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    index_fields: tuple[str, ...] = (),
    stopwords=None,
    partitioned: bool = False,
    text_col: str = "text",
    shard_size: int = DEFAULT_SHARD_SIZE,
) -> BM25Index:
    """Assemble the index star from tokenized docs ``enc`` carrying
    (pk, doc_id, dl, terms: array<string>, tfs: array<int>, ...). Shared by
    the batch build and streaming segment compaction."""
    spark = enc.sparkSession
    flat = enc.select(
        "pk",
        "doc_id",
        "dl",
        F.explode(F.arrays_zip("terms", "tfs")).alias("t"),
    ).select(
        "pk",
        F.col("t.terms").alias("term"),
        "doc_id",
        "dl",
        F.col("t.tfs").cast("int").alias("tf"),
    )
    docs_out = enc.drop("terms", "tfs")

    stats = docs_out.groupBy("pk").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    packed = _packed_postings(flat, stats, shard_size, k1, b)
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
        enc=enc,
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
    ]
)


def _packed_postings(
    flat: DataFrame, stats: DataFrame, shard_size: int, k1: float, b: float
) -> DataFrame:
    """Two-stage pack-merge postings build (the index build's only wide
    shuffle, Lucene-segment style):

    1. map side (narrow): within each input partition, group its (doc, term,
       tf, dl) rows by (pk, term, shard) and delta+varint-pack each doc-sorted
       run. The shuffle then moves COMPRESSED RUS — orders of magnitude
       less than shuffling raw posting rows, and hot Zipf terms are already
       split by doc-range shard so no single reducer key explodes.
    2. reduce side: merge-sort the ≤P runs per (pk, term, shard) and re-pack
       with block-max metadata (codec.pack_postings).

    The reference's analog is the single-threaded posting builder
    (lib/src/bm25.dart:437-468); shards (contiguous doc-id ranges) make the
    merge exact: per-shard doc order concatenates to global doc order."""
    from bm25_spark.functions import codec

    def partial_pack(iterator):
        batches = [pdf for pdf in iterator if len(pdf)]
        if not batches:
            return
        pdf = pd.concat(batches) if len(batches) > 1 else batches[0]
        pks, terms_c, shards_c, ns, datas = [], [], [], [], []
        for (pk, term, shard), g in pdf.groupby(
            ["pk", "term", "shard"], sort=False
        ):
            ids = g["doc_id"].to_numpy(np.int64)
            order = np.argsort(ids, kind="stable")
            data = codec.pack_run(
                ids[order],
                g["tf"].to_numpy(np.int64)[order],
                g["dl"].to_numpy(np.int64)[order],
                int(shard) * shard_size,
            )
            pks.append(pk)
            terms_c.append(term)
            shards_c.append(shard)
            ns.append(len(ids))
            datas.append(data)
        yield pd.DataFrame(
            {"pk": pks, "term": terms_c, "shard": shards_c, "n": ns, "data": datas}
        )

    runs = flat.withColumn(
        "shard", (F.col("doc_id") / F.lit(shard_size)).cast("int")
    ).mapInPandas(partial_pack, schema=_RUN_SCHEMA)

    def merge_group(key, pdf):
        pk, term, shard = key
        base = int(shard) * shard_size
        ids_l, tfs_l, dls_l = [], [], []
        for data, n in zip(pdf["data"], pdf["n"]):
            i, t, d = codec.unpack_run(bytes(data), int(n), base)
            ids_l.append(i)
            tfs_l.append(t)
            dls_l.append(d)
        ids = np.concatenate(ids_l)
        tfs = np.concatenate(tfs_l).astype(np.int64)
        dls = np.concatenate(dls_l).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        data, n, bl, bm = codec.pack_postings(
            ids[order],
            tfs[order],
            dls[order],
            base,
            k1,
            b,
            float(pdf["avgdl"].iloc[0]),
        )
        return pd.DataFrame(
            {
                "pk": [pk],
                "term": [term],
                "shard": [shard],
                "n": [n],
                "data": [data],
                "block_last": [bl],
                "block_max": [bm],
            }
        )

    return (
        runs.join(F.broadcast(stats.select("pk", "avgdl")), "pk")
        .groupBy("pk", "term", "shard")
        .applyInPandas(merge_group, schema=PACKED_SCHEMA)
    )


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
    index.docs.write.mode(mode).partitionBy("pk").parquet(p.docs)
    index.terms.write.mode(mode).partitionBy("pk").parquet(p.terms)
    post = index.packed if index.packed is not None else index.postings
    post.write.mode(mode).partitionBy("pk").parquet(p.postings)
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
