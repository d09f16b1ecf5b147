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

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bm25_spark.functions.analyzer import make_tokenize_udf
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

    def persist(self) -> "BM25Index":
        for df in (self.docs, self.terms, self.postings, self.stats):
            df.persist(StorageLevel.MEMORY_AND_DISK)
        return self

    def materialize(self) -> "BM25Index":
        """Force the build. ``flat`` (the tokenize+tf output) is pinned
        first so the tokenizer UDF runs ONCE, not once per derived table."""
        self.persist()
        if self.flat is not None:
            self.flat.persist(StorageLevel.MEMORY_AND_DISK)
        for df in (self.postings, self.terms, self.docs, self.stats):
            df.count()
        if self.flat is not None:
            self.flat.unpersist()
        return self

    def unpersist(self) -> None:
        for df in (self.docs, self.terms, self.postings, self.stats):
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
    spark = transcripts.sparkSession
    stop = frozenset(stopwords) if stopwords else None
    tok = make_tokenize_udf(stop)

    if id_col is not None:
        base = transcripts.withColumn("doc_id", F.col(id_col).cast("long"))
    else:
        base = assign_doc_ids(transcripts, order_cols=order_cols, method=docid_method)
    pk_expr = (
        F.col(partition_col).cast("string") if partition_col else F.lit("")
    )
    docs = (
        base.withColumn("pk", pk_expr)
        .withColumn("terms", tok(F.col(text_col)))
        .withColumn("dl", F.size("terms"))
    )
    # one row per (doc, distinct term): partial agg combines within-doc dups
    # map-side before the (pk, term, doc_id) shuffle.
    flat = (
        docs.select("pk", "doc_id", "dl", F.explode("terms").alias("term"))
        .groupBy("pk", "term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )
    docs_out = docs.drop("terms")

    stats = docs_out.groupBy("pk").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    terms = (
        flat.groupBy("pk", "term")
        .agg(F.count(F.lit(1)).alias("df"))
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
    postings = (
        flat.withColumn(
            "shard", (F.col("doc_id") / F.lit(shard_size)).cast("int")
        )
        .groupBy("pk", "term", "shard")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf", "dl"))
            ).alias("postings")
        )
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
        stopwords=stop,
        partitioned=partition_col is not None,
        text_col=text_col,
        shard_size=shard_size,
        flat=flat,
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
    bucketed by term] — same layout, swap ``parquet`` for ``saveAsTable``."""
    p = IndexPaths(root)
    index.docs.write.mode(mode).partitionBy("pk").parquet(p.docs)
    index.terms.write.mode(mode).partitionBy("pk").parquet(p.terms)
    index.postings.write.mode(mode).partitionBy("pk").parquet(p.postings)
    index.stats.write.mode(mode).parquet(p.stats)


def read_index(
    spark: SparkSession,
    root: str,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    index_fields: tuple[str, ...] = ("role", "tool", "conv_id"),
    stopwords=None,
    partitioned: bool = False,
) -> BM25Index:
    p = IndexPaths(root)
    return BM25Index(
        spark=spark,
        docs=spark.read.parquet(p.docs),
        terms=spark.read.parquet(p.terms),
        postings=spark.read.parquet(p.postings),
        stats=spark.read.parquet(p.stats),
        k1=k1,
        b=b,
        index_fields=tuple(index_fields),
        stopwords=frozenset(stopwords) if stopwords else None,
        partitioned=partitioned,
    )
