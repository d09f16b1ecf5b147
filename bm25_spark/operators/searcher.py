"""Query-time top-k BM25 scoring (reference operators O10-O15, O17-O18).

Distributed plan per batch of queries:

    postings scan, term IN (...) pushed to parquet/Iceberg (min-max + bloom)
      -> explode shards (narrow)
      -> [optional] left-semi join vs filter-allowed doc_ids  (O11)
      -> broadcast join query terms (qtf, idf)                (O10/O12)
      -> hash agg (pk, query_id, doc_id) sum of per-term contributions
      -> per-query top-k via window rank                       (O13)

The score expression is the exact reference formula
(lib/src/bm25.dart:646-649):  idf * tf*(k1+1)/(tf + k1*((1-b)+b*dl/avgdl)),
with query-term multiplicity folded in as a qtf multiplier (bm25.dart:635
iterates duplicate tokens; multiplication is identical to repeated
addition). All arithmetic stays in whole-stage-codegen'd JVM expressions.

Ties: the reference's tie order is unspecified (score-only comparator,
bm25.dart:740,796); we break deterministically by doc_id ASC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bm25_spark.functions.analyzer import query_term_counts
from bm25_spark.operators.indexer import BM25Index

RESULT_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("pk", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("score", DoubleType(), False),
        StructField("rank", IntegerType(), False),
    ]
)

_QDF_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("term", StringType(), False),
        StructField("qtf", IntegerType(), False),
    ]
)


_QIDF_SCHEMA = (
    "query_id long, pk string, term string, qtf int, idf double, avgdl double"
)

_EMPTY_RESULT_SQL = (
    "SELECT CAST(0 AS BIGINT) AS query_id, '' AS pk, "
    "CAST(0 AS BIGINT) AS doc_id, CAST(0.0 AS DOUBLE) AS score, "
    "CAST(0 AS INT) AS rank WHERE 1=0"
)


def empty_result(spark) -> DataFrame:
    """Zero-row RESULT_SCHEMA frame as a LocalRelation: WHERE-false over a
    one-row relation folds to an empty LocalTableScan, so actions on it are
    driver-local (~30ms) instead of the ~0.5s job-scheduling cost of the
    createDataFrame([], schema) parallelize path. All-stopword, unknown-term
    and empty-filter queries return through here (bm25.dart:220,600,628)."""
    return spark.sql(_EMPTY_RESULT_SQL)


def _stats_map(index: BM25Index, partition_keys) -> dict:
    """pk -> (n_docs, avgdl), collected once per index and cached."""
    cache = index.__dict__.setdefault("_stats_cache", {})
    if index.__dict__.get("_stats_all"):
        return cache
    if partition_keys is None:
        for r in index.stats.collect():
            cache[r["pk"]] = (r["n_docs"], r["avgdl"])
        index.__dict__["_stats_all"] = True
    else:
        missing = [k for k in partition_keys if k not in cache]
        if missing:
            for r in index.stats.filter(F.col("pk").isin(missing)).collect():
                cache[r["pk"]] = (r["n_docs"], r["avgdl"])
            for k in missing:  # unknown partitions stay absent, marked seen
                cache.setdefault(k, None)
    return cache


def _query_frame_with_idf(index: BM25Index, qrows, partition_keys) -> DataFrame:
    """(query_id, pk, term, qtf, idf, avgdl) built driver-side from the
    term-dictionary probe; broadcast into the single scoring join."""
    needed = sorted({t for _, t, _ in qrows})
    t = index.terms.filter(F.col("term").isin(needed)).select("pk", "term", "idf")
    if partition_keys is not None:
        t = t.filter(F.col("pk").isin(partition_keys))
    idf_rows = t.collect()
    smap = _stats_map(index, partition_keys)
    by_term: dict[str, list] = {}
    for qid, term, qtf in qrows:
        by_term.setdefault(term, []).append((qid, qtf))
    rows = []
    for r in idf_rows:
        st = smap.get(r["pk"])
        if st is None:
            continue
        for qid, qtf in by_term.get(r["term"], ()):
            rows.append((qid, r["pk"], r["term"], qtf, float(r["idf"]), float(st[1])))
    return index.spark.createDataFrame(rows, _QIDF_SCHEMA)


def _filter_predicate(index: BM25Index, flt: dict) -> F.Column:
    """Reference filter semantics (bm25.dart:603-629): union of values
    within a field, intersection across fields; docs with a NULL/missing
    field never match; filtering on a non-indexed field is an error."""
    pred = None
    for fname, v in flt.items():
        if fname not in index.index_fields:
            raise ValueError(
                f"field {fname!r} is not an indexed field {index.index_fields}"
            )
        vals = list(v) if isinstance(v, (list, tuple, set)) else [v]
        col = F.col(fname)
        dtype = dict(zip(index.docs.columns, index.docs.schema))[fname].dataType
        if dtype.typeName() == "array":
            p = F.arrays_overlap(col, F.array(*[F.lit(x) for x in vals]))
        else:
            p = col.isin(vals)
        pred = p if pred is None else (pred & p)
    return pred


def search_batch(
    index: BM25Index,
    queries: list[tuple[int, str]],
    limit: int = 10,
    flt: dict | None = None,
    stopwords=None,
    partition_keys: list[str] | None = None,
    per_partition_limit: int | None = None,
    use_packed: bool | None = None,
) -> DataFrame:
    """Score a batch of (query_id, query_text). Returns
    (query_id, pk, doc_id, score, rank) with rank 1..limit per query.

    ``partition_keys``: restrict to these pk values (None = no restriction —
    plain index has pk=''). ``per_partition_limit``: cap candidates per pk
    BEFORE the global top-k (reproduces searchMany's default-limit-10 inner
    searches, partitioned_bm25.dart:143-153).

    ``use_packed``: None (default) routes through the packed numpy scorer
    whenever the index carries packed postings; False forces the JVM
    explode+agg plan over the decoded array view (kept for cross-checks).
    """
    if limit < 1:
        raise ValueError("limit must be >= 1")
    if use_packed is not False and index.packed is not None:
        from bm25_spark.operators.packed import search_packed

        return search_packed(
            index,
            queries,
            limit=limit,
            flt=flt,
            stopwords=stopwords,
            partition_keys=partition_keys,
            per_partition_limit=per_partition_limit,
        )
    spark = index.spark
    stop = stopwords if stopwords is not None else index.stopwords
    qrows = []
    for qid, qtext in queries:
        for term, qtf in query_term_counts(qtext, stop).items():
            qrows.append((qid, term, qtf))
    if not qrows:
        return empty_result(spark)

    needed_terms = sorted({t for _, t, _ in qrows})

    p = index.postings.filter(F.col("term").isin(needed_terms))
    if partition_keys is not None:
        p = p.filter(F.col("pk").isin(partition_keys))

    # Driver-side dictionary lookup (exactly a search engine's term-dict
    # probe): the ≤|q| idf rows and the per-pk avgdl scalars are collected
    # once and folded into a single broadcast-joined frame — the scoring
    # job then has ONE join, not three.
    q_terms = F.broadcast(
        _query_frame_with_idf(index, qrows, partition_keys)
    )

    e = p.select(
        "pk", "term", F.explode("postings").alias("post")
    ).select(
        "pk",
        "term",
        F.col("post.doc_id").alias("doc_id"),
        F.col("post.tf").alias("tf"),
        F.col("post.dl").alias("dl"),
    )

    if flt:
        pred = _filter_predicate(index, flt)
        allowed = index.docs.filter(pred).select("pk", "doc_id")
        e = e.join(allowed, ["pk", "doc_id"], "left_semi")

    k1, b = F.lit(index.k1), F.lit(index.b)
    contrib = (
        F.col("qtf")
        * F.col("idf")
        * F.col("tf")
        * (k1 + F.lit(1.0))
        / (
            F.col("tf")
            + k1
            * (
                (F.lit(1.0) - b)
                + b * F.col("dl") / F.col("avgdl")
            )
        )
    )
    scored = (
        e.join(q_terms, ["pk", "term"])
        .groupBy("query_id", "pk", "doc_id")
        .agg(F.sum(contrib).alias("score"))
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


def search(
    index: BM25Index,
    query: str,
    limit: int = 10,
    flt: dict | None = None,
    stopwords=None,
) -> DataFrame:
    """Single-query convenience — (doc_id, score, rank), rank ascending."""
    res = search_batch(index, [(0, query)], limit=limit, flt=flt, stopwords=stopwords)
    return res.select("doc_id", "score", "rank").orderBy("rank")


def search_in(index: BM25Index, key: str, query: str, limit: int = 10) -> DataFrame:
    """Partition-scoped search (partitioned_bm25.dart:104-109); unknown key
    naturally yields zero rows."""
    res = search_batch(index, [(0, query)], limit=limit, partition_keys=[key])
    return res.select("doc_id", "score", "rank").orderBy("rank")


def search_many(
    index: BM25Index, keys: list[str], query: str, limit: int = 10
) -> DataFrame:
    """Multi-partition merge. Reference quirk reproduced: each inner
    per-partition search runs with DEFAULT limit 10 regardless of the
    caller's limit (partitioned_bm25.dart:143-153)."""
    res = search_batch(
        index,
        [(0, query)],
        limit=limit,
        partition_keys=keys,
        per_partition_limit=10,
    )
    return res.select("pk", "doc_id", "score", "rank").orderBy("rank")


def fetch_results(result_df: DataFrame, index: BM25Index) -> DataFrame:
    """O14: join scores back to document text/metadata."""
    return result_df.join(
        index.docs.select("pk", "doc_id", index.text_col), ["pk", "doc_id"]
    )
