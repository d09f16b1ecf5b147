"""Driver-contract queries: one entry per implemented operator
(SURVEY.md §2), each as a (spark, sf_dir) -> DataFrame callable plus an
equivalent DuckDB SQL oracle over the same parquet tables.

Comparison discipline (the driver hashes values order-insensitively but
exactly): every float column is rounded to 4 decimals on BOTH sides, and
every rank/top-k is computed over the ROUNDED score with doc_id ASC
tie-break, so the two systems cannot diverge on float last-bits. All
integer outputs are cast to BIGINT on both sides.

The corpus stand-in is the driver's ``documents`` table
(doc_id, text, lang, source, n_chars): text is plain [a-z0-9_ ] so the
reference ASCII tokenizer == lower + split on non-word, len>=2
(verified: zero rows match '[^ a-z0-9_]' at all SFs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bm25_spark.functions.analyzer import query_term_counts

K1, B = 1.2, 0.75

FLAGSHIP_QUERY = "data table scan data filter"  # 'data' twice -> qtf 2
FILTER_LANGS = ["en", "fr"]
FILTER_SOURCES = ["src0", "src1", "src2", "src3", "src4"]
TOPK = 10

# ---------------------------------------------------------------- SQL side

_TOK = """
  SELECT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
    FROM documents
  ) WHERE length(term) >= 2
"""

_BASE = f"""
WITH tok AS ({_TOK}),
dl AS (
  SELECT d.doc_id, CAST(count(t.term) AS BIGINT) AS dl
  FROM documents d LEFT JOIN tok t USING (doc_id) GROUP BY d.doc_id
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
),
idf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         ln(((SELECT n_docs FROM stats) - count(*) + 0.5)
            / (count(*) + 0.5) + 1.0) AS idf
  FROM tf GROUP BY term
)
"""


def _q_values(query: str) -> str:
    counts = query_term_counts(query)
    rows = ", ".join(f"('{t}', {c})" for t, c in sorted(counts.items()))
    return f"(SELECT * FROM (VALUES {rows}) AS q(term, qtf))"


def _scored_sql(query: str, where_docs: str = "TRUE") -> str:
    """CTE tail producing scored(doc_id, score) for ``query``."""
    return f"""
, q AS {_q_values(query)}
, allowed AS (SELECT doc_id FROM documents WHERE {where_docs})
, scored AS (
  SELECT tf.doc_id,
         sum(q.qtf * idf.idf * tf.tf * ({K1} + 1.0)
             / (tf.tf + {K1} * ((1.0 - {B}) + {B} * dl.dl
                / (SELECT avgdl FROM stats)))) AS score
  FROM tf
  JOIN q USING (term)
  JOIN idf USING (term)
  JOIN dl USING (doc_id)
  JOIN allowed USING (doc_id)
  GROUP BY tf.doc_id
)
"""


# ------------------------------------------------------------- Spark side


def _read_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _index(spark: SparkSession, sf_dir: str, partition_col: str | None = None):
    from bm25_spark.operators.indexer import build_index

    return build_index(
        _read_docs(spark, sf_dir),
        text_col="text",
        id_col="doc_id",
        index_fields=("lang", "source"),
        partition_col=partition_col,
    )


def _tok_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bm25_spark.functions.analyzer import make_tokenize_udf

    tok = make_tokenize_udf(None)
    return (
        _read_docs(spark, sf_dir)
        .select("doc_id", F.explode(tok(F.col("text"))).alias("term"))
    )


def q_tokenize(spark, sf_dir):
    return _tok_df(spark, sf_dir)


def q_tf(spark, sf_dir):
    return (
        _tok_df(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def q_doclen(spark, sf_dir):
    idx = _index(spark, sf_dir)
    return idx.docs.select("doc_id", F.col("dl").cast("long").alias("dl"))


def q_stats(spark, sf_dir):
    idx = _index(spark, sf_dir)
    return idx.stats.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("avgdl", 4).alias("avgdl"),
    )


def q_norm(spark, sf_dir):
    idx = _index(spark, sf_dir)
    return (
        idx.docs.join(F.broadcast(idx.stats.select("pk", "avgdl")), "pk")
        .select(
            "doc_id",
            F.round(
                F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl"), 4
            ).alias("norm"),
        )
    )


def q_idf(spark, sf_dir):
    idx = _index(spark, sf_dir)
    return idx.terms.select(
        "term", F.col("df").cast("long").alias("df"), F.round("idf", 4).alias("idf")
    )


def q_postings_digest(spark, sf_dir):
    """O8 structural digest: per term over all shards — posting count,
    total tf, doc_id span — proves postings are complete and doc-keyed."""
    idx = _index(spark, sf_dir)
    e = idx.postings.select("term", F.explode("postings").alias("p"))
    return e.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_postings"),
        F.sum("p.tf").cast("long").alias("sum_tf"),
        F.min("p.doc_id").cast("long").alias("min_doc"),
        F.max("p.doc_id").cast("long").alias("max_doc"),
    )


def q_filter(spark, sf_dir):
    idx = _index(spark, sf_dir)
    from bm25_spark.operators.searcher import _filter_predicate

    pred = _filter_predicate(idx, {"lang": FILTER_LANGS, "source": FILTER_SOURCES})
    return idx.docs.filter(pred).select("doc_id")


def _scored_spark(spark, sf_dir, flt=None, partition_col=None):
    from bm25_spark.operators.searcher import search_batch

    idx = _index(spark, sf_dir, partition_col=partition_col)
    n = _read_docs(spark, sf_dir).count()
    return idx, search_batch(idx, [(0, FLAGSHIP_QUERY)], limit=n, flt=flt)


def q_score(spark, sf_dir):
    _, res = _scored_spark(spark, sf_dir)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def _rounded_topk(res: DataFrame, k: int) -> DataFrame:
    w = Window.orderBy(F.round("score", 4).desc(), F.col("doc_id").asc())
    return (
        res.select("doc_id", F.round("score", 4).alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def q_topk(spark, sf_dir):
    _, res = _scored_spark(spark, sf_dir)
    return _rounded_topk(res, TOPK)


def q_topk_filtered(spark, sf_dir):
    _, res = _scored_spark(
        spark, sf_dir, flt={"lang": FILTER_LANGS, "source": FILTER_SOURCES}
    )
    return _rounded_topk(res, TOPK)


def q_partitioned_stats(spark, sf_dir):
    idx = _index(spark, sf_dir, partition_col="lang")
    return idx.stats.select(
        F.col("pk").alias("lang"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("avgdl", 4).alias("avgdl"),
    )


def q_search_in(spark, sf_dir):
    """O17: partition-scoped search with per-partition stats (lang='en')."""
    from bm25_spark.operators.searcher import search_batch

    idx = _index(spark, sf_dir, partition_col="lang")
    n = _read_docs(spark, sf_dir).count()
    res = search_batch(idx, [(0, FLAGSHIP_QUERY)], limit=n, partition_keys=["en"])
    return _rounded_topk(res, TOPK)


def q_empty_query(spark, sf_dir):
    from bm25_spark.operators.searcher import search

    idx = _index(spark, sf_dir)
    return (
        search(idx, "   ", limit=5)
        .select("doc_id", "score")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_tokenize": q_tokenize,
        "bm25_tf": q_tf,
        "bm25_doclen": q_doclen,
        "bm25_stats": q_stats,
        "bm25_norm": q_norm,
        "bm25_idf": q_idf,
        "bm25_postings_digest": q_postings_digest,
        "bm25_filter": q_filter,
        "bm25_score": q_score,
        "bm25_topk": q_topk,
        "bm25_topk_filtered": q_topk_filtered,
        "bm25_partitioned_stats": q_partitioned_stats,
        "bm25_search_in": q_search_in,
        "bm25_empty_query": q_empty_query,
    }


def oracle_sql() -> dict[str, str]:
    filter_where = (
        f"lang IN ({', '.join(repr(x) for x in FILTER_LANGS)}) "
        f"AND source IN ({', '.join(repr(x) for x in FILTER_SOURCES)})"
    )
    topk_tail = f"""
SELECT doc_id, round(score, 4) AS score,
       CAST(row_number() OVER (ORDER BY round(score, 4) DESC, doc_id ASC)
            AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {TOPK}
"""
    # per-lang partitioned pipeline (O16/O17)
    part_base = f"""
WITH tok AS ({_TOK}),
docs_pk AS (SELECT doc_id, lang AS pk FROM documents),
dl AS (
  SELECT d.doc_id, p.pk, CAST(count(t.term) AS BIGINT) AS dl
  FROM documents d
  JOIN docs_pk p USING (doc_id)
  LEFT JOIN tok t USING (doc_id)
  GROUP BY d.doc_id, p.pk
),
stats AS (
  SELECT pk, CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl
  FROM dl GROUP BY pk
),
tf AS (
  SELECT t.doc_id, p.pk, t.term, CAST(count(*) AS BIGINT) AS tf
  FROM tok t JOIN docs_pk p USING (doc_id) GROUP BY t.doc_id, p.pk, t.term
),
idf AS (
  SELECT tf.pk, tf.term, CAST(count(*) AS BIGINT) AS df,
         ln((s.n_docs - count(*) + 0.5) / (count(*) + 0.5) + 1.0) AS idf
  FROM tf JOIN stats s ON s.pk = tf.pk
  GROUP BY tf.pk, tf.term, s.n_docs
)
"""
    return {
        "bm25_tokenize": _TOK,
        "bm25_tf": f"WITH tok AS ({_TOK}) SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term",
        "bm25_doclen": _BASE + "SELECT doc_id, dl FROM dl",
        "bm25_stats": _BASE + "SELECT n_docs, round(avgdl, 4) AS avgdl FROM stats",
        "bm25_norm": _BASE
        + f"SELECT doc_id, round((1.0 - {B}) + {B} * dl / (SELECT avgdl FROM stats), 4) AS norm FROM dl",
        "bm25_idf": _BASE + "SELECT term, df, round(idf, 4) AS idf FROM idf",
        "bm25_postings_digest": _BASE
        + """SELECT term, CAST(count(*) AS BIGINT) AS n_postings,
                    CAST(sum(tf) AS BIGINT) AS sum_tf,
                    CAST(min(doc_id) AS BIGINT) AS min_doc,
                    CAST(max(doc_id) AS BIGINT) AS max_doc
             FROM tf GROUP BY term""",
        "bm25_filter": f"SELECT doc_id FROM documents WHERE {filter_where}",
        "bm25_score": _BASE
        + _scored_sql(FLAGSHIP_QUERY)
        + "SELECT doc_id, round(score, 4) AS score FROM scored",
        "bm25_topk": _BASE + _scored_sql(FLAGSHIP_QUERY) + topk_tail,
        "bm25_topk_filtered": _BASE
        + _scored_sql(FLAGSHIP_QUERY, filter_where)
        + topk_tail,
        "bm25_partitioned_stats": part_base
        + "SELECT pk AS lang, n_docs, round(avgdl, 4) AS avgdl FROM stats",
        "bm25_search_in": part_base
        + f"""
, q AS {_q_values(FLAGSHIP_QUERY)}
, scored AS (
  SELECT tf.doc_id,
         sum(q.qtf * idf.idf * tf.tf * ({K1} + 1.0)
             / (tf.tf + {K1} * ((1.0 - {B}) + {B} * dl.dl / s.avgdl))) AS score
  FROM tf
  JOIN q USING (term)
  JOIN idf ON idf.pk = tf.pk AND idf.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN stats s ON s.pk = tf.pk
  WHERE tf.pk = 'en'
  GROUP BY tf.doc_id
)
"""
        + topk_tail,
        "bm25_empty_query": "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE",
    }
