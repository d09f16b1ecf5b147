"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build a BM25 inverted index over the sf0.001
``documents`` corpus and run a top-k query. ``queries()``/``oracle_sql()``
— one entry per implemented operator (SURVEY.md §2), cross-checked against
DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index the sf0.001 document corpus, search a multi-term
    query, return top-10 (doc_id, score, rank)."""
    from bm25_spark.operators.indexer import build_index
    from bm25_spark.operators.searcher import search

    docs = _docs(spark, "/root/testdata/sf0.001")
    index = build_index(
        docs,
        text_col="text",
        id_col="doc_id",
        index_fields=("lang", "source"),
    )
    return search(index, "data table scan filter join", limit=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bm25_spark import contract

    return contract.queries()


def oracle_sql() -> dict[str, str]:
    from bm25_spark import contract

    return contract.oracle_sql()
