"""Profile the warm driver query path and the index build.

Builds the bench corpus (sf dir x AMPLIFY), warms the search head, then
cProfiles a handful of searches so the hot spots of the ZERO-Spark-job
path are visible (varint decode? WAND bookkeeping? result
materialization?). Prints the top cumulative functions per query.

Usage: python tools/profile_query.py [--amplify 64] [--cores 8]
"""

from __future__ import annotations

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--amplify", type=int, default=64)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bm25_spark.session import get_spark

    spark = get_spark(
        app="profile", cores=args.cores, shuffle_partitions=args.cores
    )
    from bm25_spark.operators.indexer import build_index
    from bm25_spark.operators.packed import warm_query_caches
    from bm25_spark.operators.searcher import search

    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n_base = base.count()
    corpus = base.crossJoin(
        F.broadcast(
            spark.range(args.amplify).select(F.col("id").alias("copy"))
        )
    ).select(
        (F.col("doc_id") + F.col("copy") * n_base).alias("doc_id"),
        "text",
        "lang",
        "source",
    )
    corpus = corpus.repartition(args.cores).persist()
    n_docs = corpus.count()

    t0 = time.perf_counter()
    index = build_index(
        corpus,
        text_col="text",
        id_col="doc_id",
        index_fields=("lang", "source"),
        shard_size=max(1 << 12, n_docs // 64),
        check_empty=False,
    ).materialize(persist_docs=False)
    print(f"build: {time.perf_counter() - t0:.2f}s  n_docs={n_docs}")

    warm_query_caches(index)
    search(index, "data", limit=5).collect()  # codegen warmup

    for name, q, flt in [
        ("q_top10", "data table scan filter join", None),
        ("q_top10_again", "data table scan filter join", None),
        ("q_filtered", "data table scan", {"lang": ["en", "fr"]}),
    ]:
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        search(index, q, limit=10, flt=flt).collect()
        pr.disable()
        wall = time.perf_counter() - t0
        out = io.StringIO()
        st = pstats.Stats(pr, stream=out)
        st.sort_stats("cumulative").print_stats(22)
        print(f"\n===== {name}: {wall * 1000:.0f} ms =====")
        body = out.getvalue()
        # skip the header boilerplate, keep the table
        print("\n".join(body.splitlines()[4:40]))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
