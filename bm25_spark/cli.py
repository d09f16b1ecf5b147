"""spark-submit entry point (north rule: the full build runs via
``spark-submit --py-files``).

Usage (cluster):

    zip -r bm25_spark.zip bm25_spark
    spark-submit --py-files bm25_spark.zip -m bm25_spark.cli build \
        --input /data/transcripts --root /data/bm25_index \
        --partition-col conv_id --checkpointed

    spark-submit --py-files bm25_spark.zip -m bm25_spark.cli search \
        --root /data/bm25_index --query "error retry plan" --limit 10

Local smoke (same code, local master):

    python -m bm25_spark.cli build --input ... --root ... --local-cores 8

The session is taken from the environment when launched by spark-submit
(master/executors come from the submit args); ``--local-cores`` forces a
local[N] master for dev runs.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _get_session(args):
    from pyspark.sql import SparkSession

    if getattr(args, "local_cores", None):
        from bm25_spark.session import get_spark

        return get_spark(app="bm25-cli", cores=args.local_cores)
    return SparkSession.builder.appName("bm25-cli").getOrCreate()


def cmd_build(args) -> int:
    spark = _get_session(args)
    t0 = time.perf_counter()
    reader = spark.read
    src = (
        reader.table(args.input)
        if args.input_format == "table"
        else reader.format(args.input_format).load(args.input)
    )
    if args.checkpointed:
        from bm25_spark.plans.checkpoint import checkpointed_build

        bk = {"text_col": args.text_col}
        if args.id_col:
            bk["id_col"] = args.id_col
        else:
            bk["order_cols"] = tuple(args.order_cols.split(","))
        summary = checkpointed_build(
            src,
            args.root,
            partition_col=args.partition_col or "conv_id",
            build_kwargs=bk,
        )
    else:
        from bm25_spark.operators.indexer import build_index, write_index

        idx = build_index(
            src,
            text_col=args.text_col,
            partition_col=args.partition_col,
            id_col=args.id_col,
            order_cols=tuple(args.order_cols.split(",")),
        )
        write_index(idx, args.root, storage_format=args.storage_format)
        summary = {"partitions_total": 1}
    summary["elapsed_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(summary))
    return 0


def cmd_search(args) -> int:
    spark = _get_session(args)
    from bm25_spark.operators.indexer import read_index
    from bm25_spark.operators.searcher import search

    # None lets meta.json decide; an explicit --partition-col forces True
    idx = read_index(
        spark, args.root, partitioned=(True if args.partition_col else None)
    )
    t0 = time.perf_counter()
    rows = search(idx, args.query, limit=args.limit).collect()
    out = {
        "query": args.query,
        "elapsed_sec": round(time.perf_counter() - t0, 3),
        "results": [
            {"doc_id": r["doc_id"], "score": r["score"], "rank": r["rank"]}
            for r in rows
        ],
    }
    print(json.dumps(out))
    return 0


def cmd_compact(args) -> int:
    spark = _get_session(args)
    from bm25_spark.operators.indexer import write_index
    from bm25_spark.streaming.ingest import compact_segments

    idx = compact_segments(spark, args.root, partition_col=args.partition_col)
    write_index(idx, args.out or f"{args.root}/compacted")
    print(json.dumps({"status": "ok"}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="bm25_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--root", required=True, help="index root path")
        sp.add_argument("--partition-col", default=None)
        sp.add_argument("--local-cores", type=int, default=None)

    b = sub.add_parser("build", help="build (optionally checkpointed) index")
    common(b)
    b.add_argument("--input", required=True, help="source path or table name")
    b.add_argument(
        "--input-format",
        default="parquet",
        help="parquet | iceberg | table (catalog table name)",
    )
    b.add_argument("--text-col", default="text")
    b.add_argument(
        "--id-col",
        default=None,
        help="existing unique integer id column (skips dense id assignment)",
    )
    b.add_argument(
        "--order-cols",
        default="conv_id,turn_idx",
        help="comma-separated ordering columns for dense doc_id assignment",
    )
    b.add_argument(
        "--storage-format",
        default="parquet",
        help="DataSource for index tables (parquet | iceberg); recorded "
        "in meta.json so `search` reads it back automatically",
    )
    b.add_argument("--checkpointed", action="store_true")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="query a persisted index")
    common(s)
    s.add_argument("--query", required=True)
    s.add_argument("--limit", type=int, default=10)
    s.set_defaults(fn=cmd_search)

    c = sub.add_parser("compact", help="compact streaming segments")
    common(c)
    c.add_argument("--out", default=None)
    c.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
