"""Deterministic dense doc_id assignment.

The reference assigns dense ids 0..N-1 in ingestion order
(lib/src/bm25.dart:145-162). Our ingestion order is the stable
``(conv_id, turn_idx)`` ordering mandated by the input contract, so
``doc_id = rank over (order_cols) - 1``.

Two strategies:

- ``window``: ``row_number() OVER (ORDER BY ...)`` — exact but funnels all
  rows through ONE task for the ranking (fine up to ~10M rows; never at
  10^12 scale).
- ``range`` (default): scalable two-phase assignment. Range-repartition on
  the order columns, sort within partitions, persist, count rows per
  partition (tiny collect of ~P longs), then add per-partition offsets with
  a narrow Arrow map. Range partitioning guarantees partition i's keys all
  precede partition j's for i < j, so offset + local position == global rank
  regardless of where the sampled boundaries fell. The persist pins the
  sampled boundaries so the count pass and the assign pass see identical
  partitioning.

Both produce the identical doc_id column (asserted in tests).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def assign_doc_ids(
    df: DataFrame,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    method: str = "range",
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns df + ``doc_id`` (LONG, dense 0..N-1 by order_cols)."""
    if method == "window":
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return df.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)
    if method != "range":
        raise ValueError(f"unknown method {method!r}")

    num_partitions = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # pass 1: rows per physical partition (P rows collected — tiny)
    counts = (
        parted.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(by_pid, default=-1) + 1):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)

    out_schema = StructType(
        parted.schema.fields + [StructField("doc_id", LongType(), False)]
    )

    def add_ids(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pos = offsets.get(pid, 0)
        for pdf in iterator:
            n = len(pdf)
            pdf = pdf.copy()
            pdf["doc_id"] = range(pos, pos + n)
            pos += n
            yield pdf

    return parted.mapInPandas(add_ids, schema=out_schema)
