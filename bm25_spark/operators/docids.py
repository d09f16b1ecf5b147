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
  the order columns, sort within partitions, LOCAL-CHECKPOINT, count rows
  per partition (tiny collect of ~P longs), then add per-partition offsets
  with a narrow Arrow map. Range partitioning guarantees partition i's keys
  all precede partition j's for i < j, so offset + local position == global
  rank regardless of where the sampled boundaries fell.

  The localCheckpoint (not a mere persist) is correctness-critical:
  repartitionByRange picks boundaries by SAMPLING, so a recomputation can
  partition differently and silently invalidate the collected offsets. A
  persisted plan protects normal reuse, but plan CLONES (e.g. Spark's
  relation deduplication when two filters of this output are unioned)
  bypass the cache by design. Checkpointing truncates lineage to the
  materialized partitions, so every consumer — including clones — reads
  the exact partitioning the offsets were computed from.

Both produce the identical doc_id column (asserted in tests).
"""

from __future__ import annotations

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
    # the partition index is STAMPED INTO THE DATA at checkpoint
    # materialization and read back from the rows — never from
    # TaskContext.partitionId(), which is renumbered by any enclosing
    # union/coalesce and would silently shift every offset
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # pass 1: rows per physical partition (P rows collected — tiny)
    counts = parted.groupBy("_pid").count().collect()
    by_pid = {r["_pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(by_pid, default=-1) + 1):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)

    out_schema = StructType(
        df.schema.fields + [StructField("doc_id", LongType(), False)]
    )

    def add_ids(iterator):
        pos = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            if pos is None:
                pos = offsets.get(int(pdf["_pid"].iloc[0]), 0)
            n = len(pdf)
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_id"] = range(pos, pos + n)
            pos += n
            yield pdf

    return parted.mapInPandas(add_ids, schema=out_schema)
