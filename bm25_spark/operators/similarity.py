"""Similarity search over an embedding column (array<float>).

- brute_topk: exact cosine top-k (baseline; broadcast query vectors, one
  pass over the table — the right plan even at 100 TB when k queries are
  few, because the scan is embarrassingly parallel and column-pruned).
- lsh_buckets / lsh_topk: random-hyperplane LSH — the scale path: bucket
  the corpus once (b-bit signature), probe only matching buckets (optionally
  multi-probe adjacent buckets). Hyperplanes are md5-derived, so signatures
  are deterministic with no driver-side RNG state.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_col(v: str = "v") -> F.Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def _prep(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", _norm_col("v"))


def brute_topk(
    embeddings: DataFrame,
    query_vecs: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, id, cosine, rank): exact cosine top-k per query vector.
    Ties broken by id ASC."""
    spark = embeddings.sparkSession
    v = _prep(embeddings, id_col, vec_col)
    q = spark.createDataFrame(
        [(qid, [float(x) for x in vec]) for qid, vec in query_vecs],
        "query_id long, qv array<double>",
    ).withColumn("qnrm", _norm_col("qv"))
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = v.crossJoin(F.broadcast(q)).withColumn(
        "cosine", F.round(dot / (F.col("nrm") * F.col("qnrm")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cosine", "rank")
    )


def _hyperplane(plane: int, dim: int) -> float:
    """Deterministic pseudo-gaussian-ish component in [-1, 1) from md5."""
    h = hashlib.md5(f"{plane},{dim}".encode()).hexdigest()
    return (int(h[:15], 16) % 2000001 - 1000000) / 1000000.0


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    return [
        [_hyperplane(p, d) for d in range(dim)] for p in range(n_planes)
    ]


def lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, nrm, bucket): sign-of-projection bucket per vector. One
    narrow pass; at scale, write bucketed-by-``bucket`` for probe pruning."""
    v = _prep(embeddings, id_col, vec_col)
    planes = hyperplanes(n_planes, dim)
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        proj = F.aggregate(
            F.zip_with("v", arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return v.withColumn("bucket", bucket)


def lsh_topk(
    embeddings: DataFrame,
    query_vecs: list[tuple[int, list[float]]],
    k: int = 10,
    n_planes: int = 8,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, id, cosine, rank): approximate top-k — probe buckets whose
    signature is within ``multiprobe_hamming`` of the query's. Recall is
    tunable via n_planes/multiprobe (validated vs brute_topk in tests)."""
    spark = embeddings.sparkSession
    dim = len(query_vecs[0][1])
    bucketed = lsh_buckets(embeddings, n_planes, dim, id_col, vec_col)
    planes = hyperplanes(n_planes, dim)

    def sig(vec: list[float]) -> int:
        s = 0
        for p, plane in enumerate(planes):
            if sum(x * y for x, y in zip(vec, plane)) > 0:
                s |= 1 << p
        return s

    probe_rows = []
    for qid, vec in query_vecs:
        s = sig(vec)
        buckets = {s}
        if multiprobe_hamming >= 1:
            for p in range(n_planes):
                buckets.add(s ^ (1 << p))
        if multiprobe_hamming >= 2:
            for p in range(n_planes):
                for r in range(p + 1, n_planes):
                    buckets.add(s ^ (1 << p) ^ (1 << r))
        for bkt in sorted(buckets):
            probe_rows.append((qid, [float(x) for x in vec], bkt))
    q = spark.createDataFrame(
        probe_rows, "query_id long, qv array<double>, bucket long"
    ).withColumn("qnrm", _norm_col("qv"))
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = bucketed.join(F.broadcast(q), "bucket").withColumn(
        "cosine", F.round(dot / (F.col("nrm") * F.col("qnrm")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cosine", "rank")
    )
