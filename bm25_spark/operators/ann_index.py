"""Persisted IVF ANN index: cell-partitioned parquet + centroid manifest.

``similarity.ivf_topk`` recomputes the cell assignment inside every job —
right for ad-hoc queries, wrong for a serving corpus. At 100 TB the win
of persisting is STORAGE pruning: assignment is paid once at write time,
the vectors land in parquet partitioned by ``cell``, and every query
afterwards reads only its ``nprobe`` probed cell partitions off storage
(static partition pruning — the probed-cell ``isin`` filter reaches the
scan as PartitionFilters, asserted in tests). Centroids ride a small JSON
manifest next to the data (same atomic-rename writer as the BM25 index
meta), so the probe step needs no Spark job at all.

Determinism: centroids are the md5-seeded corpus sample (optionally
Lloyd-refined at write time); the stored vectors are the same
cast-to-double arrays ivf_topk scores, so a query against the persisted
index returns bit-identical (id, cosine, rank) to ivf_topk with the same
centroids — that identity is a pytest and the ``sim_ann_ivf_indexed``
contract entry's oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bm25_spark.operators.indexer import _write_meta, read_meta
from bm25_spark.operators.similarity import (
    _make_probe_fn,
    _score_probed_cells,
    ivf_cells,
    ivf_refine_centroids,
    ivf_seed_centroids,
)

ANN_FORMAT_VERSION = 1


def write_ann_index(
    embeddings: DataFrame,
    path: str,
    nlist: int = 8,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "auto",
    mode: str = "overwrite",
    centroids: list[tuple[int, list[float]]] | None = None,
    stats: dict | None = None,
) -> dict:
    """Build and persist the IVF index under ``path``: ``path/cells`` is
    (id, v, nrm) parquet partitioned by ``cell``; ``path/ann_meta.json``
    carries the centroids + build parameters. One assignment pass (see
    ivf_cells for the literal/pandas dispatch and ``stats``) + one
    partitioned write. Returns the manifest dict."""
    if centroids is None:
        centroids = ivf_seed_centroids(embeddings, nlist, id_col, vec_col)
        if refine_iters:
            centroids = ivf_refine_centroids(
                embeddings, centroids, refine_iters, id_col, vec_col,
                impl=impl,
            )
    cells = ivf_cells(
        embeddings, nlist, id_col, vec_col, centroids, impl=impl,
        stats=stats,
    )
    cells.write.partitionBy("cell").mode(mode).parquet(f"{path}/cells")
    meta = {
        "format_version": ANN_FORMAT_VERSION,
        "nlist": len(centroids),
        "dim": len(centroids[0][1]) if centroids else 0,
        "id_col": id_col,
        "vec_col": vec_col,
        "refine_iters": refine_iters,
        "centroids": [[c, list(map(float, v))] for c, v in centroids],
    }
    _write_meta(meta, f"{path}/ann_meta.json")
    return meta


def read_ann_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[tuple[int, list[float]]], dict]:
    """(cells frame, centroids, manifest) for an index written by
    write_ann_index. The frame is lazy — nothing is scanned until a
    query, and queries scan only probed cell partitions."""
    meta = read_meta(f"{path}/ann_meta.json")
    if meta is None:
        raise FileNotFoundError(f"no ANN index manifest at {path}/ann_meta.json")
    if meta.get("format_version") != ANN_FORMAT_VERSION:
        raise ValueError(
            f"ANN index at {path} has format_version "
            f"{meta.get('format_version')!r}; this reader supports "
            f"{ANN_FORMAT_VERSION}"
        )
    centroids = [
        (int(c), [float(x) for x in v]) for c, v in meta["centroids"]
    ]
    return spark.read.parquet(f"{path}/cells"), centroids, meta


def ann_index_topk(
    spark: SparkSession,
    path: str,
    query_vecs: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 3,
    impl: str = "auto",
) -> DataFrame:
    """(query_id, id, cosine, rank) against a persisted index: probe-cell
    choice runs on the driver over the manifest centroids (zero Spark
    jobs), then one scan statically pruned to the probed cell partitions
    + broadcast join — identical results to similarity.ivf_topk with the
    same centroids/nprobe."""
    cells, centroids, _meta = read_ann_index(spark, path)
    probe_cells = _make_probe_fn(centroids, nprobe, impl)
    return _score_probed_cells(cells, query_vecs, probe_cells, k)
