"""Similarity search over an embedding column (array<float>).

- brute_topk: exact cosine top-k (baseline; broadcast query vectors, one
  pass over the table — the right plan even at 100 TB when k queries are
  few, because the scan is embarrassingly parallel and column-pruned).
- lsh_buckets / lsh_topk: random-hyperplane LSH — a scale path: bucket
  the corpus once (b-bit signature), probe only matching buckets (optionally
  multi-probe adjacent buckets). Hyperplanes are md5-derived, so signatures
  are deterministic with no driver-side RNG state.
- ivf_cells / ivf_topk: inverted-file (IVF) ANN — the other classic scale
  path: partition the corpus into ``nlist`` cells by nearest centroid,
  search only the ``nprobe`` cells nearest the query. Centroids are
  deterministic data samples (md5-of-id order), so the whole pipeline is
  reproducible and oracle-checkable with no RNG state.
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


def ivf_seed_centroids(
    embeddings: DataFrame,
    nlist: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """[(cell, centroid)]: the ``nlist`` corpus vectors with the smallest
    ``md5(cast(id as string))`` (ties by id) serve as cell centroids — a
    deterministic uniform sample with no RNG state, so an oracle can derive
    the identical centroid set in SQL. One column-pruned TakeOrdered scan;
    a one-time index-build cost (Lloyd refinement steps would slot in here
    — each is one groupBy-avg pass — without changing any consumer)."""
    rows = (
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("h", F.md5(F.col("id").cast("string")))
        .orderBy("h", "id")
        .limit(nlist)
        .collect()
    )
    return [(c, [float(x) for x in r["v"]]) for c, r in enumerate(rows)]


def ivf_refine_centroids(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Lloyd (k-means) refinement of IVF centroids: ``iters`` passes, each
    one FULL scan of ``embeddings`` + groupBy-avg shuffle (Lloyd updates
    need every vector's assignment — persist the input upstream when
    running several passes over a large table). RNG-free, but only
    deterministic up to floating-point summation order: F.avg's partial
    aggregation adds in partition order, so near-tie vectors can flip
    cells across runs — pin ``refine_iters=0`` where bit-exact
    reproducibility is required (the contract oracle does). Cosine
    assignment is scale-invariant, so the plain coordinate mean is a
    valid spherical k-means update (normalizing the mean would not change
    any argmax).

    Plan per iteration: one narrow cell assignment (`_cell_expr` inlines
    the current centroids as literals — no UDF, no broadcast), then
    posexplode to (cell, pos, value) and avg — partially aggregatable, so
    map-side combine reduces the shuffle to ~tasks × nlist × dim rows;
    only nlist × dim averaged values reach the driver. Empty cells keep
    their previous centroid (the standard Lloyd convention), so the cell
    count is stable for consumers."""
    cur = centroids
    v = _prep(embeddings, id_col, vec_col)
    for _ in range(iters):
        assigned = v.withColumn("cell", _cell_expr(cur))
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("s")
            )
            .select("cell", F.col("s.m").alias("centroid"))
            .collect()
        )
        by_cell = {int(r["cell"]): [float(x) for x in r["centroid"]]
                   for r in means}
        cur = [(c, by_cell.get(c, prev)) for c, prev in cur]
    return cur


def _cell_expr(centroids: list[tuple[int, list[float]]]) -> F.Column:
    """Nearest-centroid cell id (argmax cosine, ties -> smallest cell) as a
    pure JVM expression over column ``v``/``nrm``: greatest() over
    (similarity, -cell) structs — struct comparison is lexicographic, so
    the max struct IS the argmax with the deterministic tie-break. No UDF,
    no shuffle; whole-stage-codegen-friendly for any small nlist."""
    structs = []
    for cell, cv in centroids:
        arr = F.array(*[F.lit(float(x)) for x in cv])
        cnrm = sum(x * x for x in cv) ** 0.5
        dot = F.aggregate(
            F.zip_with("v", arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sim = dot / (F.col("nrm") * F.lit(cnrm))
        structs.append(
            F.struct(sim.alias("s"), F.lit(-cell).alias("negc"))
        )
    best = structs[0] if len(structs) == 1 else F.greatest(*structs)
    return (-best["negc"]).cast("int")


def ivf_cells(
    embeddings: DataFrame,
    nlist: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """(id, v, nrm, cell): IVF cell assignment — one narrow pass with the
    centroids inlined as literals (broadcast-free; they ARE the plan). At
    scale, write this out partitioned/bucketed by ``cell`` so ivf_topk's
    probe reads only nprobe cells off storage (partition pruning).
    ``refine_iters`` > 0 first runs that many Lloyd passes over the FULL
    embeddings table starting from the seeded centroids
    (ivf_refine_centroids) — better-balanced cells and higher recall at
    fixed nprobe, for one extra full scan + shuffle per pass."""
    if centroids is None:
        centroids = ivf_seed_centroids(embeddings, nlist, id_col, vec_col)
        if refine_iters:
            centroids = ivf_refine_centroids(
                embeddings, centroids, refine_iters, id_col, vec_col
            )
    v = _prep(embeddings, id_col, vec_col)
    return v.withColumn("cell", _cell_expr(centroids))


def ivf_topk(
    embeddings: DataFrame,
    query_vecs: list[tuple[int, list[float]]],
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """(query_id, id, cosine, rank): IVF approximate top-k — score only the
    rows whose cell is among the ``nprobe`` cells whose centroids are
    nearest the query (cosine, ties by cell asc). Recall is tunable via
    nlist/nprobe (validated vs brute_topk in tests); nprobe=nlist is exact.
    ``refine_iters`` Lloyd passes (build-time) raise recall at fixed
    nprobe on clustered data. The probe-cell choice runs on the driver
    over the nlist centroids (tiny); candidate scoring is one cell-pruned
    scan + broadcast join."""
    spark = embeddings.sparkSession
    if centroids is None:
        centroids = ivf_seed_centroids(embeddings, nlist, id_col, vec_col)
        if refine_iters:
            centroids = ivf_refine_centroids(
                embeddings, centroids, refine_iters, id_col, vec_col
            )
    cells = ivf_cells(embeddings, nlist, id_col, vec_col, centroids)

    def probe_cells(vec: list[float]) -> list[int]:
        qn = sum(x * x for x in vec) ** 0.5
        sims = []
        for cell, cv in centroids:
            cn = sum(x * x for x in cv) ** 0.5
            dot = 0.0
            for x, y in zip(vec, cv):
                dot += x * y
            sims.append((-(dot / (qn * cn)), cell))
        sims.sort()
        return [c for _, c in sims[:nprobe]]

    probe_rows = []
    for qid, vec in query_vecs:
        fvec = [float(x) for x in vec]
        for cell in probe_cells(fvec):
            probe_rows.append((qid, fvec, cell))
    q = spark.createDataFrame(
        probe_rows, "query_id long, qv array<double>, cell int"
    ).withColumn("qnrm", _norm_col("qv"))
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = cells.join(F.broadcast(q), "cell").withColumn(
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
