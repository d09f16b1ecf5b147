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

Plan-size dispatch: small centroid/plane matrices are inlined into the
expression tree (pure codegen); past LITERAL_PLAN_MAX_TERMS total
literal terms (nlist*dim / n_planes*dim) the SAME math runs as a
sparkContext.broadcast matrix + one vectorized numpy GEMM per Arrow
batch in mapInPandas — bounded plans at production sizes (nlist 4096,
dim 768+). ``impl='literal'|'pandas'`` forces a path; tests assert
identity.
"""

from __future__ import annotations

import hashlib
import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

logger = logging.getLogger("bm25_spark.similarity")

# Literal-inlined plans (centroids / hyperplanes folded into the expression
# tree) are the fastest path for small matrices — no broadcast, pure
# whole-stage codegen — but an O(nlist*dim) or O(n_planes*dim) expression
# tree breaks analysis/codegen at production sizes (nlist 4096 x dim 768).
# Above this many literal terms, the same math runs as ONE vectorized
# mapInPandas over a sparkContext.broadcast numpy matrix instead.
LITERAL_PLAN_MAX_TERMS = 4096


def _resolve_impl(impl: str, n_terms: int) -> str:
    """'auto' -> 'literal' (inlined expression) or 'pandas' (broadcast
    matrix + vectorized numpy) by the literal-term budget."""
    if impl == "auto":
        chosen = "literal" if n_terms <= LITERAL_PLAN_MAX_TERMS else "pandas"
        if chosen == "pandas":
            logger.info(
                "similarity: %d literal terms > %d — using broadcast-"
                "matrix mapInPandas instead of an inlined plan",
                n_terms, LITERAL_PLAN_MAX_TERMS,
            )
        return chosen
    if impl not in ("literal", "pandas"):
        raise ValueError(f"unknown impl {impl!r}")
    return impl


def _norm_col(v: str = "v") -> F.Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def _centroid_matrix(centroids: list[tuple[int, list[float]]]):
    """(ids ascending, C matrix, row norms) — the ONE derivation both the
    pandas cell assignment and the probe-cell selection share, so their
    float layout cannot drift apart (the tie-break argument rests on the
    ascending-id row order)."""
    import numpy as np

    order = sorted(centroids, key=lambda t: t[0])
    ids = np.asarray([c for c, _ in order], dtype=np.int64)
    C = np.asarray([cv for _, cv in order], dtype=np.float64)
    return ids, C, np.sqrt((C * C).sum(axis=1))


def _plane_matrix(planes: list[list[float]]):
    """(P matrix, bit weights) shared by the pandas bucket projection and
    the query-signature computation."""
    import numpy as np

    P = np.asarray(planes, dtype=np.float64)
    w = (1 << np.arange(len(planes), dtype=np.int64)).astype(np.int64)
    return P, w


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
    impl: str = "auto",
) -> DataFrame:
    """(id, v, nrm, bucket): sign-of-projection bucket per vector. One
    narrow pass; at scale, write bucketed-by-``bucket`` for probe pruning.

    ``impl``: 'literal' inlines the plane vectors into the plan (fastest
    for small n_planes*dim); 'pandas' broadcasts the plane matrix and
    projects one Arrow batch at a time with a single numpy GEMM — the
    production path for real embedding dims (768+), where a literal
    expression tree would bloat analysis/codegen. 'auto' (default) picks
    by LITERAL_PLAN_MAX_TERMS. Both produce identical buckets (strict
    ``proj > 0`` sign test; per-component products differ only in
    summation order, asserted identical on dense fixtures in tests)."""
    if n_planes > 63:
        raise ValueError("n_planes must be <= 63 (bucket is a 64-bit long)")
    v = _prep(embeddings, id_col, vec_col)
    planes = hyperplanes(n_planes, dim)
    if _resolve_impl(impl, n_planes * dim) == "pandas":
        return _lsh_buckets_pandas(v, planes)
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


def _lsh_buckets_pandas(v: DataFrame, planes: list[list[float]]) -> DataFrame:
    """Broadcast the (n_planes x dim) plane matrix once; per Arrow batch,
    one numpy GEMM + sign-weighted sum. Narrow (no shuffle), same bucket
    semantics as the literal path."""
    import numpy as np

    spark = v.sparkSession
    bc = spark.sparkContext.broadcast(_plane_matrix(planes))
    schema = T.StructType(
        list(v.schema.fields) + [T.StructField("bucket", T.LongType())]
    )

    def run(batches):
        P_, w_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(bucket=np.array([], dtype=np.int64))
                continue
            V = np.stack(pdf["v"].to_numpy())
            proj = V @ P_.T  # (batch, n_planes)
            yield pdf.assign(bucket=((proj > 0) @ w_).astype(np.int64))

    return v.mapInPandas(run, schema)


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
    impl: str = "auto",
) -> list[tuple[int, list[float]]]:
    """Lloyd (k-means) refinement of IVF centroids: ``iters`` passes, each
    one FULL scan of ``embeddings`` + groupBy-avg shuffle (Lloyd updates
    need every vector's assignment; for ``iters > 1`` the prepped input is
    persisted here for the duration of the passes, so an unpersisted
    parquet source is read+normalized once, not once per pass). RNG-free,
    but only deterministic up to floating-point summation order: F.avg's
    partial aggregation adds in partition order, so near-tie vectors can
    flip cells across runs — pin ``refine_iters=0`` where bit-exact
    reproducibility is required (the contract oracle does). Cosine
    assignment is scale-invariant, so the plain coordinate mean is a
    valid spherical k-means update (normalizing the mean would not change
    any argmax).

    Plan per iteration: one narrow cell assignment (`_assign_cells`:
    literal expression for small nlist*dim, broadcast-matrix mapInPandas
    past LITERAL_PLAN_MAX_TERMS — see ivf_cells), then posexplode to
    (cell, pos, value) and avg — partially aggregatable, so map-side
    combine reduces the shuffle to ~tasks × nlist × dim rows; only
    nlist × dim averaged values reach the driver. Empty cells keep their
    previous centroid (the standard Lloyd convention), so the cell count
    is stable for consumers."""
    cur = centroids
    v = _prep(embeddings, id_col, vec_col)
    persisted = False
    if iters > 1:
        from pyspark import StorageLevel

        v = v.persist(StorageLevel.MEMORY_AND_DISK)
        persisted = True
    try:
        for _ in range(iters):
            assigned = _assign_cells(v, cur, impl)
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
    finally:
        if persisted:
            v.unpersist()
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


def _assign_cells_pandas(
    v: DataFrame, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """Nearest-centroid assignment for LARGE nlist*dim: the centroid matrix
    is one sparkContext.broadcast (nlist x dim doubles, e.g. 25 MB at
    nlist=4096, dim=768), and each Arrow batch is one numpy GEMM + argmax —
    bounded plan size at any nlist/dim, same argmax-cosine math and
    ties->smallest-cell break as _cell_expr (np.argmax returns the FIRST
    max; centroids are processed in ascending cell order). Narrow: no
    shuffle, partitioning preserved."""
    import numpy as np

    spark = v.sparkSession
    bc = spark.sparkContext.broadcast(_centroid_matrix(centroids))
    schema = T.StructType(
        list(v.schema.fields) + [T.StructField("cell", T.IntegerType())]
    )

    def run(batches):
        ids_, C_, Cn_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(cell=np.array([], dtype=np.int32))
                continue
            V = np.stack(pdf["v"].to_numpy())
            S = (V @ C_.T) / np.outer(
                pdf["nrm"].to_numpy(dtype=np.float64), Cn_
            )
            yield pdf.assign(
                cell=ids_[np.argmax(S, axis=1)].astype(np.int32)
            )

    return v.mapInPandas(run, schema)


def _assign_cells(
    v: DataFrame, centroids: list[tuple[int, list[float]]], impl: str = "auto"
) -> DataFrame:
    """Dispatch cell assignment: inlined-literal expression for small
    centroid sets, broadcast-matrix mapInPandas past the literal-plan
    budget (LITERAL_PLAN_MAX_TERMS total nlist*dim terms)."""
    dim = len(centroids[0][1]) if centroids else 0
    if _resolve_impl(impl, len(centroids) * dim) == "pandas":
        return _assign_cells_pandas(v, centroids)
    return v.withColumn("cell", _cell_expr(centroids))


def ivf_cells(
    embeddings: DataFrame,
    nlist: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    refine_iters: int = 0,
    impl: str = "auto",
    stats: dict | None = None,
) -> DataFrame:
    """(id, v, nrm, cell): IVF cell assignment — one narrow pass. Small
    nlist*dim inlines the centroids as literals (broadcast-free; they ARE
    the plan); past LITERAL_PLAN_MAX_TERMS the same argmax-cosine runs as
    a broadcast centroid matrix + one vectorized mapInPandas GEMM per
    Arrow batch, keeping the plan bounded at production sizes (nlist 4096
    x dim 768+). ``impl`` forces 'literal'/'pandas' ('auto' picks). At
    scale, write this out partitioned/bucketed by ``cell`` so ivf_topk's
    probe reads only nprobe cells off storage (partition pruning).
    ``refine_iters`` > 0 first runs that many Lloyd passes over the FULL
    embeddings table starting from the seeded centroids
    (ivf_refine_centroids) — better-balanced cells and higher recall at
    fixed nprobe, for one extra full scan + shuffle per pass.

    Telemetry: pass ``stats={}`` to eagerly compute and log the cell-size
    histogram — ``cell_sizes`` ({cell: rows}), ``nonempty_cells``, and
    ``max_cell``/``min_cell``/``mean_cell`` over nonempty cells (skew at
    a glance: a max_cell >> mean_cell means nprobe probes do unbalanced
    work — add Lloyd passes). One cheap count-by-cell aggregation; the
    returned DataFrame is unaffected."""
    if centroids is None:
        centroids = ivf_seed_centroids(embeddings, nlist, id_col, vec_col)
        if refine_iters:
            centroids = ivf_refine_centroids(
                embeddings, centroids, refine_iters, id_col, vec_col,
                impl=impl,
            )
    v = _prep(embeddings, id_col, vec_col)
    assigned = _assign_cells(v, centroids, impl)
    if stats is not None:
        hist = {
            int(r["cell"]): int(r["c"])
            for r in assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        sizes = sorted(hist.values())
        stats["cell_sizes"] = hist
        stats["nonempty_cells"] = len(sizes)
        stats["max_cell"] = sizes[-1] if sizes else 0
        stats["min_cell"] = sizes[0] if sizes else 0
        stats["mean_cell"] = (
            round(sum(sizes) / len(sizes), 2) if sizes else 0.0
        )
        logger.info(
            "ivf_cells: nlist=%d nonempty=%d min/mean/max cell size "
            "%d/%.1f/%d",
            len(centroids), stats["nonempty_cells"], stats["min_cell"],
            stats["mean_cell"], stats["max_cell"],
        )
    return assigned


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
    impl: str = "auto",
    stats: dict | None = None,
) -> DataFrame:
    """(query_id, id, cosine, rank): IVF approximate top-k — score only the
    rows whose cell is among the ``nprobe`` cells whose centroids are
    nearest the query (cosine, ties by cell asc). Recall is tunable via
    nlist/nprobe (validated vs brute_topk in tests); nprobe=nlist is exact.
    ``refine_iters`` Lloyd passes (build-time) raise recall at fixed
    nprobe on clustered data. The probe-cell choice runs on the driver
    over the nlist centroids (tiny); candidate scoring is one cell-pruned
    scan + broadcast join. ``impl``/``stats``: see ivf_cells (assignment
    strategy and cell-size telemetry)."""
    if centroids is None:
        centroids = ivf_seed_centroids(embeddings, nlist, id_col, vec_col)
        if refine_iters:
            centroids = ivf_refine_centroids(
                embeddings, centroids, refine_iters, id_col, vec_col,
                impl=impl,
            )
    dim_c = len(centroids[0][1]) if centroids else 0
    impl = _resolve_impl(impl, len(centroids) * dim_c)  # resolve ONCE
    cells = ivf_cells(
        embeddings, nlist, id_col, vec_col, centroids, impl=impl,
        stats=stats,
    )
    probe_cells = _make_probe_fn(centroids, nprobe, impl)
    return _score_probed_cells(cells, query_vecs, probe_cells, k)


def _make_probe_fn(
    centroids: list[tuple[int, list[float]]], nprobe: int, impl: str = "auto"
):
    """probe_cells(vec) -> the nprobe cell ids whose centroids are nearest
    (cosine, ties -> smaller cell). Small centroid sets use the
    sequential-python dot (the float-order the SQL oracle transcribes);
    past the literal budget, one numpy GEMM per query in the same
    _centroid_matrix + row-vector-@-C.T orientation as the pandas cell
    assignment. Residual caveat there: BLAS may pick a different kernel
    for a 1-row GEMM than a batch, so a cell whose similarity ties to
    ~1 ulp could in principle rank differently — probing nprobe cells
    absorbs that at any realistic nprobe."""
    dim_c = len(centroids[0][1]) if centroids else 0
    if _resolve_impl(impl, len(centroids) * dim_c) == "pandas":
        import numpy as np

        cids, C, Cn = _centroid_matrix(centroids)

        def probe_cells(vec: list[float]) -> list[int]:
            q_ = np.asarray(vec, dtype=np.float64)[None, :]
            sims = (q_ @ C.T)[0] / (np.sqrt((q_ * q_).sum()) * Cn)
            # ties -> smaller cell: stable sort on (-sim), ascending ids
            top = np.argsort(-sims, kind="stable")[:nprobe]
            return [int(c) for c in cids[top]]

    else:

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

    return probe_cells


def _score_probed_cells(
    cells: DataFrame, query_vecs, probe_cells, k: int
) -> DataFrame:
    """(query_id, id, cosine, rank) over a (id, v, nrm, cell) frame: exact
    cosine within each query's probed cells only. The explicit
    cell-isin filter ahead of the broadcast join is semantically
    redundant (the join key restricts anyway) but STATICALLY prunes a
    cell-partitioned parquet source to the probed partitions — the
    storage win a persisted IVF index exists for (ann_index)."""
    spark = cells.sparkSession
    probe_rows = []
    for qid, vec in query_vecs:
        fvec = [float(x) for x in vec]
        for cell in probe_cells(fvec):
            probe_rows.append((qid, fvec, cell))
    q = spark.createDataFrame(
        probe_rows, "query_id long, qv array<double>, cell int"
    ).withColumn("qnrm", _norm_col("qv"))
    probed = sorted({c for _, _, c in probe_rows})
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        cells.filter(F.col("cell").isin(probed))
        .join(F.broadcast(q), "cell")
        .withColumn(
            "cosine", F.round(dot / (F.col("nrm") * F.col("qnrm")), 4)
        )
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
    impl: str = "auto",
) -> DataFrame:
    """(query_id, id, cosine, rank): approximate top-k — probe buckets whose
    signature is within ``multiprobe_hamming`` of the query's. Recall is
    tunable via n_planes/multiprobe (validated vs brute_topk in tests).
    ``impl``: bucket-signature strategy, see lsh_buckets."""
    spark = embeddings.sparkSession
    dim = len(query_vecs[0][1])
    bucketed = lsh_buckets(
        embeddings, n_planes, dim, id_col, vec_col, impl=impl
    )
    planes = hyperplanes(n_planes, dim)
    if _resolve_impl(impl, n_planes * dim) == "pandas":
        # same _plane_matrix + row-vector-@-P.T orientation as the pandas
        # bucket path, so the query signature computes like its own
        # vector's bucket did. Residual caveat: BLAS may pick a different
        # kernel for a 1-row GEMM than a batch, so a projection within
        # ~1 ulp of exactly 0 could in principle flip a bit — the default
        # hamming-1 multiprobe absorbs a single flipped bit.
        import numpy as np

        P_, w_ = _plane_matrix(planes)

        def sig(vec: list[float]) -> int:
            proj = (np.asarray(vec, dtype=np.float64)[None, :] @ P_.T)[0]
            return int(((proj > 0) * w_).sum())

    else:

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
