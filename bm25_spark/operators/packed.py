"""Packed physical index: delta+varint postings blobs + block-max metadata,
and the vectorized scoring path over them.

Why this layout scales (the reference's flat Uint32List postings,
lib/src/bm25.dart:437-468, re-thought for a 1000-executor cluster):

- one row per (pk, term, shard): a Zipf-hot term is split across doc-range
  shards, so no single collect_list/row explodes; parquet/Iceberg min-max +
  bloom on ``term`` prune the scan to exactly the query's rows;
- a doc's postings for ALL query terms live in the same shard (shards are
  contiguous doc_id ranges), so per-(query, pk, shard) scoring is complete
  and a per-shard top-k merges into an EXACT global top-k — the distributed
  analog of the reference's single-threaded bounded heap (bm25.dart:744-790);
- scoring is an Arrow-grouped UDF doing pure numpy: varint-decode, sparse
  accumulate (np.add.at over shard-local doc slots), argpartition top-k.
  No per-row Python, no JVM<->Python chatter beyond the ≤|q| blobs/shard.

Block-max metadata (per-BLOCK score upper bounds, codec.py) is persisted
alongside; shard-level upper bounds enable safe pruning (see
``shard_upper_bounds``): ub(shard) = Σ_t idf_t · max_block partial_t ≥ any
doc score in the shard, so shards with ub below the running k-th score can
be skipped without changing the exact top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bm25_spark.functions import codec
from bm25_spark.functions.analyzer import query_term_counts
from bm25_spark.operators.indexer import BM25Index
from bm25_spark.operators.searcher import (
    RESULT_SCHEMA,
    _filter_predicate,
    _query_frame_with_idf,
)

PACKED_FIELDS = StructType(
    [
        StructField("n", IntegerType(), False),
        StructField("data", BinaryType(), False),
        StructField("block_last", ArrayType(LongType()), False),
        StructField("block_max", ArrayType(DoubleType()), False),
    ]
)


def pack_index(index: BM25Index) -> BM25Index:
    """Derive ``index.packed``: (pk, term, shard, n, data, block_last,
    block_max) — one varint blob per posting shard. Uses the index's own
    shard_size (shard_base = shard * shard_size must match the build)."""
    k1, b = index.k1, index.b
    shard_size = index.shard_size

    @F.pandas_udf(PACKED_FIELDS)
    def pack(
        doc_ids: pd.Series,
        tfs: pd.Series,
        dls: pd.Series,
        shards: pd.Series,
        avgdls: pd.Series,
    ) -> pd.DataFrame:
        out = {"n": [], "data": [], "block_last": [], "block_max": []}
        for ids, tf, dl, shard, avgdl in zip(doc_ids, tfs, dls, shards, avgdls):
            ids = np.asarray(ids, dtype=np.int64)
            tf = np.asarray(tf, dtype=np.int64)
            dl = np.asarray(dl, dtype=np.int64)
            data, n, bl, bm = codec.pack_postings(
                ids, tf, dl, int(shard) * shard_size, k1, b, float(avgdl)
            )
            out["n"].append(n)
            out["data"].append(data)
            out["block_last"].append(bl)
            out["block_max"].append(bm)
        return pd.DataFrame(out)

    p = index.postings.join(F.broadcast(index.stats.select("pk", "avgdl")), "pk")
    packed = p.select(
        "pk",
        "term",
        "shard",
        pack(
            F.col("postings.doc_id"),
            F.col("postings.tf"),
            F.col("postings.dl"),
            F.col("shard"),
            F.col("avgdl"),
        ).alias("z"),
    ).select("pk", "term", "shard", "z.n", "z.data", "z.block_last", "z.block_max")
    index.packed = packed
    return index


def _query_frames(index: BM25Index, queries, stopwords):
    stop = stopwords if stopwords is not None else index.stopwords
    qrows = []
    for qid, qtext in queries:
        for term, qtf in query_term_counts(qtext, stop).items():
            qrows.append((qid, term, qtf))
    return qrows


def search_packed(
    index: BM25Index,
    queries: list[tuple[int, str]],
    limit: int = 10,
    flt: dict | None = None,
    stopwords=None,
    partition_keys: list[str] | None = None,
    per_partition_limit: int | None = None,
    prune: bool = True,
) -> DataFrame:
    """Top-k over the packed index. Same semantics/schema as
    searcher.search_batch. Requires pack_index() first."""
    if index.packed is None:
        raise ValueError("index is not packed — call pack_index() first")
    if limit < 1:
        raise ValueError("limit must be >= 1")
    spark = index.spark
    shard_size = index.shard_size
    qrows = _query_frames(index, queries, stopwords)
    if not qrows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    needed = sorted({t for _, t, _ in qrows})

    p = index.packed.filter(F.col("term").isin(needed))
    if partition_keys is not None:
        p = p.filter(F.col("pk").isin(partition_keys))
    q_terms = F.broadcast(_query_frame_with_idf(index, qrows, partition_keys))
    rows = p.join(q_terms, ["pk", "term"])

    allowed_b = None
    if flt:
        pred = _filter_predicate(index, flt)
        allowed = index.docs.filter(pred).select("pk", "doc_id")
        # The allowed set is joined AFTER decode (exact reference semantics:
        # filtered docs are skipped during traversal, bm25.dart:644).
        allowed_b = allowed

    k1, b = index.k1, index.b
    group_limit = max(limit, per_partition_limit or 0)

    if allowed_b is None:
        out_schema = StructType(
            [
                StructField("query_id", LongType(), False),
                StructField("pk", StringType(), False),
                StructField("doc_id", LongType(), False),
                StructField("score", DoubleType(), False),
            ]
        )

        def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
            qid = int(pdf["query_id"].iloc[0])
            pk = pdf["pk"].iloc[0]
            shard_base = int(pdf["shard"].iloc[0]) * shard_size
            # sparse accumulate: collect (doc, contribution) across terms
            all_docs, all_contrib = [], []
            for _, r in pdf.iterrows():
                doc_ids, tfs, dls = codec.unpack_postings(
                    bytes(r["data"]), int(r["n"]), shard_base
                )
                tfs = tfs.astype(np.float64)
                norm = (1.0 - b) + b * dls.astype(np.float64) / r["avgdl"]
                contrib = (
                    r["qtf"] * r["idf"] * tfs * (k1 + 1.0) / (tfs + k1 * norm)
                )
                all_docs.append(doc_ids)
                all_contrib.append(contrib)
            docs = np.concatenate(all_docs)
            contrib = np.concatenate(all_contrib)
            uniq, inv = np.unique(docs, return_inverse=True)
            acc = np.zeros(len(uniq))
            np.add.at(acc, inv, contrib)
            k = min(group_limit, len(uniq))
            if k < len(uniq):
                idx = np.argpartition(-acc, k - 1)[:k]
            else:
                idx = np.arange(len(uniq))
            return pd.DataFrame(
                {
                    "query_id": qid,
                    "pk": pk,
                    "doc_id": uniq[idx],
                    "score": acc[idx],
                }
            )

        scored = rows.groupBy("query_id", "pk", "shard").applyInPandas(
            score_group, schema=out_schema
        )
    else:
        # filtered path: decode -> explode -> semi-join -> JVM agg
        decode_schema = ArrayType(
            StructType(
                [
                    StructField("doc_id", LongType(), False),
                    StructField("tf", IntegerType(), False),
                    StructField("dl", IntegerType(), False),
                ]
            )
        )

        @F.pandas_udf(decode_schema)
        def decode(data: pd.Series, n: pd.Series, shard: pd.Series) -> pd.Series:
            out = []
            for d, nn, s in zip(data, n, shard):
                ids, tfs, dls = codec.unpack_postings(
                    bytes(d), int(nn), int(s) * shard_size
                )
                out.append(
                    [
                        {"doc_id": int(i), "tf": int(t), "dl": int(l)}
                        for i, t, l in zip(ids, tfs, dls)
                    ]
                )
            return pd.Series(out)

        e = rows.select(
            "query_id",
            "pk",
            "qtf",
            "idf",
            "avgdl",
            F.explode(decode("data", "n", "shard")).alias("post"),
        ).select(
            "query_id",
            "pk",
            "qtf",
            "idf",
            "avgdl",
            F.col("post.doc_id").alias("doc_id"),
            F.col("post.tf").alias("tf"),
            F.col("post.dl").alias("dl"),
        )
        e = e.join(allowed_b, ["pk", "doc_id"], "left_semi")
        k1c, bc = F.lit(k1), F.lit(b)
        contrib = (
            F.col("qtf")
            * F.col("idf")
            * F.col("tf")
            * (k1c + F.lit(1.0))
            / (
                F.col("tf")
                + k1c * ((F.lit(1.0) - bc) + bc * F.col("dl") / F.col("avgdl"))
            )
        )
        scored = e.groupBy("query_id", "pk", "doc_id").agg(
            F.sum(contrib).alias("score")
        )

    if per_partition_limit is not None:
        w_pk = Window.partitionBy("query_id", "pk").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        scored = (
            scored.withColumn("prank", F.row_number().over(w_pk))
            .filter(F.col("prank") <= per_partition_limit)
            .drop("prank")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
        .select("query_id", "pk", "doc_id", "score", "rank")
    )
