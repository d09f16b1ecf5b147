"""write_index/read_index round-trip and the spark-submit CLI surface."""

import json

from bm25_spark.operators.indexer import build_index, read_index, write_index
from bm25_spark.operators.searcher import search, search_in
from bm25_spark.sources.datagen import synthetic_transcripts


def _ranked(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.orderBy("rank").collect()]


def test_write_read_roundtrip_plain(spark, tmp_path):
    df = synthetic_transcripts(spark, n_convs=10, seed=5)
    idx = build_index(df)
    root = str(tmp_path / "idx")
    write_index(idx, root)
    idx2 = read_index(spark, root)
    q = "spark data query plan"
    assert _ranked(search(idx2, q, limit=10)) == _ranked(search(idx, q, limit=10))


def test_write_read_roundtrip_partitioned(spark, tmp_path):
    df = synthetic_transcripts(spark, n_convs=12, seed=9)
    idx = build_index(df, partition_col="role")
    root = str(tmp_path / "idxp")
    write_index(idx, root)
    idx2 = read_index(spark, root, partitioned=True)
    for key in ("user", "assistant"):
        a = _ranked(search_in(idx, key, "spark data", limit=8))
        b = _ranked(search_in(idx2, key, "spark data", limit=8))
        assert a == b


def test_meta_roundtrip_nondefault_shard_size(spark, tmp_path):
    """Regression: shard_size is decode-critical (doc_id = shard*shard_size
    + deltas). A non-default build read back WITHOUT parameters must get
    every parameter from meta.json — not silently default and corrupt
    doc_ids."""
    df = synthetic_transcripts(spark, n_convs=10, seed=5)
    idx = build_index(
        df, shard_size=64, k1=1.5, b=0.6, stopwords=("the", "and")
    )
    root = str(tmp_path / "idx_meta")
    write_index(idx, root)
    idx2 = read_index(spark, root)  # no args: meta.json drives everything
    assert idx2.shard_size == 64
    assert idx2.k1 == 1.5 and idx2.b == 0.6
    assert idx2.stopwords == frozenset({"the", "and"})
    q = "spark data query plan"
    assert _ranked(search(idx2, q, limit=10)) == _ranked(search(idx, q, limit=10))
    # doclens table round-trips too
    a = sorted((r["doc_id"], r["dl"]) for r in idx.doclens.collect())
    b = sorted((r["doc_id"], r["dl"]) for r in idx2.doclens.collect())
    assert a == b


def test_read_index_refuses_to_guess_shard_size(spark, tmp_path):
    import os

    import pytest

    df = synthetic_transcripts(spark, n_convs=6, seed=5)
    idx = build_index(df, shard_size=64)
    root = str(tmp_path / "idx_nometa")
    write_index(idx, root)
    os.remove(os.path.join(root, "meta.json"))
    with pytest.raises(ValueError, match="shard_size"):
        read_index(spark, root)
    # explicit shard_size still works without meta
    idx2 = read_index(spark, root, shard_size=64)
    q = "spark data"
    assert _ranked(search(idx2, q, limit=5)) == _ranked(search(idx, q, limit=5))


def test_cli_build_and_search(spark, tmp_path, capsys):
    from bm25_spark import cli

    src = str(tmp_path / "src")
    synthetic_transcripts(spark, n_convs=8, seed=3).write.parquet(src)
    root = str(tmp_path / "cli_idx")
    rc = cli.main(["build", "--input", src, "--root", root])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["partitions_total"] == 1

    rc = cli.main(["search", "--root", root, "--query", "spark data", "--limit", "5"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(res["results"]) == 5
    assert res["results"][0]["rank"] == 1
