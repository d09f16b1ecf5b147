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
