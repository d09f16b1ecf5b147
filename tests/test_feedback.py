"""Rocchio relevance feedback: engine vs oracle parity (O19)."""

import pytest

from bm25_spark.operators import feedback, searcher
from bm25_spark.operators.indexer import build_index
from bm25_spark.oracle import OracleBM25
from bm25_spark.sources.datagen import TRANSCRIPT_SCHEMA

CORPUS = [
    "cats are wonderful pets and cats purr softly",
    "kittens grow into cats quickly every year",
    "dogs are loyal companions for people",
    "birds sing in the morning light",
    "cats and kittens play with yarn",
    "the weather is cold in winter months",
]


@pytest.fixture(scope="module")
def engine(spark):
    import datetime as dt

    rows = [
        ("c0", i, "user", t, None, dt.datetime(2026, 1, 1, 0, i))
        for i, t in enumerate(CORPUS)
    ]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    return build_index(df)


@pytest.fixture(scope="module")
def oracle():
    return OracleBM25(CORPUS)


def test_expansion_matches_oracle(engine, oracle):
    from bm25_spark.functions.analyzer import tokenize_text

    for rel in ([1], [0, 1], [1, 4], [2]):
        want = oracle.expand_query("cats", rel)
        rel_terms = [tokenize_text(CORPUS[i]) for i in sorted(rel)]
        got = feedback.rocchio_expand("cats", rel_terms)
        assert sorted(got.split()) == sorted(want.split()), rel


def test_feedback_results_match_oracle(engine, oracle):
    want = oracle.search_with_feedback("cats", [1], limit=6)
    got = feedback.search_with_feedback(engine, "cats", [1], limit=6)
    got_rows = [(r["doc_id"], r["score"]) for r in got.orderBy("rank").collect()]
    assert [d for d, _ in got_rows] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got_rows, want):
        assert abs(gs - ws) < 1e-9


def test_feedback_empty_ids_is_plain_search(engine):
    plain = searcher.search(engine, "cats", limit=6).collect()
    fb = feedback.search_with_feedback(engine, "cats", [], limit=6).collect()
    assert [(r["doc_id"], r["score"]) for r in plain] == [
        (r["doc_id"], r["score"]) for r in fb
    ]
