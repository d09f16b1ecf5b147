"""Property-based engine ≡ oracle parity (SURVEY §5c): random small
corpora and queries, the packed Spark engine must agree with the pure-
Python reference oracle on candidate sets, scores (within float
tolerance), and ranking up to near-tie permutations.

Randomness deliberately covers: empty documents, duplicate documents,
repeated query terms, unknown query terms, all-stopword queries, and
stopword builds.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bm25_spark.operators.indexer import build_index
from bm25_spark.operators.packed import search_packed
from bm25_spark.operators.searcher import search_batch
from bm25_spark.oracle import OracleBM25

VOCAB = [
    "data", "table", "scan", "filter", "join", "agg", "cat", "dog",
    "fox", "spark", "query", "the", "and", "row", "key",
]
STOP = frozenset({"the", "and"})

doc_s = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=25).map(
    " ".join
)
corpus_s = st.lists(doc_s, min_size=1, max_size=25)
query_s = st.lists(
    st.sampled_from(VOCAB + ["zzunknown"]), min_size=1, max_size=5
).map(" ".join)


def _tie_groups(ranked, tol=1e-8):
    """[(doc, score)...] desc -> list of doc-sets of near-equal score."""
    groups, cur, cur_s = [], [], None
    for d, s in ranked:
        if cur and abs(s - cur_s) > tol:
            groups.append(cur)
            cur = []
        cur.append(d)
        cur_s = s
    if cur:
        groups.append(cur)
    return groups


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(
    corpus=corpus_s,
    queries=st.lists(query_s, min_size=1, max_size=3),
    use_stop=st.booleans(),
)
def test_packed_engine_matches_oracle(spark, corpus, queries, use_stop):
    stop = STOP if use_stop else None
    oracle = OracleBM25(corpus, stopwords=set(stop) if stop else None)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    idx = build_index(
        df,
        text_col="text",
        id_col="doc_id",
        index_fields=(),
        stopwords=stop,
        shard_size=8,  # force multiple shards + multi-run merges
    )
    n = len(corpus)
    res = search_batch(idx, list(enumerate(queries)), limit=max(n, 1))
    by_q: dict[int, list] = {}
    for r in res.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for qid, q in enumerate(queries):
        want = oracle.search(q, limit=max(n, 1))
        got = sorted(by_q.get(qid, []))
        # identical candidate sets and per-doc scores
        got_scores = {d: s for _, d, s in got}
        want_scores = dict(want)
        assert set(got_scores) == set(want_scores), q
        for d, s in want_scores.items():
            assert abs(got_scores[d] - s) <= 1e-9, (q, d, s, got_scores[d])
        # ranking agrees up to permutations within near-tie groups
        got_order = [d for _, d, _ in got]
        pos = 0
        for grp in _tie_groups(want):
            assert sorted(got_order[pos : pos + len(grp)]) == sorted(grp), q
            pos += len(grp)
    # the distributed cluster scorer (block-max WAND in applyInPandas)
    # agrees with the oracle too — first query keeps runtime sane
    q0 = queries[0]
    want0 = dict(oracle.search(q0, limit=max(n, 1)))
    got0 = {
        r["doc_id"]: r["score"]
        for r in search_packed(
            idx, [(0, q0)], limit=max(n, 1), force_cluster=True
        ).collect()
    }
    assert set(got0) == set(want0), q0
    for d, s in want0.items():
        assert abs(got0[d] - s) <= 1e-9, (q0, d)
