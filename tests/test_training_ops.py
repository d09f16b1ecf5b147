"""Training-data pipeline operators: text stats, dedup family, similarity,
multimodal plumbing — validated against direct Python computation."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bm25_spark.operators import dedup, multimodal, similarity, textstats

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "THE QUICK  BROWN FOX jumps over the lazy dog!!"),  # normalizes to 0
    (3, "completely different text about spark and data pipelines"),
    (4, "completely different text about spark and data pipelines"),
    (5, "short"),
    (6, "the and of to in is"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_token_stats(spark, docs):
    rows = {r["doc_id"]: r for r in textstats.token_stats(docs).collect()}
    assert rows[0]["ws_tokens"] == 9
    assert rows[5]["ws_tokens"] == 1
    # bpe-ish: 'dog!!' -> dog, !, !
    assert rows[2]["bpe_tokens"] == 11


def test_quality_and_langid(docs):
    q = {r["doc_id"]: r for r in textstats.quality_score(docs).collect()}
    assert q[0]["n_tokens"] == 9  # all tokens are len>=2
    assert 0 <= q[0]["stopword_ratio"] <= 1
    assert q[5]["quality"] < q[0]["quality"]
    langs = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_id(docs).collect()}
    assert langs[0] == "en"
    assert langs[5] == "und"


def test_fingerprint_and_exact_dedup(docs):
    fp = {r["doc_id"]: r["fp"] for r in textstats.fingerprint(docs).collect()}
    assert fp[0] == fp[2]  # case/punct-insensitive
    assert fp[0] != fp[1]
    res = {r["doc_id"]: r for r in dedup.exact_duplicates(docs).collect()}
    assert res[2]["group_id"] == 0 and res[2]["group_size"] == 2
    assert res[0]["keep"] and not res[2]["keep"]
    assert res[4]["group_id"] == 3


def _py_shingles(text, n=3):
    toks = [t for t in __import__("re").findall(r"[a-z0-9_]+", text.lower()) if len(t) >= 2]
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))}


def test_jaccard_pairs(docs):
    got = {(r["a"], r["b"]): r["jaccard"] for r in
           dedup.jaccard_pairs(docs, n=3, threshold=0.3).collect()}
    s0, s1 = _py_shingles(CORPUS[0][1]), _py_shingles(CORPUS[1][1])
    want_j = round(len(s0 & s1) / len(s0 | s1), 4)
    assert got[(0, 1)] == want_j
    assert got[(0, 2)] == 1.0
    assert got[(3, 4)] == 1.0
    assert (0, 3) not in got


def test_minhash_lsh_finds_near_dups(docs):
    got = {(r["a"], r["b"]): r["jaccard"] for r in
           dedup.minhash_lsh_pairs(docs, num_perm=16, bands=8, threshold=0.3).collect()}
    # exact dups always collide in every band
    assert (0, 2) in got and got[(0, 2)] == 1.0
    assert (3, 4) in got
    # verified jaccard matches exact computation
    for (a, b), j in got.items():
        sa, sb = _py_shingles(CORPUS[a][1]), _py_shingles(CORPUS[b][1])
        assert j == round(len(sa & sb) / len(sa | sb), 4)


def test_minhash_signature_is_md5_min(spark, docs):
    sig = {r["doc_id"]: r["sig"] for r in
           dedup.minhash_signatures(docs, num_perm=4).collect()}
    sh = _py_shingles(CORPUS[0][1])
    for perm in range(4):
        want = min(hashlib.md5(f"{perm}|{s}".encode()).hexdigest() for s in sh)
        assert sig[0][perm] == want


def test_simhash(docs):
    s = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, bits=16).collect()}
    assert s[0] == s[2]  # identical token multiset
    assert 0 <= s[0] < (1 << 16)
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             dedup.simhash_pairs(docs, bits=16, max_hamming=3).collect()}
    assert pairs[(0, 2)] == 0
    assert pairs[(3, 4)] == 0


def _vecs(seed=3, n=30, dim=8):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim))
    base[1] = base[0] + 0.01 * rng.normal(size=dim)  # near-dup of 0
    return [(i, [float(x) for x in base[i]]) for i in range(n)]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in _vecs()], "vec_id long, embedding array<float>"
    )


def _naive_pairs(threshold):
    vecs = dict(_vecs())
    out = {}
    for i in vecs:
        for j in vecs:
            if i < j:
                a, b = np.array(vecs[i]), np.array(vecs[j])
                c = round(
                    float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))),
                    4,
                )
                if c >= threshold:
                    out[(i, j)] = c
    return out


def test_embedding_neardup(emb):
    pairs = {(r["a"], r["b"]) for r in
             dedup.embedding_neardup_pairs(emb, threshold=0.99).collect()}
    assert (0, 1) in pairs


def test_embedding_neardup_block_equals_all_pairs(emb):
    """The block-GEMM plan is exact: same pair set + cosines as the naive
    all-pairs computation, at both a loose and a tight threshold, and for
    block counts that do / don't divide the corpus evenly."""
    for threshold in (0.2, 0.9):
        want = _naive_pairs(threshold)
        for n_blocks in (1, 3, 7):
            got = {
                (r["a"], r["b"]): r["cosine"]
                for r in dedup.embedding_neardup_pairs(
                    emb, threshold=threshold, n_blocks=n_blocks
                ).collect()
            }
            assert got == want, (threshold, n_blocks)


def test_embedding_neardup_lsh_high_threshold(emb):
    """The banded-LSH path finds the planted near-dup pair (cosine ~0.9999)
    and returns a subset of the exact pairs with identical cosines."""
    want = _naive_pairs(0.99)
    got = {
        (r["a"], r["b"]): r["cosine"]
        for r in dedup.embedding_neardup_pairs(
            emb, threshold=0.99, method="lsh", n_planes=16, bands=4
        ).collect()
    }
    assert (0, 1) in got
    assert set(got) <= set(want)
    assert all(want[k] == v for k, v in got.items())


def test_brute_topk_matches_numpy(emb):
    vecs = dict(_vecs())
    q = vecs[5]
    got = similarity.brute_topk(emb, [(0, q)], k=5).orderBy("rank").collect()
    qv = np.array(q)
    cos = {
        i: round(float(np.dot(v, qv) / (np.linalg.norm(v) * np.linalg.norm(qv))), 4)
        for i, v in ((i, np.array(v)) for i, v in vecs.items())
    }
    want = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["id"], r["cosine"]) for r in got] == want


def test_lsh_topk_recall(emb):
    vecs = dict(_vecs())
    qs = [(i, vecs[i]) for i in (0, 5, 9)]
    brute = similarity.brute_topk(emb, qs, k=5).collect()
    approx = similarity.lsh_topk(emb, qs, k=5, n_planes=6, multiprobe_hamming=2).collect()
    bset = {(r["query_id"], r["id"]) for r in brute}
    aset = {(r["query_id"], r["id"]) for r in approx}
    recall = len(bset & aset) / len(bset)
    assert recall >= 0.6, recall  # approximate, deterministic planes


def test_multimodal_plumbing(docs):
    blobs = multimodal.attach_blobs(docs)
    meta = {r["doc_id"]: r for r in multimodal.decode_images(blobs).collect()}
    assert meta[0]["byte_len"] == len(CORPUS[0][1].encode())
    assert meta[0]["channels"] == 3
    assert 4 <= meta[0]["width"] <= 16
    # determinism: same text -> same decoded meta
    assert meta[3]["mean_pixel"] == meta[4]["mean_pixel"]
    resized = multimodal.resize_images(blobs, target=4).collect()
    assert all(len(r["blob"]) == 4 * 4 * 3 for r in resized)
    frames = multimodal.sample_frames(blobs, n_frames=3)
    assert frames.count() == len(CORPUS) * 3
    assert frames.schema == multimodal.FRAME_SCHEMA
