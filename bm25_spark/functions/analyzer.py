"""Tokenizer — vectorized Arrow/pandas UDF reproducing the reference analyzer.

Semantics (reference lib/src/bm25.dart:681-735, verified against the golden
example output and the reference unicode test corpus):

- pure-ASCII text: maximal runs of ``[A-Za-z0-9_]`` (a run MAY start with a
  digit or underscore), lowercased (bm25.dart:698-721);
- text with any non-ASCII char: whole text lowercased, tokens match
  ``\\p{L}[\\p{L}\\p{N}_]*`` — must START with a letter (bm25.dart:723-735);
- tokens shorter than 2 chars dropped; stopwords dropped (bm25.dart:712,729);
- CJK without separators stays ONE token (no segmentation — matches the
  reference, test/bm25_test.dart:205-240).

The UDF is an Arrow-batched pandas UDF: Python regex runs per row inside the
batch, but data transfer and scheduling are vectorized (no row-at-a-time
pickling). This is the input_hint-mandated slow path; everything downstream
of tokenization stays in JVM expressions.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_ASCII_WORD = re.compile(r"[a-z0-9_]+")
# Python stdlib equivalent of \p{L}[\p{L}\p{N}_]* : [^\W\d_] is a letter.
_UNICODE_WORD = re.compile(r"[^\W\d_]\w*", re.UNICODE)


def tokenize_text(text: str | None, stopwords: frozenset[str] | None = None) -> list[str]:
    """Single-string tokenizer (driver side: queries, small fixtures)."""
    if not text:
        return []
    lowered = text.lower()
    words = (_ASCII_WORD if text.isascii() else _UNICODE_WORD).findall(lowered)
    if stopwords:
        return [w for w in words if len(w) >= 2 and w not in stopwords]
    return [w for w in words if len(w) >= 2]


def tokenize_batch(texts: pd.Series, stopwords: frozenset[str] | None) -> pd.Series:
    return pd.Series(
        [tokenize_text(t, stopwords) for t in texts], index=texts.index
    )


def make_tokenize_udf(stopwords=None):
    """Returns a pandas UDF Column-function: text -> array<string> terms."""
    stop = frozenset(stopwords) if stopwords else None

    @F.pandas_udf(ArrayType(StringType()))
    def tokenize(texts: pd.Series) -> pd.Series:
        return tokenize_batch(texts, stop)

    return tokenize


DOC_TERMS_SCHEMA = StructType(
    [
        StructField("dl", IntegerType(), False),
        StructField("terms", ArrayType(StringType()), False),
        StructField("tfs", ArrayType(IntegerType()), False),
    ]
)


def make_dl_udf(stopwords=None):
    """text -> dl (post-filter token count, the reference's doc length —
    bm25.dart:427). Scalar-only return: the docs/stats pipeline never ships
    token arrays back across the Arrow boundary."""
    stop = frozenset(stopwords) if stopwords else None

    @F.pandas_udf(IntegerType())
    def dl_of(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [len(tokenize_text(t, stop)) for t in texts], index=texts.index
        )

    return dl_of


def make_doc_terms_udf(stopwords=None):
    """text -> struct(dl, terms: array<string>, tfs: array<int>) — the
    distinct terms of the doc with their in-doc frequencies, parallel-array
    encoded (Arrow list columns serialize far faster than struct arrays).

    Folding the per-document TF count into the tokenizer UDF (the reference
    builds exactly this per-doc map, lib/src/bm25.dart:426-433) makes the
    downstream (doc, term, tf) relation a NARROW explode — the index build's
    only wide shuffle is then the per-term postings merge, instead of an
    extra full shuffle of every exploded token occurrence."""
    stop = frozenset(stopwords) if stopwords else None

    @F.pandas_udf(DOC_TERMS_SCHEMA)
    def doc_terms(texts: pd.Series) -> pd.DataFrame:
        dls: list[int] = []
        terms_l: list[list[str]] = []
        tfs_l: list[list[int]] = []
        for t in texts:
            toks = tokenize_text(t, stop)
            dls.append(len(toks))
            c = Counter(toks)
            terms_l.append(list(c.keys()))
            tfs_l.append(list(c.values()))
        return pd.DataFrame({"dl": dls, "terms": terms_l, "tfs": tfs_l})

    return doc_terms


def query_term_counts(query: str, stopwords=None) -> dict[str, int]:
    """Query tokens WITH multiplicity (reference keeps duplicates,
    bm25.dart:635) folded into term -> qtf counts: summing qtf * contribution
    is mathematically identical to repeated addition."""
    stop = frozenset(stopwords) if stopwords else None
    counts: dict[str, int] = {}
    for t in tokenize_text(query, stop):
        counts[t] = counts.get(t, 0) + 1
    return counts
