"""Rocchio relevance feedback (reference O19, lib/src/extensions.dart:22-139).

The expansion operates on ONE query's term weights — tiny data — so it is a
driver-side query rewrite: fetch the few relevant documents' texts with a
doc_id-pushdown scan, re-tokenize (the reference always tokenizes docs with
the main analyzer at build time — extensions.dart:49 uses doc.terms), expand,
then run the expanded query through the normal distributed search path.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25_spark.functions.analyzer import tokenize_text
from bm25_spark.operators.indexer import BM25Index
from bm25_spark.operators.searcher import search

_ROCCHIO_SPLIT = re.compile(r"\W+", re.UNICODE)
MAX_EXPANDED_TERMS = 30


def rocchio_expand(
    query: str,
    relevant_terms: list[list[str]],
    alpha: float = 1.0,
    beta: float = 0.75,
) -> str:
    """Expand ``query`` from relevant documents' token lists.

    Mirrors extensions.dart: per-doc TF normalized by 1/len (:47-55);
    query tokenized with the DIFFERENT \\W+ splitter (:67-71, no stopwords);
    alpha on query terms, beta*tf_norm/found on doc terms (:77-91); top-30
    by weight (:98-99, ties broken by term — reference order unspecified);
    terms repeated clamp(round(1+ln(w)),1,8) times when w>1 (:116-124);
    leftover original terms appended (:127)."""
    if not relevant_terms:
        return query
    term_freq: dict[str, float] = {}
    for terms in relevant_terms:
        if not terms:
            continue
        ln = 1.0 / len(terms)
        for t in terms:
            term_freq[t] = term_freq.get(t, 0.0) + ln
    found = len(relevant_terms)
    qtoks = [w for w in _ROCCHIO_SPLIT.split(query.lower()) if len(w) >= 2]
    weighted: dict[str, float] = {t: alpha for t in qtoks}
    dn = 1.0 / found
    for t, v in term_freq.items():
        weighted[t] = weighted.get(t, 0.0) + beta * v * dn
    sel = sorted(weighted.items(), key=lambda kv: (-kv[1], kv[0]))[
        :MAX_EXPANDED_TERMS
    ]
    required = set(qtoks)
    expanded: list[str] = []
    for t, w in sel:
        required.discard(t)
        if math.isfinite(w) and w > 1:
            # Dart .round() is half-away-from-zero; w>1 so floor(x+0.5)
            reps = min(8, max(1, math.floor(1 + math.log(w) + 0.5)))
        else:
            reps = 1
        expanded.extend([t] * reps)
    expanded.extend(sorted(required))
    return " ".join(expanded) if expanded else query


def search_with_feedback(
    index: BM25Index,
    query: str,
    relevant_doc_ids: list[int] | None = None,
    alpha: float = 1.0,
    beta: float = 0.75,
    limit: int = 10,
) -> DataFrame:
    if not relevant_doc_ids:
        return search(index, query, limit=limit)
    rel = (
        index.docs.filter(F.col("doc_id").isin(list(set(relevant_doc_ids))))
        .select(index.text_col)
        .collect()
    )
    if not rel:
        return search(index, query, limit=limit)
    relevant_terms = [
        tokenize_text(r[index.text_col] or "", index.stopwords) for r in rel
    ]
    expanded = rocchio_expand(query, relevant_terms, alpha, beta)
    return search(index, expanded, limit=limit)
