"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All of these are pure JVM expressions (no Python in the hot path) and each
has an exact DuckDB-SQL mirror in contract.py: shared determinism comes from
md5 (identical across Spark/DuckDB/Python) and fixed regex token rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenization: letter runs | single digits | single punct
BPE_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"
# analyzer-equivalent token split for plain ascii corpora
WORD_SPLIT = r"[^a-z0-9_]+"

STOPWORDS_EN = (
    "the a an and or but of to in is are was were be been it this that "
    "for on with as at by from"
).split()

_LANG_MARKERS = {
    "en": ["the", "and", "is", "of", "to", "in"],
    "es": ["el", "los", "las", "que", "y", "de"],
    "de": ["der", "die", "und", "das", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "des", "est"],
}


def _tokens_col(text_col: str) -> F.Column:
    """array of analyzer tokens (len>=2) for plain-ascii text — the JVM-side
    equivalent of the tokenizer UDF's ASCII path (valid when text has no
    non-ascii chars; the general path is the pandas UDF in analyzer.py)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), WORD_SPLIT),
        lambda t: F.length(t) >= 2,
    )


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens): whitespace token count + BPE-ish
    pre-token count — the unit for training-data size accounting."""
    trimmed = F.trim(F.col(text_col))
    ws = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    bpe = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_PATTERN), F.lit(0))
    )
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, stopword_ratio, mean_token_len, quality):
    deterministic linear quality heuristic — length band + stopword balance
    (the classic Gopher-style filters, reduced to SQL-expressible form)."""
    toks = _tokens_col(text_col)
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_len = F.when(n > 0, F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))
    len_ok = (n >= 5) & (n <= 500)
    quality = (
        F.when(len_ok, F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when((stop_ratio >= 0.0) & (stop_ratio <= 0.4), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_len >= 3.0) & (mean_len <= 10.0), F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(quality, 4).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred): marker-word language heuristic with fixed
    tie-break order; 'und' when no markers hit."""
    toks = _tokens_col(text_col)

    def contains(arr):
        return lambda t: F.array_contains(arr, t)

    hits = {}
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hits[lang] = F.size(F.filter(toks, contains(arr)))
    best = F.lit("und")
    best_n = F.lit(0)
    # fixed order => deterministic argmax tie-break (first wins)
    for lang in ["en", "es", "de", "fr"]:
        cond = hits[lang] > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, hits[lang]).otherwise(best_n)
    return docs.select("doc_id", best.alias("lang_pred"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp): md5 of the normalized token stream — exact-dup key that
    is whitespace/case/punct-insensitive."""
    norm = F.concat_ws(" ", _tokens_col(text_col))
    return docs.select("doc_id", F.md5(norm).alias("fp"))
