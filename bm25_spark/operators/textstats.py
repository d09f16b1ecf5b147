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

# Character-trigram language profiles (leading/trailing space = word
# boundary; all entries exactly 3 chars). Classic n-gram profile LID
# (Cavnar & Trenkle-style) reduced to a fixed discriminative set per
# language so scoring stays a pure string expression: score(L) = total
# occurrences of L's trigrams in the normalized text. Deterministic,
# DuckDB-mirrorable (integer counts via length-difference / 3).
# Profiles revised round 4 against tools/lid_accuracy.py's labeled fixture
# using ONLY its dev half (first 10 sentences/language); the test half is
# untouched held-out data, reported in BENCH.md (0.74 -> 0.86). Design
# notes: pan-Germanic endings ("en ", "er ") appear in ALL of de/nl/sv so
# they cancel among those and the distinctive trigrams decide; "que"/"est"
# sit in es AND pt AND fr for the same reason.
LANG_TRIGRAMS = {
    "en": [" th", "the", "he ", "and", " an", "nd ", "ing", "ng ",
           " of", "of ", " to", "to ", "ion", " is", "is ", "ed ",
           "tha", "hat", "was", " wa", "for", " fo", "ere", "ent"],
    "de": ["der", "die", "und", " un", "ein", "ich", "sch", "cht",
           "ung", "gen", "den", " zu", "zu ", "eit", "ver", "nen",
           "en ", "er ", "aus", "bei", "wir", "das", "sse", "ück",
           "auf"],
    "es": ["ión", "ado", "los", " lo", "las", "ció", "ent", "ar ",
           "era", "nte", " co", "con", "por", " po", "una", "ada",
           "del", " el", "el ", "que", " qu", "est", "aba", "ndo",
           " y ", "ía ", "ón "],
    "fr": ["les", " le", "ent", "que", " qu", "ue ", "ait", "eur",
           "oir", " pa", "par", "une", "ons", " et", "et ", "ais",
           "est", "des", "our", " à ", "ée ", "eau", "dan", "ont",
           "iss", "lle", "le "],
    "it": ["che", " ch", "zio", "one", "ità", "gli", " gl", "ell",
           "lla", "to ", " di", "di ", "per", " pe", "non", "nto",
           "are", "ere", "ato", "ono", "ano", "utt", "ggi", "iù "],
    "nl": ["het", " he", "van", " va", "een", " ee", "ijk", "ij ",
           "aar", "oor", "rde", "nde", " ve", "aan", "gel", "ord",
           "en ", "er ", "lk ", "ijd", "oud", "eer", " op", "cht",
           "iet", "uit", " ui", "wij", "zij", "eke", "kwa", "uis"],
    "pl": ["nie", " ni", "prz", "rze", " pr", "ego", "ych", "owa",
           "ani", "cze", "szy", " sz", "ość", "dzi", "wie", "ało",
           "ej ", "ym ", "ów ", "ał ", "ła ", "ło ", "ied", "czy",
           " w ", "cja", "acj", "owi", "ili"],
    "pt": ["ção", "ão ", "ade", " co", "do ", " do", "da ", " da",
           "os ", "par", "uma", "não", " nã", "res", "men", "com",
           "em ", " em", "nha", "nho", "lhe", "lho", "eir", "ões",
           "ava", "ou ", "que", " qu", "est", "as ", " no", " os",
           "inh", "çõe"],
    "ru": ["ого", "его", "ени", "ост", "ств", "ать", "ния", "тся",
           "ть ", "ый ", "ая ", " пр", "при", " не", "что", " на",
           "ом ", "ой ", "ий ", "или", "они", " во", "оро", "ет ",
           "ние", " ко", "ами", "ень", "ала"],
    "sv": ["och", " oc", "att", " at", "det", "för", " fö", "är ",
           " är", "som", " so", "ade", "ett", "rna", "lig", "ska",
           "den", "en ", "na ", "er ", " på", "på ", " av", "av ",
           "än ", "ång", "ill", "tt ", "ätt", "igt", "öve"],
}
# argmax preference order: ties go to the EARLIER language (and the same
# CASE order is generated for the DuckDB oracle, so both engines break
# ties identically)
LANG_ORDER = ("en", "de", "es", "fr", "it", "nl", "pl", "pt", "ru", "sv")
# normalization shared with the oracle SQL: lowercase, keep latin +
# latin-1/ext-A accents + cyrillic, collapse everything else to spaces
LANG_NORM_CLASS = "[^a-zà-ÿа-яё]+"
LANG_MAX_CHARS = 1000


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


def lang_id(
    docs: DataFrame,
    text_col: str = "text",
    max_chars: int = LANG_MAX_CHARS,
) -> DataFrame:
    """(doc_id, lang_pred): character-trigram profile language ID over the
    LANG_TRIGRAMS languages; 'und' when no profile trigram occurs.

    100 TB shape: a single NARROW projection — normalize once, then each
    language's score is a chain of length-difference counts (JVM string
    ops inside whole-stage codegen). No explode, no join, no shuffle; the
    text is capped at ``max_chars`` so cost is bounded per row. Tie-break:
    earliest language in LANG_ORDER (same CASE order as the DuckDB
    oracle)."""
    norm = F.concat(
        F.lit(" "),
        F.regexp_replace(
            F.lower(F.substring(F.col(text_col), 1, max_chars)),
            LANG_NORM_CLASS,
            " ",
        ),
        F.lit(" "),
    )
    d = docs.select("doc_id", norm.alias("s"))

    def occurrences(tri: str) -> F.Column:
        # non-overlapping count, identical semantics in DuckDB's replace()
        return F.length("s") - F.length(
            F.replace(F.col("s"), F.lit(tri), F.lit(""))
        )

    score_cols = []
    for lang in LANG_ORDER:
        total = None
        for tri in LANG_TRIGRAMS[lang]:
            c = occurrences(tri)
            total = c if total is None else total + c
        score_cols.append((total / F.lit(3)).cast("long").alias(f"s_{lang}"))
    scored = d.select("doc_id", *score_cols)
    maxs = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_ORDER])
    pred = F.when(maxs <= 0, F.lit("und"))
    for lang in LANG_ORDER:
        pred = pred.when(F.col(f"s_{lang}") == maxs, F.lit(lang))
    return scored.select("doc_id", pred.alias("lang_pred"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp): md5 of the normalized token stream — exact-dup key that
    is whitespace/case/punct-insensitive."""
    norm = F.concat_ws(" ", _tokens_col(text_col))
    return docs.select("doc_id", F.md5(norm).alias("fp"))
