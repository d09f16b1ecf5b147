"""Deterministic synthetic transcript corpora (FIXTURES.md F1/F2).

No external data; seeded; generated as pandas then lifted to Spark with an
explicit schema. The transcript shape is the input contract:
(conv_id string, turn_idx int, role string, text string, tool string,
 ts timestamp).
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

GOLDEN_TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "A fast brown fox leaps above a sleeping dog",
    "The lazy dog sleeps under the tree",
    "Quick foxes are known for their jumping abilities",
    "Dogs can be lazy when they are tired",
]

_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = [None, "search", "code", "browser"]

# Zipfian-ish vocabulary for synthetic turns
_VOCAB = (
    "the of and to in is for spark query data table join filter index scan "
    "shuffle partition broadcast agg window stream batch column row key value "
    "fast slow small large cat dog fox engine search rank score term doc "
    "token text turn tool user agent answer question code error retry plan "
    "unicode café naïve привет мир γειά κόσμε 世界 你好 under_score test123"
).split()

_EDGE_TEXTS = [
    "cat cat cat",
    "the and a an or but",  # stopword-only
    "MiXeD CaSe TeXt MIXED case text",
    "Visit https://example.com/path?q=1 or email me@test.org now",
    "héllo wörld Привет Мир γειά σου κόσμε 世界 emoji 😀 here",
    "under_score test123 42nd a_b_c x",
    "",  # empty text
    "   ",  # whitespace-only
    "duplicate turn text exactly",
    "duplicate turn text exactly",
]


def _rows(n_convs: int, seed: int, turns_mean: int = 8):
    rng = random.Random(seed)
    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # Zipf-weighted vocabulary sampling
    weights = [1.0 / (i + 1) for i in range(len(_VOCAB))]
    edge_iter = iter(_EDGE_TEXTS * 2)
    for c in range(n_convs):
        conv = f"conv-{c:06d}"
        n_turns = max(1, int(rng.expovariate(1.0 / turns_mean)) + 1)
        for t in range(n_turns):
            if c < 4 and t == 0:
                try:
                    text = next(edge_iter)
                except StopIteration:
                    text = " ".join(rng.choices(_VOCAB, weights, k=12))
            else:
                n_words = rng.randint(3, 40)
                if rng.random() < 0.002:
                    n_words = 1000  # the long-doc edge case
                text = " ".join(rng.choices(_VOCAB, weights, k=n_words))
            rows.append(
                (
                    conv,
                    t,
                    rng.choice(_ROLES),
                    text,
                    rng.choice(_TOOLS),
                    t0 + dt.timedelta(minutes=c * 100 + t),
                )
            )
    # guarantee all edge texts appear at least once
    for i, text in enumerate(_EDGE_TEXTS):
        rows.append(
            (
                f"edge-{i:04d}",
                0,
                _ROLES[i % len(_ROLES)],
                text,
                _TOOLS[i % len(_TOOLS)],
                t0 + dt.timedelta(days=1, minutes=i),
            )
        )
    return rows


def synthetic_transcripts(
    spark: SparkSession, n_convs: int = 50, seed: int = 42
) -> DataFrame:
    pdf = pd.DataFrame(
        _rows(n_convs, seed),
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def golden_transcripts(spark: SparkSession) -> DataFrame:
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("golden", i, "user", text, None, t0 + dt.timedelta(minutes=i))
        for i, text in enumerate(GOLDEN_TEXTS)
    ]
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


def transcripts_rows_for_oracle(df_rows) -> list[tuple[str, dict]]:
    """Rows (already ordered by conv_id, turn_idx) -> oracle corpus input."""
    return [
        (r["text"] or "", {"role": r["role"], "tool": r["tool"], "conv_id": r["conv_id"]})
        for r in df_rows
    ]
