"""Sentiment scoring + 3-way classification (SURVEY.md O21/O40).

The reference applies VADER row-wise in pandas, rebuilding the analyzer
per row (redditProcessor.py:23-33,97-99).  VADER isn't available here,
so the engine ships a small embedded valence lexicon and two execution
paths with identical semantics:

1. ``score_relational`` — tokenize -> broadcast-join the lexicon ->
   groupBy-sum valence -> VADER-style normalization
   ``x / sqrt(x^2 + 15)``.  Pure DataFrame ops: JVM-side, fully
   SQL-expressible (DuckDB oracle in __spark_entry__), and the join is a
   broadcast hash join — the scale path for 100 TB of text.
2. ``score_pandas_udf`` — an Arrow-batched pandas UDF with an
   executor-singleton analyzer (fixes the reference's per-row analyzer
   rebuild anti-pattern, SURVEY.md section 4).  Same lexicon, same numbers;
   kept as the extension point for a real model (VADER/transformer).

Classification thresholds are the reference's: > 0.05 positive,
< -0.05 negative, else neutral (redditProcessor.py:28-33).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import tokens

# Valence lexicon (VADER scale, [-4, 4]): the ~300-entry curated set
# shared with functions/vader.py, which also documents how to drop in
# the stock 7.5k-entry vader_lexicon.txt (load_lexicon_file).  This
# module's scorer is the *bag-of-words* semantics (sum + normalize);
# vader.py layers the full negation/booster/caps/punctuation algorithm.
from .vader import VADER_LEXICON as LEXICON

ALPHA = 15.0  # VADER normalization constant: compound = x / sqrt(x*x + alpha)

POS_THRESHOLD = 0.05
NEG_THRESHOLD = -0.05


def lexicon_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(w, v) for w, v in sorted(LEXICON.items())], "word string, valence double"
    )


def compound_from_sum(x: Column) -> Column:
    return x / F.sqrt(x * x + F.lit(ALPHA))


def label_from_score(score: Column) -> Column:
    """Threshold bucketing, native `when` chain (redditProcessor.py:28-33)."""
    return (
        F.when(score > POS_THRESHOLD, "positive")
        .when(score < NEG_THRESHOLD, "negative")
        .otherwise("neutral")
    )


def score_relational(
    df: DataFrame, id_cols: list[str], text_col: str, round_to: int = 4
) -> DataFrame:
    """Per-row sentiment via explode + broadcast lexicon join + re-agg.

    Scale notes: the lexicon side is tiny -> broadcast hash join, no
    shuffle for the probe side beyond the groupBy back onto the id
    (map-side partial aggregation applies).  No Python in the plan.
    """
    spark = df.sparkSession
    lex = F.broadcast(lexicon_df(spark))
    toks = df.select(*id_cols, F.explode_outer(tokens(text_col)).alias("word"))
    scored = (
        toks.join(lex, "word", "left")
        .groupBy(*id_cols)
        .agg(F.coalesce(F.sum("valence"), F.lit(0.0)).alias("_x"))
    )
    compound = F.round(compound_from_sum(F.col("_x")), round_to)
    return scored.select(
        *id_cols,
        compound.alias("sentiment_score"),
        label_from_score(compound).alias("sentiment"),
    )


def score_pandas_udf(df: DataFrame, text_col: str) -> DataFrame:
    """Arrow-batched pandas-UDF path (O40 surface): struct-returning UDF,
    analyzer built once per executor process, not per row."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<sentiment_score: double, sentiment: string>")
    def _sent(texts: pd.Series) -> pd.DataFrame:
        analyzer = _get_analyzer()  # executor-singleton
        scores = texts.fillna("").map(analyzer.polarity)
        labels = scores.map(
            lambda s: "positive" if s > POS_THRESHOLD
            else ("negative" if s < NEG_THRESHOLD else "neutral")
        )
        return pd.DataFrame({"sentiment_score": scores, "sentiment": labels})

    return df.withColumn("_s", _sent(F.col(text_col))).select("*", "_s.*").drop("_s")


class _LexiconAnalyzer:
    """Tiny VADER-shaped analyzer over the embedded lexicon."""

    def __init__(self) -> None:
        self.lexicon = LEXICON

    def polarity(self, text: str) -> float:
        import math
        import re
        from decimal import ROUND_HALF_UP, Decimal

        x = sum(self.lexicon.get(w, 0.0) for w in re.split(r"\s+", text) if w)
        # HALF_UP quantize of the SHORTEST decimal repr, not Python
        # round() (banker's): this path is value-hash-gated against the
        # shared F.round oracle, and Spark's F.round is
        # BigDecimal.valueOf(double) (= shortest repr, same contract as
        # Python repr) + HALF_UP — so an exact 1e-4 tie breaks the same
        # way on both legs (r6 ADVICE); the three paths stay identical
        # by construction
        return float(
            Decimal(repr(x / math.sqrt(x * x + ALPHA))).quantize(
                Decimal("0.0001"), ROUND_HALF_UP
            )
        )


_ANALYZER: _LexiconAnalyzer | None = None


def _get_analyzer() -> _LexiconAnalyzer:
    global _ANALYZER
    if _ANALYZER is None:
        _ANALYZER = _LexiconAnalyzer()
    return _ANALYZER
