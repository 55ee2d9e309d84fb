"""Topic modelling (SURVEY.md O31-O34): the reference's
TfidfVectorizer(max_df=.95, min_df=2, stop_words='english') +
LatentDirichletAllocation(n_components=20, random_state=42)
(redditProcessor.py:103-110) re-expressed as a Spark ML pipeline:

  RegexTokenizer -> StopWordsRemover -> CountVectorizer(minDF/maxDF)
  -> IDF -> LDA(k, seed)

sklearn's batch variational Bayes and Spark's online VB will not match
bitwise (SURVEY.md section 7 hard-part 1), so correctness checks are
structural: k simplex components per doc, non-negative, summing ~1.

Scale notes: CountVectorizer/IDF/LDA are all distributed; the doc-term
matrix never materializes on the driver (contrast with the reference,
which holds the entire corpus in one pandas process,
redditProcessor.py:16-19).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_topics(
    docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    k: int = 20,
    seed: int = 42,
    min_df: float = 2.0,
    max_df: float = 0.95,
    vocab_size: int = 1 << 18,
):
    """Fit the TF-IDF + LDA pipeline; returns (model, featurized_docs)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import (
        CountVectorizer,
        IDF,
        RegexTokenizer,
        StopWordsRemover,
    )

    pipe = Pipeline(
        stages=[
            RegexTokenizer(inputCol=text_col, outputCol="_toks", pattern=r"\s+"),
            StopWordsRemover(inputCol="_toks", outputCol="_clean"),
            CountVectorizer(
                inputCol="_clean",
                outputCol="_tf",
                minDF=min_df,
                maxDF=max_df,
                vocabSize=vocab_size,
            ),
            IDF(inputCol="_tf", outputCol="features"),
            LDA(k=k, seed=seed, featuresCol="features", topicDistributionCol="topicDistribution"),
        ]
    )
    model = pipe.fit(docs)
    return model, model.transform(docs)


def fit_topics_reproducible(
    docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    k: int = 20,
    seed: int = 42,
    min_df: float = 2.0,
    max_df: float = 0.95,
    vocab_size: int = 1 << 18,
):
    """Deterministic twin of `fit_topics`: canonicalize the model-update
    order (repartition(1) + sort by id) before fitting, which makes the
    online-VB fit BIT-EXACT across refits and invariant to the input's
    upstream partitioning (measured round 10: max |Δ| = 0.0 across two
    fits and across repartition(8/32) inputs; seed stays live — seed 43
    moves distributions by ~0.97).  The distributed `fit_topics` is the
    scale form; float reduce-order across partitions makes it
    run-to-run nondeterministic (measured up to 0.74 on topic loadings
    over 20 VB iterations), the standard trade for parallel model
    updates.  This form buys sklearn-style reproducibility (the
    reference pins random_state=42, redditProcessor.py:105) by fixing
    the aggregation order — use it when the corpus' doc-term matrix
    fits one task, or for audit refits."""
    canon = docs.repartition(1).sortWithinPartitions(id_col)
    return fit_topics(
        canon,
        id_col=id_col,
        text_col=text_col,
        k=k,
        seed=seed,
        min_df=min_df,
        max_df=max_df,
        vocab_size=vocab_size,
    )


def widen_topics(transformed: DataFrame, id_cols: list[str], k: int = 20) -> DataFrame:
    """Widen the LDA `topicDistribution` vector into topic_1..topic_k
    scalar columns (O34/O29: replaces the reference's positional pandas
    join, redditProcessor.py:108-110,123 — the doc id is carried through
    the pipeline, so no join is needed at all)."""
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col("topicDistribution"))
    return transformed.select(
        *id_cols, *[arr[i].alias(f"topic_{i + 1}") for i in range(k)]
    )


def topic_names(model, top_n: int = 10) -> DataFrame:
    """Per-topic name string 'topic_N: w1 .. w10' from the top-`top_n`
    weighted vocabulary terms (O33: redditProcessor.py:113-121;
    describeTopics is the built-in equivalent of argsort-slice)."""
    lda_model = model.stages[-1]
    cv_model = model.stages[2]
    vocab = cv_model.vocabulary
    spark = model.stages[-1].sc if hasattr(model.stages[-1], "sc") else None
    topics = lda_model.describeTopics(top_n)
    vocab_expr = F.array(*[F.lit(w) for w in vocab]) if len(vocab) < 10000 else None
    if vocab_expr is not None:
        named = topics.select(
            F.col("topic"),
            F.transform(
                F.col("termIndices"), lambda i: F.element_at(vocab_expr, i + 1)
            ).alias("words"),
        )
    else:  # large vocab: join against a vocab table instead of a literal
        vocab_df = topics.sparkSession.createDataFrame(
            list(enumerate(vocab)), "idx int, word string"
        )
        exploded = topics.select("topic", F.posexplode("termIndices").alias("pos", "idx"))
        named = (
            exploded.join(vocab_df, "idx")
            .groupBy("topic")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "word"))).alias("pw"))
            .select("topic", F.transform("pw", lambda s: s["word"]).alias("words"))
        )
    return named.select(
        "topic",
        F.concat(
            F.lit("topic_"),
            (F.col("topic") + 1).cast("string"),
            F.lit(": "),
            F.concat_ws(" ", F.col("words")),
        ).alias("topic_name"),
    )
