"""Property-based checks (hypothesis) for the text-function semantics:
the Spark normalization chain must agree with an independent Python
reimplementation of the reference chain on arbitrary input."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cloud_native_reddit_data_pipeline_spark.functions.text import normalize_text
from tests.test_text import reference_preprocess

# printable-ish text incl. urls, punctuation, unicode, whitespace runs
_WORDS = st.sampled_from(
    ["http://x.y/z?a=1", "www.foo.bar", "this", "JUST", "ive", "coffee", "é", "ß"]
)
_CHUNKS = st.one_of(
    st.text(alphabet=list("abcXYZ 019.!?'\"-_/\\:;()[]{}\t\n"), max_size=30), _WORDS
)
TEXTS = st.lists(
    st.lists(_CHUNKS, max_size=6).map(" ".join), min_size=1, max_size=16
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(TEXTS)
def test_normalize_agrees_with_reference_chain(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["c"] for r in df.select(normalize_text("t").alias("c")).collect()]
    want = [reference_preprocess(t) for t in texts]
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(TEXTS)
def test_normalize_idempotent(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    once = df.select(normalize_text("t").alias("c"))
    twice = once.select(normalize_text("c").alias("c"))
    # stopword removal can expose new words, but whitespace/punct/case are fixed
    for a, b in zip(once.collect(), twice.collect()):
        assert b["c"] == reference_preprocess(a["c"])


def _py_rolling_hash(s: str) -> int:
    h = 7
    for ch in s:
        h = (h * 31 + ord(ch)) % 2147483647
    return h


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
        ),
        min_size=1,
        max_size=12,
    )
)
def test_rolling_hash_agrees_with_python_fold(spark, texts):
    from cloud_native_reddit_data_pipeline_spark.functions.text import rolling_hash

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["h"] for r in df.select(rolling_hash("t").alias("h")).collect()]
    assert got == [_py_rolling_hash(t) for t in texts]
