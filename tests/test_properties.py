"""Property-based tests (Hypothesis) for the quirk-bearing primitives
(SURVEY §5.2): generated inputs, invariant assertions. Example counts are
small because each example pays a Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.functions.dialect import (
    nullify_tokens,
    split_part,
    try_decimal,
)
from airbnb_listings_data_pipelines_spark.operators.dedup import exact_dedup

FAST = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

price_like = st.one_of(
    st.from_regex(r"\$[0-9]{1,6}\.[0-9]{2}", fullmatch=True),       # parses
    st.from_regex(r"\$[0-9]{1,3},[0-9]{3}\.[0-9]{2}", fullmatch=True),  # comma -> NULL
    st.sampled_from(["", "abc", "$", "$-", "12.34.56"]),            # junk -> NULL
)


@FAST
@given(st.lists(price_like, min_size=1, max_size=30))
def test_price_parse_total_function(spark, prices):
    """try_decimal(split_part(p,'$',-1)) never errors; commas and junk are
    NULL; plain $-prices parse to their numeric value (SURVEY §2.10(2))."""
    df = spark.createDataFrame([(p,) for p in prices], ["p"])
    out = df.select(
        "p", try_decimal(split_part(F.col("p"), "$", -1)).alias("d")
    ).collect()
    for r in out:
        if "," in r.p or not r.p.startswith("$") or r.p in ("$", "$-"):
            assert r.d is None, r
        elif r.p.count(".") == 1:
            assert r.d is not None and float(r.d) == float(r.p[1:]), r


@FAST
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=40,
    )
)
def test_exact_dedup_idempotent_and_minimal(spark, rows):
    df = spark.createDataFrame([(i, t) for i, t in rows], ["doc_id", "text"])
    once = exact_dedup(df, ["text"], "doc_id")
    twice = exact_dedup(once, ["text"], "doc_id")
    got_once = sorted(map(tuple, once.collect()))
    got_twice = sorted(map(tuple, twice.collect()))
    assert got_once == got_twice  # idempotent
    expected = {}
    for i, t in rows:
        expected[t] = min(expected.get(t, i), i)
    assert got_once == sorted((i, t) for t, i in expected.items())  # keeps min id


@FAST
@given(st.lists(st.sampled_from(["\\N", "NULL", "NUL", "", "ok", " ", "0"]), min_size=1, max_size=20))
def test_null_tokens_exactly(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    out = [r.c for r in df.select(nullify_tokens("s").alias("c")).collect()]
    assert out == [None if v in ("\\N", "NULL", "NUL", "") else v for v in vals]


words = st.lists(
    st.text(alphabet="abcxyz0123", min_size=1, max_size=6), min_size=0, max_size=12
)


@FAST
@given(words, st.integers(min_value=1, max_value=4))
def test_ngrams_from_tokens_matches_inline_form(spark, toks, k):
    """The projected-tokens fast path and the convenience inline form are
    the same function (the difference is evaluation count, not results)."""
    from airbnb_listings_data_pipelines_spark.operators import text as T

    txt = " ".join(toks)
    df = spark.createDataFrame([(txt,)], ["text"])
    fast = (
        df.select(T.tokens(F.lower(F.col("text"))).alias("__toks"))
        .select(T.ngrams_from_tokens(F.col("__toks"), k).alias("g"))
        .collect()[0]
        .g
    )
    inline = df.select(T.word_ngrams("text", k).alias("g")).collect()[0].g
    assert fast == inline
    # count invariant: n-k+1 n-grams for n>=k tokens, else none
    n = len(txt.split())
    assert len(fast) == (max(0, n - k + 1) if n >= k else 0)


@FAST
@given(st.text(alphabet="ab1.@- xyz\n", max_size=60))
def test_pii_redaction_idempotent(spark, s):
    """Redacting already-redacted text changes nothing (placeholders never
    re-match any PII pattern)."""
    from airbnb_listings_data_pipelines_spark.operators import text as T

    df = spark.createDataFrame([(s,)], ["t"])
    once = df.select(T.redact_pii("t").alias("r"))
    twice = once.select(T.redact_pii("r").alias("r"))
    assert once.collect()[0].r == twice.collect()[0].r
