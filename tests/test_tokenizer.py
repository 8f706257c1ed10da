"""Golden tests for the analysis chain — must reproduce the reference's
extractKeywords semantics exactly (MediaServiceLive.scala:1641-1668,
golden vector MediaServiceCRUDOperationsTest.scala:138-151)."""

import pandas as pd
import pytest

from sotohp_spark.functions.tokenizer import (
    KeywordRules,
    extract_keywords,
    make_keywords_udf,
    make_term_freq_udf,
    tokenize,
)

GOLDEN_RULES = KeywordRules(
    ignoring=frozenset({"with", "i", "am"}),
    mappings=(("nigght", "night"),),
    rewritings=(("(42)(thing)", "$2$1"),),
)


def test_reference_golden_vector():
    # the reference's exact test: rules above over "I am with nigght 42thing"
    assert extract_keywords("I am with nigght 42thing", GOLDEN_RULES) == {
        "night",
        "thing42",
    }


def test_camel_case_split():
    assert extract_keywords("retryTimeout") == {"retry", "timeout"}
    assert extract_keywords("toolCallError") == {"tool", "call", "error"}
    assert extract_keywords("HTTPServer") == {"http", "server"}
    assert extract_keywords("parseJSON") == {"parse", "json"}


def test_standalone_numbers_dropped():
    assert extract_keywords("2024 photos") == {"photos"}
    assert extract_keywords("error 42 -7 retry") == {"error", "retry"}
    # number glued to word survives (camel-split does not split digits)
    assert "thing42" in extract_keywords("nigght thing42")


def test_separators_and_case():
    assert extract_keywords("Timeout, retry/backoff a-b c'd") == {
        "timeout",
        "retry",
        "backoff",
        "a",
        "b",
        "c",
        "d",
    }


def test_empty_and_null():
    assert tokenize(None) == []
    assert tokenize("") == []
    assert tokenize("  , -- ") == []


def test_mapping_first_match_wins_and_multiword_mapping():
    rules = KeywordRules(
        mappings=(("nyc", "new york"), ("nyc", "other")),
    )
    assert extract_keywords("NYC", rules) == {"new", "york"}


def test_rewritings_applied_in_order_all_occurrences():
    rules = KeywordRules(rewritings=(("a", "b"), ("bb", "c")))
    # "aa" -> "bb" (rewrite 1, all occurrences) -> "c" (rewrite 2)
    assert extract_keywords("aa", rules) == {"c"}


def test_tokenize_keeps_duplicates_in_order():
    assert tokenize("error retry error") == ["error", "retry", "error"]


def test_ignoring_applied_after_lowercase():
    rules = KeywordRules(ignoring=frozenset({"with"}))
    assert extract_keywords("With WITH with", rules) == set()


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.sampled_from(
            list("abcXYZ 0123456789-/,'\t\n")
            + ["retryTimeout", "42thing", "HTTPServer"]
        ),
        max_size=40,
    ).map("".join)
)
@settings(max_examples=500, deadline=None)
def test_fast_path_equals_reference_chain(s):
    from sotohp_spark.functions.tokenizer import _tokenize_chain, tokenize

    assert tokenize(s) == _tokenize_chain(s, None)


def test_whitespace_only_fragments_dropped():
    """Tabs/newlines are NOT separator chars; whitespace-only fragments
    between separators must be dropped on the fast path exactly like
    the chain's .filter(_.trim.nonEmpty) (reference parity)."""
    from sotohp_spark.functions.tokenizer import _tokenize_chain, tokenize

    for s in ["a \t b", "a \n b", "x,\t,y", "\t", " \n ", "a-\t-b c"]:
        assert tokenize(s) == _tokenize_chain(s, None)
        assert all(t.strip() for t in tokenize(s))
    assert tokenize("a \t b") == ["a", "b"]


@pytest.mark.spark
def test_udfs_match_pure_python(spark):
    texts = [
        "I am with nigght 42thing",
        "retryTimeout toolCallError",
        None,
        "",
        "error 42 error retry/backoff",
        "camelCaseToken httpServer parseJSON 2024",
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    kw = df.select(make_keywords_udf(GOLDEN_RULES)("text").alias("kw")).collect()
    tf = df.select(make_term_freq_udf(GOLDEN_RULES)("text").alias("tf")).collect()
    for i, t in enumerate(texts):
        assert set(kw[i]["kw"]) == extract_keywords(t, GOLDEN_RULES)
        expect_tf = {}
        for tok in tokenize(t, GOLDEN_RULES):
            expect_tf[tok] = expect_tf.get(tok, 0) + 1
        assert dict(tf[i]["tf"]) == expect_tf
