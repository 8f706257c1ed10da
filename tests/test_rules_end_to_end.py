"""End-to-end rank identity WITH KeywordRules (the reference's
per-store rules applied inside the pipeline, UD1): index built with
rewritings/mappings/stopwords must match the oracle running the same
rules — including queries whose surface text only matches after
rewriting."""

import numpy as np
import pytest

from sotohp_spark.config import EngineConfig
from sotohp_spark.functions.tokenizer import KeywordRules
from sotohp_spark.generator import generate_transcripts_pdf
from sotohp_spark.index import IndexBuilder, QueryEngine
from sotohp_spark.oracle.bm25_oracle import Bm25Oracle

RULES = KeywordRules(
    ignoring=frozenset({"with", "i", "am", "the"}),
    mappings=(("nigght", "night"), ("err", "error")),
    rewritings=(("(42)(thing)", "$2$1"), ("toolCall", "tool-call")),
)

QUERIES = [
    "nigght",            # mapping: matches docs containing 'nigght'->night
    "42thing",           # rewriting: -> thing42
    "error retry",       # plain
    "I am with error",   # stopwords drop, 'error' remains
    "retryTimeout",      # camel split
    "err timeout",       # mapping err->error
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rulesidx"))
    pdf = generate_transcripts_pdf(0.05)
    cfg = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2,
                       shuffle_partitions=4)
    IndexBuilder(spark, path, cfg, rules=RULES).build(
        spark.createDataFrame(pdf), input_fingerprint="rules"
    )
    return (
        QueryEngine(spark, path, rules=RULES),
        Bm25Oracle(pdf, rules=RULES),
    )


@pytest.mark.parametrize("conjunctive", [False, True])
def test_rules_rank_identity(built, conjunctive):
    engine, oracle = built
    for qt in QUERIES:
        got = engine.top_k_pdf(qt, 10, conjunctive=conjunctive)
        want = oracle.top_k(qt, 10, conjunctive=conjunctive)
        assert list(got["doc_id"]) == list(want["doc_id"]), (
            f"{qt!r} (conjunctive={conjunctive})\n got={got}\nwant={want}"
        )
        assert np.allclose(
            got["score"].to_numpy(np.float64),
            want["score"].to_numpy(np.float64),
            atol=1e-9,
            rtol=0,
        )


def test_rules_affect_results(built):
    engine, oracle = built
    # the corpus's edge snippets contain 'nigght' -> indexed as 'night'
    got = engine.top_k_pdf("nigght", 10)
    assert len(got) > 0, "mapping nigght->night should hit edge-case docs"
    # stopwords are not searchable
    assert len(engine.top_k_pdf("with", 10)) == 0
