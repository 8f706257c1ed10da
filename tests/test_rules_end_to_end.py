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


# ---------------------------------------------------------------------------
# per-source rules routing (reference: keywordSentenceToKeywords resolves
# the STORE's rules at tokenize time, MediaServiceLive.scala:1670-1676)
# ---------------------------------------------------------------------------


def test_per_source_rules_routing(spark, tmp_path):
    """Two sources, identical raw text, different rules: the same
    sentence must tokenize (and therefore index and match) differently
    per source, and query tokenization must route by source too."""
    import datetime

    import pandas as pd

    from sotohp_spark.functions.tokenizer import (
        KeywordRulesRouter,
        make_term_freq_udf_routed,
    )

    rules_a = KeywordRules(mappings=(("nigght", "night"),))
    rules_b = KeywordRules(ignoring=frozenset({"nigght"}))
    router = KeywordRulesRouter(
        by_source=(("storeA", rules_a), ("storeB", rules_b)), default=None
    )

    # UDF level: same text, different maps per source
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "text": ["nigght watch", "nigght watch", "nigght watch"],
                "source": ["storeA", "storeB", None],
            }
        )
    )
    maps = {
        r["source"]: r["tfs"]
        for r in df.withColumn(
            "tfs", make_term_freq_udf_routed(router)("text", "source")
        ).collect()
    }
    assert maps["storeA"] == {"night": 1, "watch": 1}
    assert maps["storeB"] == {"watch": 1}
    assert maps[None] == {"nigght": 1, "watch": 1}  # default: rules-free

    # end to end: build a two-source index and query per source
    ts = datetime.datetime(2025, 1, 1)
    turns = pd.DataFrame(
        [
            ("convA", 0, "user", "nigght watch report", None, ts, "storeA"),
            ("convB", 0, "user", "nigght watch report", None, ts, "storeB"),
        ],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts", "source"],
    )
    path = str(tmp_path / "routed")
    cfg = EngineConfig(range_size=8, block_size=4, ranges_per_batch=2,
                       shuffle_partitions=2)
    IndexBuilder(spark, path, cfg, rules=router).build(
        spark.createDataFrame(turns), input_fingerprint="routed"
    )
    engine = QueryEngine(spark, path, rules=router)

    # 'night' exists only where the mapping ran (storeA's doc)
    hits = engine.top_k("night", 10, with_docs=True).select("conv_id").collect()
    assert [r["conv_id"] for r in hits] == ["convA"]
    # 'watch' survives both chains
    both = engine.top_k("watch", 10, with_docs=True).select("conv_id").collect()
    assert sorted(r["conv_id"] for r in both) == ["convA", "convB"]
    # query-side routing: 'nigght' maps to night under storeA's rules
    # (finds convA), is a stopword under storeB's rules (empty)
    via_a = engine.top_k("nigght", 10, source="storeA", with_docs=True)
    assert [r["conv_id"] for r in via_a.select("conv_id").collect()] == ["convA"]
    assert engine.top_k("nigght", 10, source="storeB", with_docs=False).count() == 0
