"""Token-budget packing (concat-then-chunk) and the distributed
prefix-sum it rides on: values must match the naive global-window
cumsum exactly, and the plan must not contain the single-partition
window that cumsum naively compiles to."""

import pandas as pd

from pyspark.sql import functions as F

from sotohp_spark.operators.packing import pack_documents
from sotohp_spark.operators.positional import with_running_total
from sotohp_spark.plans.checks import formatted_plan


def test_running_total_matches_pandas(spark):
    pdf = pd.DataFrame(
        {"k": range(100), "v": [(i * 37) % 13 for i in range(100)]}
    )
    got = (
        with_running_total(spark.createDataFrame(pdf), ["k"], "v", num_ranges=8)
        .orderBy("k")
        .toPandas()
    )
    want = pdf["v"].cumsum().shift(1, fill_value=0)
    assert list(got["running_total"]) == list(want)


def test_packing_matches_oracle_semantics(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget = 512
    got = pack_documents(docs, budget=budget).orderBy("doc_id").toPandas()

    ref = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n"),
    ).orderBy("doc_id").toPandas()
    cum = ref["n"].cumsum().shift(1, fill_value=0)
    assert list(got["n_tokens"]) == list(ref["n"])
    assert list(got["pack_id"]) == list(cum // budget)
    assert list(got["pack_offset"]) == list(cum % budget)
    # packs are contiguous and start at 0
    assert got["pack_id"].iloc[0] == 0
    assert (got["pack_id"].diff().dropna() >= 0).all()


def test_packing_plan_no_single_partition_window(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = formatted_plan(pack_documents(docs, budget=2048))
    assert "Exchange SinglePartition" not in plan


def test_lm_scores_rank_repetitive_text_high(spark):
    """A smoothed unigram LM must score text made of corpus-common
    tokens above text of hapaxes, and average the exact add-k
    log-probabilities."""
    import math

    from sotohp_spark.operators.lm import unigram_logprob_scores

    rows = [(0, "the the the the"), (1, "the cat sat"), (2, "xylo qwerty")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_logprob_scores(docs).collect()
    }
    # model: N=9 tokens, V=5 distinct (the,cat,sat,xylo,qwerty); c(the)=5
    n, v, k = 9.0, 5.0, 0.5
    lp = lambda c: math.log((c + k) / (n + k * v))
    assert got[0] == (4, round(lp(5), 6))
    assert got[1][0] == 3
    assert abs(got[1][1] - round((lp(5) + lp(1) + lp(1)) / 3, 6)) <= 1e-6
    assert got[0][1] > got[1][1] > got[2][1]  # common > mixed > hapax


def test_stratified_sample_deterministic_and_rate_shaped(spark, sf_dir):
    """Membership is a pure function of (id, seed): identical under any
    partition layout, disjoint seeds differ, per-stratum rates order
    the kept fractions."""
    from sotohp_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rates = {"en": 0.8, "zh": 0.2}
    a = {r["doc_id"] for r in stratified_sample(docs, "lang", rates).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(17), "lang", rates
        ).collect()
    }
    assert a == b and a  # layout-independent
    c = {
        r["doc_id"]
        for r in stratified_sample(docs, "lang", rates, seed=7).collect()
    }
    assert c != a  # seed changes the draw
    kept = stratified_sample(docs, "lang", rates).groupBy("lang").count().collect()
    kept = {r["lang"]: r["count"] for r in kept}
    tot = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert set(kept) <= {"en", "zh"}  # unlisted strata default to 0
    assert kept["en"] / tot["en"] > kept.get("zh", 0) / tot["zh"]


def test_temperature_mix_upweights_rare_sources(spark, sf_dir):
    from sotohp_spark.operators.sampling import temperature_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mixed = temperature_mix(docs, source_col="lang", alpha=0.5,
                            budget_frac=0.5)
    kept = {r["lang"]: r["count"]
            for r in mixed.groupBy("lang").count().collect()}
    tot = {r["lang"]: r["count"]
           for r in docs.groupBy("lang").count().collect()}
    # rare languages keep a HIGHER fraction than the dominant one
    # (n^0.5 shares), and the overall budget lands near 50%
    rare = min(tot, key=tot.get)
    dominant = max(tot, key=tot.get)
    assert kept[rare] / tot[rare] > kept[dominant] / tot[dominant]
    frac = sum(kept.values()) / sum(tot.values())
    assert 0.35 < frac < 0.65
    # layout independence: same membership after a repartition
    again = {r["doc_id"] for r in temperature_mix(
        docs.repartition(13), source_col="lang", alpha=0.5,
        budget_frac=0.5).select("doc_id").collect()}
    assert again == {r["doc_id"] for r in mixed.select("doc_id").collect()}
    # alpha=1 keeps the natural mixture: every rate == budget_frac
    nat = temperature_mix(docs, source_col="lang", alpha=1.0,
                          budget_frac=0.5)
    kept1 = {r["lang"]: r["count"]
             for r in nat.groupBy("lang").count().collect()}
    for lang in tot:
        assert abs(kept1[lang] / tot[lang] - 0.5) < 0.2
