"""Bounded two-stage document materialization (SURVEY §7 hard-point 4).

Pins: (1) byte-identity of the two-stage concat with the single-stage
concat_ws semantics, including null/empty turns straddling chunk
boundaries; (2) a 100k-turn adversarial conversation materializes
(each stage-A group bounded by turn_chunk); (3) the max_turns cap
quarantines runaway conversations BEFORE stage B; (4) the physical
plan really has the two-exchange shape (conv_id+chunk, then conv_id).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from sotohp_spark.operators.docs import (
    build_documents,
    materialize_documents,
    quarantined_conversations,
)

TS = datetime.datetime(2025, 1, 1)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, text string"
    )


def _expected_text(texts_by_idx):
    # reference semantics: concat_ws(" ", texts sorted by turn_idx),
    # nulls skipped, empty strings kept
    return " ".join(
        t for _, t in sorted(texts_by_idx.items()) if t is not None
    )


def test_two_stage_parity_nulls_and_empties(spark):
    texts = {
        0: "alpha",
        1: None,       # null at a chunk head
        2: "",         # empty string must KEEP its separator slot
        3: "beta",
        4: None,
        5: None,       # chunk (4,5) is all-null -> contributes nothing
        6: "gamma",
        7: "",
    }
    rows = [
        ("c1", i, TS + datetime.timedelta(seconds=i), t)
        for i, t in texts.items()
    ]
    out = (
        materialize_documents(_turns(spark, rows), turn_chunk=2)
        .collect()[0]
    )
    assert out["doc_text"] == _expected_text(texts)
    assert out["n_turns"] == len(texts)
    assert out["doc_ts"] == TS


@pytest.mark.parametrize("chunk", [1, 3, 1024])
def test_chunk_size_invariance(spark, chunk):
    texts = {i: (None if i % 5 == 3 else f"w{i}") for i in range(40)}
    rows = [
        ("c1", i, TS + datetime.timedelta(seconds=i), t)
        for i, t in texts.items()
    ]
    out = materialize_documents(_turns(spark, rows), turn_chunk=chunk).collect()[0]
    assert out["doc_text"] == _expected_text(texts)


def test_adversarial_100k_turn_conversation(spark):
    n = 100_000
    turns = spark.range(n).select(
        F.lit("big").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        (F.lit(TS) + F.make_interval(secs=F.col("id"))).alias("ts"),
        F.concat(F.lit("w"), F.col("id")).alias("text"),
    )
    out = materialize_documents(turns).collect()[0]
    assert out["n_turns"] == n
    txt = out["doc_text"]
    assert txt.startswith("w0 w1 ")
    assert txt.endswith(f"w{n - 2} w{n - 1}")
    expected_len = sum(len(f"w{i}") for i in range(n)) + n - 1
    assert len(txt) == expected_len


def test_max_turns_cap_quarantines(spark):
    rows = [
        ("small", i, TS, f"s{i}") for i in range(3)
    ] + [
        ("runaway", i, TS, f"r{i}") for i in range(10)
    ]
    turns = _turns(spark, rows)
    docs = materialize_documents(turns, max_turns=5, turn_chunk=4)
    got = {r["conv_id"]: r for r in docs.collect()}
    assert set(got) == {"small"}
    assert got["small"]["doc_text"] == "s0 s1 s2"
    quar = quarantined_conversations(turns, max_turns=5).collect()
    assert [(r["conv_id"], r["n_turns"]) for r in quar] == [("runaway", 10)]
    # cap threads through build_documents
    built = build_documents(turns, num_ranges=2, max_turns=5)
    assert [r["conv_id"] for r in built.collect()] == ["small"]


def test_plan_has_two_stage_shape(spark):
    rows = [("c1", 0, TS, "x"), ("c1", 1, TS, "y")]
    plan = (
        materialize_documents(_turns(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    # stage A shuffles on (conv_id, _chunk); stage B on conv_id alone —
    # the single-stage shape (ONE exchange, no _chunk key) is the
    # regression this pins against
    assert any("_chunk" in ln for ln in exchanges), plan
    assert any(
        "conv_id" in ln and "_chunk" not in ln for ln in exchanges
    ), plan


# --- property-based parity with the single-stage reference semantics ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_text = st.one_of(
    st.none(),
    st.text(alphabet="ab ", min_size=0, max_size=6),
)
_conv = st.lists(_text, min_size=1, max_size=12)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(convs=st.lists(_conv, min_size=1, max_size=4),
       chunk=st.integers(min_value=1, max_value=5))
def test_property_two_stage_equals_reference(spark, convs, chunk):
    """For arbitrary null/empty/whitespace turn texts and arbitrary
    chunk sizes, the two-stage concat must equal the single-stage
    reference semantics computed in plain Python."""
    rows = []
    expect = {}
    for ci, texts in enumerate(convs):
        cid = f"c{ci}"
        rows += [
            (cid, i, TS + datetime.timedelta(seconds=i), t)
            for i, t in enumerate(texts)
        ]
        expect[cid] = (
            " ".join(t for t in texts if t is not None),
            len(texts),
        )
    out = materialize_documents(_turns(spark, rows), turn_chunk=chunk)
    got = {
        r["conv_id"]: (r["doc_text"], r["n_turns"]) for r in out.collect()
    }
    assert got == expect
