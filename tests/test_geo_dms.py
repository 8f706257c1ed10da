"""F4 DMS->decimal geo parsing: behavior parity with the reference's
own table-driven spec (LocationSpec.scala:14-33 — the exact inputs and
expected decimal degrees), plus quarantine-null on invalid specs."""

import math

import pytest

from pyspark.sql import functions as F

from sotohp_spark.functions.geo import dms_to_decimal

# the reference's latitude test table, verbatim values
LAT_CASES = [
    ("1° 00′ 0″ N", 1.0),
    ("0° 06′ 0″ N", 0.1),
    ("0° 00′ 36″ N", 0.01),
    ("0° 00′ 0.036″ N", 9.999999999999999e-6),
    ("3°58'24\" S", -3.9733333333333336),
    ("03°58'24\" S", -3.9733333333333336),
    ("3° 58'  24\"  S", -3.9733333333333336),
    ("3° 58'  24''  S", -3.9733333333333336),
    ("3° 58'  24″  S", -3.9733333333333336),
    ("3° 58′  24′′  S", -3.9733333333333336),
    # comma decimal separator normalizes to dot
    ("0° 00′ 0,036″ N", 9.999999999999999e-6),
]

LON_CASES = [
    ("30° 15' 50\" E", 30.26388888888889),
    ("30° 15' 50″ E", 30.26388888888889),
    ("30° 15' 50'' E", 30.26388888888889),
    ("77° 00′ 32″ W", -77.00888888888889),
]

INVALID = [
    "not a location",
    "3°58'24\"",        # missing hemisphere
    "3°58'24\" Q",      # bad hemisphere
    "3°58'24\" E",      # longitude ref on a latitude parse
    "58'24\" S",        # missing degrees
    "",
]


def _parse(spark, specs, kind):
    df = spark.createDataFrame([(s,) for s in specs], "spec string")
    return [
        r["dd"]
        for r in df.select(dms_to_decimal(F.col("spec"), kind).alias("dd"))
        .collect()
    ]


def test_latitude_table_matches_reference(spark):
    got = _parse(spark, [s for s, _ in LAT_CASES], "lat")
    for (spec, want), g in zip(LAT_CASES, got):
        assert g is not None and math.isclose(g, want, rel_tol=0, abs_tol=1e-12), (
            spec, g, want
        )


def test_longitude_table_matches_reference(spark):
    got = _parse(spark, [s for s, _ in LON_CASES], "lon")
    for (spec, want), g in zip(LON_CASES, got):
        assert g is not None and math.isclose(g, want, rel_tol=0, abs_tol=1e-12), (
            spec, g, want
        )


def test_invalid_specs_quarantine_to_null(spark):
    got = _parse(spark, INVALID, "lat")
    assert all(g is None for g in got), got


def test_compose_parse_roundtrip_property(spark):
    """Property: any (d, m, s, ref, dialect) composed into a spec
    parses back to exactly d + m/60 + s/3600 with the hemisphere sign —
    one batched Spark job over a hypothesis-style grid (deterministic
    enumeration; per-example Spark jobs would take minutes)."""
    cases = []
    for d in (0, 1, 45, 89):
        for m in (0, 7, 59):
            for s, s_txt in ((0.0, "0"), (30.5, "30.5"), (59.999, "59.999")):
                for ref in ("N", "S"):
                    for q_min, q_sec in (("'", '"'), ("′", "″"), ("'", "''")):
                        spec = f"{d}° {m}{q_min} {s_txt}{q_sec} {ref}"
                        want = d + m / 60 + s / 3600
                        cases.append((spec, want if ref == "N" else -want))
    got = _parse(spark, [c[0] for c in cases], "lat")
    for (spec, want), g in zip(cases, got):
        assert g is not None and math.isclose(
            g, want, rel_tol=0, abs_tol=1e-9
        ), (spec, g, want)
