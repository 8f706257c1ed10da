"""Geo-encoded secondary index (operators/geoindex.py): geo_distance /
geo_bounding_box filters over a grid-partitioned parquet index —
exact-membership vs a brute haversine oracle, and the partition-pruned
plan asserted like a result.  Reference: the geo index the reference
maintains over media locations (MediaServiceLive.scala:1811,1827)."""

import math
import re

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from sotohp_spark.operators import geoindex
from sotohp_spark.plans.checks import formatted_plan


def _brute_haversine(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
        * math.sin(dlon / 2) ** 2
    )
    return 2.0 * 6371000.0 * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def geo_idx(spark, tmp_path_factory):
    rng = np.random.default_rng(7)
    n = 4000
    pdf = pd.DataFrame(
        {
            "pid": np.arange(n, dtype=np.int64),
            "lat": rng.uniform(-89.9, 89.9, n),
            "lon": rng.uniform(-180.0, 180.0, n),
        }
    )
    path = str(tmp_path_factory.mktemp("geo") / "idx")
    geoindex.build_geo_index(spark.createDataFrame(pdf), path)
    return path, pdf


def test_geo_distance_exact_membership(spark, geo_idx):
    path, pdf = geo_idx
    for (lat, lon, r) in [
        (40.0, -74.0, 500_000.0),
        (-33.9, 151.2, 1_000_000.0),
        (0.0, 0.0, 250_000.0),
        (85.0, 10.0, 400_000.0),   # near-polar: lon band degrades wide
        (10.0, 179.8, 300_000.0),  # antimeridian: falls back to full lon
    ]:
        got = {
            int(row["pid"]): row["dist_m"]
            for row in geoindex.geo_distance(
                spark, path, lat, lon, r
            ).collect()
        }
        want = {
            int(p.pid): _brute_haversine(lat, lon, p.lat, p.lon)
            for p in pdf.itertuples()
            if _brute_haversine(lat, lon, p.lat, p.lon) <= r
        }
        assert set(got) == set(want), (lat, lon, r)
        for pid in got:
            assert abs(got[pid] - want[pid]) < 1e-3


def test_geo_bbox_exact_membership(spark, geo_idx):
    path, pdf = geo_idx
    lat0, lat1, lon0, lon1 = 10.0, 35.0, -120.0, -80.0
    got = {
        int(r["pid"])
        for r in geoindex.geo_bbox(
            spark, path, lat0, lat1, lon0, lon1
        ).collect()
    }
    want = {
        int(p.pid)
        for p in pdf.itertuples()
        if lat0 <= p.lat <= lat1 and lon0 <= p.lon <= lon1
    }
    assert got == want and got


def test_geo_scan_is_partition_pruned(spark, geo_idx):
    """The covering-tile predicate must land as a PARTITION filter on
    geo_bucket (hive pruning: untouched tiles never read) and the
    lat/lon band as pushed data filters; no Python UDF anywhere."""
    path, _ = geo_idx
    df = geoindex.geo_distance(spark, path, 40.0, -74.0, 200_000.0)
    plan = formatted_plan(df)
    pf = re.findall(r"PartitionFilters: \[(.*?)\]", plan)
    assert any(
        "geo_bucket" in f
        and any(op in f for op in (" = ", "INSET", " IN "))
        for f in pf
    ), plan
    assert "PushedFilters" in plan and "lat" in plan
    assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan
    # a 200 km radius at mid-latitude touches a handful of 10-degree
    # tiles — the INSET list must be small, not the whole grid
    inset = [f for f in pf if "geo_bucket" in f]
    assert inset and len(inset[0]) < 200, inset


def test_geo_grid_agg_counts(spark, geo_idx):
    """geohash_grid analog: per-1-degree-cell counts over a bbox equal
    a brute per-cell histogram; result bounded by the bbox cells."""
    path, pdf = geo_idx
    lat0, lat1, lon0, lon1 = -10.0, 30.0, 0.0, 60.0
    got = {
        int(r["cell_id"]): (int(r["cell_lat"]), int(r["cell_lon"]),
                            int(r["n"]))
        for r in geoindex.geo_grid_agg(
            spark, path, lat0, lat1, lon0, lon1
        ).collect()
    }
    want: dict = {}
    for p in pdf.itertuples():
        if lat0 <= p.lat <= lat1 and lon0 <= p.lon <= lon1:
            cl = min(int(math.floor(p.lat + 90)), 179)
            cn = min(int(math.floor(p.lon + 180)), 359)
            cid = cl * 360 + cn
            la, lo, n = want.get(cid, (cl - 90, cn - 180, 0))
            want[cid] = (la, lo, n + 1)
    assert got == want and got


def test_geo_distance_radius_zero_and_negative(spark, geo_idx):
    path, pdf = geo_idx
    p0 = pdf.iloc[0]
    got = geoindex.geo_distance(
        spark, path, float(p0.lat), float(p0.lon), 0.0
    ).collect()
    assert [int(r["pid"]) for r in got] == [int(p0.pid)]
    with pytest.raises(ValueError):
        geoindex.geo_distance(spark, path, 0.0, 0.0, -1.0)
