"""Operator coverage batch 2 (SURVEY §2): geo distance, kNN consensus
classification, sliding windows, paged key-walk, scalar-function
parity ops.  All pure DataFrame plans with DuckDB oracles in
__spark_entry__.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0  # reference: Location.scala:53-70


def _deg2rad(c):
    return c * 3.141592653589793 / 180.0


def haversine_m(lat1, lon1, lat2, lon2):
    """Haversine distance in meters (R=6371000), pure column exprs —
    the reference's Location.distanceTo (Location.scala:53-70)."""
    dlat = _deg2rad(lat2 - lat1)
    dlon = _deg2rad(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(_deg2rad(lat1)) * F.cos(_deg2rad(lat2))
        * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def user_travel_distance(events: DataFrame) -> DataFrame:
    """Synthetic geo walk: each event gets a deterministic position
    derived from (user_id, event_id); total haversine distance between
    consecutive events per user (the locationInduction distance math,
    J7, applied through window navigation W1)."""
    pos = events.select(
        "user_id",
        "event_id",
        "ts",
        ((F.col("event_id") % 180) - 90 + (F.col("user_id") % 10) / 10.0).alias("lat"),
        ((F.col("event_id") % 360) - 180 + (F.col("user_id") % 7) / 7.0).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hop = pos.select(
        "user_id",
        haversine_m(
            F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
        ).alias("hop_m"),
    )
    return (
        hop.where(F.col("hop_m").isNotNull())
        .groupBy("user_id")
        .agg(F.round(F.sum("hop_m") / 1000.0, 3).alias("travel_km"))
        .orderBy("user_id")
    )


def knn_consensus_classify(embeddings: DataFrame, k: int = 2) -> DataFrame:
    """FaceInference parity (J8+A4, FaceInference.scala:92-154): for
    every vector, take its k nearest labeled neighbors (cosine,
    excluding itself); accept a predicted label only when ALL k agree
    (the reference's top-2 consensus vote).  Exact small-scale path:
    self-join + per-row top-k window; the scale path swaps the join
    for the LSH bucketing in ann.py."""
    from sotohp_spark.operators.ann import cosine_sim

    e = embeddings.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").alias("vec"),
        F.col("label").alias("lbl"),
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(b, F.col("a.vid") != F.col("b.vid")).select(
        F.col("a.vid").alias("vid"),
        F.col("b.vid").alias("nbr"),
        F.col("b.lbl").alias("nbr_label"),
        F.round(cosine_sim(F.col("a.vec"), F.col("b.vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("vid").orderBy(F.col("cos_sim").desc(), F.col("nbr").asc())
    topk = pairs.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
    return (
        topk.groupBy("vid")
        .agg(
            F.countDistinct("nbr_label").alias("n_labels"),
            F.min("nbr_label").alias("label_pred"),
            F.round(F.max("cos_sim"), 6).alias("best_sim"),
        )
        .select(
            "vid",
            F.when(F.col("n_labels") == 1, F.col("label_pred")).alias("consensus_label"),
            "best_sim",
        )
        .orderBy("vid")
    )


def sliding_window_avg(events: DataFrame, before: int = 2, after: int = 2) -> DataFrame:
    """W5: centered rows-window aggregate (PlacesFix sliding windows)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-before, after)
    )
    return events.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("smoothed_value"),
        F.count("*").over(w).alias("window_n"),
    )


def paged_walk(events: DataFrame, after_event_id: int, limit: int = 50) -> DataFrame:
    """W2: keyset pagination — from an exclusive cursor in key order,
    next `limit` rows (the reference's mediaStream paged walk,
    MediaServiceLive.scala:183-216; limit cap ApiApp.scala:749-752)."""
    limit = min(limit, 200)  # the reference's HTTP cap
    return (
        events.where(F.col("event_id") > after_event_id)
        .orderBy("event_id")
        .limit(limit)
        .select("event_id", "user_id", "event_type", "ts")
    )


def month_diff_buckets(orders: DataFrame) -> DataFrame:
    """F10: calendar month arithmetic (Statistics.scala:143-146) —
    whole-month difference from a fixed epoch, bucketed."""
    months = (F.year("o_orderdate") - 1995) * 12 + (F.month("o_orderdate") - 1)
    return (
        orders.groupBy(months.alias("months_since_1995"))
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total"))
        .orderBy("months_since_1995")
    )


def display_format(events: DataFrame) -> DataFrame:
    """F11: display formatting (package.scala:548-582 `F%.1f` etc.)."""
    return events.select(
        "event_id",
        F.format_string("V%.2f", F.col("value")).alias("value_display"),
        F.format_string("%05d/%s", F.col("user_id"), F.col("event_type")).alias(
            "key_display"
        ),
    )


def json_extract_props(events: DataFrame) -> DataFrame:
    """F12: JSON decode of the props column (service/json codecs)."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


def regex_mask_filter(
    documents: DataFrame, include: str = "^src[0-3]$", ignore: str = "^src2$"
) -> DataFrame:
    """P3: include/ignore regex masks (FileSystemSearch.scala:56-77,
    masks package.scala:408-433) applied to the source column."""
    return (
        documents.where(F.col("source").rlike(include))
        .where(~F.col("source").rlike(ignore))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source")
    )


def parse_quarantine(events: DataFrame) -> DataFrame:
    """F3: datetime parse with bad-value quarantine (the reference
    parses EXIF datetimes, filters known-bad sentinel values, and
    normalizes to UTC — OriginalBuilder.scala:93-122).  A deterministic
    share of rows carries an unparseable string; try_to_timestamp sends
    them to the quarantine count instead of failing the job."""
    raw = events.select(
        "event_id",
        F.when(F.col("event_id") % 50 == 0, F.lit("not a date"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .alias("date_str"),
    )
    parsed = raw.select(
        "event_id",
        F.try_to_timestamp(F.col("date_str"), F.lit("yyyy-MM-dd HH:mm:ss")).alias(
            "parsed_ts"
        ),
    )
    return parsed.agg(
        F.count("*").alias("n_rows"),
        F.count("parsed_ts").alias("n_parsed"),
        (F.count("*") - F.count("parsed_ts")).alias("n_quarantined"),
        F.min("parsed_ts").alias("min_ts"),
        F.max("parsed_ts").alias("max_ts"),
    )


def event_type_set_ops(events: DataFrame) -> DataFrame:
    """U1/U3/U4: array set algebra per user — union with a fixed set,
    distinct flatten, removal (the reference's keyword-set union
    Media.scala:32, set predicates, faceIds diff on delete)."""
    fixed = F.array(F.lit("alert"), F.lit("click"))
    per_user = events.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    # arrays flattened to '|'-joined strings: scalar outputs compare
    # cleanly across engines (and the driver's value-hash)
    return per_user.select(
        "user_id",
        F.concat_ws("|", F.array_sort(F.array_union("types", fixed))).alias(
            "types_union"
        ),
        F.concat_ws("|", F.array_sort(F.array_intersect("types", fixed))).alias(
            "types_inter"
        ),
        F.concat_ws("|", F.array_sort(F.array_remove("types", "click"))).alias(
            "types_minus_click"
        ),
        F.size("types").alias("n_types"),
    ).orderBy("user_id")


def search_doc_assembly(orders, customer, nation, region, lineitem) -> DataFrame:
    """J3: the reference's search-document assembly is a 6-way join of
    processor outputs into one flat denormalized doc
    (SaoMedia.scala:51-98, MediaServiceLive.scala:1456-1475).  Same
    shape here: fact enriched by three broadcast dims + one aggregated
    side — multi-way LEFT joins, flat output."""
    li = lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .join(li, orders.o_orderkey == li.l_orderkey, "left")
        .select(
            "o_orderkey",
            "c_name",
            "n_name",
            "r_name",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        )
    )


def base64_keys(events: DataFrame, limit_id: int = 100) -> DataFrame:
    """F8: base64 key encode/decode round-trip (MediaAccessKey codec,
    package.scala:50-100)."""
    return (
        events.where(F.col("event_id") < limit_id)
        .select(
            "event_id",
            F.base64(
                F.concat_ws(":", F.col("user_id"), F.col("event_type")).cast("binary")
            ).alias("access_key"),
        )
        .orderBy("event_id")
    )
