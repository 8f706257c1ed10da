"""Generic analytics operators — the reference's non-search query
surface (SURVEY §2.2-2.8) re-expressed as idiomatic DataFrame plans
over the star-schema testdata.  Each function is paired with an ANSI
SQL oracle in __spark_entry__.py.

Reference parity notes are in each docstring (file:line cites into
/root/reference)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- A2: single-pass multi-aggregate fold (Statistics.scala:48-136) ---

def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: the reference's Statistics fold (count, sums,
    conditional counts, min/max) as ONE groupBy().agg() — partial
    aggregation map-side, no second pass."""
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- J1/J2: lookup joins with broadcast dims (MediaServiceLive.scala:60-70) ---

def order_customer_nation(orders, customer, nation) -> DataFrame:
    """The reference's N+1 KV lookup joins become broadcast hash joins:
    dims (customer at this scale, nation always) are broadcast so the
    fact table never shuffles."""
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("order_count"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .orderBy("n_name")
    )


# --- J6: anti/semi join dedup (GoogleTakeoutTooling.scala:72-96) ---

def customers_without_orders(customer, orders) -> DataFrame:
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def customers_with_orders_count(customer, orders) -> DataFrame:
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .agg(F.count("*").alias("n_customers"))
    )


# --- F13: composite signature key (GoogleTakeoutTooling.scala:49-66) ---

def order_signatures(orders) -> DataFrame:
    """concat_ws + coalesce + hash signature for dedup keys."""
    return orders.select(
        "o_orderkey",
        F.sha2(
            F.concat_ws(
                "|",
                F.col("o_custkey").cast("string"),
                F.coalesce(F.col("o_orderpriority"), F.lit("?")),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
            ),
            256,
        ).alias("signature"),
    )


# --- W1/W2: key-ordered navigation (MediaServiceLive.scala:114-216) ---

def event_navigation(events) -> DataFrame:
    """lead/lag over (ts, event_id) per user — the reference's
    first/next/previous/last stream walk as window functions."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.row_number().over(w).alias("position"),
    )


# --- W6: sessionization (takeWhile gap window, MediaServiceLive.scala:1416-1430) ---

def sessionize(events, gap_minutes: int = 30) -> DataFrame:
    """Session-gap sessionization: new session when ts - lag(ts) > gap;
    session id = cumulative sum of boundaries. Two stacked windows on
    the same (user_id × ts) partitioning — one shuffle total."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts may be TIMESTAMP_NTZ (parquet) — route through timestamp_ltz
    # (session TZ pinned to UTC, so the mapping is the identity)
    ts_sec = F.col("ts").cast("timestamp").cast("long")
    gap = ts_sec - F.lag(ts_sec).over(w)
    with_flag = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return with_flag.withColumn("session_id", F.sum("new_session").over(w2))


def session_stats(events, gap_minutes: int = 30) -> DataFrame:
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


# --- J7: as-of join (locationInduction, MediaServiceLive.scala:1411-1454) ---

def asof_last_error(events) -> DataFrame:
    """For every event, the most recent prior 'error' event's id within
    the same user — the reference's walk-backwards-in-key-order
    nearest-neighbor join as last(..., ignorenulls) over a running
    window (one shuffle, no self-join)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(
            F.when(F.col("event_type") == "error", F.col("event_id")),
            ignorenulls=True,
        )
        .over(w)
        .alias("last_error_event_id"),
    )


# --- O3: top-k per group (FaceInference.scala:113-118) ---

def topk_orders_per_customer(orders, k: int = 3) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


# --- A2: histogram bucketing ((focal/10)*10, Statistics.scala:82-90) ---

def value_histogram(events, bucket: float = 10.0) -> DataFrame:
    return (
        events.groupBy(
            (F.floor(F.col("value") / bucket) * bucket).alias("bucket")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


# --- A1: keyword histogram / document-frequency (MediaServiceLive.scala:1678-1690) ---

def term_histogram(documents, min_count: int = 100) -> DataFrame:
    from sotohp_spark.operators.topk import simple_tokens

    return (
        documents.select(F.explode(simple_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("term").asc())
    )


# --- A2: duplicate detection by hash (Statistics.scala count-by-hash) ---

def duplicate_signatures(documents) -> DataFrame:
    return (
        documents.groupBy(F.md5(F.col("text")).alias("digest"))
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .orderBy(F.col("n").desc(), F.col("digest").asc())
    )


# --- J9: set-equality semi join (SearchForPeople.scala:34-51) ---

def users_with_exact_event_types(events, type_set: list) -> DataFrame:
    """Users whose distinct event-type set equals type_set exactly."""
    want = F.array(*[F.lit(t) for t in sorted(type_set)])
    return (
        events.groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
        .where(F.col("types") == want)
        .select("user_id")
        .orderBy("user_id")
    )


# --- P6: derived-column fallback chain (Media.scala:18-23,36-42) ---

def coalesced_event_value(events) -> DataFrame:
    """coalesce fallback chain + (0,0)-style null cleanup: value<=0 is
    treated as missing (the reference nulls out (0,0) GPS points)."""
    return events.select(
        "event_id",
        F.coalesce(
            F.when(F.col("value") > 0, F.col("value")),
            F.lit(-1.0),
        ).alias("value_or_default"),
    )


# --- W3/W4: positional access + seeded random select
# (originalIdByPosition / mediaGetAt + ApiApp.scala:804-814) ---

def every_nth_event(events, n: int = 1000) -> DataFrame:
    """Dense positional index + stride sample — the reference's
    originalIdByPosition O(1) access generalized.  Distributed: the
    position comes from the range-partition prefix-sum helper, never a
    single-task global window."""
    from sotohp_spark.operators.positional import with_global_position

    return (
        with_global_position(events, ["event_id"])
        .where(F.col("pos") % n == 0)
        .select("pos", "event_id", "user_id", "event_type")
    )


def lcg_positions(n_total: int, n_pick: int, seed: int) -> list:
    """Draw n_pick DISTINCT positions in [0, n_total) by iterating a
    Lehmer-style LCG (x = (48271*x + 12345) mod N; public constants
    from the minstd generator) past collisions — a strided draw
    silently returned FEWER than n_pick rows whenever positions
    collided.  The iteration cap (mirrored in the SQL oracle's
    recursive CTE) bounds the pathological short-cycle case; both
    sides then agree on the possibly-short result."""
    a, c = 48271, 12345
    x = seed % n_total
    seen: set = set()
    want = min(n_pick, n_total)
    for _ in range(100 * n_pick):
        x = (a * x + c) % n_total
        seen.add(x)
        if len(seen) >= want:
            break
    return sorted(seen)


def random_events(events, n_pick: int = 10, seed: int = 7) -> DataFrame:
    """Seeded uniform row selection — the reference's random pick via
    maxPosition (ApiApp.scala:804-814): draw k positions in [0, N)
    with a deterministic LCG and fetch them through the distributed
    positional index.  N is one count() scalar (the reference reads
    maxPosition driver-side the same way); everything else is a
    broadcast semi-join against the positional index."""
    n_total = events.count()
    picks = lcg_positions(n_total, n_pick, seed)
    pos_df = events.sparkSession.createDataFrame(
        [(p,) for p in picks], "pos long"
    )
    from sotohp_spark.operators.positional import with_global_position

    return (
        with_global_position(events, ["event_id"])
        .join(F.broadcast(pos_df), "pos")
        .select("pos", "event_id", "user_id", "event_type")
        .orderBy("pos")
    )
