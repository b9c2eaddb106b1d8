"""Aggregate stage — A1-A13 of SURVEY.md §2.5, computed per sink.

All aggregates are single-pass hash aggregations with map-side partial
aggregation (Spark does partial/final automatically). The only special
handling is skew: group keys dominated by hot values (url/username
under Zipf traffic, category=success) go through an explicit two-phase
salted groupBy (see ``salted_topk``) — partials on (key, salt), final
on key — per the north rule.

Semantics parity (reference):
- totals:       StatisticsService.calculateRealTimeStats (java:75-165)
- status hist:  StatisticsService.java:99-123 (CASE buckets)
- hourly hist:  StatisticsService.java:126-143 (dense int[24])
- top urls:     PrecalculatedTopService.calculateTopUrls (java:102-145)
- top users:    PrecalculatedTopService.calculateTopUsers (java:148-195)
- ROUND(AVG()): Java Math.round == floor(x+0.5) — reproduced exactly
  (Spark's ROUND is HALF_UP which matches for positive averages).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logparser_spark.functions.classify import status_class_expr


def _round_java(c: Column) -> Column:
    """Math.round(double) for positive values: floor(x + 0.5) as long."""
    return F.floor(c + F.lit(0.5)).cast("long")


def sink_totals(df: DataFrame, approx_distinct: bool = False) -> DataFrame:
    """Per-category: A1 count, A2 errors, A3 distinct ip, A6 avg rt
    (rt>0 only), A7 bytes sum — one pass, one shuffle on category.

    ``approx_distinct`` swaps exact COUNT(DISTINCT ip) for HyperLogLog++
    (``approx_count_distinct``, default rsd 5%) — the documented knob
    for 10^12-row scale, where the exact distinct forces a per-category
    ip expansion. Tests pin the exact path; the approx path is asserted
    within tolerance."""
    distinct_ips = (
        F.approx_count_distinct("ip") if approx_distinct else F.countDistinct("ip")
    )
    return (
        df.groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.count(F.when(F.col("status_code") >= 400, 1)).alias("error_count"),
            distinct_ips.alias("unique_ips"),
            F.coalesce(F.sum("response_size_bytes"), F.lit(0)).alias("bytes_total"),
            F.coalesce(
                _round_java(F.avg(F.when(F.col("response_time_ms") > 0, F.col("response_time_ms")))),
                F.lit(0),
            ).alias("avg_response_time_ms"),
        )
        .orderBy("category")
    )


def status_hist(df: DataFrame) -> DataFrame:
    """A4: category × status_class counts (valid rows)."""
    return (
        df.filter(F.col("valid") == 1)
        .groupBy("category", status_class_expr(F.col("status_code")).alias("status_class"))
        .agg(F.count(F.lit(1)).alias("row_count"))
        .orderBy("category", "status_class")
    )


def hourly_hist(df: DataFrame) -> DataFrame:
    """A5: dense 24-slot histogram per category — SINGLE scan.

    The reference densifies app-side into int[24]
    (StatisticsService.java:126-143). A grid-join formulation would
    re-scan the fact to enumerate categories; instead densification
    happens on the (category, hour) aggregate itself: collapse each
    category's sparse counts into a map, then explode hours 0-23 against
    it. The second groupBy shuffles only #categories x 24 rows."""
    # UTC hour via epoch arithmetic, NOT F.hour(): hour()/date_format()
    # honor spark.sql.session.timeZone, so a consumer with an unpinned
    # session would bucket the same row differently than the UTC
    # contract (and than data written under a pinned session).
    # Floor-division form (div truncates toward zero): a pre-epoch
    # timestamp must bucket to 0..23, not a negative slot the dense
    # explode(0..23) would silently drop. (The pipeline's own parse
    # only admits unsigned epochs, but the operator is generic.)
    utc_hour = F.expr(
        "cast(pmod((unix_timestamp(time) - pmod(unix_timestamp(time), 3600))"
        " div 3600, 24) as int)"
    )
    counts = (
        df.filter(F.col("valid") == 1)
        .groupBy("category", utc_hour.alias("hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dense = counts.groupBy("category").agg(
        F.map_from_entries(F.collect_list(F.struct("hour", "cnt"))).alias("m")
    )
    return (
        dense.select(
            "category", "m", F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hour")
        )
        .select(
            "category",
            F.col("hour").cast("int").alias("hour"),
            F.coalesce(F.try_element_at("m", F.col("hour")), F.lit(0)).alias(
                "row_count"
            ),
        )
        .orderBy("category", "hour")
    )


def salted_topk(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    merge_aggs: list[Column],
    k: int,
    order_key: str,
    salt_buckets: int = 16,
    salt_src: str = "doc_id",
) -> DataFrame:
    """Two-phase salted groupBy + TakeOrderedAndProject.

    Phase 1 aggregates on (keys..., salt) — hot keys spread over
    ``salt_buckets`` reducers; phase 2 merges partials per key (input
    already tiny: #distinct_keys × salt_buckets). The final
    orderBy+limit compiles to TakeOrderedAndProject (no global sort).
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)))
    partial = salted.groupBy(*keys, "_salt").agg(*aggs)
    merged = partial.groupBy(*keys).agg(*merge_aggs)
    return merged.orderBy(F.desc("request_count"), F.asc(order_key)).limit(k)


def top_urls(df: DataFrame, k: int = 100, salted: bool = True) -> DataFrame:
    """A8 with pinned tie-break (count DESC, url ASC)."""
    base = df.filter(
        (F.col("valid") == 1) & F.col("url").isNotNull() & (F.col("url") != "-")
    )
    if not salted:
        return (
            base.groupBy("url", "domain")
            .agg(
                F.count(F.lit(1)).alias("request_count"),
                _round_java(F.avg("response_time_ms")).alias("avg_response_time"),
                F.sum("response_size_bytes").alias("total_bytes"),
                F.max("epoch_us").alias("last_access_us"),
            )
            .orderBy(F.desc("request_count"), F.asc("url"))
            .limit(k)
        )
    aggs = [
        F.count(F.lit(1)).alias("c"),
        F.sum("response_time_ms").alias("rt_sum"),
        F.sum("response_size_bytes").alias("b_sum"),
        F.max("epoch_us").alias("la"),
    ]
    merge = [
        F.sum("c").alias("request_count"),
        _round_java(F.sum("rt_sum") / F.sum("c")).alias("avg_response_time"),
        F.sum("b_sum").alias("total_bytes"),
        F.max("la").alias("last_access_us"),
    ]
    return salted_topk(base, ["url", "domain"], aggs, merge, k, "url")


def top_users(df: DataFrame, k: int = 10, salted: bool = True) -> DataFrame:
    """A9 with pinned tie-break (count DESC, username ASC).

    COUNT(DISTINCT ip) is exact: the salted partial keeps per-salt
    distinct ip sets collapsed via collect_set, merged and de-dup'd in
    the final phase (set sizes are bounded by the fixture's ip pool; at
    true 10^12 scale swap in approx_count_distinct — documented knob).
    """
    base = df.filter(
        (F.col("valid") == 1)
        & F.col("username").isNotNull()
        & (F.col("username") != "-")
    )
    if not salted:
        return (
            base.groupBy("username")
            .agg(
                F.min("ip").alias("min_ip"),
                F.count(F.lit(1)).alias("request_count"),
                F.countDistinct("ip").alias("unique_ips"),
                _round_java(F.avg("response_time_ms")).alias("avg_response_time"),
                F.sum("response_size_bytes").alias("total_bytes"),
                F.min("epoch_us").alias("first_seen_us"),
                F.max("epoch_us").alias("last_seen_us"),
            )
            .orderBy(F.desc("request_count"), F.asc("username"))
            .limit(k)
        )
    aggs = [
        F.min("ip").alias("mi"),
        F.count(F.lit(1)).alias("c"),
        F.collect_set("ip").alias("ips"),
        F.sum("response_time_ms").alias("rt_sum"),
        F.sum("response_size_bytes").alias("b_sum"),
        F.min("epoch_us").alias("fs"),
        F.max("epoch_us").alias("ls"),
    ]
    merge = [
        F.min("mi").alias("min_ip"),
        F.sum("c").alias("request_count"),
        F.size(F.array_distinct(F.flatten(F.collect_list("ips")))).cast("long").alias(
            "unique_ips"
        ),
        _round_java(F.sum("rt_sum") / F.sum("c")).alias("avg_response_time"),
        F.sum("b_sum").alias("total_bytes"),
        F.min("fs").alias("first_seen_us"),
        F.max("ls").alias("last_seen_us"),
    ]
    return salted_topk(base, ["username"], aggs, merge, k, "username")


def distinct_dims(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A11: dim tables populated from the fact (DatabaseManager.java:460-492).

    log_statuses: DISTINCT status_code WHERE NOT NULL AND > 0;
    log_actions:  DISTINCT action WHERE action != '-'.
    """
    statuses = (
        df.filter(F.col("status_code").isNotNull() & (F.col("status_code") > 0))
        .select("status_code")
        .distinct()
        .orderBy("status_code")
    )
    actions = (
        df.filter(F.col("action").isNotNull() & (F.col("action") != "-"))
        .select("action")
        .distinct()
        .orderBy("action")
    )
    return statuses, actions


def daily_rollup(df: DataFrame) -> DataFrame:
    """A12: the declared matview GROUP BY username, status_code, day
    (schema.sql:40-47)."""
    # UTC midnight via epoch arithmetic (date_trunc honors the session
    # timezone — see hourly_hist); floor-division form so pre-epoch
    # rows round DOWN to their own day, not up toward 1970-01-01
    utc_day = F.timestamp_seconds(
        F.expr("unix_timestamp(time) - pmod(unix_timestamp(time), 86400)")
    )
    return (
        df.filter(F.col("valid") == 1)
        .groupBy(
            "username",
            "status_code",
            utc_day.alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("request_count"))
    )


def dataset_period(df: DataFrame) -> DataFrame:
    """A10: MIN/MAX(time) (AggregatedStatsService.java:246-255)."""
    return df.filter(F.col("valid") == 1).agg(
        F.min("epoch_us").alias("min_time_us"), F.max("epoch_us").alias("max_time_us")
    )
