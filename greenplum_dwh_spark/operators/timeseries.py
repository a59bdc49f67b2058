"""Time-series operator family over the ``events`` stream: calendar
spine generation + gap detection, forward-fill interpolation, exact
statistical moments, covariance components, and value histograms.

Reference analog: the fraud mart's temporal rules (Data_mart.sql
rules 3-4) reason over per-client event timelines with gaps; a
warehouse at 100 TB needs the same timeline algebra as reusable
operators.  All queries here are oracle-checked bit-exact against
DuckDB using the repo's parity rules (scaled-int sums, explicit casts,
unique window tiebreaks — see ``relational.py`` module docstring).

Scale notes per operator are inline; the common design point: every
query is one shuffle (a groupBy on the natural key) plus windowed or
generated work that stays partition-local, so the plans are linear in
input size and skew-bounded by the per-user event cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from greenplum_dwh_spark.sources.tpch import Tables


# ---------------------------------------------------------------------------
# Calendar-spine gap fill with forward-fill interpolation.
#
# Per user: hourly activity sums on a dense hour spine spanning the
# user's own [first, last] hour, gaps flagged and forward-filled with
# the most recent observed hour's sum.  The spine is generated
# per-user with sequence()+explode — generation is partition-local
# (no shuffle beyond the one hourly groupBy), and the row count is
# bounded by Σ_user span_hours, not users × global_span.  At 100 TB
# the same plan holds: the explode output feeds a window partitioned
# by the same key, so AQE coalesces and no second exchange appears.
def gapfill_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("hour"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    hourly = ev.groupBy("user_id", "hour").agg(
        F.sum("cents").alias("observed_cents"))
    span = ev.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    spine = span.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"))
    w = Window.partitionBy("user_id").orderBy("hour")
    return (spine.join(hourly, ["user_id", "hour"], "left")
            .select("user_id", "hour", "observed_cents",
                    F.last("observed_cents", ignorenulls=True).over(w)
                    .alias("filled_cents"),
                    F.col("observed_cents").isNull().alias("is_gap")))


# ---------------------------------------------------------------------------
# Exact statistical moments per group: count / sum / sum-of-squares /
# min / max as scaled int64 (order-independent, mergeable — the same
# partial-aggregate shape a 1000-executor map-side combine produces),
# plus the mean as one double division of exact ingredients.
# sum(cents²) ≤ n·(maxcents)² ≈ 2.4e9·n — int64-safe through sf100;
# production note: promote to decimal(38,0) beyond ~1e9 rows/group.
def stats_moments_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    return (t.events.select("event_type", cents.alias("cents"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("cents").alias("sum_cents"),
                 F.sum(F.col("cents") * F.col("cents")).alias("sum_sq_cents"),
                 F.min("cents").alias("min_cents"),
                 F.max("cents").alias("max_cents"))
            .withColumn("mean_value",
                        (F.col("sum_cents").cast("double") / 100.0)
                        / F.col("n")))


# ---------------------------------------------------------------------------
# Covariance / regression components per group, exact.  x = seconds
# since 2024-01-01 (re-based so Σxy fits int64 at sf1 and beyond:
# x ≤ 2.6e6, y ≤ 4.9e4 ⇒ xy ≤ 1.3e11, int64-safe to ~7e7 rows/group),
# y = value cents.  Slope/intercept/correlation are one further
# arithmetic step from these five sums — emitting the exact sums keeps
# the oracle bit-exact and the aggregate mergeable across executors.
def covar_components_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    x = (F.unix_timestamp("ts")
         - F.unix_timestamp(F.lit("2024-01-01 00:00:00"))).cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    return (t.events.select("event_type", x.alias("x"), y.alias("y"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("x").alias("sum_x"),
                 F.sum("y").alias("sum_y"),
                 F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
                 F.sum(F.col("x") * F.col("x")).alias("sum_xx")))


# ---------------------------------------------------------------------------
# Equi-width histogram via integer binning (width_bucket shape without
# engine-specific bucket edge semantics): one groupBy on the derived
# bin key — a single shuffle whose key count is the bin count, so the
# reduce side is tiny no matter the input scale.
def histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (t.orders
            .select(F.floor(F.col("o_totalprice") / 25000).cast("long")
                    .alias("bin"),
                    F.round(F.col("o_totalprice") * 100).cast("long")
                    .alias("cents"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 (F.sum("cents").cast("double") / 100.0)
                 .alias("sum_totalprice"))
            .withColumn("bin_lo", (F.col("bin") * 25000).cast("double"))
            .withColumn("bin_hi", ((F.col("bin") + 1) * 25000)
                        .cast("double")))


# ---------------------------------------------------------------------------
# Quantile-fence (IQR) outlier detection per group — the classic
# robust-statistics filter a curation pipeline runs on numeric
# telemetry.  Per-group quantiles reduce to a handful of rows, so the
# join back to the fact side is a broadcast at any input scale; the
# fence comparison is identical double arithmetic in both engines
# (quantile_cont ≡ Spark percentile, proven bit-exact by
# percentile_prices).
def outlier_iqr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    fences = (t.events.groupBy("event_type")
              .agg(F.expr("percentile(value, 0.25)").alias("q1"),
                   F.expr("percentile(value, 0.75)").alias("q3"))
              .withColumn("hi_fence",
                          F.col("q3")
                          + 1.5 * (F.col("q3") - F.col("q1"))))
    return (t.events.join(F.broadcast(fences), "event_type")
            .filter(F.col("value") > F.col("hi_fence"))
            .select("event_type", "event_id", "value", "hi_fence"))


# ---------------------------------------------------------------------------
# OHLC resampling (downsample a value stream to per-user hourly
# open/high/low/close/volume bars) — the canonical time-series
# compaction.  open/close are selected by row_number over (ts,
# event_id) — a *unique* ordering, so the result is deterministic
# under any partitioning (min_by/max_by on ts alone would tie-break
# arbitrarily).  Both windows share one hash partition on (user_id,
# hour); the groupBy that follows re-uses the same key, so the whole
# query is a single exchange plus two partition-local sorts.  Bars
# per group are bounded by events-per-user-hour — skew-bounded the
# same way the gapfill spine is.
def resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "user_id", F.date_trunc("hour", "ts").alias("hour"),
        "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    wf = Window.partitionBy("user_id", "hour").orderBy("ts", "event_id")
    wl = Window.partitionBy("user_id", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    rk = ev.select(
        "*",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"))
    return (rk.groupBy("user_id", "hour")
            .agg(F.max(F.when(F.col("rf") == 1, F.col("cents")))
                 .alias("open_cents"),
                 F.max(F.when(F.col("rl") == 1, F.col("cents")))
                 .alias("close_cents"),
                 F.min("cents").alias("low_cents"),
                 F.max("cents").alias("high_cents"),
                 F.sum("cents").alias("vol_cents"),
                 F.count(F.lit(1)).alias("n_events")))


# ---------------------------------------------------------------------------
# Cumulative distinct users per day ("running uniques") — the window
# idiom COUNT(DISTINCT) OVER cannot express in either engine.  The
# scalable formulation: a user contributes exactly once, on their
# FIRST active day, so the cumulative distinct count at day d is the
# running sum of first-day counts.  Two small aggregations (per-user
# min day ≤ users rows; per-day firsts ≤ days rows) and one running
# window over the day spine — versus the naive per-day re-count whose
# work is Σ_d |users through d| (quadratic in the time span).  The
# left join keeps every ACTIVE day on the spine, including days that
# added no new users.
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", F.to_date("ts").alias("day"))
    first_day = (ev.groupBy("user_id")
                 .agg(F.min("day").alias("day"))
                 .groupBy("day")
                 .agg(F.count(F.lit(1)).alias("new_users")))
    days = ev.select("day").distinct()
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (days.join(first_day, "day", "left")
            # day is emitted as its ISO string: a raw DATE column
            # round-trips differently through the two engines' pandas
            # bridges (date vs midnight timestamp)
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    F.coalesce("new_users", F.lit(0)).alias("new_users"),
                    F.sum(F.coalesce("new_users", F.lit(0))).over(w)
                    .alias("cum_users")))


# The streaming-rollup twin (round 9): the incremental form a
# continuous "running uniques" dashboard maintains.  A streaming
# maintainer cannot re-scan history per batch — it appends each
# batch's PARTIAL first-seen index (user_id, min day within the
# batch) and merges on read, exactly the HourlyRollup recipe
# (`rollup_store.py`) applied to a MIN aggregate: first-seen is
# algebraic (min of per-batch mins IS the global min), so partials
# merge exactly regardless of how rows split across batches — unlike
# a COUNT DISTINCT, which is why the index stores per-user state and
# not per-day counts.  The query expresses one maintenance cycle as
# a batch plan: three disjoint event slices (stand-ins for arrival
# batches; pmod, NOT time slices, to pin order-independence) each
# aggregate to a per-user partial, the union merges to the global
# first-day index, and the daily rollup + running window finish it.
# Must equal the serial single-scan oracle bit-for-bit.
def cumulative_users_rollup_merge(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_id",
                         F.to_date("ts").alias("day"))
    parts = None
    for i in range(3):
        p = (ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i)
             .groupBy("user_id")
             .agg(F.min("day").alias("day")))
        parts = p if parts is None else parts.unionByName(p)
    first_day = (parts.groupBy("user_id")
                 .agg(F.min("day").alias("day"))
                 .groupBy("day")
                 .agg(F.count(F.lit(1)).alias("new_users")))
    days = ev.select("day").distinct()
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (days.join(first_day, "day", "left")
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    F.coalesce("new_users", F.lit(0)).alias("new_users"),
                    F.sum(F.coalesce("new_users", F.lit(0))).over(w)
                    .alias("cum_users")))


# ---------------------------------------------------------------------------
# Point-in-time (as-of) dimension lookup — the join SCD2 exists for:
# attach to each fact row the dimension version that was valid AT the
# fact's event time.  The version table here is derived from orders
# (each order is a "version" of the customer valid from its order
# date until the next one), probed by lineitem ship dates.
#
# The implementation is the UNION-window formulation, the 100 TB-safe
# as-of shape: version rows and fact rows are unioned, sorted within
# each key by (date, version-before-fact on ties), and a running
# `last(ignorenulls)` carries the newest version forward onto every
# fact row.  Cost: ONE shuffle on the key and a partition-local sort —
# versus the interval-join formulation, whose candidate set is
# Σ_key facts·versions and which needs a dedup-by-rank afterwards.
# (The oracle deliberately uses that interval+rank formulation, so
# the two independent algorithms check each other.)
def asof_join(facts: DataFrame, versions: DataFrame, key: str,
              fact_time: str, version_time: str,
              version_tiebreak: str) -> DataFrame:
    """Generic keyed as-of join: attach to every fact row the latest
    version row (same ``key``) whose ``version_time`` is ≤ the fact's
    ``fact_time`` — the SCD2 point-in-time lookup as a reusable verb.

    Union-window formulation: version and fact rows are unioned,
    sorted per key by (time, versions-before-facts on ties,
    ``version_tiebreak``), and a running ``last(ignorenulls)`` carries
    the newest version struct onto each fact row.  ONE shuffle on the
    key + a partition-local sort, versus the interval-join
    formulation's Σ_key facts·versions candidate set.  Among same-time
    versions the max ``version_tiebreak`` wins.

    Column contract: ``facts`` and ``versions`` share ONLY ``key``;
    output = all fact columns + every version column (nullable when
    no version is early enough)."""
    vcols = [c for c in versions.columns if c != key]
    fcols = [c for c in facts.columns if c != key]
    overlap = set(vcols) & set(fcols)
    if overlap:
        raise ValueError(f"column collision beyond key: {overlap}")
    reserved = {"_t", "_tag", "_v", "_last"}
    clash = reserved & set(facts.columns) | reserved & set(versions.columns)
    if clash:
        raise ValueError(
            f"columns collide with asof_join internals: {clash}")
    # NULL times never match (ASOF convention, same as nearest_join):
    # an unfiltered NULL version_time would sort nulls-FIRST and be
    # carried onto every fact with no real earlier version; with the
    # filter, a NULL fact_time row's preceding frame holds no version
    # at all, so it comes back version-less automatically
    versions = versions.filter(F.col(version_time).isNotNull())
    vstruct = versions.select(
        F.struct(*vcols).alias("_v")).schema["_v"].dataType
    unioned = (versions.select(
                   key, F.col(version_time).alias("_t"),
                   F.lit(0).alias("_tag"),
                   F.struct(*vcols).alias("_v"),
                   *[F.lit(None).cast(facts.schema[c].dataType).alias(c)
                     for c in fcols])
               .unionByName(facts.select(
                   key, F.col(fact_time).alias("_t"),
                   F.lit(1).alias("_tag"),
                   F.lit(None).cast(vstruct).alias("_v"),
                   *fcols)))
    # versions (tag 0) sort before facts (tag 1) at the same time: a
    # version effective at t is visible to a fact at t
    w = (Window.partitionBy(key)
         .orderBy("_t", "_tag",
                  F.col(f"_v.{version_tiebreak}").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn(
        "_last", F.last("_v", ignorenulls=True).over(w))
    return (carried.filter(F.col("_tag") == 1)
            .select(key, *fcols,
                    *[F.col(f"_last.{c}").alias(c) for c in vcols]))


def pit_lookup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    facts = (t.lineitem
             .join(t.orders.select("o_orderkey", "o_custkey"),
                   t.lineitem.l_orderkey == F.col("o_orderkey"))
             .select(F.col("o_custkey").alias("custkey"),
                     "l_orderkey", "l_linenumber", "l_shipdate"))
    versions = t.orders.select(
        F.col("o_custkey").alias("custkey"),
        "o_orderdate",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"))
    return (asof_join(facts, versions, key="custkey",
                      fact_time="l_shipdate",
                      version_time="o_orderdate",
                      version_tiebreak="asof_orderkey")
            .select("l_orderkey", "l_linenumber", "custkey",
                    "l_shipdate", "asof_orderkey", "asof_totalprice"))


def nearest_join(facts: DataFrame, versions: DataFrame, key: str,
                 fact_time: str, version_time: str,
                 version_tiebreak: str) -> DataFrame:
    """Nearest-event as-of join: attach to every fact row the version
    row (same ``key``) whose ``version_time`` is CLOSEST to the
    fact's ``fact_time`` in either direction — the bidirectional
    member of the as-of family (:func:`asof_join` is backward-only).
    Sensor alignment, nearest-snapshot enrichment, label-to-feature
    time matching all need this shape.

    Same union-window plan as :func:`asof_join` — ONE shuffle on the
    key + one partition-local sort, shared by BOTH directions: the
    backward candidate is ``last(ignorenulls)`` over the preceding
    frame, the forward candidate ``first(ignorenulls)`` over the
    following frame (same sort order, so Spark sorts once), versus
    the interval-join formulation's per-key facts·versions candidate
    blow-up.  Deterministic resolution: smaller |Δt| wins, a tie
    prefers the backward (earlier) version; among same-time versions
    the backward pick is the max ``version_tiebreak``, the forward
    pick the min (first/last in one total order).

    Output: ``key``, all fact columns, the chosen version's columns,
    plus ``delta_us`` (signed microseconds version − fact, BIGINT)
    and ``direction`` ('backward' | 'forward', NULL when the key has
    no version at all).  NULL times never match: a version with NULL
    ``version_time`` is excluded, and a fact with NULL ``fact_time``
    comes back with NULL version columns/delta/direction — the ASOF
    convention and what the SQL oracle's range predicates do."""
    vcols = [c for c in versions.columns if c != key]
    fcols = [c for c in facts.columns if c != key]
    overlap = set(vcols) & set(fcols)
    if overlap:
        raise ValueError(f"column collision beyond key: {overlap}")
    reserved = {"_t", "_tag", "_v", "_tb", "_back", "_fwd", "_c",
                "delta_us", "direction"}  # last two: output columns
    clash = reserved & set(facts.columns) | reserved & set(versions.columns)
    if clash:
        raise ValueError(
            f"columns collide with nearest_join internals: {clash}")
    versions = versions.filter(F.col(version_time).isNotNull())
    vstruct = versions.select(
        F.struct(version_time, *[c for c in vcols if c != version_time])
        .alias("_v")).schema["_v"].dataType
    unioned = (versions.select(
                   key, F.col(version_time).alias("_t"),
                   F.lit(0).alias("_tag"),
                   F.struct(version_time,
                            *[c for c in vcols if c != version_time])
                   .alias("_v"),
                   *[F.lit(None).cast(facts.schema[c].dataType).alias(c)
                     for c in fcols])
               .unionByName(facts.select(
                   key, F.col(fact_time).alias("_t"),
                   F.lit(1).alias("_tag"),
                   F.lit(None).cast(vstruct).alias("_v"),
                   *fcols)))
    # the tiebreak is projected ONCE (_tb): ordering both windows by
    # the struct-field expression directly materializes it per window
    # under distinct attribute ids, which blocks CollapseWindow and
    # forces a second (redundant) Sort — with a shared column both
    # frames fuse into ONE Window node over ONE Sort
    unioned = unioned.withColumn(
        "_tb", F.col(f"_v.{version_tiebreak}"))
    order = ["_t", "_tag", F.col("_tb").asc_nulls_first()]
    w_back = (Window.partitionBy(key).orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_fwd = (Window.partitionBy(key).orderBy(*order)
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    carried = (unioned
               .withColumn("_back", F.last("_v", ignorenulls=True)
                           .over(w_back))
               .withColumn("_fwd", F.first("_v", ignorenulls=True)
                           .over(w_fwd)))
    # microsecond-exact deltas (unix_timestamp truncates to seconds,
    # which would mis-pick the direction on sub-second ties and break
    # oracle parity — DuckDB's epoch_us is the exact twin)
    usec = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    d_back = usec(F.col(f"_back.{version_time}")) - usec(F.col("_t"))
    d_fwd = usec(F.col(f"_fwd.{version_time}")) - usec(F.col("_t"))
    # backward wins ties (|d_back| ≤ d_fwd); NULL side never wins;
    # a NULL-time fact matches NOTHING (its row sorts nulls-first, so
    # _back is null but _fwd would otherwise grab the earliest version)
    null_fact = F.col("_t").isNull()
    pick_back = F.col("_fwd").isNull() | (
        F.col("_back").isNotNull() & (-d_back <= d_fwd))
    chosen = (F.when(null_fact, F.lit(None).cast(vstruct))
              .when(pick_back, F.col("_back")).otherwise(F.col("_fwd")))
    delta = F.when(null_fact, F.lit(None).cast("long")) \
        .when(pick_back, d_back).otherwise(d_fwd)
    direction = (F.when(chosen.isNull(),
                        F.lit(None).cast("string"))
                 .when(pick_back, "backward").otherwise("forward"))
    return (carried.filter(F.col("_tag") == 1)
            .select(key, *fcols, chosen.alias("_c"),
                    delta.cast("long").alias("delta_us"),
                    direction.alias("direction"))
            .select(key, *fcols,
                    *[F.col(f"_c.{c}").alias(c) for c in vcols],
                    "delta_us", "direction"))


def nearest_click_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest click (either direction) to every purchase, per user —
    the bidirectional twin of ``asof_last_click``."""
    t = Tables(spark, sf_dir)
    facts = (t.events.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("event_id").alias("purchase_id"),
                     F.col("ts").alias("purchase_ts")))
    versions = (t.events.filter(F.col("event_type") == "click")
                .select("user_id", F.col("ts").alias("click_ts"),
                        F.col("event_id").alias("click_id")))
    return nearest_join(facts, versions, key="user_id",
                        fact_time="purchase_ts",
                        version_time="click_ts",
                        version_tiebreak="click_id")


# ---------------------------------------------------------------------------
# Cohort retention: bucket users by first-active day (the cohort),
# then count how many are active again k days later — the canonical
# product/engagement matrix, and in a data-engine context the shape
# behind "days-since-ingest" freshness matrices.  Two aggregations:
# per-user first day (one shuffle on user), then (cohort, offset)
# counts over user-days (one shuffle on the pair).  distinct
# user-days first so multi-event days can't double-count; every count
# is exact.  Offsets beyond the corpus span simply don't appear.
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ud = (t.events
          .select("user_id", F.to_date("ts").alias("day"))
          .distinct())
    first = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (ud.join(first, "user_id")
            .select("cohort_day",
                    F.datediff("day", "cohort_day").alias("day_offset"))
            .groupBy("cohort_day", "day_offset")
            # ud is distinct user-days and a user has ONE cohort day,
            # so each user hits a (cohort, offset) cell at most once:
            # count(*) IS the distinct-user count
            .agg(F.count(F.lit(1)).alias("n_users"))
            .withColumn("day_offset",
                        F.col("day_offset").cast("int")))


QUERIES = {
    "retention_cohorts": retention_cohorts,
    "pit_lookup_orders": pit_lookup_orders,
    "nearest_click_event": nearest_click_event,
    "gapfill_forward_fill": gapfill_forward_fill,
    "resample_ohlc": resample_ohlc,
    "cumulative_distinct_users": cumulative_distinct_users,
    # round 9: the streaming-rollup twin — per-batch partial
    # first-seen indexes merged on read (MIN is algebraic), same
    # serial oracle
    "cumulative_users_rollup_merge": cumulative_users_rollup_merge,
    "stats_moments_events": stats_moments_events,
    "covar_components_events": covar_components_events,
    "histogram_orders": histogram_orders,
    "outlier_iqr_events": outlier_iqr_events,
}

#: shared by cumulative_distinct_users and its rollup-merge twin —
#: the serial single-scan formulation both plans must reproduce
_CUM_USERS_ORACLE = """
        WITH ev AS (SELECT user_id, ts::DATE AS day FROM events),
        fd AS (SELECT user_id, min(day) AS first_day
               FROM ev GROUP BY user_id),
        days AS (SELECT DISTINCT day FROM ev),
        newu AS (SELECT first_day AS day, count(*)::BIGINT AS new_users
                 FROM fd GROUP BY first_day)
        SELECT strftime(d.day, '%Y-%m-%d') AS day,
               coalesce(n.new_users, 0)::BIGINT AS new_users,
               (SELECT count(*) FROM fd
                WHERE fd.first_day <= d.day)::BIGINT AS cum_users
        FROM days d LEFT JOIN newu n ON d.day = n.day"""

ORACLES = {
    # backward pick = max (ts, id) among clicks ≤ t, forward pick =
    # min (ts, id) among clicks > t — exactly the union-window's
    # last/first in one total order; nearest = smaller |Δ| in
    # microseconds, tie → backward
    "nearest_click_event": """
        WITH p AS (SELECT user_id, event_id AS purchase_id,
                          ts AS purchase_ts
                   FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
              FROM events WHERE event_type = 'click'),
        j AS (
          SELECT p.*,
                 b.click_ts AS b_ts, b.click_id AS b_id,
                 f.click_ts AS f_ts, f.click_id AS f_id,
                 epoch_us(b.click_ts) - epoch_us(p.purchase_ts) AS db,
                 epoch_us(f.click_ts) - epoch_us(p.purchase_ts) AS df
          FROM p
          LEFT JOIN LATERAL (
            SELECT click_ts, click_id FROM c
            WHERE c.user_id = p.user_id
              AND c.click_ts <= p.purchase_ts
            ORDER BY c.click_ts DESC, c.click_id DESC LIMIT 1) b ON true
          LEFT JOIN LATERAL (
            SELECT click_ts, click_id FROM c
            WHERE c.user_id = p.user_id
              AND c.click_ts > p.purchase_ts
            ORDER BY c.click_ts ASC, c.click_id ASC LIMIT 1) f ON true)
        SELECT user_id, purchase_id, purchase_ts,
               CASE WHEN pick_back THEN b_ts ELSE f_ts END AS click_ts,
               CASE WHEN pick_back THEN b_id ELSE f_id END AS click_id,
               (CASE WHEN pick_back THEN db ELSE df END)::BIGINT
                   AS delta_us,
               CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
                    WHEN pick_back THEN 'backward'
                    ELSE 'forward' END AS direction
        FROM (SELECT *,
                     (f_ts IS NULL
                      OR (b_ts IS NOT NULL AND -db <= df)) AS pick_back
              FROM j)""",
    "retention_cohorts": """
        WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day
                    FROM events),
        first AS (SELECT user_id, min(day) AS cohort_day
                  FROM ud GROUP BY user_id)
        SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
               (ud.day - f.cohort_day)::INT AS day_offset,
               count(*)::BIGINT AS n_users
        FROM ud JOIN first f USING (user_id)
        GROUP BY 1, 2""",
    # independent formulation: interval join + per-fact rank (the
    # Spark side is the union-window carry — two different algorithms
    # for the same as-of semantics)
    "pit_lookup_orders": """
        WITH fm AS (SELECT o.o_custkey AS custkey, l.l_orderkey,
                           l.l_linenumber, l.l_shipdate
                    FROM lineitem l
                    JOIN orders o ON l.l_orderkey = o.o_orderkey),
        -- the synthetic lineitem is NOT unique on (orderkey,
        -- linenumber): resolve the as-of per DISTINCT fact tuple,
        -- then join back to restore the duplicate multiplicity
        f AS (SELECT DISTINCT * FROM fm),
        v AS (SELECT o_custkey AS custkey, o_orderdate, o_orderkey,
                     o_totalprice
              FROM orders),
        j AS (SELECT f.l_orderkey, f.l_linenumber, f.custkey,
                     f.l_shipdate, v.o_orderkey, v.o_totalprice,
                     row_number() OVER (
                         PARTITION BY f.custkey, f.l_orderkey,
                                      f.l_linenumber, f.l_shipdate
                         ORDER BY v.o_orderdate DESC,
                                  v.o_orderkey DESC) AS rn
              FROM f LEFT JOIN v
                ON v.custkey = f.custkey
               AND v.o_orderdate <= f.l_shipdate),
        res AS (SELECT * FROM j WHERE rn = 1)
        SELECT a.l_orderkey, a.l_linenumber, a.custkey, a.l_shipdate,
               a.o_orderkey AS asof_orderkey,
               a.o_totalprice AS asof_totalprice
        FROM res a JOIN fm USING (custkey, l_orderkey, l_linenumber,
                                   l_shipdate)""",
    # independent formulation: per-day count of users whose first
    # active day is <= d (correlated semantics, not the same plan)
    "cumulative_distinct_users": _CUM_USERS_ORACLE,
    # the rollup-merge decomposition is output-identical BY CONTRACT
    # (min of per-slice mins = global min) — same serial oracle, so
    # the driver proves the streaming maintenance algebra against
    # DuckDB directly
    "cumulative_users_rollup_merge": _CUM_USERS_ORACLE,
    "resample_ohlc": """
        WITH ev AS (
          SELECT user_id, date_trunc('hour', ts) AS hour, ts, event_id,
                 round(value * 100)::BIGINT AS cents
          FROM events),
        rk AS (
          SELECT *,
                 row_number() OVER (PARTITION BY user_id, hour
                     ORDER BY ts, event_id) AS rf,
                 row_number() OVER (PARTITION BY user_id, hour
                     ORDER BY ts DESC, event_id DESC) AS rl
          FROM ev)
        SELECT user_id, hour,
               max(CASE WHEN rf = 1 THEN cents END)::BIGINT AS open_cents,
               max(CASE WHEN rl = 1 THEN cents END)::BIGINT AS close_cents,
               min(cents) AS low_cents, max(cents) AS high_cents,
               sum(cents)::BIGINT AS vol_cents, count(*) AS n_events
        FROM rk GROUP BY user_id, hour""",
    "gapfill_forward_fill": """
        WITH ev AS (
          SELECT user_id, date_trunc('hour', ts) AS hour,
                 round(value * 100)::BIGINT AS cents
          FROM events),
        hourly AS (
          SELECT user_id, hour, sum(cents)::BIGINT AS observed_cents
          FROM ev GROUP BY user_id, hour),
        span AS (
          SELECT user_id, min(hour) AS h0, max(hour) AS h1
          FROM ev GROUP BY user_id),
        spine AS (
          SELECT user_id,
                 unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM span)
        SELECT s.user_id, s.hour, h.observed_cents,
               last_value(h.observed_cents IGNORE NULLS)
                   OVER (PARTITION BY s.user_id ORDER BY s.hour)
                   AS filled_cents,
               (h.observed_cents IS NULL) AS is_gap
        FROM spine s
        LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour""",
    "stats_moments_events": """
        WITH ev AS (SELECT event_type, round(value * 100)::BIGINT AS cents
                    FROM events)
        SELECT event_type,
               count(*) AS n,
               sum(cents)::BIGINT AS sum_cents,
               sum(cents * cents)::BIGINT AS sum_sq_cents,
               min(cents) AS min_cents,
               max(cents) AS max_cents,
               (sum(cents)::BIGINT::DOUBLE / 100.0) / count(*) AS mean_value
        FROM ev GROUP BY event_type""",
    "covar_components_events": """
        WITH ev AS (
          SELECT event_type,
                 (floor(epoch(ts))::BIGINT
                  - floor(epoch(TIMESTAMP '2024-01-01 00:00:00'))::BIGINT)
                     AS x,
                 round(value * 100)::BIGINT AS y
          FROM events)
        SELECT event_type, count(*) AS n,
               sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y,
               sum(x * y)::BIGINT AS sum_xy, sum(x * x)::BIGINT AS sum_xx
        FROM ev GROUP BY event_type""",
    "histogram_orders": """
        WITH o AS (SELECT floor(o_totalprice / 25000)::BIGINT AS bin,
                          round(o_totalprice * 100)::BIGINT AS cents
                   FROM orders)
        SELECT bin, count(*) AS n_orders,
               sum(cents)::BIGINT::DOUBLE / 100.0 AS sum_totalprice,
               (bin * 25000)::DOUBLE AS bin_lo,
               ((bin + 1) * 25000)::DOUBLE AS bin_hi
        FROM o GROUP BY bin""",
    "outlier_iqr_events": """
        WITH f AS (
          SELECT event_type,
                 quantile_cont(value, 0.25) AS q1,
                 quantile_cont(value, 0.75) AS q3
          FROM events GROUP BY event_type),
        g AS (SELECT event_type,
                     q3 + 1.5 * (q3 - q1) AS hi_fence FROM f)
        SELECT e.event_type, e.event_id, e.value, g.hi_fence
        FROM events e JOIN g ON e.event_type = g.event_type
        WHERE e.value > g.hi_fence""",
}
