"""Event-log sessionization and funnel analysis over an events table
(event_id, ts, user_id, event_type, value, ...).

The crawl/serving side of a web-scale engine produces append-only event
logs (fetch logs, query logs, click logs); these operators are the standard
rollups a training-data pipeline runs over them:

  * ``sessionize``    — gap-based session assignment (a new session starts
    when the user's inter-event gap exceeds ``gap_seconds``)
  * ``session_stats`` — per-session rollup (event count, exact microsecond
    duration, exact DECIMAL value sum)
  * ``funnel``        — strictly-ordered conversion funnel (stage i+1 must
    happen AFTER the user's first stage-i event)

Physical shape / 100-TB notes:

  * ``sessionize`` is ONE user-keyed hash exchange: both window functions
    (the lag-gap flag and the running session counter / session-start row
    number) share the same partitioning+ordering, so Catalyst evaluates
    them in a single Window operator over a single shuffle — no global
    sort, no second exchange. Per-user state is the user's own history;
    the classic pathological-user skew (a bot with 10^8 events) is bounded
    upstream by per-user sampling, not here.
  * Timestamps are compared as ``unix_micros`` BIGINTs, so the gap test is
    exact integer arithmetic — bit-stable across engines (the DuckDB twin
    uses ``epoch_us``).
  * ``funnel`` is K conditional min-aggregates chained through user-keyed
    joins (K = number of stages, a small constant): each stage is one
    partial-aggregated exchange on user_id, never a self-join of the raw
    log against itself.

The reference (laurenleadbetter/Pagerank) has no event-log layer; these
extend the engine the same way the text operators do (textops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SECONDS = 30 * 60


def _us(col):
    """Microseconds-since-epoch BIGINT for TIMESTAMP or TIMESTAMP_NTZ input.
    The NTZ→TZ cast applies the session timezone, a constant offset that
    cancels in every gap/duration difference these operators compute (and
    the repo pins the session to UTC anyway)."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event session assignment: input columns plus

      * ``session_seq``     — 1-based session index within the user
      * ``idx_in_session``  — 1-based event index within the session

    A new session starts on the user's first event or when the gap from the
    previous event strictly exceeds ``gap_seconds``. Ordering within a user
    is (ts, event_id) so duplicate timestamps cannot flip assignment.

    One exchange, TWO Window operators (the data-dependency minimum: the
    running session counter consumes the lag output): pass 1 computes the
    previous-event timestamp and the user-ordered row number in one
    same-spec Window; pass 2 computes the running break-flag sum
    (session_seq) and the running max of session-start row numbers in one
    running-frame Window. ``idx_in_session`` is then a plain projection
    (row number minus session-start row number + 1) — no (user, session)
    re-partition anywhere. Verified by tests/test_plan_audits.py.
    """
    us = _us(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(us, F.col(id_col))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    # one select per pass: same-spec window expressions in one select are
    # grouped into a single Window operator (chained withColumn would
    # split them into one operator each)
    s1 = events.select(
        "*",
        F.lag(us).over(w).alias("_prev"),
        F.row_number().over(w).alias("_rn"),
    )
    is_new = F.col("_prev").isNull() | (us - F.col("_prev") > gap_us)
    s2 = s1.select("*", is_new.cast("int").alias("_new"))
    out = s2.select(
        "*",
        F.sum("_new").over(run).alias("session_seq"),
        F.max(F.when(F.col("_new") == 1, F.col("_rn"))).over(run).alias("_srn"),
    )
    return out.select(
        "*", (F.col("_rn") - F.col("_srn") + F.lit(1)).alias("idx_in_session")
    ).drop("_prev", "_rn", "_new", "_srn")


def session_stats(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup: (user_id, session_seq, n_events, duration_us,
    value_sum). ``duration_us`` is last-minus-first in exact microseconds
    (BIGINT); ``value_sum`` is summed in DECIMAL(18,2) so the result is
    independent of partial-aggregation order (the adamic_adar recipe).

    Two exchanges total: the sessionize window (user-keyed) and the
    (user, session) aggregate — the latter is map-side combined because
    sessionized rows for one (user, session) are contiguous per partition.
    """
    s = sessionize(events, gap_seconds, user_col, ts_col, id_col)
    us = _us(F.col(ts_col))
    return (
        s.groupBy(F.col(user_col).alias("user_id"), "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(us) - F.min(us)).cast("bigint").alias("duration_us"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("value_sum"),
        )
    )


def cohort_retention(
    events: DataFrame,
    period_seconds: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: (cohort_period, period_offset, n_users,
    retention) — of the users whose FIRST event falls in period
    ``cohort_period`` (epoch time DIV period, exact BIGINT), how many were
    active again ``period_offset`` periods later; ``retention`` is that
    count over the cohort's size (offset 0 is 1.0 by construction).

    The classic product-analytics rollup, and at crawl scale the
    re-crawl-freshness report (cohort = first-crawled period of a host,
    activity = periods it was re-fetched).

    Physical shape — everything is user- or cohort-keyed, nothing is
    row-sized after the first aggregate:

      * first-seen period: ONE user-keyed partial-aggregated min;
      * active (user, period) pairs: one partial-aggregated distinct
        (shuffle O(users × active periods), already far below the raw log);
      * activity ⋈ cohort on user_id, then a (cohort, offset) count — the
        offsets per row are exact BIGINT subtractions;
      * cohort sizes come from the offset-0 rows of the SAME matrix (a
        cohort's first-event period is by definition an active period) via
        a cohort-partitioned window over the already-aggregated matrix —
        cohort×offset rows, NOT a second pass over the raw log (a self-join
        here would re-derive the whole matrix subtree twice).

    Period arithmetic is integer microseconds DIV period (no doubles, no
    timezone math beyond the constant _us offset that cancels nowhere here
    but is pinned UTC by the repo's session conf — cohort boundaries are
    epoch-aligned in both engines).
    """
    p_us = int(period_seconds) * 1_000_000
    period = F.expr(
        f"CAST(unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV {p_us} AS BIGINT)"
    )
    active = (
        events.select(F.col(user_col).alias("user_id"), period.alias("period"))
        .distinct()
    )
    cohorts = active.groupBy("user_id").agg(F.min("period").alias("cohort_period"))
    matrix = (
        active.join(cohorts, "user_id")
        .groupBy(
            "cohort_period",
            (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cohort_period")
    size = F.max(
        F.when(F.col("period_offset") == 0, F.col("n_users"))
    ).over(w)
    return matrix.select(
        "cohort_period",
        "period_offset",
        "n_users",
        F.round(F.col("n_users").cast("double") / size, 6).alias("retention"),
    )


def funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered conversion funnel: (stage_idx, stage, n_users) —
    n_users = users whose FIRST qualifying stage-i event happens strictly
    after their first qualifying stage-(i-1) event.

    ``first qualifying`` is the classic open-window funnel: stage 1 anchors
    at the user's first stage-1 event; stage i anchors at the user's first
    stage-i event after the stage-(i-1) anchor. Each stage is one
    conditional min-aggregate on (user, ts) joined back on user_id — K
    user-keyed partial-aggregated exchanges for a K-stage funnel, no
    self-join of the raw log and NO driver actions (the whole funnel is one
    lazy plan; stage prefixes are recomputed per stage row, an O(K²)
    constant of cheap aggregates).
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    us = _us(F.col(ts_col))
    # anchors: user_id -> anchor ts (microseconds) per completed stage
    anchors = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.min(us).alias("t_anchor"))
    )
    stage_counts = []
    for i, stage in enumerate(stages):
        if i > 0:
            anchors = (
                events.where(F.col(type_col) == stage)
                .select(F.col(user_col).alias("user_id"), us.alias("_t"))
                .join(anchors, "user_id")
                .where(F.col("_t") > F.col("t_anchor"))
                .groupBy("user_id")
                .agg(F.min("_t").alias("t_anchor"))
            )
        stage_counts.append(
            anchors.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).cast("int").alias("stage_idx"),
                F.lit(stage).alias("stage"),
                "n_users",
            )
        )
    out = stage_counts[0]
    for sc in stage_counts[1:]:
        out = out.unionByName(sc)
    return out


def covisitation_pairs(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    item_col: str = "item",
    max_session_items: int = 50,
    min_support: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(item_a, item_b, n_sessions) — the session co-visitation graph:
    two items are connected once per session that touched BOTH (each
    session counts a pair once regardless of repeat visits), item_a <
    item_b, pairs below ``min_support`` sessions dropped. This is the
    classic behavioral related-items signal (Amazon's item-item CF,
    Linden et al. 2003) built on the engine's own sessionizer — and the
    co-visitation edges feed every graph operator upstream (components
    over them cluster browsing intents).

    Scale guards: sessions with more than ``max_session_items`` DISTINCT
    items are dropped whole (bot/crawler sessions — also the quadratic
    bound: the per-session self-join is <= cap^2); the pair aggregate is
    the only post-join exchange and it map-side combines on the pair
    key. The (user, session) self-join rides the user-keyed partitioning
    the sessionizer already produced.
    """
    if max_session_items < 2:
        raise ValueError("max_session_items must be >= 2")
    s = sessionize(
        events, gap_seconds=gap_seconds, user_col=user_col,
        ts_col=ts_col, id_col=id_col,
    )
    items = s.select(
        F.col(user_col).alias("_u"), "session_seq", F.col(item_col).alias("_i")
    ).distinct()
    sz = (
        items.groupBy("_u", "session_seq")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") <= max_session_items)
        .select("_u", "session_seq")
    )
    ok = items.join(sz, ["_u", "session_seq"])
    b = ok.select(
        F.col("_u").alias("_u2"),
        F.col("session_seq").alias("_s2"),
        F.col("_i").alias("_i2"),
    )
    pairs = ok.join(
        b,
        (ok["_u"] == b["_u2"])
        & (ok["session_seq"] == b["_s2"])
        & (ok["_i"] < b["_i2"]),
    )
    return (
        pairs.groupBy(
            F.col("_i").alias("item_a"), F.col("_i2").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .where(F.col("n_sessions") >= min_support)
    )


def crawl_volume_trend(
    events: DataFrame,
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """(day, n_events, trailing_days, trailing_total, trailing_avg,
    ratio_to_trailing) — daily event volume with an exact trailing
    ``window_days``-day window: the crawl-throughput trend + burst
    detector (ratio >> 1 = a spike against the trailing baseline, << 1
    = a stall). The RANGE window runs over the integer day ordinal, so
    calendar GAPS shorten the trailing set correctly (a row-based window
    would silently span missing days).

    Scale shape: the corpus collapses to one row per DAY in a
    map-side-combined aggregate before any window runs — the window's
    single-partition sort touches #days rows (thousands for years of
    crawl), never the event log. Exact BIGINT counts; ratio =
    n * trailing_days / trailing_total in one rounded division (no
    compounding through a rounded average)."""
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    # day ordinal from exact epoch microseconds (the sessionize
    # convention) — integer division, no timezone anywhere
    daily = (
        events.select(
            F.expr(
                f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV 86400000000"
            ).alias("_dn")
        )
        .groupBy("_dn")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = (
        Window.orderBy("_dn")
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("_dn").cast("int"))
        .cast("string")
        .alias("day"),
        "n_events",
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_days"),
        F.sum("n_events").over(w).cast("long").alias("trailing_total"),
    ).select(
        "day",
        "n_events",
        "trailing_days",
        "trailing_total",
        F.round(
            F.col("trailing_total").cast("double") / F.col("trailing_days"), 6
        ).alias("trailing_avg"),
        F.round(
            (F.col("n_events") * F.col("trailing_days")).cast("double")
            / F.col("trailing_total"),
            6,
        ).alias("ratio_to_trailing"),
    )
