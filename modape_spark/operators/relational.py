"""Relational operators mirroring the reference's alignment/validation
semantics on the driver's events + TPC-H-ish tables.

Mapping to SURVEY.md §2 (citations into /root/reference/):
- events_dedup_latest  -> J3/W2 duplicate resolution, latest-timestamp-wins
                          (modape/modis/collect.py:106-142)
- events_date_slice    -> P5 date-range slice (modape/modis/window.py:200-207)
- events_completeness  -> A7 expected-vs-present date audit
                          (modape/scripts/modis_util.py:42-92)
- events_sessionize    -> W3 sequentiality/gap detection (utils.py:137-159)
- grid_dekad_pentad    -> F3/F4 calendar target grids (utils.py:189-222)
- tpch_pricing_summary -> A6-style whole-table metric rollup
- tpch_top_suppliers   -> J6-style small-dimension equi-join (broadcast)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import register_views, table


def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per (user_id, event_type) — the canonical dedup window."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql("""
        with ranked as (
            select user_id, event_type, event_id, value,
                   row_number() over (
                       partition by user_id, event_type
                       order by ts desc, event_id desc
                   ) as rn
            from events
        )
        select user_id, event_type, event_id as latest_event_id, value
        from ranked where rn = 1
        order by user_id, event_type
    """)


ORACLE_DEDUP_LATEST = """
    with ranked as (
        select user_id, event_type, event_id, value,
               row_number() over (
                   partition by user_id, event_type
                   order by ts desc, event_id desc
               ) as rn
        from events
    )
    select user_id, event_type, event_id as latest_event_id, value
    from ranked where rn = 1
    order by user_id, event_type
"""


def q_date_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql("""
        select event_type,
               count(*) as n,
               cast(sum(cast(round(value * 100) as bigint)) as bigint)
                   as sum_value_x100,
               cast(sum(cast(round(value * 100) as bigint)) * 10
                    div count(*) as bigint) as avg_value_milli
        from events
        where ts >= timestamp '2024-01-08 00:00:00'
          and ts <  timestamp '2024-01-15 00:00:00'
        group by event_type
        order by event_type
    """)


ORACLE_DATE_SLICE = """
    select event_type,
           count(*) as n,
           cast(sum(cast(round(value * 100) as bigint)) as bigint)
               as sum_value_x100,
           cast(sum(cast(round(value * 100) as bigint)) * 10
                // count(*) as bigint) as avg_value_milli
    from events
    where ts >= timestamp '2024-01-08 00:00:00'
      and ts <  timestamp '2024-01-15 00:00:00'
    group by event_type
    order by event_type
"""


def q_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with days missing from the expected daily grid (A7)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql("""
        with bounds as (
            select to_date(min(ts)) as d0, to_date(max(ts)) as d1 from events
        ),
        grid as (
            select u.user_id, d.day
            from (select distinct user_id from events) u
            cross join (
                select explode(sequence(d0, d1, interval 1 day)) as day from bounds
            ) d
        ),
        present as (select distinct user_id, to_date(ts) as day from events)
        select g.user_id, count(*) as missing_days
        from grid g left join present p
          on g.user_id = p.user_id and g.day = p.day
        where p.user_id is null
        group by g.user_id
        having count(*) > 0
        order by g.user_id
    """)


ORACLE_COMPLETENESS = """
    with bounds as (
        select min(ts)::date as d0, max(ts)::date as d1 from events
    ),
    grid as (
        select u.user_id, d.day
        from (select distinct user_id from events) u
        cross join (
            select unnest(generate_series(d0, d1, interval 1 day))::date as day
            from bounds
        ) d
    ),
    present as (select distinct user_id, ts::date as day from events)
    select g.user_id, count(*) as missing_days
    from grid g left join present p
      on g.user_id = p.user_id and g.day = p.day
    where p.user_id is null
    group by g.user_id
    having count(*) > 0
    order by g.user_id
"""

_SESSION_GAP_MIN = 30


def _sessionize_sql(ts_diff_expr: str) -> str:
    return f"""
        with ordered as (
            select user_id, ts,
                   lag(ts) over (partition by user_id order by ts, event_id) as prev_ts
            from events
        ),
        flagged as (
            select user_id, ts,
                   case when prev_ts is null or {ts_diff_expr} > {_SESSION_GAP_MIN * 60}
                        then 1 else 0 end as new_session
            from ordered
        ),
        sess as (
            select user_id,
                   sum(new_session) over (
                       partition by user_id order by ts
                       rows between unbounded preceding and current row
                   ) as session_id
            from flagged
        )
        select user_id,
               count(distinct session_id) as n_sessions,
               count(*) as n_events
        from sess
        group by user_id
        order by user_id
    """


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_sessionize_sql(
        "unix_timestamp(ts) - unix_timestamp(prev_ts)"))


# epoch()::bigint truncates like Spark's unix_timestamp (whole seconds)
ORACLE_SESSIONIZE = _sessionize_sql("epoch(ts)::bigint - epoch(prev_ts)::bigint")


def _grid_sql(dialect: str) -> str:
    """Dekad + pentad calendar grids for 2002-2004 (F3/F4)."""
    if dialect == "spark":
        julian = "date_format(d, 'yyyyDDD')"
        days = (
            "select explode(sequence(to_date('2002-01-01'), to_date('2004-12-31'), "
            "interval 1 day)) as d"
        )
    else:
        julian = "strftime(d, '%Y%j')"
        days = (
            "select unnest(generate_series(date '2002-01-01', date '2004-12-31', "
            "interval 1 day))::date as d"
        )
    return f"""
        with days as ({days})
        select
            case when day(d) in (5, 15, 25) then 'dekad' else 'pentad' end as grid,
            {julian} as julian
        from days
        where day(d) in (5, 15, 25)
           or day(d) in (3, 8, 13, 18, 23, 28)
        order by grid, julian
    """


def q_grid_dekad_pentad(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ())
    return spark.sql(_grid_sql("spark"))


def _tumbling_sql(dialect: str) -> str:
    """ST6-adjacent: fixed 6-hour tumbling windows over events (the
    calendar dekad/pentad tiers use grids.py; THIS is the uniform-window
    flavour Spark's F.window covers)."""
    if dialect == "spark":
        bucket = "window(ts, '6 hours').start"
    else:
        bucket = "time_bucket(interval 6 hours, ts)"
    return f"""
        select event_type,
               cast({bucket} as timestamp) as win_start,
               count(*) as n,
               cast(sum(cast(round(value * 100) as bigint)) as bigint)
                   as sum_value_x100
        from events
        group by event_type, win_start
        order by event_type, win_start
    """


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_tumbling_sql("spark"))


_PRICING_BODY = """
    select l_returnflag, l_linestatus,
           cast(sum(cast(round(l_quantity * 100) as bigint)) as bigint)
               as sum_qty_x100,
           cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint)
               as sum_base_price_x100,
           cast(sum(cast(round(l_extendedprice * 100) as bigint)
                    * cast(round((1 - l_discount) * 100) as bigint))
                as bigint) as sum_disc_price_x1e4,
           cast(sum(cast(round(l_quantity * 100) as bigint)) * 100
                {div} count(*) as bigint) as avg_qty_x1e4,
           count(*) as count_order
    from lineitem
    where l_shipdate < timestamp '1998-09-02 00:00:00'
    group by l_returnflag, l_linestatus
    order by l_returnflag, l_linestatus
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style rollup — whole-table metric aggregation (A6).

    Fixed-point throughout: the 2-decimal money/discount columns are
    rounded to exact integers per row BEFORE any aggregation, so the sums
    are identical under ANY partitioning/accumulation order — float sums
    only matched the oracle while the fixture scan was a single task."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_PRICING_BODY.format(div="div"))


ORACLE_PRICING = _PRICING_BODY.format(div="//")


def q_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-join of the small supplier dim onto lineitem (J6
    analogue: small state joined onto the big fact side)."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * F.round((1 - F.col("l_discount")) * 100).cast("long")
            ).cast("long").alias("revenue_x1e4"),
            F.count("*").alias("n_items"),
        )
    )
    return (
        rev.join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            "revenue_x1e4",
            "n_items",
        )
        .orderBy(F.desc("revenue_x1e4"), "suppkey")
        .limit(10)
    )


ORACLE_TOP_SUPPLIERS = """
    with rev as (
        select l_suppkey,
               cast(sum(cast(round(l_extendedprice * 100) as bigint)
                        * cast(round((1 - l_discount) * 100) as bigint))
                    as bigint) as revenue_x1e4,
               count(*) as n_items
        from lineitem group by l_suppkey
    )
    select s_suppkey as suppkey, s_name as supp_name, revenue_x1e4, n_items
    from rev join supplier on l_suppkey = s_suppkey
    order by revenue_x1e4 desc, suppkey
    limit 10
"""


def q_ingest_reclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 nodata-LUT reclass as a standalone ingest operator
    (io.py:436-452): multi-sentinel token arrays normalized to ONE
    canonical nodata through sources.ingest.ingest_reclass, then
    aggregated so the oracle can hash the effect.  floor(value) is used on
    both sides because double->int cast rounding differs across engines."""
    from ..sources.ingest import ingest_reclass

    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        "event_id", "event_type",
        F.expr("array(cast(floor(value) as int), "
               "cast(event_id % 1000 + 9500 as int), 32767, -32768)"
               ).alias("tokens"),
    )
    rc = ingest_reclass(raw, (0, 10000), (-32768, 32767))
    return (
        rc.select(
            "event_type",
            F.expr("aggregate(tokens, cast(0 as bigint), (a, t) -> a + t)"
                   ).alias("row_sum"),
            F.expr("size(filter(tokens, t -> t = -32768))").alias("n_nd"),
        )
        .groupBy("event_type")
        .agg(F.sum("row_sum").cast("long").alias("sum_tokens"),
             F.sum("n_nd").cast("long").alias("n_reclassed"),
             F.count("*").alias("n_rows"))
        .orderBy("event_type")
    )


ORACLE_INGEST_RECLASS = """
    with raw as (
        select event_id, event_type,
               [cast(floor(value) as int),
                cast(event_id % 1000 + 9500 as int), 32767, -32768] as tokens
        from events
    ),
    rc as (
        select event_type,
               list_transform(tokens, t -> case when t >= 0 and t <= 10000
                                           then t else -32768 end) as tokens
        from raw
    )
    select event_type,
           cast(sum(list_reduce(list_prepend(0::bigint, tokens),
                                (a, t) -> a + t)) as bigint) as sum_tokens,
           cast(sum(len(list_filter(tokens, t -> t = -32768))) as bigint)
               as n_reclassed,
           count(*) as n_rows
    from rc
    group by event_type
    order by event_type
"""


QUERIES = {
    "events_dedup_latest": q_dedup_latest,
    "events_ingest_reclass": q_ingest_reclass,
    "events_date_slice": q_date_slice,
    "events_completeness": q_completeness,
    "events_sessionize": q_sessionize,
    "grid_dekad_pentad": q_grid_dekad_pentad,
    "events_tumbling_window": q_tumbling_window,
    "tpch_pricing_summary": q_pricing_summary,
    "tpch_top_suppliers": q_top_suppliers,
}

ORACLES = {
    "events_dedup_latest": ORACLE_DEDUP_LATEST,
    "events_ingest_reclass": ORACLE_INGEST_RECLASS,
    "events_date_slice": ORACLE_DATE_SLICE,
    "events_completeness": ORACLE_COMPLETENESS,
    "events_sessionize": ORACLE_SESSIONIZE,
    "grid_dekad_pentad": _grid_sql("duck"),
    "events_tumbling_window": _tumbling_sql("duck"),
    "tpch_pricing_summary": ORACLE_PRICING,
    "tpch_top_suppliers": ORACLE_TOP_SUPPLIERS,
}
