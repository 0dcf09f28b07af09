"""Relational operator coverage over the TPC-H-ish driver tables:
grouped aggregation, multi-way joins with selective filters, top-k,
window functions, set ops. These exercise the engine surface the fmask
pipeline doesn't (multi-table joins, event windows).

Money sums are computed in exact integer cents (doubles summed in
different partition orders diverge in the last ulp; cents are exact).
"""

from __future__ import annotations


def _cents(col: str) -> str:
    return f"cast(round({col} * 100) as bigint)"


def q_lineitem_agg(d: str) -> str:
    """TPC-H Q1-style pricing summary (scan -> filter -> hash agg)."""
    return f"""
SELECT l_returnflag, l_linestatus,
  cast(sum(l_quantity) as bigint) AS sum_qty,
  cast(sum({_cents('l_extendedprice')}) as bigint) AS sum_base_price_cents,
  cast(sum({_cents('l_extendedprice * (1 - l_discount)')}) as bigint) AS sum_disc_price_cents,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""


def q_orders_topk(d: str) -> str:
    """TPC-H Q3-style: 3-way join + grouped revenue + top-10
    (broadcast-able dims, shuffle only on the fact)."""
    date_s = ("date_format(o.o_orderdate, 'yyyy-MM-dd')" if d == "spark"
              else "strftime(o.o_orderdate, '%Y-%m-%d')")
    return f"""
SELECT o.o_orderkey, {date_s} AS o_orderdate_s,
  cast(sum({_cents('l.l_extendedprice * (1 - l.l_discount)')}) as bigint)
    AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, {date_s}
ORDER BY revenue_cents DESC, o.o_orderkey
LIMIT 10"""


def q_region_nation_join(d: str) -> str:
    """Dim-dim broadcast join + count rollup."""
    return f"""
SELECT r.r_name AS region, count(*) AS n_nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name"""


def q_events_window(d: str) -> str:
    """Event-stream windows: per-user running sum + previous-event delta
    (Window.partitionBy.orderBy — A2/J6 analogue in SURVEY §2.6)."""
    return f"""
SELECT event_id, user_id, event_type,
  cast(round(sum(value) OVER (
    PARTITION BY user_id ORDER BY ts, event_id) * 1000) as bigint)
    AS running_value_milli,
  cast(round(coalesce(value - lag(value) OVER (
    PARTITION BY user_id ORDER BY ts, event_id), 0) * 1000) as bigint)
    AS delta_milli,
  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
FROM events"""


def q_supplier_part_antijoin(d: str) -> str:
    """Anti-join (parts with no supplier in nation 0..4) + semi-join
    coverage (J7 mask-apply analogue)."""
    return f"""
SELECT count(*) AS n_parts_without_cheap_supplier
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM supplier s
  WHERE s.s_nationkey < 5 AND s.s_suppkey % 200 = p.p_partkey % 200
)"""


def q_lineitem_rollup(d: str) -> str:
    """Grouping-sets/rollup surface (SURVEY §2.3 note: the reference has
    none; Spark/DuckDB provide it free over the metrics tables)."""
    return f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
  coalesce(l_linestatus, 'ALL') AS linestatus,
  cast(sum(l_quantity) as bigint) AS sum_qty,
  count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)"""


def q_events_session_windows(d: str) -> str:
    """Sessionization-lite: 30-minute gap splits per user (lag + running
    session id), then per-session aggregates — the streaming-state
    pattern expressed in batch SQL."""
    return f"""
WITH gaps AS (
  SELECT user_id, ts, event_id, value,
    case when lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              IS NULL
         or ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            > INTERVAL '30' MINUTE
         then 1 else 0 end AS new_session
  FROM events
),
sess AS (
  SELECT *, cast(sum(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id) as bigint) AS session_id
  FROM gaps
)
SELECT user_id, session_id, count(*) AS n_events,
  cast(round(sum(value) * 1000) as bigint) AS sum_value_milli,
  min(event_id) AS first_event
FROM sess GROUP BY user_id, session_id"""
