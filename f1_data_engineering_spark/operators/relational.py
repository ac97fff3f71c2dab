"""Core relational operators on the driver test tables.

Covers SURVEY.md §2.2 (projection/filter), §2.3 (joins), §2.4
(aggregation), §2.5 (windows), §2.6 (sort/limit/top-k), §2.7 (set ops),
plus the JSON scalar surface on ``events.props``.

Determinism & oracle parity conventions (driver compares to DuckDB by
row count + schema + order-insensitive value hash):

* every computed column is aliased; names match the oracle SQL exactly;
* double aggregates go through DECIMAL(38,4) so Spark's partial
  aggregation order and DuckDB's serial order produce bit-identical
  sums (float addition is non-associative; decimal is exact);
* `first`-style picks use min_by/max_by with an explicit key — never
  "whatever row came first" (pandas row-order semantics don't exist in
  a distributed engine);
* top-k queries order by a unique tiebreaker before LIMIT.

Scale notes are inline per operator — each one states the shuffle it
causes and why that's the minimal shuffle for the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.registry import load_table

DEC = "decimal(38,4)"


def _dec(c) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


# ---------------------------------------------------------------------------
# §2.4 aggregation
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary on lineitem.

    Operators: scan → filter (pushed to parquet row groups) → hash agg
    (partial map-side combine, then one shuffle on the 2 low-cardinality
    keys) → sort.  The group count is tiny (~6), so the shuffle moves
    only pre-aggregated partials — this plan is flat-optimal at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_price"
            ),
            F.sum(
                _dec(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            F.avg(_dec("l_quantity")).alias("avg_qty"),
            F.avg(_dec("l_extendedprice")).alias("avg_price"),
            F.avg(_dec("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def stint_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 tyre-stint analog on events: per (user_id, event_type) —
    first value by time (min_by ≡ the reference's ordered ``iloc[0]``,
    f1_dataExtractor.py:348), min/max ts, count.

    One shuffle on the group keys; min_by replaces the reference's
    nested unique()-loop group-by (f1_dataExtractor.py:334-353).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(
            F.min_by(F.struct("ts", "event_id", "value"), F.struct("ts", "event_id"))[
                "value"
            ].alias("first_value"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "event_type")
    )


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5 + distinct-agg: per-segment customer stats with
    count / countDistinct / min / max / avg (decimal-exact)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.min(_dec("c_acctbal")).alias("min_bal"),
            F.max(_dec("c_acctbal")).alias("max_bal"),
            F.sum(_dec("c_acctbal")).alias("sum_bal"),
        )
        .orderBy("c_mktsegment")
    )


def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 implicit pivot (stint stacked-bar, streamlit_app.py:385-389):
    groupBy l_returnflag pivot l_linestatus sum(l_quantity).

    Pivot values are declared explicitly so the plan is a single-pass
    hash aggregate (omitting them adds a distinct-scan job to discover
    them — a full extra pass at 100 TB).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(_dec("l_quantity")))
        .withColumnsRenamed({"F": "qty_f", "O": "qty_o"})
        .orderBy("l_returnflag")
    )


def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface (free in Spark, absent in the reference —
    SURVEY.md §2.4): rollup over (o_orderstatus, o_orderpriority)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(_dec("o_totalprice")).alias("sum_price"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# §2.2 projection / filter
# ---------------------------------------------------------------------------


def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P7 composite: NOT NULL + range + IN-list predicates with a
    derived-column projection.  All three predicates push into the
    parquet scan (verify: plans.assert_pushed_filters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").isNotNull())
        .filter(F.col("l_quantity") > 0)
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_quantity",
            _dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


def join_customer_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2-style dimension enrichment: customer ⋈ nation ⋈ region with
    explicit broadcast of the small dims — zero shuffle of the fact
    side; at 100 TB the dims are KBs, so broadcast is always right."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).alias("sum_bal"),
        )
        .orderBy("r_name", "n_name")
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-join: lineitem ⋈ orders ⋈ customer ⋈
    nation — the two big tables shuffle-join on orderkey; dims
    broadcast.  AQE converts to broadcast where a side is small and
    splits skewed orderkey partitions."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("n_name")
    )


def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join surface: customers WITH orders vs WITHOUT, per
    market segment (EXISTS / NOT EXISTS).  Left-semi and left-anti
    shuffle only distinct keys of the probe side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    with_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("has_orders", F.lit(True))
    )
    without = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("has_orders", F.lit(False))
    )
    return with_orders.unionByName(without).orderBy("c_mktsegment", "has_orders")


def outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + conditional agg: order count per customer
    including zero-order customers (TPC-H Q13 shape)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def range_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 interval/range join (the laps × telemetry shape,
    f1_dataExtractor.py:251-255): count events whose ts falls in
    [o_orderdate, o_orderdate + 1 day), bucketized.

    Scale design (SURVEY.md §4.2 option b): a raw theta join is
    O(n·m) BroadcastNestedLoopJoin.  Instead both sides are tagged
    with a day bucket — the interval spans at most 2 buckets, so
    orders are exploded to their ≤2 covering buckets via a literal
    array (no extra scan), then it's an EQUI join on the bucket +
    a residual band filter.  Shuffle is hash-partitioned on the
    bucket; at 100 TB this is a plain sort-merge join, no nested
    loop anywhere.  See operators/telemetry.py for the same pattern
    on the F1-native tables.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts"), F.to_date("ts").alias("bucket")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias("o_end"),
    )
    o_b = o.withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(F.to_date("o_orderdate"), F.to_date(F.col("o_end")))
            )
        ),
    )
    joined = o_b.join(ev, "bucket").filter(
        (F.col("ts") >= F.col("o_orderdate")) & (F.col("ts") < F.col("o_end"))
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# §2.5 windows
# ---------------------------------------------------------------------------


def window_value_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/W1 gear-change analog (f1_dataExtractor.py:280-287): per user,
    count consecutive-event event_type changes (first row = no change,
    matching ``diff().fillna(0)``).

    One shuffle to partition by user_id, then a sort within partitions —
    the distributed rewrite of the reference's per-lap pandas diff.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    changed = F.when(prev.isNull(), 0).when(F.col("event_type") != prev, 1).otherwise(0)
    return (
        ev.withColumn("chg", changed)
        .groupBy("user_id")
        .agg(F.sum("chg").alias("n_type_changes"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/W2 distance-integration analog (f1_dataExtractor.py:260):
    running sum of value per user ordered by (ts, event_id) — the
    unbounded-preceding→current-row frame.  Decimal accumulator so the
    per-row prefix sums match the serial oracle exactly."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(_dec("value")).over(w).alias("running_value"),
    ).orderBy("user_id", "event_id")


def rank_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking surface (absent in the reference, SURVEY.md §2.5): top-3
    orders per customer by totalprice via row_number — the classic
    per-group top-k that avoids a global sort."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", _dec("o_totalprice").alias("totalprice"), "rn")
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# §2.6 sort / limit / top-k; §2.4 A4 distinct
# ---------------------------------------------------------------------------


def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5/O6 value-based top-k: 10 most expensive orders.  TakeOrdered
    (per-partition heap + driver merge of k·partitions rows), not a
    global sort; deterministic via the orderkey tiebreaker."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", _dec("o_totalprice").alias("totalprice"))
        .limit(10)
    )


def distinct_sorted_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/O4: sorted distinct key enumeration (driver lists,
    streamlit_app.py:235,415) — partial-aggregated distinct, tiny
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_type").where(F.col("event_type").isNotNull()).distinct().orderBy(
        "event_type"
    )


def stride_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 deterministic stride downsample (weather axis ticks,
    streamlit_app.py:299-302): every ⌈n/10⌉-th event by global time
    order.  row_number over a single ordered window — acceptable here
    because the reference's semantics are inherently global-order; at
    scale you'd downsample per partition key instead (see
    streaming/events.py for the windowed variant)."""
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    step = max(1, -(-n // 10))  # ceil
    w = W.orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(((F.col("rn") - 1) % step) == 0)
        .select("event_id", "ts", "value")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# §2.7 set ops
# ---------------------------------------------------------------------------


def set_ops_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union/intersect/except surface (absent in the reference,
    SURVEY.md §2.7): customer nations vs supplier nations."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).withColumn("relation", F.lit("both"))
    cust_only = c.distinct().exceptAll(s.distinct()).withColumn("relation", F.lit("customer_only"))
    return both.unionByName(cust_only).orderBy("relation", "nationkey")


# ---------------------------------------------------------------------------
# JSON scalar surface (events.props)
# ---------------------------------------------------------------------------


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction on events.props (beyond-reference scalar surface,
    SURVEY.md §2.8 tail): parse once with from_json, aggregate typed
    fields.  get_json_object would re-parse per field; from_json parses
    the document once per row."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.get_json_object("props", "$.k").try_cast("long").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
