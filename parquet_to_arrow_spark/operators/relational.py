"""SURVEY.md §2 operator inventory over the TPC-H-ish oracle tables.

Every function takes (spark, sf_dir) and returns a DataFrame whose column
names match the DuckDB oracle SQL in __spark_entry__.py exactly (the driver
sorts columns by name before value-hashing). Declarative DataFrame API
throughout — Catalyst does the pruning/pushdown the reference hand-rolled
(reference: src/parquet-to-text-stream.cc:777-783 column pruning,
:146-159 row skip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(c):
    """The parity-relevant money/quantity cast: decimal(18,4) everywhere a
    sum feeds an oracle compare, so partial-aggregation order can't move the
    result (the DuckDB twins use the same CAST — keep them in lockstep)."""
    return F.col(c).cast("decimal(18,4)")


# --- S1: full scan -----------------------------------------------------------


def scan_full(spark, sf_dir) -> DataFrame:
    """Whole-file scan with integrity totals (the parquet-to-arrow role)."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.sum("l_orderkey").alias("sum_orderkey"),
        F.count("l_shipdate").alias("n_shipdate"),
        F.min("l_linenumber").alias("min_line"),
        F.max("l_linenumber").alias("max_line"),
    )


# --- P1: column-range projection ---------------------------------------------


def projection_column_range(spark, sf_dir) -> DataFrame:
    """Keep an ordinal column range [0, 3) of lineitem — Catalyst prunes the
    scan to exactly these columns (ReadSchema), like --column-range."""
    df = _t(spark, sf_dir, "lineitem")
    return df.select(df.columns[0:3])


# --- P2: row-range slice (offset + limit over a stable order) ----------------


def row_range_slice(spark, sf_dir) -> DataFrame:
    """Rows [100, 150) of lineitem under a total order — the reference's
    --row-range=100-150 with deterministic order instead of file order."""
    df = _t(spark, sf_dir, "lineitem")
    return (
        df.select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .offset(100)
        .limit(50)
    )


# --- §2.3: diff / zip-compare ------------------------------------------------


def diff_self_compare(spark, sf_dir) -> DataFrame:
    """parquet-diff role: null-safe compare of two sides keyed by row id;
    equal inputs -> zero mismatches (reference: src/parquet-diff.cc:197-207)."""
    a = _t(spark, sf_dir, "orders").alias("a")
    b = _t(spark, sf_dir, "orders").alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    mismatch = (
        ~F.col("a.o_totalprice").eqNullSafe(F.col("b.o_totalprice"))
        | ~F.col("a.o_orderstatus").eqNullSafe(F.col("b.o_orderstatus"))
    )
    return joined.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(mismatch, 1).otherwise(0)).cast("long").alias("n_mismatch"),
    )


# --- §2.4: aggregation stats (the codec-selector shape) ----------------------


def agg_stats_by_source(spark, sf_dir) -> DataFrame:
    """Per-source chunk statistics: exactly what the codec selector samples
    (cardinality, range, counts) — over the documents table."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


def q1_pricing_summary(spark, sf_dir) -> DataFrame:
    """TPC-H Q1 shape over lineitem; decimal-exact sums cast to double so the
    value-hash is engine-independent."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount")))
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- §2.5: window ------------------------------------------------------------


def window_top3_per_supplier(spark, sf_dir) -> DataFrame:
    """row_number over (supplier, shipdate) with a unique tiebreak — the
    stable intra-partition ordinal the reference gets from file order."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "rn")
    )


# --- §2.6: sort / limit / top-k ----------------------------------------------


def topk_orders(spark, sf_dir) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# --- §2.7: set operations ----------------------------------------------------


def customers_without_orders(spark, sf_dir) -> DataFrame:
    """EXCEPT-style: customer keys minus order custkeys (anti join — the
    checkpoint/resume primitive, SURVEY.md §2.3)."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    ords = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return cust.join(ords, "custkey", "left_anti").distinct()


# --- joins (broadcast dimension) ---------------------------------------------


def revenue_by_nation(spark, sf_dir) -> DataFrame:
    """Star join with explicitly broadcast dimensions — the 100 TB plan:
    fact table streams, dims broadcast, single shuffle for the final agg.

    Round 6 (guide §2.3 aggregate-before-shuffle): lineitem is pre-aggregated
    per l_orderkey BEFORE the orders join, so the fact-fact exchange carries
    one partially-summed row per order (~4x fewer rows, map-side combined)
    instead of raw line items, and the join's sort runs on the reduced side.
    Exact: the per-order sums are decimal (associativity-free), re-summed per
    nation, cast to double only at the end — measured value-identical, and
    faster at both sf0.1 (0.81->0.64 s) and sf1.0 (2.2->1.6 s)."""
    li = _t(spark, sf_dir, "lineitem")
    ords = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    li_agg = li.groupBy("l_orderkey").agg(
        F.sum(
            _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
        ).alias("__rev"),
        F.count("*").alias("__cnt"),
    )
    return (
        li_agg.join(ords, li_agg.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum("__rev").cast("double").alias("revenue"),
            F.sum("__cnt").alias("n_items"),
        )
    )


def sessionize_events(spark, sf_dir, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user session ids from event-time gaps (window lag
    + cumulative gap count — the batch shape of session_window)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_sid = ev.withColumn(
        "session_id", F.sum(new_session).over(w).cast("long")
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )


def pivot_qty_by_status(spark, sf_dir) -> DataFrame:
    """Pivot: quantity by returnflag x linestatus (decimal-exact sums)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = F.col("l_quantity").cast("decimal(18,4)")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "O", dec)).cast("double").alias("qty_O"),
        F.sum(F.when(F.col("l_linestatus") == "F", dec)).cast("double").alias("qty_F"),
    )


def price_histogram(spark, sf_dir, buckets: int = 10) -> DataFrame:
    """Value-distribution histogram via width_bucket — the shape of the
    selector's run-length/value histograms as a relational query."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(buckets)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def rollup_counts(spark, sf_dir) -> DataFrame:
    """CUBE over (returnflag, linestatus): all grouping sets, incl. totals."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


# --- events: batch shape of the streaming hourly rollup ----------------------


def events_hourly_rollup(spark, sf_dir) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def asof_purchase_last_click(spark, sf_dir) -> DataFrame:
    """AS-OF JOIN — an operator Spark lacks natively, composed scalably:
    for each 'purchase' event, the same user's latest 'click' at-or-before
    it. UNION the two streams, ONE window pass per user timeline
    (last(..., ignorenulls) over rows-unbounded-preceding), filter back to
    the left side. One shuffle on user_id, no per-row subquery, no range
    join explosion — the plan is identical at 10^12 events.

    Ties at equal ts: clicks sort before purchases (side 0 < 1), so a
    same-instant click counts as 'before'; event_id breaks residual ties,
    making the result fully deterministic (and oracle-checkable)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("event_id"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("click_id"),
        "event_id",
    )
    u = clicks.unionByName(buys)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", F.coalesce("click_id", "event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w)).withColumn(
        "last_click_ts", F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "last_click_id",
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("last_click_ts").cast("timestamp"))
            ).alias("gap_us"),
        )
    )


def price_percentiles(spark, sf_dir) -> DataFrame:
    """EXACT percentiles per group (p50/p95 with linear interpolation) —
    the quantile member of the aggregate family. Exact (not approx_percentile)
    so the DuckDB quantile_cont oracle matches to the bit; at 100 TB the
    scale path swaps in approx_percentile(col, p, accuracy) with the same
    plan shape (partial + final aggregate)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
            F.count("*").alias("n"),
        )
    )


def q3_shipping_priority(spark, sf_dir) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    revenue per urgent order, top 10. The two dimension-side filters reach
    the scans (pushdown) and the small filtered sides hash-join into the
    lineitem scan; decimal-exact revenue cast to double for the oracle."""
    cutoff = F.lit("1998-06-01").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "orderdate", "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark, sf_dir) -> DataFrame:
    """TPC-H Q5 shape: the 6-way region/nation/customer/supplier/orders/
    lineitem join — revenue per nation where customer and supplier sit in
    the SAME nation of one region, over one year of orders. The canonical
    join-ordering showcase: region and the region-filtered nation list
    BROADCAST (tiny dims), orders carries the pushed-down date cut into
    the fact join, the same-nation predicate prunes after the two key
    joins, and the only wide stage is the 25-row per-nation aggregate.
    Decimal-exact revenue cast to double for the oracle."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def q6_forecast_revenue(spark, sf_dir) -> DataFrame:
    """TPC-H Q6 shape: the pure filter-and-sum forecast — every predicate
    pushes to the parquet scan, zero joins, one scalar out."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


def q4_order_priority(spark, sf_dir) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — orders of one quarter
    where EXISTS a lineitem shipped strictly after the order date (the
    synth schema's late-shipment analogue of commitdate < receiptdate).
    The correlated EXISTS decorrelates into ONE LEFT SEMI join whose
    non-equi conjunct rides the orderkey equi-join — no per-row subquery,
    one shuffle keyed on orderkey, and the quarter cut pushes down to the
    orders scan before anything joins."""
    lo = F.lit("1996-07-01").cast("timestamp")
    hi = F.lit("1996-10-01").cast("timestamp")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q10_returned_items(spark, sf_dir) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer over
    one quarter, top 20. Fact-side: the return flag and the quarter cut
    both push into the parquet scans BEFORE the orderkey join; dim-side:
    customer joins the aggregated 20-row-bound output... no — customer is
    a fact-scale dim here, so it hash-joins, and only NATION broadcasts.
    The top-20 is TakeOrderedAndProject (no global sort)."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
    )
    return (
        rev.join(cust, rev["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def q7_nation_volume(spark, sf_dir) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year — the
    supplier's nation and the (order's) customer's nation must be the
    specific opposite pair, either direction. Both nation dims BROADCAST
    (2 rows each after the name filter); the only wide joins are the
    orderkey and custkey fact joins; the year comes from the shipdate so
    the two-year cut pushes into the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    pair = F.col("n_name").isin("NATION_3", "NATION_9")
    n1 = _t(spark, sf_dir, "nation").filter(pair).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").filter(pair).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_9")
            )
            | (
                (F.col("supp_nation") == "NATION_9")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q14_promo_revenue_share(spark, sf_dir) -> DataFrame:
    """TPC-H Q14 shape: promo revenue as a percentage of one month's total
    — a conditional aggregate (CASE inside SUM) over the part-joined
    facts. part is the broadcast dim; the month cut pushes to the
    lineitem scan; the division happens once on two decimal-exact sums
    cast to double."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(
                F.lit(0).cast("decimal(18,4)")
            )).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_pct"),
        F.count("*").alias("n_rows"),
    )


def q19_discounted_band_revenue(spark, sf_dir) -> DataFrame:
    """TPC-H Q19 shape: revenue from an OR of three (brand, size band,
    quantity band) conjunctions — the disjunctive-predicate showcase. The
    whole filter is one JVM boolean expression over the part-joined rows;
    the part side prunes to the three brands BEFORE broadcasting (Catalyst
    extracts the common brand disjunction into the dim scan)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    band = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size").between(1, smax))
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    return (
        j.filter(
            band("Brand#11", 5, 1, 11)
            | band("Brand#23", 10, 10, 20)
            | band("Brand#34", 15, 20, 30)
        )
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


def q17_small_quantity_revenue(spark, sf_dir) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue loss from small-quantity
    orders of one brand — lineitems with quantity under 20% of their
    part's average quantity. The correlated scalar subquery (per-part avg)
    is decorrelated by hand into the plan Catalyst would want anyway: one
    partial-agg shuffle over (partkey -> avg), the brand-filtered part dim
    BROADCAST into both sides, and the threshold comparison as a plain
    join-filter. avg of integral quantities is exact in double, so the
    oracle comparison cannot wobble on summation order."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem")
    brand_li = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    thresh = brand_li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("q_thresh")
    )
    return (
        brand_li.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("q_thresh"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_rows"),
        )
    )


def event_funnel(spark, sf_dir) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: each stage's
    first event must occur strictly AFTER the previous stage's (min-ts
    sequential matching, the standard funnel semantics).

    Three user-keyed aggregations chained by broadcast-friendly joins —
    per-user state is three timestamps, so the shuffle stays narrow at any
    event volume; timestamps surface as epoch microseconds so the oracle
    hash is engine-independent."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    users = ev.select("user_id").distinct()
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("vt")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.join(c, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("ct")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("vt").alias("view_us"),
            F.unix_micros("ct").alias("click_us"),
            F.unix_micros("pt").alias("purchase_us"),
            F.col("pt").isNotNull().alias("converted"),
        )
    )


def retention_cohorts(spark, sf_dir) -> DataFrame:
    """Weekly retention matrix: users grouped by signup week (their first
    'signup' event), counted as retained in each later week they have ANY
    event. The cohort triangle every product-analytics engine ships.

    Weeks are integer offsets from epoch (floor(epoch_us / week_us)) so
    the bucketing is engine-exact; per-user state is one signup week, the
    activity set is distinct (user, week) — both narrow shuffles."""
    week_us = 7 * 24 * 3600 * 1_000_000
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp")) / week_us)
        .cast("long")
        .alias("week"),
    )
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("week").alias("cohort_week"))
    )
    active = ev.select("user_id", "week").distinct()
    return (
        active.join(cohort, "user_id")
        .filter(F.col("week") >= F.col("cohort_week"))
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def json_props_stats(spark, sf_dir) -> DataFrame:
    """Semi-structured extraction: pull the numeric field out of the JSON
    props column and aggregate it per event type — the schema-on-read path
    (JSON stays a string in storage; extraction happens in the scan
    projection, JVM-side via get_json_object, no Python)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count("k").alias("n"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").alias("sum_k"),
        F.countDistinct("k").alias("n_distinct_k"),
    )


# --- outer joins, decorrelated subqueries, derived partsupp ------------------


def q13_customer_distribution(spark, sf_dir) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer non-urgent order
    counts — the LEFT OUTER join showcase (customers with zero qualifying
    orders must survive with c_count = 0, which an inner join would drop).

    Scale shape: the outer join and the per-customer count share the
    c_custkey/o_custkey shuffle key; the second groupBy keys on c_count,
    whose cardinality is the max orders-per-customer — tiny at any SF."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q18_large_volume_customers(spark, sf_dir, min_qty: int = 250) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest-volume orders — an
    IN-subquery over a grouped HAVING (orders whose lineitems sum past
    min_qty), decorrelated into one aggregate + join.

    Scale shape: the qty aggregate shuffles on l_orderkey (partial sums
    map-side); the surviving order set is the HAVING's output — small by
    construction — so it broadcasts into orders and customer instead of
    reshuffling the two big tables. Top-100 is TakeOrderedAndProject with
    o_orderkey as the deterministic tiebreak."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > F.lit(min_qty).cast("decimal(18,4)"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sel = orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
    return (
        cust.join(F.broadcast(sel), cust["c_custkey"] == sel["o_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q22_dormant_high_balance(spark, sf_dir) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers with no recent order, by
    nation — a global-scalar subquery (the positive-balance average) plus
    an anti join (adapted: NOT EXISTS over RECENT orders, because at this
    SF every customer has ordered at least once).

    The average compare is exact: instead of dividing (float summation
    order would make the boundary engine-dependent), the filter
    cross-multiplies decimals — acctbal * n_pos > sum_pos.

    Scale shape: the scalar aggregate is one row, broadcast; the anti join
    shuffles on the customer key; the final groupBy keys on nation (25)."""
    cust = _t(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("sum_pos"),
        F.count("*").alias("n_pos"),
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(_dec("c_acctbal") * F.col("n_pos") > F.col("sum_pos"))
        .join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q15_top_supplier(spark, sf_dir) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum revenue in one
    quarter — a scalar-max subquery over a grouped view, kept exact by
    comparing the DECIMAL revenue (ties both engines resolve identically)
    and casting to double only for output.

    Scale shape: one l_suppkey aggregate; the one-row max broadcasts back
    over it — no re-aggregation, no window over the whole vocabulary."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
        ).alias("rev_dec")
    )
    mx = rev.agg(F.max("rev_dec").alias("max_dec"))
    sup = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_dec") == F.col("max_dec"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


def q8_market_share(spark, sf_dir) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part revenue
    per order year — the two-role nation join (customer-side nation decides
    region membership, supplier-side nation gets the share attribution).

    Scale shape: lineitem joins orders on the orderkey shuffle, then
    customer on custkey; part (pre-filtered to PROMO), supplier and both
    nation roles plus region broadcast. The share is a conditional
    decimal-sum ratio evaluated once per year group."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    n_cust = _t(spark, sf_dir, "nation").alias("nc")
    n_supp = _t(spark, sf_dir, "nation").alias("ns")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    j = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n_cust), cust["c_nationkey"] == F.col("nc.n_nationkey"))
        .join(F.broadcast(region), F.col("nc.n_regionkey") == region["r_regionkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(n_supp), sup["s_nationkey"] == F.col("ns.n_nationkey"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("ns.n_name") == "NATION_7", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark, sf_dir) -> DataFrame:
    """TPC-H Q9 shape: profit on red parts by supplier nation and order
    year (adapted: p_retailprice * l_quantity stands in for the
    ps_supplycost term — the testdata ships no partsupp table).

    Scale shape: part (LIKE-filtered), supplier and nation broadcast;
    orders joins on the orderkey shuffle; one decimal sum per
    (nation, year) group."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    amount = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,4)") - _dec("l_discount")
    ) - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q21_sole_failing_supplier(spark, sf_dir) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for the returned line
    in a finished multi-supplier order (adapted: l_returnflag = 'R' stands
    in for the receipt-after-commit lateness predicate — the testdata has
    no commit/receipt dates). EXISTS becomes a left-semi join with a
    non-equi conjunct (same order, different supplier); NOT EXISTS the
    left-anti twin over the returned subset.

    Scale shape: both the semi and the anti key their shuffle on
    l_orderkey; the non-equi supplier test rides along as a join conjunct,
    never a cross product. orders prunes to status 'F' before its join;
    supplier broadcasts; top-100 is TakeOrderedAndProject with the unique
    s_name tiebreak."""
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    ).alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    sup = _t(spark, sf_dir, "supplier")
    cand = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("ok2"))
            & (F.col("l1.l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("ok3"))
            & (F.col("l1.l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .join(orders, F.col("l1.l_orderkey") == orders["o_orderkey"], "left_semi")
        .join(F.broadcast(sup), F.col("l1.l_suppkey") == sup["s_suppkey"])
    )
    return (
        cand.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


def _lineitem_pairs(li: DataFrame) -> DataFrame:
    """The derived partsupp relation: one row per observed
    (l_partkey, l_suppkey) pair with its min unit price — the TPC-H
    partsupp analogue over a schema that ships none. One
    partial-aggregated shuffle on the pair key. (q20 builds its own pair
    aggregate because it needs quantities over a red-filtered fact set,
    not costs over the full one.)"""
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
    )


def q2_min_cost_supplier(spark, sf_dir) -> DataFrame:
    """TPC-H Q2 shape: the cheapest supplier(s) for every mid-size part —
    the correlated-min subquery, decorrelated into ONE window min
    partitioned by part (no self-join, no re-aggregation).

    The unit cost is the min observed l_extendedprice/l_quantity per
    (part, supplier) pair — per-row IEEE division is engine-identical, so
    the min and the equality against it are exact.

    Scale shape: the pair aggregate shuffles once on (part, supplier); the
    part filter broadcasts and prunes BEFORE the window (every pair of a
    part shares its p_size, so the per-part min is unaffected); the window
    partitions by l_partkey — never a global sort."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size").between(4, 6))
    sup = _t(spark, sf_dir, "supplier")
    pairs = _lineitem_pairs(li).join(
        F.broadcast(part), F.col("l_partkey") == part["p_partkey"]
    )
    w = Window.partitionBy("l_partkey")
    best = pairs.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
        .select("s_acctbal", "s_name", "p_partkey", "p_brand", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


def q11_important_parts(spark, sf_dir) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue from one nation's suppliers
    exceeds 0.1% of that nation's total — a group HAVING measured against
    a broadcast global scalar, kept exact by cross-multiplying decimals
    (value * 1000 > total) instead of dividing.

    Scale shape: one l_partkey aggregate over the nation-filtered facts;
    the one-row total is derived from the SAME aggregate (re-agg of the
    partials, not a second corpus scan) and broadcasts back."""
    li = _t(spark, sf_dir, "lineitem")
    sup_k = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 2)
    base = li.join(F.broadcast(sup_k), li["l_suppkey"] == sup_k["s_suppkey"])
    per = base.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice")).alias("value_dec")
    )
    tot = per.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per.crossJoin(F.broadcast(tot))
        .filter(F.col("value_dec") * 1000 > F.col("total_dec"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


def q16_supplier_diversity(spark, sf_dir) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each qualifying
    (brand, type, size) — with a NOT IN exclusion set (negative-balance
    suppliers, the complaints-comment analogue) realized as a left-anti
    join on the distinct pair relation.

    Scale shape: the pair distinct is the only wide shuffle; the exclusion
    set and the filtered part dim broadcast; countDistinct keys on the
    (brand, type, size) triple whose cardinality is the dim's, not the
    fact's."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11") & F.col("p_size").isin(2, 5, 9, 14, 21)
    )
    return (
        pairs.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q20_part_share_suppliers(spark, sf_dir) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than 10% of some red
    part's total quantity — nested aggregates feeding a semi join back to
    supplier. The share compare cross-multiplies decimals (qty * 10 >
    total) so the boundary is exact in both engines.

    Scale shape: facts prune to red parts FIRST (broadcast semi via the
    filtered part dim); the per-pair aggregate is the one wide shuffle and
    the per-part total re-aggregates its partials; the surviving supplier
    keys deduplicate before the left-semi into supplier."""
    li = _t(spark, sf_dir, "lineitem")
    redp = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    li_red = li.join(F.broadcast(redp), li["l_partkey"] == F.col("p_partkey"))
    pairq = li_red.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q_dec")
    )
    totq = pairq.groupBy("l_partkey").agg(F.sum("q_dec").alias("tq_dec"))
    cand = (
        pairq.join(totq, "l_partkey")
        .filter(F.col("q_dec") * 10 > F.col("tq_dec"))
        .select("l_suppkey")
        .distinct()
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        sup.join(cand, sup["s_suppkey"] == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q12_priority_by_returnflag(spark, sf_dir) -> DataFrame:
    """TPC-H Q12 shape (adapted: l_returnflag classes stand in for
    l_shipmode, which the testdata lacks): per line class, how many of the
    year's orders were critical (1-URGENT/2-HIGH) vs not — the
    two-CASE-count classification join.

    Scale shape: the year cut pushes to the lineitem scan; the join
    shuffles on the orderkey; both CASE counts come out of ONE aggregate
    pass (no second scan, no pivot)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~crit, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def order_cadence_by_segment(spark, sf_dir) -> DataFrame:
    """Analytic-window breadth: per market segment, the average and max gap
    in days between a customer's consecutive orders — lag() over a
    per-customer window feeding a segment aggregate.

    Scale shape: the window partitions by o_custkey (never global); the
    customer join brings only (c_custkey, c_mktsegment); the final groupBy
    keys on the 5-value segment."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
        .withColumn(
            "gap_days", F.datediff(F.col("o_orderdate"), F.col("prev_date"))
        )
    )
    return (
        gaps.join(cust, gaps["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("gap_days").alias("sum_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
        )
        .withColumn(
            "avg_gap_days",
            F.round(
                F.col("sum_gap_days").cast("double") / F.col("n_gaps"), 6
            ),
        )
        .orderBy("c_mktsegment")
    )


def event_cooccurrence_pairs(spark, sf_dir, window_s: int = 300) -> DataFrame:
    """Range join, bucketized: which event types follow which within
    window_s seconds of the same user — every ordered pair (a, b) with
    0 < b.ts - a.ts <= window_s, rolled up to a type-pair co-occurrence
    matrix.

    Spark has no native band/range join; the naive theta join
    (a.user = b.user AND b.ts BETWEEN ...) degenerates to a per-user cross
    product. This is the standard blocking rewrite: both sides key on
    (user, floor(ts / window_s)); the probe side ALSO probes the previous
    block (any in-window pair spans at most one block boundary), so the
    join is a plain equi-join on (user, block) — hash-partitioned,
    AQE-skew-splittable — and each qualifying pair is found EXACTLY once
    (a's block is a single value; b's two probe blocks are distinct). The
    residual time predicate filters within the matched block pair.

    Equal timestamps pair in neither direction (strict >): deterministic
    in both engines, no tie-order dependence. Time is integer MICROSECONDS
    on both sides (unix_micros / epoch_us) — the events carry sub-second
    precision, so a seconds truncation would diverge from the oracle."""
    win_us = window_s * 1_000_000
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    a = ev.select(
        F.col("user_id").alias("u"),
        F.col("ts_us").alias("a_ts"),
        F.col("event_type").alias("type_a"),
    ).withColumn("block", F.floor(F.col("a_ts") / win_us))
    b = ev.select(
        F.col("user_id").alias("u2"),
        F.col("ts_us").alias("b_ts"),
        F.col("event_type").alias("type_b"),
    ).withColumn(
        "probe",
        F.explode(
            F.array(
                F.floor(F.col("b_ts") / win_us),
                F.floor(F.col("b_ts") / win_us) - 1,
            )
        ),
    )
    pairs = a.join(
        b, (F.col("u") == F.col("u2")) & (F.col("block") == F.col("probe"))
    ).filter(
        (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + win_us)
    )
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("type_a", "type_b")
    )


def grouping_sets_revenue(spark, sf_dir) -> DataFrame:
    """Explicit GROUPING SETS ((flag, status), (flag), ()) — the general
    form of which rollup/cube are shorthands: per-(flag,status) revenue,
    per-flag subtotals, and the grand total in ONE pass. Catalyst plans it
    as a single Expand + hash aggregate: each input row fans out once per
    set, then one partial-aggregated shuffle — at 10^12 rows that is 3x
    map output for 3 sets, never 3 scans."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.withColumn("rev", rev)
        .groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


def rolling_hour_user_value(spark, sf_dir) -> DataFrame:
    """Event-time RANGE window: per event, the same user's event count and
    value sum over the PRECEDING HOUR (frame = range of the order key, not
    row count — peers at the same timestamp share a frame). The order key
    is epoch microseconds, so the frame bound is a plain numeric range —
    identical semantics in any engine. One shuffle on user_id; state per
    task is one hour of one user's events."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_in_hour"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_value_hour"),
    )


def customer_balance_deciles(spark, sf_dir, exact: bool = False) -> DataFrame:
    """Boundary-based decile assignment + per-decile rollup: per-segment
    decile boundaries from the percentile machinery, broadcast back, and
    the band picked by value comparison (decile 1 = highest balances).
    Deliberately NOT an NTILE window: partitioning a window by the 5-value
    c_mktsegment puts each segment's full customer population through ONE
    task's sort at 100 TB. Here the fact side sees only a broadcast join
    plus a 9-element array fold (whole-stage codegen, no Window at all),
    and the boundary agg is a partial-aggregated shuffle over 5 groups
    carrying a fixed-size sketch (approx_percentile) or value map (exact).

    ``exact``: the library default is approx_percentile (bounded memory at
    corpus scale); the DuckDB oracle needs the interpolating percentile for
    bit-exact quantile_cont parity — same split as textstats.quality_filter.

    Rows exactly AT a boundary band downward (the strict > comparison),
    identically in the SQL twin."""
    cust = _t(spark, sf_dir, "customer")
    fn = "percentile" if exact else "approx_percentile"
    fracs = ", ".join(f"{k / 10}D" for k in range(1, 10))
    bounds = cust.groupBy("c_mktsegment").agg(
        F.expr(f"{fn}(c_acctbal, array({fracs}))").alias("__qb")
    )
    banded = cust.join(F.broadcast(bounds), "c_mktsegment").withColumn(
        "decile",
        F.lit(10)
        - F.aggregate(
            "__qb",
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col("c_acctbal") > b, F.lit(1)).otherwise(F.lit(0)),
        ),
    )
    return banded.groupBy("c_mktsegment", "decile").agg(
        F.count("*").alias("n_customers"),
        F.max(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("top_balance"),
        F.min(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("bottom_balance"),
    )
