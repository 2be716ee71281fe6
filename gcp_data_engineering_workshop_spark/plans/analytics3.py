"""Round-3 analytics widening (SURVEY.md §2 B-block, B43-B47):
window-frame, set-operator, grouping-set, and slowly-changing-
dimension shapes that round out the engine's ANSI surface.

Same discipline as plans/analytics.py / analytics2.py: decimal-exact
money math cast to double at the boundary, aggregate-before-window so
frames run over reduced frames, deterministic orderings, and no
unpartitioned windows on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gcp_data_engineering_workshop_spark.catalog import load_table

_DEC = "decimal(18,4)"


def _dec(col: str):
    return F.col(col).cast(_DEC)


def rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B43: trailing 7-day revenue per order priority — a RANGE-frame
    window (interval-based, not row-count-based), the shape behind
    every "rolling 7/28-day metric" dashboard.

    Scale posture: the raw fact table is aggregated to (priority,
    day) FIRST — one map-side-combinable shuffle — so the range
    window runs over ~|priorities| x |days| rows, not 100 TB of
    lineitems. The frame orders by epoch-day (unix_date) with an
    integer [-6, 0] range, which is exactly "this day and the 6
    calendar days before it" including days absent from the data —
    semantics a ROWS frame cannot express when days are missing.
    """
    orders = load_table(spark, "orders", sf_dir)
    daily = (
        orders
        .select(F.col("o_orderpriority"),
                F.to_date("o_orderdate").alias("day"),
                F.col("o_totalprice"))
        .groupBy("o_orderpriority", "day")
        .agg(F.sum(_dec("o_totalprice")).alias("day_rev"),
             F.count(F.lit(1)).alias("n_orders"))
    )
    w = (Window.partitionBy("o_orderpriority")
         .orderBy(F.unix_date(F.col("day")))
         .rangeBetween(-6, 0))
    return daily.select(
        "o_orderpriority", "day",
        F.sum("day_rev").over(w).cast("double").alias("rev_7d"),
        F.sum("n_orders").over(w).alias("n_orders_7d"),
    )


def value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B44: NTILE(10) decile bucketing of event values per event
    type, then per-decile stats — the standard "distribution by
    bucket" report and the percentile-bucket primitive quantile-based
    features build on.

    NOT implemented as `ntile() OVER (PARTITION BY event_type)`:
    with FEW, HUGE groups (5 event types over 100 TB) that window
    funnels each group through one task — the vocab_topk
    scale-killer wearing a partition clause. Instead the global rank
    within each group comes from assign_group_ranks (range-partition
    by (group, value, id) so a group spans ordered partition slices;
    bounded per-(slice, group) offset collect), and the decile is
    NTILE's exact closed form over (rank, group size): with
    q = n div 10 and r = n mod 10, the first r buckets hold q+1
    rows. Output is bit-identical to the window NTILE the oracle
    computes (pytest-asserted too).
    """
    from gcp_data_engineering_workshop_spark.operators.ids import assign_group_ranks

    ev = load_table(spark, "events", sf_dir)
    ranked = assign_group_ranks(
        ev.select("event_type", "value", "event_id"),
        ["event_type"], ["value", "event_id"], rank_col="rnk")
    n = ranked.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = F.col("n") / 10
    big = (F.col("n") % 10) * (F.floor(q) + 1)
    decile = F.when(
        F.col("rnk") <= big,
        F.floor((F.col("rnk") - 1) / (F.floor(q) + 1)) + 1
    ).otherwise(
        (F.col("n") % 10)
        + F.floor((F.col("rnk") - big - 1) / F.floor(q)) + 1)
    return (
        ranked.join(F.broadcast(n), "event_type")
        .withColumn("decile", decile.cast("int"))
        .groupBy("event_type", "decile")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("value").alias("lo"),
             F.max("value").alias("hi"),
             F.sum(F.col("value").cast("decimal(18,6)"))
              .cast("double").alias("sum_value"))
    )


def retention_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B45: INTERSECT / EXCEPT set operators — first-week vs
    last-week user retention. 'retained' = active both weeks
    (INTERSECT), 'churned' = first week only (EXCEPT), 'new' = last
    week only (EXCEPT reversed).

    Set ops plan as distinct-aggregated joins (left-semi / left-anti
    over hashed keys), so each segment costs one shuffle on user_id
    over the pre-filtered, pre-distinct week frames — the filters
    push to the scan.
    """
    ev = load_table(spark, "events", sf_dir)
    wk1 = (ev.where(F.col("ts") < F.lit("2024-01-08 00:00:00"))
           .select("user_id").distinct())
    wkn = (ev.where(F.col("ts") >= F.lit("2024-01-24 00:00:00"))
           .select("user_id").distinct())

    def seg(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")) \
                 .select(F.lit(name).alias("segment"), "n_users")

    return (
        seg("retained", wk1.intersect(wkn))
        .unionAll(seg("churned", wk1.subtract(wkn)))
        .unionAll(seg("new", wkn.subtract(wk1)))
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B46: explicit GROUPING SETS — ((year, status), (year), ()) —
    the asymmetric aggregation lattice neither ROLLUP (B7) nor CUBE
    (B18) expresses: per-status detail within a year plus the year
    total plus the grand total, WITHOUT the (status) margin a CUBE
    would force. One pass over the fact table; Spark expands the sets
    map-side, so the fact scan is paid once.
    """
    orders = load_table(spark, "orders", sf_dir)
    o = orders.select(
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.col("o_orderstatus"), F.col("o_totalprice"))
    return (
        o.groupingSets([["order_year", "o_orderstatus"], ["order_year"], []],
                       "order_year", "o_orderstatus")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
             F.count(F.lit(1)).alias("n_orders"))
    )


def scd2_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B47: Slowly-Changing-Dimension Type 2 build — apply a change
    batch to a dimension, closing superseded rows with an effective
    end date and inserting the new version, keeping full history.
    The warehouse-maintenance counterpart of B28's MERGE upsert.

    The change batch is derived deterministically from the data:
    customers with orders on/after 2000-01-01 move to an activity
    tier ('UPGRADED-GOLD' at >= 3 such orders, else 'UPGRADED-STD').
    Each dimension row is read ONCE: a single left join against the
    aggregated change batch, then an inline array-of-struct explode
    emits either the one unchanged current row or the closed-old +
    new-current pair — no second scan, no union of two dimension
    reads. At 100 TB the join shuffles on the dimension key once
    (or free with both sides bucketed by custkey, see E7).
    """
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    eff = F.lit("2000-01-01").cast("date")
    upd = (
        orders.where(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_recent"))
        .select(F.col("o_custkey"),
                F.when(F.col("n_recent") >= 3, F.lit("UPGRADED-GOLD"))
                 .otherwise(F.lit("UPGRADED-STD")).alias("new_segment"))
    )
    j = cust.join(upd, cust.c_custkey == upd.o_custkey, "left")
    base_from = F.lit("1990-01-01").cast("date")
    null_date = F.lit(None).cast("date")
    versions = F.when(
        F.col("new_segment").isNull(),
        F.array(F.struct(F.col("c_mktsegment").alias("segment"),
                         base_from.alias("valid_from"),
                         null_date.alias("valid_to"),
                         F.lit(True).alias("is_current")))
    ).otherwise(
        F.array(
            F.struct(F.col("c_mktsegment").alias("segment"),
                     base_from.alias("valid_from"),
                     eff.alias("valid_to"),
                     F.lit(False).alias("is_current")),
            F.struct(F.col("new_segment").alias("segment"),
                     eff.alias("valid_from"),
                     null_date.alias("valid_to"),
                     F.lit(True).alias("is_current")),
        )
    )
    return (
        j.select("c_custkey", "c_name", F.explode(versions).alias("v"))
        .select("c_custkey", "c_name", "v.segment", "v.valid_from",
                "v.valid_to", "v.is_current")
    )


def value_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B48: percent_rank / cume_dist per group at VALUE granularity,
    with no per-group window.

    Tied rows share one output row, so the op first aggregates to
    (group, value, count) — map-side combinable — then runs the
    DISTRIBUTED PREFIX-SUM (operators/ids.py group_prefix_sum) over
    the value-level frame. percent_rank's rank() is the min rank of
    the tie group = 1 + rows strictly less = 1 + (cum - cnt), so
    both statistics are closed forms of (cumulative count, group
    total): percent_rank = (cum - cnt)/(n - 1), cume_dist = cum/n —
    exactly the SQL window definitions the oracle computes row-wise.
    """
    from gcp_data_engineering_workshop_spark.operators.ids import group_prefix_sum

    ev = load_table(spark, "events", sf_dir)
    vl = (ev.groupBy("event_type", "value")
          .agg(F.count(F.lit(1)).alias("n_rows")))
    ps = group_prefix_sum(vl, ["event_type"], ["value"], "n_rows",
                          out_col="cum")
    n = vl.groupBy("event_type").agg(F.sum("n_rows").alias("n"))
    return (ps.join(F.broadcast(n), "event_type")
            .select("event_type", "value", "n_rows",
                    F.when(F.col("n") > 1,
                           (F.col("cum") - F.col("n_rows"))
                           / (F.col("n") - 1))
                     .otherwise(F.lit(0.0)).alias("pct_rank"),
                    (F.col("cum") / F.col("n")).alias("cum_dist")))


def zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B49: Z-order (Morton) layout codes for lineitem on
    (l_partkey, l_suppkey) — the clustering key behind
    OPTIMIZE ZORDER BY, computed with pure JVM bit arithmetic
    (sources/layout.py). The min/max grid bounds come from one
    bounded 4-value agg; scaling + interleave then run inside
    whole-stage codegen. The write path (write_zordered: range-
    exchange on the code + in-file sort => tight min/max footer
    stats on BOTH dimensions) is pytest-proven to prune files; this
    query certifies the CODE arithmetic against DuckDB bit for bit.

    Exactness note: floor((x-lo)*(2^16-1)/span) is evaluated in
    double by both engines; (x-lo)*65535 < 2^53 for any key below
    ~2^37, so the product, the correctly-rounded division, and the
    floor are identical IEEE operations on both sides."""
    from gcp_data_engineering_workshop_spark.sources.layout import (
        zorder_code)
    li = load_table(spark, "lineitem", sf_dir)
    code, _ = zorder_code(li, "l_partkey", "l_suppkey")
    return (li.select("l_orderkey", "l_linenumber", "l_partkey",
                      "l_suppkey", code.alias("zcode"))
            .orderBy("zcode", "l_orderkey", "l_linenumber")
            .limit(5000))


def zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B51: the READ side of the Z-order layout (VERDICT r6 #6 — at
    100 TB the layout only matters if the reader exploits it): write
    a lineitem copy clustered by the (l_partkey, l_suppkey) Morton
    curve, then answer a conjunctive box predicate with footer-based
    FILE skipping (sources/layout.prune_files — the Delta/Iceberg
    manifest step) plus Spark's own row-group skipping inside the
    survivors. Pruning is conservative (footer ranges are supersets),
    so the result is EXACTLY the box rows — the oracle filters plain
    lineitem and certifies that no skipped file held a match. The
    pytest asserts the kept-file count is a fraction of the total;
    this query certifies the answer.

    The box is the middle ~20% of each key range, derived from the
    same one-row min/max agg as the layout grid with pure integer
    arithmetic (lo + span*2//5 .. lo + span*3//5) so the oracle
    recomputes identical bounds."""
    import os
    import tempfile

    from gcp_data_engineering_workshop_spark.sources.layout import (
        read_pruned, write_zordered)

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity")
    # keyed by applicationId so concurrent sessions on the same
    # scale factor never race overwrite-vs-read on a shared path
    # (within one session, re-runs still reuse the rewrite)
    path = os.path.join(tempfile.gettempdir(),
                        "spark_graft_zorder_lineitem_"
                        + spark.sparkContext.applicationId + "_"
                        + sf_dir.rstrip("/").rsplit("/", 1)[-1])
    write_zordered(li, path, "l_partkey", "l_suppkey", n_files=16)
    r = li.agg(F.min("l_partkey"), F.max("l_partkey"),
               F.min("l_suppkey"), F.max("l_suppkey")).collect()[0]
    box = {}
    for c, lo, hi in (("l_partkey", int(r[0]), int(r[1])),
                      ("l_suppkey", int(r[2]), int(r[3]))):
        span = hi - lo
        box[c] = (lo + span * 2 // 5, lo + span * 3 // 5)
    return read_pruned(spark, path, box).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        F.col("l_quantity").cast("double").alias("l_quantity"))


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B52: the cohort retention matrix — users grouped by first-
    activity week (their cohort), each cohort tracked across
    week-offsets: how many distinct cohort members were active k
    weeks after joining, and what fraction of the cohort that is.
    The canonical product-analytics query (every BI tool's retention
    screen) in long form: (cohort_week, week_offset, n_active,
    retention).

    Scale shape: one user_id-keyed min-aggregate finds cohorts, one
    broadcast-join-free equi-join attaches them back to events
    (user_id-keyed shuffle), and the matrix is a single distinct-
    count aggregate over (cohort_week, offset) — three linear
    passes, no window functions. retention = exact-integer ratio
    rounded at 1e-6; week arithmetic is integer epoch-day math
    (date_trunc-free, so both engines agree to the day)."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.floor(F.unix_micros("ts") / F.lit(86_400_000_000))
        .alias("day"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    cohorted = (ev.join(first, "user_id")
                .select("user_id",
                        F.floor(F.col("first_day") / 7).alias("cohort_week"),
                        F.floor((F.col("day") - F.col("first_day")) / 7)
                        .alias("week_offset")))
    sizes = (cohorted.where(F.col("week_offset") == 0)
             .groupBy("cohort_week")
             .agg(F.countDistinct("user_id").alias("cohort_size")))
    active = (cohorted.groupBy("cohort_week", "week_offset")
              .agg(F.countDistinct("user_id").alias("n_active")))
    return (active.join(sizes, "cohort_week")
            .select(F.col("cohort_week").cast("bigint").alias("cohort_week"),
                    F.col("week_offset").cast("bigint").alias("week_offset"),
                    F.col("n_active").cast("bigint").alias("n_active"),
                    F.round(F.col("n_active") / F.col("cohort_size"), 6)
                    .alias("retention")))


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B53: the user-flow transition matrix — for each ordered pair
    of event types, how often does a user's next event follow the
    previous one, and with what conditional probability (the Markov
    view product analytics draws as a flow/sankey diagram).

    Per-user next-event via lag over (user_id, ts, event_id) — the
    high-cardinality-small-groups window regime (a user's history
    fits a task; ids.py doctrine), then one (from, to)-keyed count
    aggregate. Ties in ts break on event_id so the sequence is a
    total order in both engines; probability = exact-integer ratio
    on the 1e-6 grid."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.withColumn("next_type",
                           F.lead("event_type").over(w))
             .where(F.col("next_type").isNotNull())
             .groupBy(F.col("event_type").alias("from_type"),
                      F.col("next_type").alias("to_type"))
             .agg(F.count(F.lit(1)).alias("n_transitions")))
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").alias("n_from"))
    return (pairs.join(totals, "from_type")
            .select("from_type", "to_type",
                    F.col("n_transitions").cast("bigint")
                    .alias("n_transitions"),
                    F.round(F.col("n_transitions") / F.col("n_from"), 6)
                    .alias("p_next")))
