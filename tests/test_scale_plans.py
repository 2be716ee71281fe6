"""Runtime-adaptivity scale guards (SURVEY.md §4): AQE skew-join
splitting and runtime bloom-filter join pruning, plan-asserted on
synthetic data shaped to trigger them.

These two are the mechanisms that keep the 100 TB plans honest when
static planning guesses wrong: a hot key no longer serializes one
reducer (AQE splits the skewed partition across tasks), and a
selective dim filter prunes fact rows at the scan side before the
shuffle (bloom semi-join reduction). Thresholds are lowered to fire
at test scale; the plan markers are what production plans show too.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    old = {}
    try:
        for k, v in kv.items():
            key = k.replace("__", ".")
            try:
                old[key] = spark.conf.get(key)
            except Exception:
                old[key] = None
            spark.conf.set(key, v)
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_aqe_splits_skewed_join_partition(spark):
    """90% of fact rows share one key: AQE must re-plan the sort-merge
    join with the hot partition split (SortMergeJoin(skew=true)) so a
    single reducer never owns the whole hot key."""
    with _confs(
        spark,
        **{"spark__sql__autoBroadcastJoinThreshold": "-1",
           "spark__sql__adaptive__skewJoin__enabled": "true",
           "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "4KB",
           "spark__sql__adaptive__advisoryPartitionSizeInBytes": "2KB",
           "spark__sql__adaptive__skewJoin__skewedPartitionFactor": "2"},
    ):
        skewed = spark.range(0, 60000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
             .otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"))
        dim = spark.range(0, 60000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = skewed.join(dim, "k")
        # collect() (not count()) so the final AQE plan belongs to THIS
        # DataFrame's QueryExecution — count() plans its own query
        assert len(j.collect()) == 60000  # inner join on distinct dim keys
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:600]


def test_runtime_bloom_filter_prunes_fact_scan(spark, tmp_path):
    """A selective dimension filter must inject a bloom semi-join
    filter on the fact side (bloom_filter_agg on the dim build,
    BloomFilterMightContain / scan-side filter on the fact probe), so
    non-matching fact rows drop before the shuffle."""
    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(0, 300000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")) \
        .write.mode("overwrite").parquet(fact_p)
    spark.range(0, 300000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("f")) \
        .write.mode("overwrite").parquet(dim_p)
    with _confs(
        spark,
        **{"spark__sql__autoBroadcastJoinThreshold": "-1",
           "spark__sql__optimizer__runtime__bloomFilter__enabled": "true",
           "spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold": "0",
           "spark__sql__optimizer__runtime__bloomFilter__creationSideThreshold": "100MB"},
    ):
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).where(F.col("f") == 3)
        j = fact.join(dim, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:600]
        n_dim = dim.count()
        assert j.count() == n_dim  # unique keys: one fact row per dim row


def test_q9_star_join_shape(spark, sf_dir):
    """B36 plan lock: the 5-table star join must keep all three
    dimension joins broadcast (part/supplier/nation), never
    sort-merge them, and reach the (nation, year) agg with exactly
    one hash-partition exchange pair — the shape that survives 100x
    on the fact side."""
    from gcp_data_engineering_workshop_spark.plans.analytics2 import q9_product_profit
    df = q9_product_profit(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3   # part, supplier, nation (+AQE orders)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "partial_sum" in plan                  # map-side combine before the shuffle
    assert "StringContains(p_name,red)" in plan   # part filter pushed to the scan


def test_grouping_sets_expands_before_single_shuffle(spark, sf_dir):
    """B46: the lattice costs ONE fact scan and ONE exchange — the
    Expand node emits the grouping-set rows map-side and the partial
    aggregate collapses them before the shuffle."""
    from gcp_data_engineering_workshop_spark.plans import analytics3 as an3

    plan = an3.grouping_sets_revenue(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1
    assert plan.count("Exchange") == 1
    assert plan.count("FileScan") == 1


def test_scd2_reads_dimension_once(spark, sf_dir):
    """B47: the SCD2 build must not union two dimension reads — one
    customer scan, versions emitted by the explode."""
    from gcp_data_engineering_workshop_spark.plans import analytics3 as an3

    plan = an3.scd2_customer_dim(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("customer.parquet") == 1
    assert "Generate explode" in plan


def test_tokenize_ids_has_no_corpus_side_shuffle(spark, sf_dir):
    """C42: tokenization is a broadcast map — the corpus path from
    scan to probe must contain no Exchange (the only exchanges ever
    allowed are on the tiny vocab build below the broadcast)."""
    from gcp_data_engineering_workshop_spark.plans.textpipeline import tokenize_ids

    plan = tokenize_ids(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    # the ONLY exchanges in the whole plan belong to the tiny vocab
    # build (its agg + TakeOrdered) and the broadcast itself — the
    # corpus path is scan -> explode -> probe with no shuffle, so
    # stripping the vocab subtree (below BroadcastExchange) must
    # leave an exchange-free plan
    assert "BroadcastExchange" in plan
    corpus_side = plan[:plan.index("BroadcastExchange")]
    assert "Exchange" not in corpus_side


def test_dv_read_plan_shapes(spark, tmp_path):
    """Deletion-vector plan guards (r11 third stint): a table
    WITHOUT vectors reads as a bare scan (no join, no metadata
    columns — the zero-overhead contract), and a vectored read
    applies the deleted-position set as a BROADCAST left-anti join
    (a map-side filter, never a shuffle of the data side) while the
    residual predicate still reaches the scan as a pushed filter."""
    from gcp_data_engineering_workshop_spark.sources import txlog as T

    root = str(tmp_path / "tbl")
    T.append(spark.range(2000).selectExpr("id", "id * 2 as v"),
             root, checkpoint_every=0)
    clean = T.read(spark, root)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in clean and "__txlog_dv" not in clean
    # a delete spread across EVERY file (so skipping can't simply
    # drop the vectored files — which it correctly does otherwise)
    T.delete_where(spark, root, "id % 20 = 0", mode="dv",
                   checkpoint_every=0)
    df = T.read_where(spark, root, "v >= 1000")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "PushedFilters: [IsNotNull(v), GreaterThanOrEqual(v,1000)" \
        in plan.replace("\n", " "), plan
    # and the result is exact
    assert df.count() == sum(1 for i in range(2000)
                             if i % 20 and i * 2 >= 1000)
