"""Sinks & layout (SURVEY.md §2.A + §4.4): partitioned parquet writes,
csv/json round-trips, bucketed tables with shuffle-free joins, and
range-partitioned sorted writes."""

from pyspark.sql import functions as F

from pystreams_spark.io import load_table, read_csv, read_json, write_parquet
from pystreams_spark.plans import executed_plan, shuffle_count


def test_partitioned_parquet_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_status")
    write_parquet(o, path, partition_by=["o_orderstatus"])

    back = spark.read.parquet(path)
    assert back.count() == o.count()
    # partition pruning: filtering on the partition column must scan a
    # subset of files, visible as PartitionFilters in the plan
    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = executed_plan(pruned)
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan.replace("#", "").replace(
        "o_orderstatus1", "o_orderstatus"
    ) or "PartitionFilters" in plan
    assert pruned.count() == o.filter(F.col("o_orderstatus") == "F").count()


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    n = load_table(spark, sf_dir, "nation")
    csv_path, json_path = str(tmp_path / "n_csv"), str(tmp_path / "n_json")
    n.write.option("header", True).csv(csv_path)
    n.write.json(json_path)

    csv_back = read_csv(spark, csv_path, n.schema, header=True)
    json_back = read_json(spark, json_path, n.schema)
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(csv_back) == key(n)
    assert key(json_back) == key(n)


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both sides on the join key pre-materializes the
    exchange: the join plans with zero Exchange operators."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "orders_bkt"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "lineitem_bkt"
    )
    ob, lb = spark.table("orders_bkt"), spark.table("lineitem_bkt")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy("o_orderstatus").count()
        # the join itself needs no exchange; only the tiny post-agg one
        plan = executed_plan(joined)
        n_shuffles = shuffle_count(joined)
        assert "SortMergeJoin" in plan
        assert n_shuffles <= 1, plan
        assert joined.count() == 3
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_repartition_by_range_sorted_write(spark, sf_dir, tmp_path):
    """repartitionByRange + sortWithinPartitions: globally range-
    clustered files — what a downstream range-pruning reader wants."""
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_ranged")
    (
        li.repartitionByRange(4, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    assert back.count() == li.count()


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """DPP: a filter on the DIM side of a join prunes partitions of the
    partitioned FACT at runtime — at 100 TB this is the difference
    between scanning one status partition and scanning the table when
    the selective predicate lives on the dimension."""
    o = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part_status")
    write_parquet(o, path, partition_by=["o_orderstatus"])
    fact = spark.read.parquet(path)

    # the dim filter must be on a NON-join column, so the surviving
    # status values are only known at runtime — a static filter on the
    # join key would be constraint-propagated without DPP
    status_counts = o.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    n_max = status_counts.agg(F.max("n")).collect()[0][0]
    dim = status_counts.filter(F.col("n") == n_max)

    joined = fact.join(F.broadcast(dim), "o_orderstatus")
    plan = executed_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expected = o.join(dim.select("o_orderstatus"), "o_orderstatus").count()
    assert joined.count() == expected


def test_json_corrupt_record_handling(spark, tmp_path):
    """PERMISSIVE ingestion: malformed JSON lines land in the corrupt-
    record column instead of failing the 100 TB job; DROPMALFORMED
    silently drops them."""
    p = tmp_path / "messy.json"
    p.write_text('{"k": 1, "v": "a"}\n{"k": bad\n{"k": 3, "v": "c"}\n')
    schema = "k long, v string, _corrupt_record string"
    df = (
        spark.read.schema(schema)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
        .cache()
    )
    try:
        ok = df.filter(F.col("_corrupt_record").isNull()).count()
        bad = df.filter(F.col("_corrupt_record").isNotNull()).count()
        assert (ok, bad) == (2, 1)
    finally:
        df.unpersist()
    dropped = (
        spark.read.schema("k long, v string")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert dropped.count() == 2


def test_text_lines_source(spark, tmp_path):
    # Files.lines analog: stream of lines with the standard `value` column
    from pystreams_spark.io import read_text_lines

    p = tmp_path / "lines.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    df = read_text_lines(spark, str(p))
    assert df.columns == ["value"]
    assert sorted(r.value for r in df.collect()) == ["alpha", "beta", "gamma"]
