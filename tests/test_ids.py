"""dense_ids: bijection + determinism at non-trivial scale (regression for
the repartitionByRange sampling bug — boundaries differing between actions
produced out-of-range ids at millions of keys)."""

from pyspark.sql import functions as F

from graph_data_science_spark.graph.ids import dense_ids


def test_dense_ids_bijection_200k(spark):
    df = spark.range(200_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k1"), F.pmod("id", F.lit(7)).alias("k2")
    )
    ids = dense_ids(df, ["k1", "k2"]).persist()
    n = ids.count()
    assert n == 200_000
    stats = ids.agg(
        F.min("node_id").alias("lo"),
        F.max("node_id").alias("hi"),
        F.countDistinct("node_id").alias("d"),
    ).collect()[0]
    assert (stats["lo"], stats["hi"], stats["d"]) == (0, n - 1, n)
    ids.unpersist()


def test_dense_ids_deterministic_across_evaluations(spark):
    df = spark.range(50_000).select(F.concat(F.lit("x"), F.col("id")).alias("k"))
    a = dense_ids(df, ["k"])
    b = dense_ids(df, ["k"])
    # Same key set ⇒ identical mapping, including when the plan is
    # re-evaluated from scratch (no sampling anywhere).
    mism = (
        a.withColumnRenamed("node_id", "id_a")
        .join(b.withColumnRenamed("node_id", "id_b"), "k")
        .filter(F.col("id_a") != F.col("id_b"))
        .count()
    )
    assert mism == 0


def test_dense_ids_bijection_at_multiple_bucket_counts(spark):
    # Explicit bucket counts must each give a bijection; a recorded count
    # reproduces the identical mapping bit-for-bit.
    from graph_data_science_spark.graph.ids import bucket_count_for

    df = spark.range(20_000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    for nb in (64, 256, 1024):
        ids = dense_ids(df, ["k"], num_buckets=nb)
        stats = ids.agg(
            F.min("node_id").alias("lo"),
            F.max("node_id").alias("hi"),
            F.countDistinct("node_id").alias("d"),
        ).collect()[0]
        assert (stats["lo"], stats["hi"], stats["d"]) == (0, 19_999, 20_000)
    a = dense_ids(df, ["k"], num_buckets=512)
    b = dense_ids(df, ["k"], num_buckets=512)
    assert (
        a.withColumnRenamed("node_id", "id_a")
        .join(b.withColumnRenamed("node_id", "id_b"), "k")
        .filter(F.col("id_a") != F.col("id_b"))
        .count()
    ) == 0
    # Derived bucket count is a deterministic function of the key count.
    assert bucket_count_for(1_000) == 256
    assert bucket_count_for(10**12) == 2**19
