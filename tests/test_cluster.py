"""Semantic k-means clustering (llm/cluster.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_clickhouse_spark.llm.cluster import (
    _assign,
    _quantize,
    kmeans_rounds,
)


def _toy(spark):
    # two tight groups on opposite corners of the plane; the seed rule
    # takes the k lowest vec_ids, so ids 1 and 2 sit in DIFFERENT groups
    rows = [
        (1, [1.0, 1.0]), (3, [1.1, 0.9]), (5, [0.9, 1.1]),
        (2, [-1.0, -1.0]), (4, [-1.1, -0.9]), (6, [-0.9, -1.1]),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).select("vec_id", _quantize(F.col("embedding")).alias("q"))


def test_kmeans_separates_obvious_clusters(spark):
    asg = kmeans_rounds(spark, _toy(spark), k=2, n_rounds=2).collect()
    by_cl = {}
    for r in asg:
        by_cl.setdefault(r["cl"], set()).add(r["vec_id"])
    assert sorted(map(sorted, by_cl.values())) == [[1, 3, 5], [2, 4, 6]]


def test_kmeans_is_deterministic(spark):
    df = _toy(spark)
    a = sorted(map(tuple, kmeans_rounds(spark, df, 2, 2).collect()))
    b = sorted(map(tuple, kmeans_rounds(spark, df, 2, 2).collect()))
    assert a == b


def test_assignment_broadcasts_centroids(spark):
    df = _toy(spark)
    cent = spark.createDataFrame(
        [(0, [1000000, 1000000]), (1, [-1000000, -1000000])],
        "cl int, cq array<long>",
    )
    plan = _assign(df, cent)._jdf.queryExecution().executedPlan().toString()
    # the k×d centroid side must be broadcast, never shuffled
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_argmin_tie_breaks_on_lower_cluster_id(spark):
    df = spark.createDataFrame(
        [(5, [0, 0])], "vec_id long, q array<long>"
    )
    cent = spark.createDataFrame(
        [(1, [3, 4]), (0, [4, 3]), (2, [5, 0])], "cl int, cq array<long>"
    )  # clusters 0 and 1 are equidistant (25); 2 is equal too (25)
    got = _assign(df, cent).collect()[0]
    assert got["cl"] == 0 and got["d"] == 25
