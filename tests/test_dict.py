"""SparkDictionary (dictGet analog) contract tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dev_clickhouse_spark.functions.dict import SparkDictionary


def test_dict_get_and_default(spark):
    dim = spark.createDataFrame(
        [(1, "us-east", 10), (2, "eu-west", 20), (3, None, 30)],
        "k long, name string, qty long",
    )
    d = SparkDictionary(dim, "k", ["name", "qty"])
    probe = spark.createDataFrame([(1,), (3,), (9,)], "k long")
    got = {
        r["k"]: (r["n"], r["nd"], r["q"], r["h"])
        for r in probe.select(
            "k",
            d.get("name", "k").alias("n"),
            d.get_or_default("name", "k", "unknown").alias("nd"),
            d.get("qty", F.col("k")).alias("q"),
            d.has("k").alias("h"),
        ).collect()
    }
    assert got[1] == ("us-east", "us-east", 10, True)
    # key 3 exists (has=True) even though its 'name' attribute is NULL
    assert got[3] == (None, "unknown", 30, True)
    assert got[9] == (None, "unknown", None, False)


def test_dict_refuses_unbounded_dim(spark):
    big = spark.range(50).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    with pytest.raises(ValueError, match="broadcast.*join"):
        SparkDictionary(big, "k", ["v"], max_rows=10)


def test_dict_refuses_duplicate_keys(spark):
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string")
    with pytest.raises(ValueError, match="not unique"):
        SparkDictionary(dup, "k", ["v"])


def test_dict_skips_null_keys(spark):
    dim = spark.createDataFrame([(None, "x"), (2, "y")], "k long, v string")
    d = SparkDictionary(dim, "k", ["v"])
    probe = spark.createDataFrame([(2,)], "k long")
    assert probe.select(d.get("v", "k")).collect()[0][0] == "y"


def test_hierarchical_dictionary(spark):
    from pyspark.sql import functions as F

    from dev_clickhouse_spark.functions.dict import SparkDictionary

    dim = spark.createDataFrame(
        [(1, "root"), (2, "a"), (3, "b"), (4, "leaf")], "k long, name string"
    )
    d = SparkDictionary(dim, "k", ["name"])
    d.set_hierarchy({1: None, 2: 1, 3: 1, 4: 2})
    df = spark.createDataFrame([(4,), (3,), (1,), (99,)], "k long")
    got = {
        r["k"]: (list(r["h"]), r["in1"], r["in3"])
        for r in df.select(
            "k",
            d.get_hierarchy("k").alias("h"),
            d.is_in("k", F.lit(1)).alias("in1"),
            d.is_in("k", F.lit(3)).alias("in3"),
        ).collect()
    }
    assert got[4] == ([4, 2, 1], True, False)
    assert got[3] == ([3, 1], True, True)   # dictIsIn includes self
    assert got[1] == ([1], True, False)
    assert got[99] == ([99], False, False)  # unknown key: just itself


def test_hierarchy_cycle_refused(spark):
    import pytest as _pytest

    from dev_clickhouse_spark.functions.dict import SparkDictionary

    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k long, name string")
    d = SparkDictionary(dim, "k", ["name"])
    with _pytest.raises(ValueError, match="cycle"):
        d.set_hierarchy({1: 2, 2: 1})
