"""Hand-case pins for the ML-metric parity tranche (queries/stats_tests4.py).

The oracle mirror proves Spark ≡ DuckDB; these tests prove both equal the
TEXTBOOK definitions on inputs small enough to compute by hand (the same
two-sided strategy as test_stats_tests.py for Mann-Whitney/KS).
"""

import math

from pyspark.sql import Window
from pyspark.sql import functions as F


def _auc_bruteforce(pairs):
    """AUC by definition: P(score_pos > score_neg) + ½P(tie)."""
    pos = [s for s, l in pairs if l == 1]
    neg = [s for s, l in pairs if l == 0]
    num = 0.0
    for p in pos:
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    return num / (len(pos) * len(neg))


def _auc_grid(spark, pairs):
    """The query's midrank-grid formulation over literal rows."""
    df = spark.createDataFrame(pairs, "sc long, lab int")
    grid = df.groupBy("sc").agg(
        F.sum("lab").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("lab")).cast("long").alias("neg"),
    )
    w = Window.orderBy("sc").rowsBetween(Window.unboundedPreceding, -1)
    cum = grid.select(
        "pos", "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("neg_below"),
    )
    r = cum.groupBy().agg(
        F.sum(F.col("pos") * (2 * F.col("neg_below") + F.col("neg"))).alias("u2"),
        F.sum("pos").alias("p"),
        F.sum("neg").alias("n"),
    ).first()
    return r["u2"] / (2.0 * r["p"] * r["n"])


def test_auc_perfect_separation(spark):
    pairs = [(10, 1), (11, 1), (12, 1), (1, 0), (2, 0), (3, 0)]
    assert _auc_grid(spark, pairs) == 1.0 == _auc_bruteforce(pairs)


def test_auc_ties_and_interleaving(spark):
    pairs = [(5, 1), (5, 0), (3, 1), (7, 0), (6, 1), (2, 0), (5, 1)]
    got = _auc_grid(spark, pairs)
    want = _auc_bruteforce(pairs)
    assert abs(got - want) < 1e-12, (got, want)


def test_auc_random_label_is_half(spark):
    # identical score for every row: AUC must be exactly 0.5 (all ties)
    pairs = [(4, 1), (4, 0), (4, 1), (4, 0), (4, 0)]
    assert _auc_grid(spark, pairs) == 0.5


def test_iv_terms_match_textbook(spark):
    from dev_clickhouse_spark.queries.stats_tests4 import (
        categorical_iv_segment_balance,
    )

    out = {
        r["seg"]: r["iv_term"]
        for r in categorical_iv_segment_balance(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    # recompute from raw counts in pure python
    import duckdb

    rows = duckdb.sql(
        "SELECT c_mktsegment, sum(CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END),"
        " sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)"
        " FROM '/root/testdata/sf0.01/customer.parquet' GROUP BY 1"
    ).fetchall()
    gt = sum(r[1] for r in rows)
    bt = sum(r[2] for r in rows)
    for seg, g, b in rows:
        if g == 0 or b == 0:
            assert seg not in out
            continue
        pg, pb = g / gt, b / bt
        want = math.floor((pg - pb) * math.log(pg / pb) * 1e6 + 0.5) / 1e6
        assert abs(out[seg] - want) < 1e-9, (seg, out[seg], want)


def test_contingency_coeff_bounds_and_chi2(spark):
    from dev_clickhouse_spark.queries.stats_tests4 import (
        contingency_coeff_priority_status,
    )

    r = contingency_coeff_priority_status(
        spark, "/root/testdata/sf0.001"
    ).first()
    assert r["chi2"] >= 0
    assert 0 <= r["contingency_c"] < 1  # C is bounded below 1 by definition
    # identity: C = sqrt(chi2/(chi2+n)) with n = orders rowcount
    import duckdb

    n = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/orders.parquet'"
    ).fetchone()[0]
    want = math.floor(
        math.sqrt(r["chi2"] / (r["chi2"] + n)) * 1e6 + 0.5
    ) / 1e6
    assert abs(r["contingency_c"] - want) < 2e-6
