"""Shuffle-partition sizing rule (session.partitions_for_factor).

The rule is volume-proportional with a core-count floor and a 1024 cap —
the spark-submit sizing discipline (constant per-task shuffle/sort state
as data grows).  The slope passes through the SPILL_PROBE.json A/B point:
240 ≈ the 256-partition cell that beat the core-count 32 on the heaviest
dedup workers at ×30.  The ×1 floor matters just as much: a blanket
256-partition session default measured a broad 30-50% regression on the
sf0.1 bench (e2e 42.6 → 58.5 s; ingest +130%).
"""

from dev_clickhouse_spark.session import partitions_for_factor


def test_floor_at_core_count():
    assert partitions_for_factor(1, cpus=32) == 32
    assert partitions_for_factor(0.5, cpus=32) == 32
    # small factors never drop below the floor
    assert partitions_for_factor(3, cpus=32) == 32


def test_linear_in_volume_past_floor():
    assert partitions_for_factor(10, cpus=32) == 80
    assert partitions_for_factor(30, cpus=32) == 240
    assert partitions_for_factor(50, cpus=32) == 400
    # doubling data doubles partitions in the linear regime
    assert (
        partitions_for_factor(60, cpus=32)
        == 2 * partitions_for_factor(30, cpus=32)
    )


def test_cap_at_1024():
    assert partitions_for_factor(200, cpus=32) == 1024
    assert partitions_for_factor(10_000, cpus=32) == 1024


def test_respects_cpu_env_default():
    # cpus=None reads $SPARK_GRAFT_CPUS (defaults to 32 in this env)
    assert partitions_for_factor(1) >= 1
