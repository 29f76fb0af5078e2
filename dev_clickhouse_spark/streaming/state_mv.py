"""Streaming materialized view over MERGEABLE aggregate states.

ClickHouse's AggregatingMergeTree MV pattern: a materialized view folds the
incoming stream into ``-State`` rows (``uniqState``, ``sumState``, …) and
readers finish with ``-Merge`` — the rollup is maintained ONLINE without
ever re-scanning history (the reference's nearest analog is the Kafka MV
fan-out, ``clickhouse/init/02_kafka_ingest.sql.tmpl``, which materializes
raw rows; this is the pre-aggregated form a 100 TB stream needs).

Spark-first: ``foreachBatch`` folds each micro-batch into per-(day, type)
state rows — count, sum, and a DataSketches HLL sketch of user_id
(``queries.state_rollup.daily_user_states``) — and appends them through the
Warehouse manifest ledger, so a replayed batch converges exactly-once.  The
read side (``merged``) unions states per key: counts/sums by summation, HLL
by register union (lossless).  The state table grows by (days × types) rows
per batch — kilobytes — regardless of stream volume, and compaction folds
the per-batch members like any warehouse table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pyspark.sql import types as T

from ..plans.warehouse import Warehouse
from ..queries.state_rollup import daily_user_states, merge_user_states

STATE_TABLE = "mv_user_state"

#: the analytics `events` stream shape (testdata/TESTDATA.md); the on-disk
#: test parquet stores ts as TIMESTAMP(NANOS) which batch reads convert in
#: io.load_table — streaming sources here receive micro-batch files written
#: with plain timestamps, so the declared schema is the converted one
EVENTS_STREAM = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


class StateRollupMV:
    """foreachBatch pipeline: event micro-batches → mergeable state rows."""

    def __init__(self, spark: SparkSession, warehouse_root: str,
                 checkpoint_root: str):
        self.spark = spark
        self.wh = Warehouse(spark, warehouse_root)
        self.checkpoint_root = checkpoint_root

    def from_files(self, input_dir: str) -> StreamingQuery:
        """Consume parquet micro-batches with the raw events schema."""
        stream = (
            self.spark.readStream.schema(EVENTS_STREAM)
            .option("maxFilesPerTrigger", "1")
            .parquet(input_dir)
        )
        return (
            stream.writeStream.foreachBatch(self._process_batch)
            .option(
                "checkpointLocation",
                os.path.join(self.checkpoint_root, "state_mv"),
            )
            .trigger(availableNow=True)
            .start()
        )

    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        # idempotent: append() skips batch_ids already in the manifest
        # ledger, so a replay after a mid-commit crash cannot double states
        self.wh.append(STATE_TABLE, daily_user_states(batch),
                       batch_id=batch_id)

    def merged(self) -> DataFrame:
        """The ``-Merge`` read: current rollup over every committed state."""
        return merge_user_states(self.wh.read(STATE_TABLE))
