"""Partitioned-parquet warehouse: the engine's table layer.

Re-expresses the reference's MergeTree storage conventions (SURVEY.md S3/S4):
bronze and fact tables partitioned by ``event_date`` (``PARTITION BY
toDate(event_ts)``, 01_bronze_tables.sql:26) with rows sorted within
partitions on the MergeTree ORDER BY key so parquet row-group min/max stats
approximate the primary-key skip index; small gold dims unpartitioned.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import BRONZE_SCHEMAS, GOLD_SCHEMAS


def conform_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` onto the declared schema: absent columns materialize
    as typed NULLs, type-widened columns are cast, order follows the
    declaration.  This is the read side of ADDITIVE schema evolution — a
    plan-level projection, so an ALTER is metadata-only and instant even on
    a 100 TB table (ClickHouse's non-mutating ALTERs behave the same way);
    old parquet files are never rewritten."""
    cols = []
    have = {f.name: f.dataType for f in df.schema.fields}
    for f in schema.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name] != f.dataType:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)

#: tables partitioned by event_date + their in-partition sort key
_PARTITIONED_SORT: dict[str, list[str]] = {
    **{name: ["event_ts", "event_id"] for name in BRONZE_SCHEMAS},
    "fact_wazuh_events": ["event_id", "event_ts"],
    "fact_suricata_events": ["event_id", "event_ts"],
    "fact_zeek_events": ["event_id", "event_ts"],
    "bridge_wazuh_event_tag": ["event_id", "event_ts"],
    "bridge_suricata_event_tag": ["event_id", "event_ts"],
    "bridge_zeek_event_tag": ["event_id", "event_ts"],
}

_ALL_SCHEMAS: dict[str, T.StructType] = {**BRONZE_SCHEMAS, **GOLD_SCHEMAS}


class Warehouse:
    """Path-rooted table registry with append / overwrite / read."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        #: mtime-keyed cache of parsed schema overrides — read()/read_window()
        #: consult the override several times per call and run ~30×/tick
        self._override_cache: dict[str, tuple[float, T.StructType]] = {}

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.exists(p) and any(
            not f.startswith((".", "_")) for f in os.listdir(p)
        )

    # -- declared-schema registry (ALTER target) ---------------------------

    def _schema_override_path(self, table: str) -> str:
        return os.path.join(self.root, "_schemas", table + ".json")

    def schema_override(self, table: str) -> T.StructType | None:
        """The persisted post-ALTER schema, if a migration has been applied
        (quality/migrate.py writes it); None = the in-code declaration.
        Parsed once per (file, mtime) — the atomic replace in
        ``save_schema_override`` bumps the mtime, invalidating the cache."""
        p = self._schema_override_path(table)
        try:
            mtime = os.path.getmtime(p)
        except OSError:
            return None
        hit = self._override_cache.get(table)
        if hit is not None and hit[0] == mtime:
            return hit[1]
        with open(p) as fh:
            schema = T.StructType.fromJson(json.load(fh))
        self._override_cache[table] = (mtime, schema)
        return schema

    def save_schema_override(self, table: str, schema: T.StructType) -> None:
        """Persist an ALTERed declared schema — the migration COMMIT.  Only
        quality/migrate.SchemaMigrator should call this (it validates the
        change is additive/widening first)."""
        p = self._schema_override_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(schema.jsonValue(), fh, indent=1)
        os.replace(tmp, p)  # atomic: readers see old or new, never partial

    def schema_for(self, table: str) -> T.StructType:
        schema = self.schema_override(table) or _ALL_SCHEMAS[table]
        if table in _PARTITIONED_SORT and not any(
            f.name == "event_date" for f in schema.fields
        ):
            return T.StructType(
                [*schema.fields, T.StructField("event_date", T.DateType())]
            )
        return schema

    def read(self, table: str) -> DataFrame:
        """Read a table; a missing table reads as empty with its declared
        schema, so every pipeline is total on a fresh warehouse.  The
        ``ingest_batch`` directory level used by exactly-once streaming
        appends is an implementation detail and is hidden from readers.
        After an applied migration the read conforms to the ALTERed schema
        (typed NULLs for added columns, casts for widened ones) — old files
        are served through the new schema without rewrite."""
        if not self.exists(table):
            return self.spark.createDataFrame([], self.schema_for(table))
        override = self.schema_override(table)
        if override is None:
            df = self.spark.read.parquet(self.path(table))
        else:
            # post-ALTER the directory mixes pre- and post-migration files;
            # an inferred read would adopt ONE file's schema and could hide
            # the added column in the others.  Reading with the declared
            # schema is authoritative and free: missing columns surface as
            # NULLs, widened types use the parquet reader's type promotion.
            expected = self.schema_for(table)
            if self._batch_layout(table):
                expected = T.StructType(
                    [*expected.fields, T.StructField("ingest_batch", T.LongType())]
                )
            df = self.spark.read.schema(expected).parquet(self.path(table))
        if "ingest_batch" in df.columns:
            df = df.drop("ingest_batch")
        if override is not None:
            df = conform_to_schema(df, self.schema_for(table))
        return df

    def read_window(self, table: str, start_ts, end_ts) -> DataFrame:
        """Windowed scan with explicit partition pruning: the ts predicate
        alone cannot prune a date-partitioned table, so the event_date
        predicate is added alongside (SURVEY.md §4 partition-pruning note)."""
        df = self.read(table)
        if "event_date" in df.columns:
            df = df.filter(
                (F.col("event_date") >= F.to_date(F.lit(start_ts)))
                & (F.col("event_date") <= F.to_date(F.lit(end_ts)))
            )
        return df.filter(
            (F.col("event_ts") >= F.lit(start_ts)) & (F.col("event_ts") < F.lit(end_ts))
        )

    def append(self, table: str, df: DataFrame, batch_id: int | None = None) -> None:
        """Append rows.  With ``batch_id`` the write is IDEMPOTENT: rows land
        under a ``ingest_batch=<id>`` directory that is atomically replaced on
        replay, so a micro-batch retried after a partial write converges to
        exactly-once end state instead of duplicating (streaming callers pass
        the foreachBatch id).  A table must be written consistently with or
        without batch ids — the two directory layouts don't mix, and mixing
        them makes ``spark.read`` fail on conflicting partition structures —
        so a mismatch against the existing layout is REFUSED here rather than
        discovered at read time."""
        existing = self._batch_layout(table)
        if existing is True and batch_id is None:
            raise ValueError(
                f"table {table!r} uses the ingest_batch layout; "
                "append() without batch_id would corrupt it"
            )
        if existing is False and batch_id is not None:
            raise ValueError(
                f"table {table!r} uses the plain layout; "
                f"append(batch_id={batch_id}) would corrupt it"
            )
        writer_df = self._prep(table, df)
        if batch_id is None:
            target, mode = self.path(table), "append"
        else:
            target = os.path.join(self.path(table), f"ingest_batch={batch_id}")
            mode = "overwrite"
        if table in _PARTITIONED_SORT:
            writer_df.write.mode(mode).partitionBy("event_date").parquet(target)
        else:
            writer_df.write.mode(mode).parquet(target)

    def _batch_layout(self, table: str) -> bool | None:
        """True = existing table uses ``ingest_batch=`` dirs, False = plain
        layout, None = no data yet (either layout may start)."""
        if not self.exists(table):
            return None
        entries = [
            f for f in os.listdir(self.path(table)) if not f.startswith((".", "_"))
        ]
        return any(e.startswith("ingest_batch=") for e in entries)

    def batch_committed(self, table: str, batch_id: int) -> bool:
        """True when ``append(..., batch_id=...)`` has fully committed for
        this id (the replay-skip marker of the streaming sink).  Only the
        job-level ``_SUCCESS`` marker counts: task files are moved into place
        BEFORE job commit, so 'any .parquet present' would let a crash in
        that gap make a replayed batch skip reprocessing and lose rows."""
        p = os.path.join(self.path(table), f"ingest_batch={batch_id}")
        return os.path.exists(os.path.join(p, "_SUCCESS"))

    def overwrite(self, table: str, df: DataFrame) -> None:
        """Full-snapshot replace (SCD2 dims).  The input may derive from the
        table being overwritten, so materialize first (localCheckpoint) —
        dims are small."""
        writer_df = self._prep(table, df).localCheckpoint(eager=True)
        writer_df.write.mode("overwrite").parquet(self.path(table))

    def compact(self, table: str) -> int:
        """Small-file compaction — the engine's analog of MergeTree background
        merges (streaming foreachBatch appends one file set per micro-batch;
        ClickHouse merges parts the same way, SURVEY.md S3/S4).

        Rewrites the table to ONE sorted file per event_date partition
        (hash-repartition on event_date: every date lands in exactly one task,
        tasks run in parallel across dates) via a staging directory + rename
        swap.  Returns the number of data files after compaction.

        MUST run in a single-writer maintenance window: the two renames are
        not jointly atomic (a reader in the gap sees a missing table, and an
        append landing mid-swap would be dropped with the backup).  On a
        failed swap the backup is restored, so a crash cannot strand the
        table; the streaming ingest and the compactor must simply not run
        concurrently — same discipline as ClickHouse's merges owning parts.
        """
        import shutil
        import uuid

        if not self.exists(table):
            return 0
        # go through read(): it collapses the streaming batch dirs AND, on a
        # migrated table, reads with the declared schema — a raw inferred
        # read over mixed pre/post-ALTER files could adopt an old file's
        # schema and silently drop the added column from the rewrite
        df = self.read(table)
        staging = self.path(f".{table}.compact-{uuid.uuid4().hex[:8]}")
        par = self.spark.sparkContext.defaultParallelism
        if table in _PARTITIONED_SORT and "event_date" in df.columns:
            out = df.repartition(par, "event_date").sortWithinPartitions(
                *_PARTITIONED_SORT[table]
            )
            out.write.mode("overwrite").partitionBy("event_date").parquet(staging)
        else:
            df.coalesce(1).write.mode("overwrite").parquet(staging)
        final = self.path(table)
        backup = self.path(f".{table}.old-{uuid.uuid4().hex[:8]}")
        os.rename(final, backup)
        try:
            os.rename(staging, final)
        except BaseException:
            os.rename(backup, final)  # restore — never leave the table missing
            raise
        shutil.rmtree(backup)
        n = 0
        for root, _dirs, files in os.walk(final):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    def _prep(self, table: str, df: DataFrame) -> DataFrame:
        if table in _PARTITIONED_SORT:
            if "event_date" not in df.columns:
                df = df.withColumn("event_date", F.to_date("event_ts"))
            df = df.sortWithinPartitions(*_PARTITIONED_SORT[table])
        return df
