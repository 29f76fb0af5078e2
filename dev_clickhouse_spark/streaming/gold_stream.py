"""Continuous ELT: streaming ingest that also refreshes gold per micro-batch.

The reference couples a continuously-consuming Kafka table with a */5 cron DAG
(SURVEY.md §3.1-3.2) — ingest is streaming, gold is scheduled.  This module
closes the loop inside one Structured Streaming query: after each
micro-batch's bronze appends, the gold pipelines run over that batch's
event-time span.  Gold stays correct under replays because every gold writer
is idempotent (anti-join guards / SCD2 snapshot protocol), so reprocessing a
batch after a crash re-derives the same rows.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.runner import PipelineRunner
from .bronze_stream import BronzeStream


class ContinuousPipeline(BronzeStream):
    """BronzeStream + per-batch gold refresh over the batch's event-time span
    (padded by ``slack_minutes`` to absorb cross-batch stragglers)."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        checkpoint_root: str,
        dedupe: bool = False,
        slack_minutes: int = 5,
        pipeline_ids: set[str] | None = None,
        metadata_url: str | None = None,
        metadata_reload_batches: int = 10,
        maintenance_every_batches: int = 0,
    ):
        """``metadata_url`` points the per-batch gold refresh at the DB
        metadata store (plans/metastore.py): the pipeline catalog reloads
        every ``metadata_reload_batches`` micro-batches, so an operator's
        ``set_enabled`` edit reaches the RUNNING stream without a restart —
        the streaming analog of the reference's DAG generator re-reading
        metadata.gold_pipelines on its parse interval
        (gold_pipeline.py:498-507).  ``set_window`` edits apply to the
        SCHEDULED path (``run_latest`` trailing windows); the stream's
        refresh window derives from each batch's event span, which
        ``window_minutes`` does not parameterize."""
        super().__init__(spark, warehouse_root, checkpoint_root, dedupe)
        self.runner = PipelineRunner(spark, warehouse_root)
        self.slack = dt.timedelta(minutes=slack_minutes)
        self.pipeline_ids = pipeline_ids
        self.metadata_url = metadata_url
        self.metadata_reload_batches = max(1, metadata_reload_batches)
        self._batches_since_reload = 0
        # 0 = maintenance owned elsewhere (orchestrator / soak driver);
        # N>0 = this stream is the single compactor, running a tiered
        # compact+GC(+declared TTL) cycle every N micro-batches
        self.maintenance_every_batches = maintenance_every_batches
        self._batches_since_maintenance = 0
        if metadata_url is not None:
            self._reload_pipelines(initial=True)

    def _reload_pipelines(self, initial: bool = False) -> None:
        """Initial load may fall back to the YAML snapshot (stream must come
        up even if the store is down); PERIODIC reloads must not — a
        transient store outage mid-run would otherwise silently revert
        operator edits (e.g. re-enable a disabled pipeline) to the snapshot.
        On a failed periodic reload we keep the last-good catalog and warn."""
        from ..plans.metastore import MetadataStore, load_pipeline_specs

        if initial:
            dag, specs = load_pipeline_specs(self.spark, self.metadata_url)
        else:
            try:
                dag, specs = MetadataStore(
                    self.spark, self.metadata_url
                ).load("gold_star_schema")
            except Exception as e:
                import warnings

                warnings.warn(
                    f"metadata store reload failed ({type(e).__name__}: {e});"
                    " keeping the last-good pipeline catalog",
                    RuntimeWarning,
                    stacklevel=2,
                )
                return
        self.runner.pipelines = specs
        self.runner.max_active_tasks = int(dag.get("max_active_tasks", 8))

    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        super()._process_batch(batch, batch_id)
        if self.metadata_url is not None:
            self._batches_since_reload += 1
            if self._batches_since_reload >= self.metadata_reload_batches:
                self._batches_since_reload = 0
                self._reload_pipelines()
        span = self._batch_event_span(batch)
        if span is None:
            return
        lo, hi = span
        start, end = lo - self.slack, hi + dt.timedelta(microseconds=1)
        self.runner.run_window(start, end, pipeline_ids=self.pipeline_ids)
        # continuous observability: the same lag/volume/drift family the
        # scheduled tick persists (monitoring.* parity)
        self.runner.monitor_tick(start, end)
        # refreshable MVs registered on the runner tick with each batch,
        # so rollups over freshly-refreshed (or mutated) gold converge
        # inside the stream's own cadence
        if self.runner.refreshable is not None:
            self.runner.refreshable.run_pending()
        if self.maintenance_every_batches > 0:
            self._batches_since_maintenance += 1
            if (
                self._batches_since_maintenance
                >= self.maintenance_every_batches
            ):
                self._batches_since_maintenance = 0
                self.runner.maintenance_tick(gc_min_age_sec=0.0)

    def _batch_event_span(self, batch: DataFrame):
        """Event-time min/max across the three routed projections (the batch
        is already parsed + checkpointed by the parent)."""
        from ..sources.json_events import extract_all

        lo = hi = None
        for df in extract_all(batch).values():
            row = df.agg(
                F.min("event_ts").alias("lo"), F.max("event_ts").alias("hi")
            ).first()
            if row.lo is not None:
                lo = row.lo if lo is None else min(lo, row.lo)
                hi = row.hi if hi is None else max(hi, row.hi)
        return None if lo is None else (lo, hi)
