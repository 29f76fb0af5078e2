"""Refreshable materialized views — ClickHouse ``CREATE MATERIALIZED
VIEW … REFRESH EVERY <interval> [DEPENDS ON …]`` (24.x).

Unlike the streaming MVs (``sources/json_events.py`` fan-out, applied
per insert block), a refreshable MV periodically re-runs its whole
SELECT and atomically replaces the target table — the right tool for
rollups whose inputs mutate (lightweight DELETE/UPDATE, dictionary
reloads) where incremental insert-time state would go stale.

Spark-first mapping: the SELECT is a ``build(spark) -> DataFrame``
callable (usually a registry query or a ``spark.sql`` string), the
target is a warehouse table, and the swap rides
``Warehouse.overwrite``'s staged write.  Scheduling is a driver-side
tick (``run_pending()``), NOT a thread by default — on a real cluster
the tick lives in the orchestrator (the reference runs gold refreshes
from Airflow on a schedule; SURVEY §3.2), and a deterministic tick is
what tests can drive.  ``DEPENDS ON`` re-runs dependents after their
upstreams inside one tick, topologically.

``system.view_refreshes`` analog: one row per view with last refresh
time/duration/status/exception and the next scheduled time — the
monitoring surface CH exposes for these views.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .warehouse import Warehouse


@dataclass
class _ViewSpec:
    name: str
    build: Callable[[SparkSession], DataFrame]
    interval_sec: float
    depends_on: list[str] = field(default_factory=list)
    last_start: float | None = None
    last_duration_s: float | None = None
    status: str = "scheduled"   # scheduled | ok | error
    exception: str | None = None
    refresh_count: int = 0


class RefreshableViews:
    """Registry + scheduler for refreshable MVs over one warehouse."""

    def __init__(self, spark: SparkSession, wh: Warehouse):
        self.spark = spark
        self.wh = wh
        self._views: dict[str, _ViewSpec] = {}

    def create(
        self,
        name: str,
        build: Callable[[SparkSession], DataFrame],
        refresh_every_sec: float,
        depends_on: list[str] | None = None,
        populate: bool = True,
    ) -> None:
        """``CREATE MATERIALIZED VIEW name REFRESH EVERY n SECOND
        [DEPENDS ON …] AS SELECT …`` — ``populate=True`` runs the first
        refresh immediately (CH runs an initial refresh after DDL unless
        the view is created EMPTY)."""
        if name in self._views:
            raise ValueError(f"refreshable view {name!r} already exists")
        for dep in depends_on or []:
            if dep not in self._views:
                raise ValueError(
                    f"DEPENDS ON unknown refreshable view {dep!r}"
                )
        spec = _ViewSpec(
            name=name, build=build, interval_sec=float(refresh_every_sec),
            depends_on=list(depends_on or []),
        )
        self._views[name] = spec
        if populate:
            self._refresh(spec)

    def refresh(self, name: str) -> None:
        """``SYSTEM REFRESH VIEW name`` — immediate out-of-schedule run."""
        self._refresh(self._views[name])

    def _refresh(self, spec: _ViewSpec) -> None:
        t0 = time.monotonic()
        spec.last_start = time.time()
        try:
            df = spec.build(self.spark)
            self.wh.save_schema_override(spec.name, df.schema)
            self.wh.overwrite(spec.name, df)
            spec.status, spec.exception = "ok", None
            spec.refresh_count += 1
        except Exception as e:  # noqa: BLE001 — status surface, rethink raise
            spec.status, spec.exception = "error", str(e)[:500]
        finally:
            spec.last_duration_s = round(time.monotonic() - t0, 3)

    def _due(self, spec: _ViewSpec, now: float) -> bool:
        if spec.last_start is None:
            return True
        return now - spec.last_start >= spec.interval_sec

    def run_pending(self, now: float | None = None) -> list[str]:
        """One scheduler tick: refresh every due view, upstreams before
        dependents (a dependent whose upstream refreshed THIS tick is
        also refreshed, the DEPENDS ON contract).  Returns the names
        refreshed, in execution order."""
        now = time.time() if now is None else now
        refreshed: list[str] = []
        done: set[str] = set()

        def visit(spec: _ViewSpec) -> bool:
            if spec.name in done:
                return spec.name in refreshed
            done.add(spec.name)
            upstream_ran = False
            for dep in spec.depends_on:
                upstream_ran |= visit(self._views[dep])
            if self._due(spec, now) or upstream_ran:
                self._refresh(spec)
                refreshed.append(spec.name)
                return True
            return False

        for spec in list(self._views.values()):
            visit(spec)
        return refreshed

    def view_refreshes(self) -> list[dict]:
        """``system.view_refreshes`` analog."""
        return [
            {
                "view": s.name,
                "status": s.status,
                "last_refresh_time": s.last_start,
                "last_duration_s": s.last_duration_s,
                "next_refresh_time": (
                    None if s.last_start is None
                    else s.last_start + s.interval_sec
                ),
                "refresh_count": s.refresh_count,
                "exception": s.exception,
                "depends_on": list(s.depends_on),
            }
            for s in self._views.values()
        ]
