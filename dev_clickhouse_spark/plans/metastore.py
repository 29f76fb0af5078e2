"""DB-backed pipeline metadata store — the engine's runtime control plane.

The reference keeps its pipeline catalog in Postgres
(``metadata.gold_dags`` / ``metadata.gold_pipelines``,
postgres/init/10_metadata.sql:3-34) and the DAG generator loads it at parse
time with a YAML fallback (airflow/dags/generator/gold_pipeline.py:323-371,
393-470): an operator enables/disables a pipeline or changes its window by
EDITING THE STORE, not the code.  This module re-expresses that contract over
any JDBC database:

- **bootstrap/seed** — create the two metadata tables and load them from the
  in-code snapshot or the YAML file (the reference's 10_metadata.sql seed).
- **load** — read the catalog back (Spark JDBC scan, enabled rows only,
  ordered by ``(pipeline_order, pipeline_name)`` exactly like the reference
  query) into :class:`PipelineSpec`s for the runner.
- **operator edits** — ``set_enabled`` / ``set_window`` issue single-row SQL
  UPDATEs, the reference's own access pattern.
- **fallback** — :func:`load_pipeline_specs` degrades to the YAML snapshot
  when no store is reachable, mirroring ``_load_configs_from_file``.

Tested against embedded Derby (in-JVM, no server needed); the SQL sticks to
the common subset so a production deployment pointing at Postgres/MySQL only
changes the JDBC url.  Scale note: the catalog is O(pipelines) rows — the
control plane is driver-side by design; only the DATA plane fans out.

Portability choice: ``depends_on`` is stored as a comma-joined TEXT column
(the reference uses Postgres ``TEXT[]``, which Derby/MySQL lack).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession

from .spec import PipelineSpec, PIPELINES, load_pipelines_yml

_DDL_DAGS = """
CREATE TABLE gold_dags (
  dag_name VARCHAR(128) NOT NULL PRIMARY KEY,
  schedule_cron VARCHAR(64) NOT NULL,
  timezone VARCHAR(64) NOT NULL,
  owner_name VARCHAR(64) NOT NULL,
  max_active_tasks INTEGER NOT NULL,
  default_window_minutes INTEGER NOT NULL,
  enabled BOOLEAN NOT NULL,
  updated_at TIMESTAMP NOT NULL
)
"""

_DDL_PIPELINES = """
CREATE TABLE gold_pipelines (
  dag_name VARCHAR(128) NOT NULL,
  pipeline_name VARCHAR(128) NOT NULL,
  enabled BOOLEAN NOT NULL,
  mode VARCHAR(16) NOT NULL,
  window_minutes INTEGER,
  depends_on VARCHAR(1024),
  target_table VARCHAR(128) NOT NULL,
  pipeline_order INTEGER NOT NULL,
  updated_at TIMESTAMP NOT NULL,
  PRIMARY KEY (dag_name, pipeline_name)
)
"""

#: dag-level defaults used by ``seed`` when none are given — the reference's
#: gold_star_schema dag row (10_metadata.sql:37-55) minus Airflow-isms.
DEFAULT_DAG = {
    "dag_name": "gold_star_schema",
    "schedule_cron": "*/5 * * * *",
    "timezone": "UTC",
    "owner": "data-eng",
    "max_active_tasks": 8,
    "default_window_minutes": 10,
    "enabled": True,
}


class MetadataStore:
    """JDBC-backed metadata catalog with operator-editable rows.

    DDL and single-row edits go through a plain ``java.sql`` connection (the
    py4j gateway — metadata writes are point SQL statements, the reference's
    own access pattern; Spark's JDBC writer only does bulk modes).  Catalog
    READS use the Spark JDBC source, so the load path is the same federated
    scan machinery as S6.  Requires a classic (non-Connect) session for the
    edit path; ``load`` works on any session.
    """

    def __init__(self, spark: SparkSession, url: str, driver: str | None = None):
        self.spark = spark
        self.url = url
        if driver is None and url.startswith("jdbc:derby:"):
            driver = "org.apache.derby.jdbc.EmbeddedDriver"
        self.driver = driver

    # -- raw connection (DDL + point edits) --------------------------------

    def _jvm(self):
        sc = getattr(self.spark, "sparkContext", None)
        gw = getattr(sc, "_gateway", None) if sc is not None else None
        if gw is None:
            raise RuntimeError(
                "MetadataStore edits need a classic SparkSession (the py4j "
                "gateway); under Spark Connect run the edit SQL with any "
                "JDBC client against the same store"
            )
        return gw.jvm

    def _connect(self):
        jvm = self._jvm()
        if self.driver:
            jvm.java.lang.Class.forName(self.driver)
        return jvm.java.sql.DriverManager.getConnection(self.url)

    def _execute(self, *statements: str) -> None:
        conn = self._connect()
        try:
            st = conn.createStatement()
            for sql in statements:
                st.execute(sql)
            st.close()
        finally:
            conn.close()

    def _execute_update(self, sql: str) -> int:
        """Run one DML statement and return the affected-row count, so
        operator edits can refuse to silently no-op on a typo'd name."""
        conn = self._connect()
        try:
            st = conn.createStatement()
            n = st.executeUpdate(sql)
            st.close()
            return int(n)
        finally:
            conn.close()

    def _table_exists(self, name: str) -> bool:
        # probe with a no-row SELECT instead of DatabaseMetaData.getTables:
        # engines fold unquoted identifiers differently (Derby → upper,
        # Postgres → lower), so a cased catalog lookup misses cross-engine
        try:
            self._execute(f"SELECT 1 FROM {name} WHERE 1=0")
            return True
        except Exception:
            return False

    # -- bootstrap / seed --------------------------------------------------

    def bootstrap(self) -> None:
        """Create the metadata tables if absent (10_metadata.sql:3-34)."""
        if not self._table_exists("gold_dags"):
            self._execute(_DDL_DAGS)
        if not self._table_exists("gold_pipelines"):
            self._execute(_DDL_PIPELINES)

    def seed(
        self,
        specs: list[PipelineSpec] | None = None,
        dag: dict | None = None,
    ) -> None:
        """Load the catalog from the in-code snapshot (or explicit specs) —
        the reference's seed INSERT (10_metadata.sql:57-96).  Replaces any
        existing rows for the dag: seeding is the bootstrap migration, edits
        afterwards go through the point-update API."""
        self.bootstrap()
        d = {**DEFAULT_DAG, **(dag or {})}
        specs = list(PIPELINES if specs is None else specs)
        now = dt.datetime.utcnow().strftime("%Y-%m-%d %H:%M:%S")
        q = _sql_quote
        stmts = [
            f"DELETE FROM gold_pipelines WHERE dag_name = {q(d['dag_name'])}",
            f"DELETE FROM gold_dags WHERE dag_name = {q(d['dag_name'])}",
            "INSERT INTO gold_dags VALUES ({}, {}, {}, {}, {}, {}, {}, "
            "{{ts '{}'}})".format(
                q(d["dag_name"]), q(d["schedule_cron"]), q(d["timezone"]),
                q(d["owner"]), int(d["max_active_tasks"]),
                int(d["default_window_minutes"]),
                "true" if d["enabled"] else "false", now,
            ),
        ]
        for order, s in enumerate(specs, start=1):
            stmts.append(
                "INSERT INTO gold_pipelines VALUES ({}, {}, true, {}, {}, {}, "
                "{}, {}, {{ts '{}'}})".format(
                    q(d["dag_name"]), q(s.pipeline_id), q(s.mode),
                    int(s.window_minutes), q(",".join(s.depends_on)),
                    q(s.target_table), order, now,
                )
            )
        self._execute(*stmts)

    def seed_from_yaml(self, path: str | None = None) -> None:
        """Seed the store from the YAML snapshot — the file→DB migration."""
        dag_cfg, specs = load_pipelines_yml(path)
        dag = {k: dag_cfg[k] for k in DEFAULT_DAG if k in dag_cfg}
        self.seed(specs, dag)

    # -- operator edits ----------------------------------------------------

    def set_enabled(
        self, pipeline_name: str, enabled: bool,
        dag_name: str = "gold_star_schema",
    ) -> None:
        """Flip a pipeline on/off AT RUNTIME — the operator edit the
        reference does with an UPDATE on metadata.gold_pipelines.  Raises
        ``LookupError`` when no row matched: a typo'd pipeline (or wrong
        dag) must not silently no-op while the CLI reports success."""
        n = self._execute_update(
            "UPDATE gold_pipelines SET enabled = {}, updated_at = "
            "CURRENT_TIMESTAMP WHERE dag_name = {} AND pipeline_name = {}".format(
                "true" if enabled else "false",
                _sql_quote(dag_name), _sql_quote(pipeline_name),
            )
        )
        if n == 0:
            raise LookupError(
                f"no pipeline {pipeline_name!r} in dag {dag_name!r}"
            )

    def set_window(
        self, pipeline_name: str, window_minutes: int,
        dag_name: str = "gold_star_schema",
    ) -> None:
        """Change a pipeline's incremental window (per-pipeline
        ``window_minutes`` override, reference gold_pipelines.yml:11).
        Raises ``LookupError`` when no row matched (see set_enabled)."""
        n = self._execute_update(
            "UPDATE gold_pipelines SET window_minutes = {}, updated_at = "
            "CURRENT_TIMESTAMP WHERE dag_name = {} AND pipeline_name = {}".format(
                int(window_minutes), _sql_quote(dag_name),
                _sql_quote(pipeline_name),
            )
        )
        if n == 0:
            raise LookupError(
                f"no pipeline {pipeline_name!r} in dag {dag_name!r}"
            )

    # -- load (the runner's view) ------------------------------------------

    def _read(self, table: str):
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
        )
        if self.driver:
            reader = reader.option("driver", self.driver)
        return reader.load()

    def load(
        self, dag_name: str = "gold_star_schema"
    ) -> tuple[dict, list[PipelineSpec]]:
        """Read the catalog back: (dag config, enabled specs in
        ``(pipeline_order, pipeline_name)`` order) — the reference's
        load_configs_from_postgres query shape (gold_pipeline.py:344-361)."""
        # unquoted identifiers fold per-engine (Derby upper-cases, Postgres
        # lower-cases) — normalize column names before field access
        dag_rows = [
            {k.lower(): v for k, v in r.asDict().items()}
            for r in self._read("gold_dags")
            .where(f"dag_name = {_sql_quote(dag_name)}")
            .collect()
        ]
        if not dag_rows:
            raise LookupError(f"dag {dag_name!r} not present in metadata store")
        drow = dag_rows[0]
        dag = {
            "dag_name": drow["dag_name"],
            "schedule_cron": drow["schedule_cron"],
            "timezone": drow["timezone"],
            "owner": drow["owner_name"],
            "max_active_tasks": int(drow["max_active_tasks"]),
            "default_window_minutes": int(drow["default_window_minutes"]),
            "enabled": bool(drow["enabled"]),
        }
        rows = [
            {k.lower(): v for k, v in r.asDict().items()}
            for r in self._read("gold_pipelines")
            .where(f"dag_name = {_sql_quote(dag_name)}")
            .orderBy("pipeline_order", "pipeline_name")
            .collect()
        ]
        specs = [
            PipelineSpec(
                pipeline_id=r["pipeline_name"],
                target_table=r["target_table"],
                mode=r["mode"],
                window_minutes=int(
                    r["window_minutes"]
                    if r["window_minutes"] is not None
                    else dag["default_window_minutes"]
                ),
                depends_on=tuple(
                    p for p in (r["depends_on"] or "").split(",") if p
                ),
            )
            for r in rows
            if r["enabled"]
        ]
        return dag, specs


def _sql_quote(s: str) -> str:
    return "'" + str(s).replace("'", "''") + "'"


def load_pipeline_specs(
    spark: SparkSession,
    url: str | None = None,
    dag_name: str = "gold_star_schema",
    yaml_path: str | None = None,
) -> tuple[dict, list[PipelineSpec]]:
    """Resolve the pipeline catalog: DB store first, YAML snapshot fallback —
    the reference's two-tier load (gold_pipeline.py:498-507: postgres configs
    ``or`` file configs).  ``url=None`` goes straight to the snapshot."""
    if url is not None:
        try:
            return MetadataStore(spark, url).load(dag_name)
        except Exception as e:
            # unreachable/empty store → snapshot, like the reference — but
            # LOUDLY: a broken store (bad driver, auth, schema typo) that
            # silently served the stale snapshot would make operator edits
            # appear to take effect while the runner ignores them forever
            import warnings

            warnings.warn(
                f"metadata store {url!r} unusable ({type(e).__name__}: {e}); "
                "falling back to the YAML pipeline snapshot — operator edits "
                "in the store will NOT take effect",
                RuntimeWarning,
                stacklevel=2,
            )
    dag_cfg, specs = load_pipelines_yml(yaml_path)
    return {**DEFAULT_DAG, **dag_cfg}, specs
