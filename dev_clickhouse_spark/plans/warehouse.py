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
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import BRONZE_SCHEMAS, CORPUS_SCHEMAS, GOLD_SCHEMAS


def _strip_scheme(p: str) -> str:
    """Local filesystem path of a Spark ``_metadata.file_path`` URI."""
    if p.startswith("file://"):
        return p[7:]
    if p.startswith("file:"):
        return p[5:]
    return p


def _rename_exchange(p1: str, p2: str) -> bool:
    """Atomically EXCHANGE two directory entries via Linux
    ``renameat2(RENAME_EXCHANGE)`` — the syscall ClickHouse's Atomic
    database uses for ``EXCHANGE TABLES``, leaving no instant where
    either name is missing (the r12 soak's concurrent readers caught
    the 3-rename fallback's window: a reader planning a query exactly
    between two renames served declared-empty).  Returns False when the
    syscall is unavailable (non-Linux / old kernel / cross-device) so
    the caller can fall back."""
    try:
        import ctypes
        import ctypes.util

        libc = ctypes.CDLL(ctypes.util.find_library("c"), use_errno=True)
        AT_FDCWD = -100
        RENAME_EXCHANGE = 2
        rc = libc.renameat2(
            AT_FDCWD, os.fsencode(p1), AT_FDCWD, os.fsencode(p2),
            RENAME_EXCHANGE,
        )
        return rc == 0
    except Exception:
        return False


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

_ALL_SCHEMAS: dict[str, T.StructType] = {
    **BRONZE_SCHEMAS, **GOLD_SCHEMAS, **CORPUS_SCHEMAS,
}


class Warehouse:
    """Path-rooted table registry with append / overwrite / read.

    Batch-append (streaming) tables use a MANIFEST layout: the live member
    directories are listed in ``_manifest/v<K>.json`` and a ``CURRENT``
    pointer file names the live version (flipped with an atomic
    ``os.replace``).  Readers resolve CURRENT once and scan exactly the
    listed members, so compaction can rewrite members and flip the pointer
    WHILE appends land — the ClickHouse-parts/Iceberg-snapshot discipline
    instead of a single-writer maintenance window.  On a real deployment the
    pointer flip maps to a metastore row or an object-store conditional PUT;
    here it is a rename on the local filesystem."""

    #: version files kept after a flip (debugging/undo); older ones pruned
    _MANIFEST_KEEP = 10

    def __init__(
        self, spark: SparkSession, root: str, codec: str | None = None
    ):
        self.spark = spark
        self.root = root
        #: parquet compression codec for every warehouse write (None =
        #: session default, snappy).  ClickHouse tables default to heavier
        #: compression (LZ4 columns + ZSTD-leaning profiles); at 100 TB
        #: ``codec="zstd"`` trades CPU for the 1.5-2x storage/IO cut the
        #: reference gets from its column codecs.
        self.codec = codec
        #: mtime-keyed cache of parsed schema overrides — read()/read_window()
        #: consult the override several times per call and run ~30×/tick
        self._override_cache: dict[str, tuple[float, T.StructType]] = {}
        self._footer_cols_cache: dict[str, tuple[float, set]] = {}
        self._footer_types_cache: dict[str, tuple[float, dict]] = {}
        self._json_meta_cache: dict[str, tuple] = {}
        #: inferred-schema cache for plain parquet dirs, keyed by path →
        #: (dir mtime_ns, schema).  Schema inference is the expensive part
        #: of ``spark.read.parquet`` (r14 measured 185 ms inferred vs 49 ms
        #: with an explicit schema per read; a gold refresh issues ~27
        #: reads).  Every Spark write to a dir touches files in its root
        #: (_SUCCESS, new part/member/batch dirs), bumping the root mtime,
        #: so the mtime key invalidates across Warehouse instances AND
        #: processes — stale entries cannot serve a post-write read.
        self._inferred_schema_cache: dict[str, tuple[tuple, T.StructType]] = {}

    def _sort_path(self, table: str) -> str:
        return os.path.join(self.root, "_schemas", table + ".sort.json")

    def set_partitioning(
        self, table: str, sort_key: list[str], partitioned: bool = True
    ) -> None:
        """Declare ``table``'s MergeTree layout: an in-part sort key and,
        by default, date partitioning — the ``PARTITION BY toDate(ts)
        ORDER BY (...)`` clause of a ClickHouse CREATE TABLE (reference
        clickhouse/init/01_create_tables.sql).  ``partitioned=False``
        declares ``ORDER BY`` WITHOUT ``PARTITION BY`` (ClickHouse allows
        a MergeTree with only a sort key): files are written sorted but
        no ``event_date=`` directory level is minted.  Must be called
        before the first append; the two layouts don't mix.

        PERSISTED (r12): the declaration lives under ``_schemas/`` like
        every other per-table metadata, so a DDL-created table keeps its
        layout across process restarts and the declaration travels with
        the table through DETACH/EXCHANGE/DROP-to-trash."""
        p = self._sort_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"sort": list(sort_key), "partitioned": bool(partitioned)},
                fh, indent=1,
            )
        os.replace(tmp, p)

    def _sort_decl(self, table: str) -> dict | None:
        return self._load_json_meta(self._sort_path(table), None)

    def modify_order_by(self, table: str, sort_key: list[str]) -> None:
        """``ALTER TABLE … MODIFY ORDER BY`` — extend the sort key.  The
        ClickHouse constraint applies verbatim: the new key must START
        WITH the existing key (only appends are allowed, because existing
        parts are already sorted by the old prefix and stay valid — new
        parts sort by the full key, merges converge the table).  Appended
        columns must exist in the declared schema.  O(1) metadata."""
        cur = self._sort_key(table)
        if cur is None:
            raise ValueError(
                f"{table!r} has no declared ORDER BY to modify "
                "(set_partitioning / CREATE TABLE first)"
            )
        if list(sort_key[: len(cur)]) != list(cur):
            raise ValueError(
                f"MODIFY ORDER BY must extend the existing key {cur} "
                f"(got {list(sort_key)}) — ClickHouse refuses prefix "
                "changes because existing parts are sorted by it"
            )
        cols = {f.name for f in self.schema_for(table).fields}
        missing = [c for c in sort_key if c not in cols]
        if missing:
            raise ValueError(
                f"MODIFY ORDER BY references unknown columns {missing}"
            )
        self.set_partitioning(
            table, list(sort_key),
            partitioned=self._is_date_partitioned(table),
        )
        self._log_mutation(
            table, "MODIFY_ORDER_BY",
            f"MODIFY ORDER BY ({', '.join(sort_key)})",
        )

    def _is_date_partitioned(self, table: str) -> bool:
        """Declared layout check: sorted tables are date-partitioned
        unless explicitly declared ORDER-BY-only."""
        decl = self._sort_decl(table)
        if decl is not None:
            return bool(decl.get("partitioned", True))
        return table in _PARTITIONED_SORT

    def _sort_key(self, table: str) -> list[str] | None:
        """Sort key for a date-partitioned table, else None."""
        decl = self._sort_decl(table)
        if decl is not None:
            return list(decl["sort"])
        return _PARTITIONED_SORT.get(table)

    def _writer(self, df: DataFrame):
        """DataFrameWriter with the warehouse codec applied — the single
        choke point every data write goes through."""
        w = df.write
        if self.codec:
            w = w.option("compression", self.codec)
        return w

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.exists(p) and any(
            not f.startswith((".", "_")) for f in os.listdir(p)
        )

    # -- DETACH / ATTACH TABLE ----------------------------------------------

    def _detached_dir(self) -> str:
        return os.path.join(self.root, "_detached")

    def detach_table(self, table: str) -> None:
        """``DETACH TABLE`` — the table disappears from the serving
        surface but its data, manifest, and overlays stay on disk under
        ``_detached/`` (one rename, O(1) at any size).  Reads of a
        detached table serve the declared-empty result like any missing
        table; maintenance ops fail on the missing path.  ``attach_table``
        reverses it."""
        src = self.path(table)
        if not os.path.exists(src):
            raise ValueError(f"no such table to detach: {table!r}")
        dst = os.path.join(self._detached_dir(), table)
        if os.path.exists(dst):
            raise ValueError(f"table {table!r} is already detached")
        os.makedirs(self._detached_dir(), exist_ok=True)
        os.rename(src, dst)
        # schema overrides / computed-column metadata travel WITH the
        # table: left under _schemas/ they would be inherited by a new
        # table created under the same name while this one is detached
        meta_dst = os.path.join(self._detached_dir(), "_schemas")
        for p in self._table_meta_paths(table):
            if os.path.exists(p):
                os.makedirs(meta_dst, exist_ok=True)
                os.rename(p, os.path.join(meta_dst, os.path.basename(p)))
        self._override_cache.pop(table, None)

    def attach_table(self, table: str) -> None:
        """``ATTACH TABLE`` — re-register a detached table (the reverse
        rename).  The manifest version pointer inside the directory is
        untouched, so the table serves exactly the member set it had at
        detach time."""
        src = os.path.join(self._detached_dir(), table)
        if not os.path.exists(src):
            raise ValueError(f"no detached table {table!r}")
        dst = self.path(table)
        if os.path.exists(dst):
            raise ValueError(
                f"cannot attach {table!r}: a live table directory exists"
            )
        os.rename(src, dst)
        # restore schema/computed metadata detached alongside the data
        meta_src = os.path.join(self._detached_dir(), "_schemas")
        for p in self._table_meta_paths(table):
            cand = os.path.join(meta_src, os.path.basename(p))
            if os.path.exists(cand):
                os.makedirs(os.path.dirname(p), exist_ok=True)
                os.rename(cand, p)
        self._override_cache.pop(table, None)

    def detached_tables(self) -> list[str]:
        """Names currently under ``_detached/`` (the ``system.detached_
        parts``-adjacent listing, table-granular here)."""
        try:
            return sorted(
                e for e in os.listdir(self._detached_dir())
                if not e.startswith("_")
            )
        except OSError:
            return []

    def _table_meta_paths(self, table: str) -> tuple:
        """Every per-table metadata file under ``_schemas/`` — the set
        that must travel with the table through DETACH/ATTACH."""
        return (
            self._schema_override_path(table),
            self._computed_cols_path(table),
            self._ttl_path(table),
            self._renames_path(table),
            self._casts_path(table),
            self._cleared_path(table),
            self._colttl_path(table),
            self._stop_merges_path(table),
            self._engine_path(table),
            self._indexes_path(table),
            self._projections_path(table),
            self._sort_path(table),
        )

    # -- declared MergeTree engine family (CREATE TABLE ENGINE = …) ---------

    def _engine_path(self, table: str) -> str:
        return os.path.join(self.root, "_schemas", table + ".engine.json")

    def set_table_engine(
        self,
        table: str,
        engine: str,
        *,
        version_col: str | None = None,
        sign_col: str | None = None,
        sum_cols: list[str] | None = None,
    ) -> None:
        """Declare the table's MergeTree engine family — the
        ``ENGINE = ReplacingMergeTree(updated_at)`` clause of a ClickHouse
        CREATE TABLE (reference clickhouse/init/03_gold_tables.sql declares
        every dim/fact this way).  Pure metadata: appends are unchanged;
        :meth:`read_final` / :meth:`read_summed` / :meth:`read_collapsed`
        consult it so ``FINAL`` reads need no per-call key/version args."""
        spec: dict = {"engine": engine}
        if version_col:
            spec["version_col"] = version_col
        if sign_col:
            spec["sign_col"] = sign_col
        if sum_cols:
            spec["sum_cols"] = list(sum_cols)
        p = self._engine_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(spec, fh, indent=1)
        os.replace(tmp, p)

    def table_engine(self, table: str) -> dict | None:
        """The declared engine spec ({"engine", "version_col", …}) or None
        for plain-MergeTree/undeclared tables."""
        spec = self._load_json_meta(self._engine_path(table), None)
        return spec if spec else None

    # -- declared skip indexes / projections (CREATE TABLE INDEX/PROJECTION) --

    def _indexes_path(self, table: str) -> str:
        return os.path.join(self.root, "_schemas", table + ".indexes.json")

    def _projections_path(self, table: str) -> str:
        return os.path.join(
            self.root, "_schemas", table + ".projections.json"
        )

    def declare_skip_index(
        self,
        table: str,
        name: str,
        col: str,
        index_type: str = "minmax",
        params: list | None = None,
    ) -> None:
        """Persist an ``INDEX name col TYPE minmax|tokenbf_v1(…)``
        declaration (the CREATE TABLE clause).  Pure metadata;
        :meth:`skip_index_for` materializes the live SkipIndex whose
        ``ensure()`` builds sidecars lazily — exactly CH's deferred
        ``MATERIALIZE INDEX`` discipline."""
        idx = self._load_json_meta(self._indexes_path(table), {})
        idx[name] = {
            "col": col, "type": index_type.lower(),
            "params": list(params or []),
        }
        p = self._indexes_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(idx, fh, indent=1)
        os.replace(tmp, p)

    def declared_skip_indexes(self, table: str) -> dict:
        return self._load_json_meta(self._indexes_path(table), {})

    def skip_index_for(self, table: str):
        """The live SkipIndex built from this table's declarations, or
        None when nothing is declared.  minmax entries pool into
        ``minmax_cols``; the first tokenbf entry supplies the token
        bloom (m, k taken from its declared parameters)."""
        decls = self.declared_skip_indexes(table)
        if not decls:
            return None
        from .skip_index import SkipIndex

        minmax = tuple(
            d["col"] for d in decls.values() if d["type"] == "minmax"
        )
        blooms = [
            d for d in decls.values() if d["type"].startswith("tokenbf")
        ]
        kw: dict = {}
        if blooms:
            kw["token_col"] = blooms[0]["col"]
            prm = blooms[0].get("params") or []
            if len(prm) >= 2:
                kw["bloom_bits"] = int(prm[0])
                kw["bloom_hashes"] = int(prm[1])
        return SkipIndex(self, table, minmax_cols=minmax, **kw)

    def declare_projection(
        self,
        table: str,
        name: str,
        dims: list[str],
        measures: list[tuple[str, str | None]],
    ) -> None:
        """Persist a ``PROJECTION name (SELECT … GROUP BY …)``
        declaration; :meth:`projection_set_for` materializes the live
        ProjectionSet (ensure() folds states incrementally, answer()
        rewrites matching rollups onto it)."""
        projs = self._load_json_meta(self._projections_path(table), {})
        projs[name] = {"dims": list(dims),
                       "measures": [list(m) for m in measures]}
        p = self._projections_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(projs, fh, indent=1)
        os.replace(tmp, p)

    def declared_projections(self, table: str) -> dict:
        return self._load_json_meta(self._projections_path(table), {})

    def projection_set_for(self, table: str):
        """The live ProjectionSet over this table's declared
        projections, or None when nothing is declared."""
        decls = self.declared_projections(table)
        if not decls:
            return None
        from .projection import Measure, ProjectionSet, ProjectionSpec

        specs = [
            ProjectionSpec(
                name=n,
                dims=tuple(d["dims"]),
                measures=tuple(
                    Measure(kind, col) for kind, col in d["measures"]
                ),
            )
            for n, d in decls.items()
        ]
        return ProjectionSet(self, table, specs)

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

    # -- computed columns (DEFAULT / MATERIALIZED / ALIAS) ------------------

    def _computed_cols_path(self, table: str) -> str:
        return os.path.join(self.root, "_schemas", table + ".computed.json")

    def _load_json_meta(self, path: str, default):
        """mtime-cached JSON metadata loader (computed columns, rename
        chains, TTL specs): table reads consult these per member, so a
        30-member scan must not open the same file 30 times.  The atomic
        replace every writer uses bumps the mtime, invalidating the
        entry; a missing file caches the default against mtime None."""
        try:
            mtime = os.path.getmtime(path)
        except OSError:
            mtime = None
        import copy

        hit = self._json_meta_cache.get(path)
        if hit is not None and hit[0] == mtime:
            # copy out: callers mutate these dicts before re-saving
            return copy.deepcopy(hit[1])
        if mtime is None:
            val = default
        else:
            try:
                with open(path) as fh:
                    val = json.load(fh)
            except (OSError, ValueError):
                val = default
        self._json_meta_cache[path] = (mtime, val)
        return copy.deepcopy(val)

    def computed_columns(self, table: str) -> dict[str, dict]:
        """Computed-column metadata applied by this warehouse's read/write
        paths: ``{name: {"kind": default|materialized|alias, "expr": sql,
        "type": ddl}}`` in declaration order.  Written only by
        ``quality/migrate.SchemaMigrator.add_computed_column``."""
        return self._load_json_meta(self._computed_cols_path(table), {})

    def save_computed_columns(self, table: str, cols: dict) -> None:
        p = self._computed_cols_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(cols, fh, indent=1)
        os.replace(tmp, p)

    def _parquet_column_names(self, fpath: str) -> set:
        """Footer column set of one parquet file, cached by (path, mtime) —
        O(1) metadata read, never a data scan."""
        try:
            mtime = os.path.getmtime(fpath)
        except OSError:
            return set()
        hit = self._footer_cols_cache.get(fpath)
        if hit is not None and hit[0] == mtime:
            return hit[1]
        import pyarrow.parquet as pq

        cols = set(pq.read_schema(fpath).names)
        self._footer_cols_cache[fpath] = (mtime, cols)
        return cols

    @staticmethod
    def _member_is_flat(p: str) -> bool:
        """True when the member dir holds no partition subdirs (k=v)."""
        try:
            with os.scandir(p) as it:
                for e in it:
                    if e.is_dir() and "=" in e.name:
                        return False
        except OSError:
            return False
        return True

    def _first_parquet(self, root: str) -> str | None:
        """First parquet file under ``root`` (a member is ONE write
        generation, so one footer answers type/column questions for the
        member — the same O(1) fast path as ``_computed_cols_lacking``)."""
        for dirpath, _dirs, files in os.walk(root):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return os.path.join(dirpath, f)
        return None

    def _parquet_field_types(self, fpath: str) -> dict:
        """Footer column → Spark DataType of one parquet file, cached by
        (path, mtime) — O(1) metadata read, never a data scan.  Columns
        whose arrow type has no Spark mapping are omitted (read as
        declared)."""
        try:
            mtime = os.path.getmtime(fpath)
        except OSError:
            return {}
        hit = self._footer_types_cache.get(fpath)
        if hit is not None and hit[0] == mtime:
            return hit[1]
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_type

        out: dict = {}
        for fld in pq.read_schema(fpath):
            try:
                out[fld.name] = from_arrow_type(fld.type)
            except Exception:
                pass
        self._footer_types_cache[fpath] = (mtime, out)
        return out

    def _computed_cols_lacking(
        self, root: str, names: list, first_file_only: bool = False
    ) -> set:
        """Which of ``names`` are absent from parquet footers under
        ``root``.  A file that physically lacks the column predates the
        ALTER and must serve the computed expression; a file that has it
        serves the stored value VERBATIM — including an explicitly
        inserted NULL (the ClickHouse per-part contract).

        ``first_file_only`` is the member fast path: a member is ONE
        write generation (one job wrote every file), so a single footer
        answers for the member — O(1) metadata per member per read
        instead of O(files), which matters when a 100 TB member holds
        thousands of files.  The full walk (default) takes the
        conservative intersection for mixed-generation directories."""
        lacking = set(names)
        for dirpath, _dirs, files in os.walk(root):
            if not lacking:
                break
            for f in sorted(files):
                if f.endswith(".parquet"):
                    lacking -= self._parquet_column_names(
                        os.path.join(dirpath, f)
                    )
                    if first_file_only:
                        return lacking
                    if not lacking:
                        break
        return lacking

    def _stored_computed(self, table: str) -> dict:
        return {
            n: m for n, m in self.computed_columns(table).items()
            if m["kind"] != "alias"
        }

    def _backfill_member_computed(
        self, table: str, member_root: str, df: DataFrame,
        stored: dict | None = None,
    ) -> DataFrame:
        """Per-member read-side back-fill of DEFAULT/MATERIALIZED columns:
        only members whose files PREDATE the ALTER (footer lacks the
        column) compute the expression; post-ALTER members serve stored
        values verbatim, preserving explicitly inserted NULLs.  ONE
        projection per member (see ``_apply_renames``)."""
        stored = (
            self._stored_computed(table) if stored is None else stored
        )
        if not stored:
            return df
        lacking = self._computed_cols_lacking(
            member_root, list(stored), first_file_only=True
        )
        if not lacking:
            return df
        exprs = {
            n: F.expr(stored[n]["expr"]).cast(stored[n]["type"]).alias(n)
            for n in lacking
        }
        cols = [
            exprs.pop(c) if c in exprs else F.col(c) for c in df.columns
        ]
        return df.select(*cols, *exprs.values())

    # -- column renames (ALTER TABLE … RENAME COLUMN) ------------------------

    def _renames_path(self, table: str) -> str:
        return os.path.join(self.root, "_schemas", table + ".renames.json")

    def renames(self, table: str) -> dict:
        """Live rename chains: ``{new_name: [old_name, older_name, …]}``.
        Old parquet files keep the old column name in their footer; reads
        scan them with the legacy fields appended and fold
        ``coalesce(new, old…)`` — metadata-only at any table size, the
        ClickHouse RENAME COLUMN contract.  Compaction writes the new
        name, so chains retire as merges touch old files."""
        return self._load_json_meta(self._renames_path(table), {})

    def save_renames(self, table: str, ren: dict) -> None:
        p = self._renames_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(ren, fh, indent=1)
        os.replace(tmp, p)

    def _legacy_read_schema(self, table: str) -> T.StructType:
        """Declared schema extended with the legacy (pre-rename) field
        names, so old files' values surface instead of reading as NULL."""
        schema = self.schema_for(table)
        ren = self.renames(table)
        if not ren:
            return schema
        by_name = {f.name: f for f in schema.fields}
        extra = []
        for new, olds in ren.items():
            f = by_name.get(new)
            if f is None:
                continue
            for old in olds:
                if old not in by_name:
                    extra.append(T.StructField(old, f.dataType, True))
        return T.StructType([*schema.fields, *extra])

    def _apply_renames(
        self, table: str, df: DataFrame, ren: dict | None = None
    ) -> DataFrame:
        """Fold legacy columns into their renamed successor and drop
        them.  A file carries a value under exactly ONE of the chain's
        names, so the coalesce is a disjoint merge, not a preference.
        ONE projection, not a withColumn chain — reads apply this per
        member, and N members × chained analysis passes is real driver
        latency."""
        ren = self.renames(table) if ren is None else ren
        if not ren:
            return df
        repl, drops = {}, set()
        for new, olds in ren.items():
            present = [o for o in olds if o in df.columns]
            if new in df.columns and present:
                repl[new] = F.coalesce(
                    F.col(new), *[F.col(o) for o in present]
                ).alias(new)
                drops.update(present)
        if not repl:
            return df
        return df.select(
            *[repl.get(c, F.col(c)) for c in df.columns if c not in drops]
        )

    # -- declared table TTL (ALTER TABLE … MODIFY TTL) -----------------------

    def _ttl_path(self, table: str) -> str:
        return os.path.join(self.root, "_schemas", table + ".ttl.json")

    def set_table_ttl(
        self,
        table: str,
        interval_days: float,
        ttl_col: str = "event_ts",
        group_by: list[str] | None = None,
        aggregates: dict[str, str] | None = None,
        where: str | None = None,
    ) -> None:
        """``ALTER TABLE … MODIFY TTL col + INTERVAL n DAY [WHERE pred]
        [GROUP BY k… SET col = agg(col)…]`` — DECLARE the TTL once; every
        ``compact`` (the merge analog) enforces it from then on, exactly
        where ClickHouse applies TTL (during merges, zero extra passes).
        Without ``group_by`` expired rows are DELETED; with it they roll
        up (the downsampling idiom).  With ``where`` only matching rows
        expire — the CH conditional-TTL idiom (age out debug/noise rows
        while keeping the rest forever); delete form only.  O(1)
        metadata write.

        Scale note: a TTL-bearing compact runs as a FULL merge (expired
        rows may hide in any generation).  On a 100 TB date-partitioned
        table, prefer ``apply_ttl`` (whole-partition drops, metadata-
        only — the ``ttl_only_drop_parts`` fast path) on the tight
        cadence and reserve the declared-TTL merge for the periodic
        major compaction."""
        if (group_by is None) != (aggregates is None):
            raise ValueError(
                "rollup TTL needs BOTH group_by and aggregates"
            )
        if where is not None and group_by is not None:
            raise ValueError(
                "TTL WHERE is supported on the delete form only "
                "(ClickHouse refuses WHERE + GROUP BY TTL likewise)"
            )
        spec = {"ttl_col": ttl_col, "interval_days": float(interval_days)}
        if where is not None:
            # validate the predicate plans against the declared schema
            probe = self.spark.createDataFrame([], self.schema_for(table))
            probe.filter(F.expr(where)).schema
            spec["where"] = where
        if group_by is not None:
            spec["group_by"] = list(group_by)
            spec["aggregates"] = dict(aggregates)
        p = self._ttl_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(spec, fh, indent=1)
        os.replace(tmp, p)
        self._log_mutation(
            table, "modify_ttl",
            f"MODIFY TTL {ttl_col} + INTERVAL {interval_days} DAY"
            + (f" GROUP BY {', '.join(group_by)}" if group_by else ""),
        )

    def table_ttl(self, table: str) -> dict | None:
        """The declared TTL spec, or None (``REMOVE TTL`` state)."""
        return self._load_json_meta(self._ttl_path(table), None)

    def remove_table_ttl(self, table: str) -> None:
        """``ALTER TABLE … REMOVE TTL``."""
        try:
            os.remove(self._ttl_path(table))
        except OSError:
            pass

    # -- MODIFY COLUMN type (cast-on-read chains) ----------------------------

    def _casts_path(self, table: str) -> str:
        return os.path.join(self.root, "_schemas", table + ".casts.json")

    def column_casts(self, table: str) -> dict:
        """Live ``ALTER TABLE … MODIFY COLUMN col type`` retype chains:
        ``{col: declared_type_ddl}``.  Old parquet files keep the
        pre-ALTER physical type in their footers; reads scan each such
        member with the footer's type and fold ONE ``cast(declared)``
        projection before the union — metadata-only at any table size.
        ClickHouse rewrites parts eagerly for MODIFY COLUMN; here the
        new type materializes as merges rewrite members (the same lazy
        discipline as RENAME COLUMN), and entries retire once no live
        member's footer disagrees (``_gc_alter_overlays``)."""
        return self._load_json_meta(self._casts_path(table), {})

    def save_column_casts(self, table: str, casts: dict) -> None:
        p = self._casts_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(casts, fh, indent=1)
        os.replace(tmp, p)

    # -- CLEAR COLUMN IN PARTITION (member-scoped reset overlays) ------------

    def _cleared_path(self, table: str) -> str:
        return os.path.join(self.root, "_schemas", table + ".cleared.json")

    def cleared_entries(self, table: str) -> list:
        """Live ``CLEAR COLUMN … IN PARTITION`` overlays:
        ``[{"col", "date", "members"}]`` — each addresses exactly the
        members that were live when the ALTER ran, so rows inserted
        AFTER it keep their values (the ClickHouse mutation-snapshot
        contract).  Reads mask the column to its DEFAULT (or typed
        NULL) for the addressed members' rows in that partition;
        compaction materializes the mask and retires the entry."""
        return self._load_json_meta(self._cleared_path(table), [])

    def save_cleared_entries(self, table: str, entries: list) -> None:
        p = self._cleared_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(entries, fh, indent=1)
        os.replace(tmp, p)

    def clear_column_in_partition(self, table: str, col: str, date) -> dict:
        """``ALTER TABLE … CLEAR COLUMN col IN PARTITION 'date'`` — O(1)
        metadata at any table size: records (column, partition, live
        member snapshot); the read path masks the column to its declared
        DEFAULT expression (or a typed NULL) for those members' rows in
        that partition and merges materialize the reset, exactly where
        ClickHouse applies the mutation (reference evolves live bronze
        tables with point ALTERs, scripts/alter_bronze_timezone_asia_
        jakarta.sql:1-16).  Requires the manifest layout (the member
        snapshot IS the mutation address) and no pending patch overlays
        (a lightweight UPDATE's rows would escape a member-scoped mask —
        compact first, as ClickHouse serializes mutations)."""
        schema = self.schema_for(table)
        names = {f.name for f in schema.fields}
        if col not in names:
            raise ValueError(f"no column {col!r} on {table!r}")
        if col == "event_date" or col in (self._sort_key(table) or []):
            raise ValueError(
                f"cannot clear layout column {col!r} (partition/sort key)"
            )
        if "event_date" not in names:
            raise ValueError(
                f"CLEAR COLUMN IN PARTITION needs a date-partitioned "
                f"table; {table!r} has no event_date column"
            )
        man = self.load_manifest(table)
        if man is None and self._batch_layout(table):
            with self._manifest_lock(table):
                if self.load_manifest(table) is None:
                    boot = self._bootstrap_manifest(table)
                    boot["version"] = 1
                    self._write_manifest(table, boot)
            man = self.load_manifest(table)
        if man is None:
            raise ValueError(
                f"CLEAR COLUMN needs the manifest (batch) layout on "
                f"{table!r} — plain tables are rebuilt wholesale by their "
                "writer"
            )
        if self._patch_files(table):
            raise ValueError(
                f"table {table!r} has pending lightweight-UPDATE patches; "
                "compact() to materialize them before CLEAR COLUMN"
            )
        entry = {"col": col, "date": str(date), "members": list(man["members"])}
        entries = self.cleared_entries(table)
        entries.append(entry)
        self.save_cleared_entries(table, entries)
        self._log_mutation(
            table, "clear_column",
            f"CLEAR COLUMN {col} IN PARTITION '{date}'",
            members_addressed=len(entry["members"]),
        )
        return entry

    def _reset_value(self, table: str, col: str):
        """Reset value for CLEAR COLUMN / column TTL: the column's
        declared DEFAULT expression when one exists (ClickHouse resets
        to the column default), else a typed NULL."""
        meta = self.computed_columns(table).get(col)
        if meta is not None and meta["kind"] == "default":
            return F.expr(meta["expr"]).cast(meta["type"])
        dtype = next(
            (
                f.dataType
                for f in self.schema_for(table).fields
                if f.name == col
            ),
            None,
        )
        return F.lit(None).cast(dtype) if dtype is not None else F.lit(None)

    # -- column-level TTL (ALTER TABLE … MODIFY COLUMN col … TTL expr) -------

    def _colttl_path(self, table: str) -> str:
        return os.path.join(self.root, "_schemas", table + ".colttl.json")

    def column_ttls(self, table: str) -> dict:
        """Declared column TTLs: ``{col: {"ttl_col", "interval_days"}}``.
        Enforced by ``compact`` (the merge) like table TTL: expired rows
        keep the row but the column resets to its DEFAULT/NULL — the
        ClickHouse column-TTL storage reclaim for wide columns whose
        value stops mattering before the row does."""
        return self._load_json_meta(self._colttl_path(table), {})

    def set_column_ttl(
        self,
        table: str,
        col: str,
        interval_days: float,
        ttl_col: str = "event_ts",
    ) -> None:
        """``ALTER TABLE … MODIFY COLUMN col type TTL ttl_col + INTERVAL
        n DAY`` — declare once, O(1) metadata; every merge enforces it
        from then on (zero extra passes: the reset folds into the
        rewrite projection the merge runs anyway)."""
        schema = self.schema_for(table)
        names = {f.name for f in schema.fields}
        if col not in names:
            raise ValueError(f"no column {col!r} on {table!r}")
        if col == "event_date" or col in (self._sort_key(table) or []):
            raise ValueError(
                f"cannot TTL layout column {col!r} (partition/sort key)"
            )
        if ttl_col not in names:
            raise ValueError(f"TTL column {ttl_col!r} not on {table!r}")
        ttls = self.column_ttls(table)
        ttls[col] = {
            "ttl_col": ttl_col, "interval_days": float(interval_days)
        }
        p = self._colttl_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(ttls, fh, indent=1)
        os.replace(tmp, p)
        self._log_mutation(
            table, "modify_column_ttl",
            f"MODIFY COLUMN {col} TTL {ttl_col} + "
            f"INTERVAL {interval_days} DAY",
        )

    def remove_column_ttl(self, table: str, col: str) -> None:
        ttls = self.column_ttls(table)
        if ttls.pop(col, None) is not None:
            if ttls:
                p = self._colttl_path(table)
                tmp = p + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(ttls, fh, indent=1)
                os.replace(tmp, p)
            else:
                try:
                    os.remove(self._colttl_path(table))
                except OSError:
                    pass

    def _column_ttl_transform(self, table: str, specs: dict, now_dt):
        """Merge-fold for declared column TTLs: ONE projection resetting
        each expired column to its DEFAULT/NULL; row count unchanged."""
        import datetime

        resets = {c: self._reset_value(table, c) for c in specs}

        def transform(df: DataFrame) -> DataFrame:
            cols = []
            for c in df.columns:
                spec = specs.get(c)
                if spec is None or spec["ttl_col"] not in df.columns:
                    cols.append(F.col(c))
                    continue
                cutoff = now_dt - datetime.timedelta(
                    days=spec["interval_days"]
                )
                expired = F.coalesce(
                    F.col(spec["ttl_col"]) < F.lit(cutoff), F.lit(False)
                )
                cols.append(
                    F.when(expired, resets[c])
                    .otherwise(F.col(c))
                    .alias(c)
                )
            return df.select(*cols)

        return transform

    def _apply_computed_read(
        self, table: str, df: DataFrame, stored_mode: str = "verbatim"
    ) -> DataFrame:
        """Read-side computed columns, ClickHouse part semantics:

        - ALIAS is never stored — always computed here.
        - DEFAULT/MATERIALIZED values ARE stored for rows written after
          the ALTER; files that predate the column serve the expression.
          Which rows those are is decided per FILE from the parquet
          footer (the column is physically absent pre-ALTER) — an
          explicitly inserted NULL in a post-ALTER file is preserved, as
          ClickHouse preserves it.  Manifest reads do the back-fill per
          member inside ``_read_members`` (``stored_mode='verbatim'``
          here); single-directory scans pass ``stored_mode='by_file'``
          and the decision keys on ``input_file_name()`` (safe there: one
          scan, no joins to break file lineage).
        """
        for name, meta in self.computed_columns(table).items():
            expr = F.expr(meta["expr"]).cast(meta["type"])
            if meta["kind"] == "alias":
                df = df.withColumn(name, expr)
            elif name not in df.columns:
                df = df.withColumn(name, expr)
            elif stored_mode == "by_file":
                root = self.path(table)
                lacking = []
                for dirpath, _dirs, files in os.walk(root):
                    for f in files:
                        if f.endswith(".parquet") and name not in (
                            self._parquet_column_names(
                                os.path.join(dirpath, f)
                            )
                        ):
                            lacking.append(
                                os.path.abspath(os.path.join(dirpath, f))
                            )
                if lacking:
                    scheme_less = F.regexp_replace(
                        F.input_file_name(), "^[a-z]+:/+", "/"
                    )
                    df = df.withColumn(
                        name,
                        F.when(
                            scheme_less.isin(lacking), expr
                        ).otherwise(F.col(name)),
                    )
        return df

    def _apply_computed_write(self, table: str, df: DataFrame) -> DataFrame:
        """Insert-side computed columns: ALIAS is not insertable (CH
        refuses it loudly), MATERIALIZED always overrides whatever the
        insert supplied, DEFAULT fills only when the column is absent."""
        for name, meta in self.computed_columns(table).items():
            kind = meta["kind"]
            if kind == "alias":
                if name in df.columns:
                    raise ValueError(
                        f"column {name!r} of table {table!r} is ALIAS — "
                        "it cannot be inserted"
                    )
                continue
            expr = F.expr(meta["expr"]).cast(meta["type"])
            if kind == "materialized" or name not in df.columns:
                df = df.withColumn(name, expr)
        return df

    # -- manifest / version pointer (batch-append tables) ------------------

    def _manifest_dir(self, table: str) -> str:
        return os.path.join(self.path(table), "_manifest")

    def load_manifest(self, table: str) -> dict | None:
        """The CURRENT manifest, or None when the table has no manifest
        layout (plain tables, or legacy batch dirs from before the manifest).

        {"version": K, "members": [dir, ...], "committed_batches": [id, ...]}

        ``members`` are the live data directories (scanned by read());
        ``committed_batches`` is the replay-skip ledger — it SURVIVES
        compaction, so a replayed micro-batch whose ``ingest_batch=`` dir was
        long since compacted away still skips instead of re-appending rows
        that now live inside a compacted member."""
        cur = os.path.join(self._manifest_dir(table), "CURRENT")
        # EXCHANGE TABLES swaps the whole table directory between the
        # CURRENT read and the version-file open — the resolved v<K>.json
        # can vanish mid-resolve (the r12 soak's readers-active drill
        # caught this).  Re-resolve from the new directory: the swap is
        # atomic per rename, so a retry lands on a consistent
        # (CURRENT, v<K>.json) pair from one side or the other.
        for _attempt in range(5):
            try:
                with open(cur) as fh:
                    version_file = fh.read().strip()
            except OSError:
                return None
            try:
                with open(
                    os.path.join(self._manifest_dir(table), version_file)
                ) as fh:
                    return json.load(fh)
            except OSError:
                continue
        raise FileNotFoundError(
            f"manifest {version_file!r} of {table!r} unreadable after "
            "5 re-resolves — not a concurrent swap"
        )

    def _write_manifest(self, table: str, manifest: dict) -> None:
        """Write v<K>.json fully, then flip CURRENT atomically.  Callers
        hold the manifest lock."""
        d = self._manifest_dir(table)
        os.makedirs(d, exist_ok=True)
        name = f"v{manifest['version']:08d}.json"
        with open(os.path.join(d, name), "w") as fh:
            json.dump(manifest, fh, indent=1)
        tmp = os.path.join(d, "CURRENT.tmp")
        with open(tmp, "w") as fh:
            fh.write(name)
        os.replace(tmp, os.path.join(d, "CURRENT"))
        keep = {name} | {
            f"v{v:08d}.json"
            for v in range(
                max(1, manifest["version"] - self._MANIFEST_KEEP),
                manifest["version"],
            )
        }
        for f in os.listdir(d):
            if f.startswith("v") and f.endswith(".json") and f not in keep:
                try:
                    os.unlink(os.path.join(d, f))
                except OSError:
                    pass

    def _manifest_lock(self, table: str, timeout: float = 30.0):
        """Exclusive manifest read-modify-write section via an O_EXCL
        lockfile — the local-fs stand-in for a metastore transaction.  A
        crash inside the section leaves the lockfile behind; the TimeoutError
        names it so an operator can clear it (the manifest itself is never
        torn: version files are whole and CURRENT flips atomically)."""
        import contextlib
        import time as _time

        d = self._manifest_dir(table)
        os.makedirs(d, exist_ok=True)
        lock = os.path.join(d, "LOCK")

        @contextlib.contextmanager
        def _held():
            deadline = _time.monotonic() + timeout
            while True:
                try:
                    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    break
                except FileExistsError:
                    if _time.monotonic() > deadline:
                        raise TimeoutError(
                            f"manifest lock busy for {timeout}s: {lock} "
                            "(remove it if the holder crashed)"
                        ) from None
                    _time.sleep(0.02)
            try:
                yield
            finally:
                os.close(fd)
                os.unlink(lock)

        return _held()

    def _manifest_commit_batch(self, table: str, batch_id: int) -> None:
        """Register a fully-written ``ingest_batch=<id>`` dir as live +
        committed (the COMMIT POINT of a streaming append)."""
        member = f"ingest_batch={batch_id}"
        with self._manifest_lock(table):
            man = self.load_manifest(table)
            changed = man is None  # first manifest: always persist
            if man is not None and batch_id in man["committed_batches"]:
                # Already committed in a PERSISTED manifest: the batch's
                # rows may since have been folded into a compacted member
                # and its dir deleted — re-registering the member here
                # would resurrect a stale (or duplicate) dir.  The ledger
                # entry is the commit.  (A freshly-bootstrapped manifest
                # adopts the dir just written and must still persist.)
                return
            if man is None:
                man = self._bootstrap_manifest(table)
            if member not in man["members"]:
                man["members"].append(member)
                changed = True
            if batch_id not in man["committed_batches"]:
                man["committed_batches"].append(batch_id)
                changed = True
            if changed:
                man["version"] += 1
                self._write_manifest(table, man)

    def _bootstrap_manifest(self, table: str) -> dict:
        """First manifest for a table: adopt any legacy ``ingest_batch=``
        dirs already on disk (committed = job-level _SUCCESS present)."""
        members, committed = [], []
        p = self.path(table)
        if os.path.isdir(p):
            for e in sorted(os.listdir(p)):
                if e.startswith("ingest_batch=") and os.path.exists(
                    os.path.join(p, e, "_SUCCESS")
                ):
                    members.append(e)
                    committed.append(int(e.split("=", 1)[1]))
        return {"version": 0, "members": members,
                "committed_batches": committed}

    def schema_for(self, table: str) -> T.StructType:
        schema = self.schema_override(table) or _ALL_SCHEMAS[table]
        if self._is_date_partitioned(table) and not any(
            f.name == "event_date" for f in schema.fields
        ):
            return T.StructType(
                [*schema.fields, T.StructField("event_date", T.DateType())]
            )
        return schema

    def _read_parquet_inferred(self, path: str) -> DataFrame:
        """``spark.read.parquet`` with the inferred schema memoized per
        (path, dir mtime): repeat reads of an unchanged dir skip Spark's
        schema-inference pass (the dominant driver-side cost of a read —
        see ``_inferred_schema_cache``).  Semantics identical: the schema
        WAS inferred from this exact dir state.  The key pairs the dir
        mtime (catches new/removed entries: part files, member/batch dirs)
        with the _SUCCESS marker's mtime (every Spark write job rewrites
        it, catching appends that only add files inside existing partition
        subdirs)."""
        sch = self._inferred_schema(path)
        if sch is not None:
            return self.spark.read.schema(sch).parquet(path)
        return self.spark.read.parquet(path)

    def _inferred_schema(self, path: str) -> T.StructType | None:
        """The memoized inferred schema of ``path`` (see
        ``_read_parquet_inferred``); None when the dir is unstatable.  A
        miss pays one real inference; hits are a pair of stats."""
        try:
            mt = os.stat(path).st_mtime_ns
            try:
                success = os.stat(os.path.join(path, "_SUCCESS")).st_mtime_ns
            except OSError:
                success = 0
            key = (mt, success)
        except OSError:
            return None
        hit = self._inferred_schema_cache.get(path)
        if hit is not None and hit[0] == key:
            return hit[1]
        sch = self.spark.read.parquet(path).schema
        self._inferred_schema_cache[path] = (key, sch)
        return sch

    def read(self, table: str) -> DataFrame:
        """Read a table; a missing table reads as empty with its declared
        schema, so every pipeline is total on a fresh warehouse.  The
        ``ingest_batch`` directory level used by exactly-once streaming
        appends is an implementation detail and is hidden from readers.
        After an applied migration the read conforms to the ALTERed schema
        (typed NULLs for added columns, casts for widened ones) — old files
        are served through the new schema without rewrite."""
        if not self.exists(table):
            return self._apply_computed_read(
                table, self.spark.createDataFrame([], self.schema_for(table))
            )
        man = self.load_manifest(table)
        if man is not None:
            return self._apply_computed_read(
                table, self._read_members(table, man["members"])
            )
        override = self.schema_override(table)
        if override is None:
            df = self._read_parquet_inferred(self.path(table))
        else:
            # post-ALTER the directory mixes pre- and post-migration files;
            # an inferred read would adopt ONE file's schema and could hide
            # the added column in the others.  Reading with the declared
            # schema is authoritative and free: missing columns surface as
            # NULLs, widened types use the parquet reader's type promotion.
            expected = self._legacy_read_schema(table)
            if self._batch_layout(table):
                expected = T.StructType(
                    [*expected.fields, T.StructField("ingest_batch", T.LongType())]
                )
            df = self.spark.read.schema(expected).parquet(self.path(table))
            df = self._apply_renames(table, df)
        if "ingest_batch" in df.columns:
            df = df.drop("ingest_batch")
        if override is not None:
            df = conform_to_schema(df, self.schema_for(table))
        return self._apply_computed_read(table, df, stored_mode="by_file")

    def read_at_version(self, table: str, version: int) -> DataFrame:
        """Snapshot read: the table EXACTLY as manifest version ``version``
        listed it — the Iceberg-style time travel the version-pointer layout
        gives for free.  Valid for the retained version window
        (``_MANIFEST_KEEP`` flips back); raises ``LookupError`` for pruned
        or unknown versions, and ``ValueError`` when a superseded member
        has already been deleted by a non-``retain_old`` compaction (the
        snapshot is no longer reconstructible)."""
        d = self._manifest_dir(table)
        path = os.path.join(d, f"v{version:08d}.json")
        try:
            with open(path) as fh:
                man = json.load(fh)
        except OSError:
            raise LookupError(
                f"no retained manifest version {version} for {table!r}"
            ) from None
        missing = [
            m for m in man["members"]
            if not os.path.isdir(os.path.join(self.path(table), m))
        ]
        if missing:
            raise ValueError(
                f"snapshot v{version} of {table!r} references deleted "
                f"members {missing}; compact with retain_old=True to keep "
                "snapshots reconstructible"
            )
        # computed columns apply to snapshots too — ALIAS/back-fill are
        # read-time semantics, not part of the stored member set
        return self._apply_computed_read(
            table, self._read_members(table, man["members"])
        )

    def _read_members(
        self, table: str, members: list[str], keep_dv_tag: bool = False
    ) -> DataFrame:
        """Scan exactly the manifest's live member dirs.  Each member is its
        own parquet root (event_date partition dirs inside), so a pointer
        flip mid-query cannot mix generations.  Compaction keeps the member
        count at 1 + (batches since last compact), so the union stays a
        handful of scans, not thousands — and each scan still prunes
        event_date partitions and pushes filters independently.

        When the table carries deletion vectors (lightweight DELETE),
        every scan is tagged with the parquet ``_metadata`` (file, row
        position) BEFORE the union — the hidden column only resolves on a
        raw scan — and the DV anti-join masks deleted rows; with
        ``keep_dv_tag`` the position columns stay visible (the
        delete-writer needs them)."""
        override = self.schema_override(table)
        dv_files = self._dv_files(table)
        patch_files = self._patch_files(table)
        tag = bool(dv_files) or bool(patch_files) or keep_dv_tag
        # ALTER metadata is hoisted OUT of the member loop: these are
        # per-table constants, and a scan of N members must not pay N
        # metadata lookups / schema constructions (the round-11 overhead
        # probe measured the chained per-member build at ~1.3 s driver
        # time for 30 members before this hoist)
        legacy_schema = (
            self._legacy_read_schema(table) if override is not None else None
        )
        ren = self.renames(table)
        stored = self._stored_computed(table)
        # MODIFY COLUMN cast-on-read + CLEAR COLUMN overlays (both
        # member-addressed, both metadata-only until merges materialize
        # them).  The cast decision is taken per member from the parquet
        # FOOTER against the declared type — not from the cast-chain
        # registry — so reads stay correct even for old-type files minted
        # after the chain retired (or by writers that bypassed _prep).
        check_casts = override is not None
        declared_types = (
            {f.name: f.dataType for f in legacy_schema.fields}
            if legacy_schema is not None
            else {}
        )
        cleared = self.cleared_entries(table)
        clear_resets = {
            e["col"]: self._reset_value(table, e["col"])
            for e in cleared
        }
        live = [
            m for m in members
            # zero-row member (empty-batch append / bootstrap): no files
            # to infer a schema from, and nothing to scan
            if self._count_parquet(os.path.join(self.path(table), m)) > 0
        ]
        # FUSED member scan (r14, VERDICT r13 #2): when no per-member
        # transform applies — no ALTER override, no stored computed
        # columns, no CLEAR overlays — and every member's parquet footer
        # carries the same (name, type) set, the N member scans collapse
        # into ONE multi-path scan.  The overlay-read profile showed the
        # 3-5× patch/DV read penalty was ~95% driver-side plan
        # analysis/optimization of the member-union tree (executing a
        # fixed plan cost ~50 ms); one scan node is also the right shape
        # at scale (§6: one shared file index, one split planning pass).
        # Row multiset and _metadata tags are identical to the union by
        # construction; footer disagreement of any kind falls back.
        fused = None
        if override is None and not stored and not cleared and len(live) > 1:
            paths = [os.path.join(self.path(table), m) for m in live]
            # partitioned members (event_date=… subdirs) need per-member
            # partition discovery — a multi-path scan raises
            # CONFLICTING_DIRECTORY_STRUCTURES without a single basePath,
            # and the table root is not one (member names are not k=v)
            flat = all(self._member_is_flat(p) for p in paths)
            fps = (
                [self._first_parquet(p) for p in paths] if flat else [None]
            )
            if all(fp is not None for fp in fps):
                names = [self._parquet_column_names(fp) for fp in fps]
                sigs = [
                    sorted(
                        self._parquet_field_types(fp).items(),
                        key=lambda kv: kv[0],
                    )
                    for fp in fps
                ]
                uniform = (
                    all(n == names[0] for n in names)
                    and all(len(s) == len(names[0]) for s in sigs)
                    and all(s == sigs[0] for s in sigs)
                )
                if uniform:
                    first = self._inferred_schema(paths[0])
                    if first is not None:
                        sch = T.StructType([
                            T.StructField(f.name, f.dataType, True)
                            for f in first.fields
                        ])
                        fused = self.spark.read.schema(sch).parquet(*paths)
        dfs = []
        if fused is not None:
            if tag:
                fused = fused.select(
                    F.col("_metadata.file_path").alias("__dv_file"),
                    F.col("_metadata.row_index").alias("__dv_pos"),
                    *[F.col(c) for c in fused.columns],
                )
            dfs.append(fused)
            live = []
        for m in live:
            p = os.path.join(self.path(table), m)
            read_schema = legacy_schema
            member_casts: dict = {}
            if check_casts:
                fp = self._first_parquet(p)
                ftypes = self._parquet_field_types(fp) if fp else {}
                for fld in legacy_schema.fields:
                    ft = ftypes.get(fld.name)
                    if ft is not None and (
                        ft.simpleString() != fld.dataType.simpleString()
                    ):
                        member_casts[fld.name] = ft
                if member_casts:
                    # old-type member: scan with the footer's physical
                    # type, fold cast(declared) below — one projection
                    read_schema = T.StructType([
                        T.StructField(f.name, member_casts[f.name], True)
                        if f.name in member_casts else f
                        for f in legacy_schema.fields
                    ])
            if override is None:
                df = self._read_parquet_inferred(p)
            elif read_schema is not legacy_schema:
                df = self.spark.read.schema(read_schema).parquet(p)
            else:
                # declared-schema read: mixed pre/post-ALTER members must not
                # adopt one file's footer and hide the added column; the
                # schema carries legacy (pre-rename) names so old files'
                # values surface — folded ONCE after the union (the
                # coalesce is disjoint-correct across mixed members, and
                # per-member folds cost N analysis passes)
                df = self.spark.read.schema(legacy_schema).parquet(p)
            # DEFAULT/MATERIALIZED back-fill is decided per member from
            # parquet footers: only pre-ALTER members (column physically
            # absent) compute the expression; post-ALTER members serve
            # stored values verbatim, explicit NULLs included.  Doing it
            # here — before the union and any DV/patch join — keeps the
            # decision on the member scan where file lineage is exact.
            df = self._backfill_member_computed(table, p, df, stored=stored)
            # CLEAR COLUMN overlays addressed to this member (mask rows of
            # the cleared partition to the column DEFAULT/NULL) + MODIFY
            # COLUMN casts — folded as ONE projection per affected member,
            # BEFORE the union so member frames stay type-uniform
            member_clears: dict[str, list] = {}
            for e in cleared:
                if m in e["members"] and e["col"] in df.columns:
                    member_clears.setdefault(e["col"], []).append(e["date"])
            if member_casts or member_clears:
                sel = []
                for c in df.columns:
                    expr = F.col(c)
                    if c in member_casts:
                        expr = expr.cast(declared_types[c])
                    if c in member_clears and "event_date" in df.columns:
                        # reset value is declared-typed (matches the
                        # post-cast branch); the mask applies only to the
                        # cleared partitions' rows of THIS member
                        in_cleared = F.lit(False)
                        for d in member_clears[c]:
                            in_cleared = in_cleared | (
                                F.col("event_date") == F.to_date(F.lit(d))
                            )
                        expr = F.when(
                            in_cleared, clear_resets[c]
                        ).otherwise(expr)
                    sel.append(expr.alias(c))
                df = df.select(*sel)
            if tag:
                df = df.select(
                    F.col("_metadata.file_path").alias("__dv_file"),
                    F.col("_metadata.row_index").alias("__dv_pos"),
                    *[F.col(c) for c in df.columns],
                )
            dfs.append(df)
        if not dfs:
            return self.spark.createDataFrame([], self.schema_for(table))
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df, allowMissingColumns=True)
        # rename fold: ONE projection over the union — a legacy column
        # holds a value in pre-rename members and NULL in post-rename
        # ones, so coalesce(new, old…) is exact here, and patch rows
        # (written post-read, new names only) pass through untouched
        out = self._apply_renames(table, out, ren=ren)
        if patch_files:
            # lightweight UPDATE (patch parts): replace each patched row
            # address with its LATEST patch row — the patch keeps the
            # original (file, position), so later DVs and further patches
            # still address it.  Patches are FILTERED to files under the
            # scanned members (a file belongs to exactly one member), so a
            # subset scan — tiered compaction folding only fresh members,
            # a snapshot of an older manifest — never injects rows whose
            # originals live outside the scan.
            # patch dirs are immutable once renamed into place and normally
            # share one schema (each patch writer selects the full tagged
            # row), so the first dir's memoized inferred schema serves the
            # multi-path read without a per-read inference pass (r14) —
            # guarded by the same footer-uniformity check as the fused
            # member scan (an ALTER between patches changes patch columns)
            ppaths = [
                os.path.join(self._patch_dir(table), f) for f in patch_files
            ]
            psch = None
            pfps = [self._first_parquet(p) for p in ppaths]
            if all(fp is not None for fp in pfps):
                pnames = [self._parquet_column_names(fp) for fp in pfps]
                if all(n == pnames[0] for n in pnames):
                    psch = self._inferred_schema(ppaths[0])
            if psch is not None:
                pat = self.spark.read.schema(psch).parquet(*ppaths)
            else:
                pat = self.spark.read.parquet(*ppaths)
            in_scan = F.lit(False)
            for m in members:
                # scheme-agnostic ('file:/x' vs 'file:///x'): match on the
                # absolute member path; the trailing '/' stops a member
                # name prefixing another ('attached-ab' vs 'attached-abc')
                frag = os.path.abspath(
                    os.path.join(self.path(table), m)
                ) + "/"
                in_scan = in_scan | F.col("__dv_file").contains(frag)
            pat = pat.filter(in_scan)
            w = Window.partitionBy("__dv_file", "__dv_pos").orderBy(
                F.col("__patch_seq").desc()
            )
            latest = (
                pat.withColumn("__prn", F.row_number().over(w))
                .filter(F.col("__prn") == 1)
                .drop("__prn", "__patch_seq")
            )
            out = out.join(
                latest.select("__dv_file", "__dv_pos"),
                ["__dv_file", "__dv_pos"],
                "left_anti",
            ).unionByName(latest, allowMissingColumns=True)
        if dv_files:
            # DV schema is FIXED by the delete-writer (the address pair) —
            # an explicit schema skips inference entirely (r14)
            dv = self.spark.read.schema(
                "__dv_file string, __dv_pos long"
            ).parquet(
                *[os.path.join(self._dv_dir(table), f) for f in dv_files]
            )
            out = out.join(dv, ["__dv_file", "__dv_pos"], "left_anti")
        if tag and not keep_dv_tag:
            out = out.drop("__dv_file", "__dv_pos")
        if override is not None:
            target = self.schema_for(table)
            if tag and keep_dv_tag:
                # the delete-writer needs the position tag to survive the
                # declared-schema projection
                target = T.StructType(
                    [
                        T.StructField("__dv_file", T.StringType()),
                        T.StructField("__dv_pos", T.LongType()),
                        *target.fields,
                    ]
                )
            out = conform_to_schema(out, target)
        return out

    # -- lightweight DELETE (deletion vectors) ------------------------------

    def _dv_dir(self, table: str) -> str:
        return os.path.join(self.path(table), "_deletes")

    def _dv_files(self, table: str) -> list[str]:
        try:
            return sorted(
                e for e in os.listdir(self._dv_dir(table))
                if e.startswith("dv-")
            )
        except OSError:
            return []

    # -- lightweight UPDATE (patch parts) -----------------------------------

    def _patch_dir(self, table: str) -> str:
        return os.path.join(self.path(table), "_patches")

    def _patch_files(self, table: str) -> list[str]:
        try:
            return sorted(
                e for e in os.listdir(self._patch_dir(table))
                if e.startswith("patch-")
            )
        except OSError:
            return []

    def _next_patch_seq(self, table: str) -> int:
        """1 + the max sequence parsed from live patch file names — NOT
        the file count: a partial GC (tiered compaction, DROP PARTITION)
        can remove an older patch while a newer one survives, and a
        count-derived seq would then collide with the survivor, making
        the latest-wins tie-break in ``_read_members`` nondeterministic."""
        mx = -1
        for f in self._patch_files(table):
            m = re.match(r"patch-(\d+)", f)
            if m:
                mx = max(mx, int(m.group(1)))
        return mx + 1

    def dv_epoch(self, table: str) -> str:
        """Stable stamp of the table's deletion-vector AND patch state —
        derived structures (projections, skip indexes) rebuild when it
        moves, because both change row content without changing manifest
        membership."""
        return ",".join(self._dv_files(table) + self._patch_files(table))

    def overlay_files(self, table: str) -> list[str]:
        """All live overlay (deletion-vector + patch) file names — the
        granular form of :meth:`dv_epoch`, for derived structures that
        invalidate per member instead of wholesale."""
        return sorted(self._dv_files(table) + self._patch_files(table))

    def overlay_member_refs(
        self, table: str, overlay_names: list[str]
    ) -> set[str]:
        """Member dirs addressed by the named overlay files.  DVs and
        patches key rows by the data file's absolute path; a file belongs
        to exactly one member, so the member set is the path's first
        component under the table root.  One Spark job over all named
        overlays (``__dv_file`` column projection), distinct file paths
        collected — bounded by the table's file count, not its rows."""
        paths = []
        for n in overlay_names:
            d = (
                self._patch_dir(table)
                if n.startswith("patch-")
                else self._dv_dir(table)
            )
            paths.append(os.path.join(d, n))
        if not paths:
            return set()
        refs = (
            self.spark.read.schema("__dv_file string")
            .parquet(*paths)
            .distinct()
            .collect()
        )
        root = os.path.abspath(self.path(table))
        out: set[str] = set()
        for (r,) in refs:
            rel = os.path.relpath(
                os.path.abspath(_strip_scheme(r)), root
            )
            head = rel.split(os.sep)[0]
            if head not in ("..", "."):
                out.add(head)
        return out

    # -- mutation log (system.mutations analog) ------------------------------

    def _mutlog_path(self, table: str) -> str:
        return os.path.join(self.path(table), "_mutations.jsonl")

    def _log_mutation(self, table: str, kind: str, command: str, **extra):
        """Append one entry to the table's mutation log — the record
        ``system.mutations`` serves in ClickHouse.  Single-writer
        append-only jsonl next to the manifest; a reader never sees a
        torn entry larger than one OS pipe buffer (entries are tiny)."""
        if not os.path.isdir(self.path(table)):
            return  # nonexistent table: don't mint a phantom dir
        entry = {
            "mutation_id": None,  # assigned below from the current count
            "kind": kind,
            "command": command,
            "created_at": time.time(),
            **extra,
        }
        path = self._mutlog_path(table)
        n = 0
        if os.path.exists(path):
            with open(path) as fh:
                n = sum(1 for line in fh if line.strip())
        entry["mutation_id"] = n
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "a") as fh:
            fh.write(json.dumps(entry) + "\n")

    def mutations(self, table: str) -> DataFrame:
        """``system.mutations`` analog: one row per mutation command ever
        issued against the table — ALTER DELETE/UPDATE part rewrites and
        lightweight DELETE/UPDATE overlays — with the command text,
        creation time, rows affected, and whether the mutation is
        MATERIALIZED into data files (part rewrites are materialized by
        construction; a lightweight mutation materializes when a merge
        folds its overlay and GC collects it, exactly ClickHouse's
        ``is_done``).  Metadata only: the log and a directory listing,
        no data scan at any table size."""
        live = set(self.overlay_files(table))
        rows = []
        try:
            with open(self._mutlog_path(table)) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    e = json.loads(line)
                    ov = e.get("overlay_file")
                    rows.append((
                        table,
                        int(e["mutation_id"]),
                        e["kind"],
                        e["command"],
                        float(e["created_at"]),
                        int(e.get("rows_affected", 0)),
                        ov,
                        int(e.get("members_rewritten", 0)),
                        ov is None or ov not in live,
                    ))
        except OSError:
            pass
        return self.spark.createDataFrame(
            rows,
            "table string, mutation_id long, kind string, command string,"
            " created_at double, rows_affected long, overlay_file string,"
            " members_rewritten long, is_materialized boolean",
        )

    def update_where_lightweight(
        self, table: str, assignments: dict[str, object], condition
    ) -> dict:
        """ClickHouse lightweight ``UPDATE … SET … WHERE`` (patch parts)
        analog: instead of rewriting members like ``update_set`` (the
        ALTER UPDATE mutation), persist a PATCH file — the full updated
        rows keyed by their original (file, row position) — applied on
        every read by replacing the addressed rows.  Update cost is one
        predicate scan + a patch write proportional to the MATCHED rows,
        no data rewrite; the commit is one atomic rename (a crash before
        it leaves the table untouched).  ``compact()`` materializes
        patches into the new member and ``gc_deletes`` collects spent
        patch files.

        The match runs against the CURRENT visible state (earlier patches
        applied, DV-masked rows excluded), so re-issuing an update whose
        predicate no longer matches is idempotent, stacked updates
        compose (latest patch per row wins), and a later DELETE of
        patched rows masks them through the preserved original address."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        man = self.load_manifest(table)
        if man is None:
            raise ValueError(
                "lightweight update needs the manifest layout; "
                f"{table!r} has none (append with batch_id to create one)"
            )
        # footer-stats member pruning (VERDICT r11 #4; soundness-guarded
        # against live patches inside _prune_members_for_mutation)
        members, _ = self._prune_members_for_mutation(
            table, man["members"], cond
        )
        if not members:
            cols = self.read(table).columns
            for col in assignments:
                if col not in cols:
                    raise ValueError(f"no such column {col!r} in {table!r}")
            self._log_mutation(
                table, "UPDATE_LIGHTWEIGHT",
                f"UPDATE … WHERE {condition}", rows_affected=0,
            )
            return {
                "rows_updated": 0,
                "patch_files": len(self._patch_files(table)),
            }
        tagged = self._read_members(table, members, keep_dv_tag=True)
        data_cols = [
            c for c in tagged.columns if c not in ("__dv_file", "__dv_pos")
        ]
        sets = {}
        for col, e in assignments.items():
            if col not in data_cols:
                raise ValueError(f"no such column {col!r} in {table!r}")
            sets[col] = F.expr(e) if isinstance(e, str) else e
        # ALL assignment RHS evaluate against the PRE-update row in one
        # select (ClickHouse ALTER UPDATE semantics, and _mutate's):
        # {a: 'b', b: 'a'} swaps — a sequential withColumn chain would
        # feed a's new value into b's expression instead
        hits = tagged.filter(cond).select(
            *[
                sets[c].cast(tagged.schema[c].dataType).alias(c)
                if c in sets
                else F.col(c)
                for c in tagged.columns
            ]
        )
        seq = self._next_patch_seq(table)
        hits = hits.withColumn("__patch_seq", F.lit(seq))
        staging = os.path.join(
            self.path(table), f".patch-staging-{uuid.uuid4().hex[:8]}"
        )
        # repartition(1), not coalesce(1): coalesce collapses the WHOLE
        # predicate scan into one task (at 100 TB, one task reading every
        # candidate member); the repartition keeps the scan parallel and
        # shuffles only the MATCHED rows into the single patch file (r13)
        self._writer(hits.repartition(1)).mode("overwrite").parquet(staging)
        n = self._count_rows_parquet(staging)
        cmd = "UPDATE %s WHERE %s" % (
            ", ".join(f"{c} = {e}" for c, e in assignments.items()),
            condition,
        )
        if n == 0:
            shutil.rmtree(staging, ignore_errors=True)
            self._log_mutation(
                table, "UPDATE_LIGHTWEIGHT", cmd, rows_affected=0
            )
            return {"rows_updated": 0,
                    "patch_files": len(self._patch_files(table))}
        os.makedirs(self._patch_dir(table), exist_ok=True)
        final = os.path.join(
            self._patch_dir(table), f"patch-{seq:06d}-{uuid.uuid4().hex[:8]}"
        )
        os.rename(staging, final)
        self._log_mutation(
            table, "UPDATE_LIGHTWEIGHT", cmd,
            rows_affected=n, overlay_file=os.path.basename(final),
        )
        return {"rows_updated": n,
                "patch_files": len(self._patch_files(table))}

    def delete_where_lightweight(self, table: str, condition) -> dict:
        """ClickHouse ``DELETE FROM … WHERE`` (lightweight delete) analog:
        instead of rewriting members like ``delete_where`` (the ALTER
        DELETE mutation), persist a POSITIONAL deletion vector — the
        (file, row_index) set of matched rows — and mask it on every
        read.  Delete cost is one predicate scan + a tiny DV write, no
        data rewrite; ``compact()`` materializes the mask into the new
        member and garbage-collects spent DVs (exactly ClickHouse's
        ``_row_exists`` mask folded by background merges, and the
        Iceberg/Delta deletion-vector design at lake scale).

        Matches against rows ALREADY masked by earlier DVs are excluded,
        so re-issuing a delete is idempotent (0 new rows).  DVs overlay
        the CURRENT table state: like ClickHouse lightweight deletes they
        apply to every read, including ``read_at_version`` snapshots."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        man = self.load_manifest(table)
        if man is None:
            raise ValueError(
                "lightweight delete needs the manifest layout; "
                f"{table!r} has none (append with batch_id to create one)"
            )
        # footer-stats member pruning (VERDICT r11 #4): the predicate scan
        # reads only members whose parquet metadata admits a match
        members, _ = self._prune_members_for_mutation(
            table, man["members"], cond
        )
        if not members:
            self._log_mutation(
                table, "DELETE_LIGHTWEIGHT",
                f"DELETE WHERE {condition}", rows_affected=0,
            )
            return {"rows_deleted": 0, "dv_files": len(self._dv_files(table))}
        tagged = self._read_members(table, members, keep_dv_tag=True)
        hits = tagged.filter(cond).select("__dv_file", "__dv_pos")
        staging = os.path.join(
            self.path(table), f".dv-staging-{uuid.uuid4().hex[:8]}"
        )
        # repartition(1), not coalesce(1) — same rationale as the patch
        # writer: keep the predicate scan parallel, shuffle only matches
        self._writer(hits.repartition(1)).mode("overwrite").parquet(staging)
        n = self._count_rows_parquet(staging)
        cmd = f"DELETE WHERE {condition}"
        if n == 0:
            shutil.rmtree(staging, ignore_errors=True)
            self._log_mutation(
                table, "DELETE_LIGHTWEIGHT", cmd, rows_affected=0
            )
            return {"rows_deleted": 0, "dv_files": len(self._dv_files(table))}
        os.makedirs(self._dv_dir(table), exist_ok=True)
        seq = len(self._dv_files(table))
        final = os.path.join(
            self._dv_dir(table), f"dv-{seq:06d}-{uuid.uuid4().hex[:8]}"
        )
        os.rename(staging, final)
        self._log_mutation(
            table, "DELETE_LIGHTWEIGHT", cmd,
            rows_affected=n, overlay_file=os.path.basename(final),
        )
        return {"rows_deleted": n, "dv_files": len(self._dv_files(table))}

    def gc_deletes(self, table: str) -> int:
        """Drop deletion-vector AND patch files whose referenced data files
        no longer exist (they were compacted/mutated away, materializing
        the mask/patch).  A file that still references ANY live data file
        stays whole — its dead references are harmless no-ops in the
        joins.  Returns the number of overlay files removed."""
        removed = 0
        targets = [
            os.path.join(self._dv_dir(table), f)
            for f in self._dv_files(table)
        ] + [
            os.path.join(self._patch_dir(table), f)
            for f in self._patch_files(table)
        ]
        if not targets:
            return 0
        # ONE job over every overlay file (a long-uncompacted table can
        # hold hundreds; one driver round-trip each was the old cost):
        # distinct (source parquet, referenced data file) pairs, grouped
        # back to overlay dirs driver-side — bounded by the table's file
        # count, not its rows
        pairs = (
            self.spark.read.schema("__dv_file string")
            .parquet(*targets)
            .select(
                F.input_file_name().alias("__src"), F.col("__dv_file")
            )
            .distinct()
            .collect()
        )
        by_abs = {os.path.abspath(p): p for p in targets}
        refs_by_overlay: dict[str, set[str]] = {p: set() for p in targets}
        for src, ref in pairs:
            d = os.path.abspath(os.path.dirname(_strip_scheme(src)))
            if d in by_abs:
                refs_by_overlay[by_abs[d]].add(ref)
        for p, refs in refs_by_overlay.items():
            if not any(os.path.exists(_strip_scheme(r)) for r in refs):
                shutil.rmtree(p, ignore_errors=True)
                removed += 1
        return removed

    def _count_rows_parquet(self, path: str) -> int:
        """Row count of a just-written parquet dir from the file FOOTERS —
        the count is free metadata; the old ``spark.read...count()`` paid a
        whole Spark job per mutation call (r13, guide §1.2: don't compute
        what metadata already knows).

        Footer-read errors PROPAGATE (r14, ADVICE): the staging dir is
        local and was written by this process moments ago, so a failure
        here is a real fault — the old blanket ``return 0`` made the
        mutation writers treat it as 'no rows matched' and silently drop
        an UPDATE/DELETE that did match rows."""
        import pyarrow.parquet as pq

        n = 0
        for dirpath, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    n += pq.ParquetFile(
                        os.path.join(dirpath, f)
                    ).metadata.num_rows
        return n

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
        df = self._apply_computed_write(table, df)
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
        if batch_id is not None and self.batch_committed(table, batch_id):
            # Replay of an already-committed batch: skip ENTIRELY.  The
            # ledger outlives compaction folding the batch dir into a
            # compacted member, so re-writing + re-registering here would
            # duplicate every row of the batch (the rows already live in
            # the compacted member).  Skipping is safe because a replayed
            # micro-batch re-derives the identical rows by construction.
            return
        writer_df = self._prep(table, df)
        if batch_id is None:
            target, mode = self.path(table), "append"
        else:
            target = os.path.join(self.path(table), f"ingest_batch={batch_id}")
            mode = "overwrite"
            if self._is_date_partitioned(table) and "event_date" in writer_df.columns:
                # ONE part per (batch, date) — the MergeTree
                # one-part-per-insert shape.  A micro-batch is bounded (a
                # 10-min window at the reference envelope ≈ 200k events),
                # so the per-date shuffle is tiny, while writing the
                # upstream shuffle's 32+ partitions straight out produces
                # 32 ~300-row files per table per batch — the small-file
                # flood the ingest soak measured (1900+ live files between
                # compactions, ~2.4k ev/s); coalesced appends write 3/batch.
                writer_df = writer_df.repartition("event_date").sortWithinPartitions(
                    *self._sort_key(table)
                )
        if self._is_date_partitioned(table):
            self._writer(writer_df).mode(mode).partitionBy("event_date").parquet(target)
        else:
            self._writer(writer_df).mode(mode).parquet(target)
        if batch_id is not None:
            # COMMIT: register the member in the manifest.  Data lands first,
            # pointer flips second — a crash between the two leaves an
            # uncommitted dir that the replay overwrite converges.
            self._manifest_commit_batch(table, batch_id)

    def _batch_layout(self, table: str) -> bool | None:
        """True = existing table uses the batch-append layout (manifest or
        legacy ``ingest_batch=`` dirs), False = plain layout, None = no data
        yet (either layout may start)."""
        if self.load_manifest(table) is not None:
            return True
        if not self.exists(table):
            return None
        entries = [
            f for f in os.listdir(self.path(table)) if not f.startswith((".", "_"))
        ]
        return any(e.startswith("ingest_batch=") for e in entries)

    def batch_committed(self, table: str, batch_id: int) -> bool:
        """True when ``append(..., batch_id=...)`` has fully committed for
        this id (the replay-skip marker of the streaming sink).  The manifest
        ledger is authoritative — it survives compaction deleting the batch
        dir, so a late replay cannot re-append rows that now live inside a
        compacted member.  Legacy (pre-manifest) tables fall back to the
        job-level ``_SUCCESS`` marker; task files alone never count — they
        move into place BEFORE job commit, and a crash in that gap must make
        the replay reprocess, not skip and lose rows."""
        man = self.load_manifest(table)
        if man is not None:
            return batch_id in man["committed_batches"]
        p = os.path.join(self.path(table), f"ingest_batch={batch_id}")
        return os.path.exists(os.path.join(p, "_SUCCESS"))

    def overwrite(self, table: str, df: DataFrame) -> None:
        """Full-snapshot replace (SCD2 dims).  The input may derive from the
        table being overwritten, so materialize first (localCheckpoint) —
        dims are small."""
        df = self._apply_computed_write(table, df)
        writer_df = self._prep(table, df).localCheckpoint(eager=True)
        self._writer(writer_df).mode("overwrite").parquet(self.path(table))

    def compact(
        self,
        table: str,
        retain_old: bool = False,
        ttl_older_than=None,
        mode: str = "full",
        max_generations: int = 4,
        transform=None,
        now=None,
    ) -> int:
        """Small-file compaction — the engine's analog of MergeTree background
        merges (streaming foreachBatch appends one file set per micro-batch;
        ClickHouse merges parts the same way, SURVEY.md S3/S4).  Returns the
        number of data files after compaction.

        ``mode="full"`` (default) rewrites the whole live set — the
        OPTIMIZE TABLE FINAL analog; ``mode="tiered"`` folds only the batch
        dirs appended since the last compaction into a new generation
        (major-merging the generations once ``max_generations`` exist), so
        the production maintenance cadence costs O(ingest window), not
        O(table) — the actual MergeTree background-merge discipline.

        Batch-append (manifest) tables compact CONCURRENT-SAFELY: the live
        member set is snapshotted from the manifest, rewritten to one sorted
        file per event_date partition in a NEW ``compacted-*`` member, and
        the pointer flips to [new member] + [members that appended since the
        snapshot].  Appends landing mid-compaction register themselves in
        the manifest and survive the flip; readers resolve the pointer once
        and never see a half-swapped table.  Only compactors must not run
        concurrently with each other (one compactor + N appenders is the
        supported discipline — same as ClickHouse merges owning parts).
        With ``retain_old`` the superseded members stay on disk (set it when
        long-running readers may still hold a pre-flip plan; a later compact
        run prunes them once unreferenced).

        Plain-layout tables (gold dims/facts refreshed by the single-writer
        runner) keep the staging + rename swap and the single-writer
        discipline: their writer is the scheduler, which never overlaps
        itself."""
        import shutil
        import uuid

        if not self.exists(table):
            return 0
        if self.merges_stopped(table):
            # SYSTEM STOP MERGES: the background merge is a no-op until
            # START MERGES; appends/reads/mutations continue unaffected
            return self._count_parquet(self.path(table))
        if self.load_manifest(table) is None and self._batch_layout(table):
            # legacy ingest_batch dirs from before the manifest layout:
            # adopt them into a first manifest, then compact through it
            with self._manifest_lock(table):
                if self.load_manifest(table) is None:
                    man = self._bootstrap_manifest(table)
                    man["version"] = 1
                    self._write_manifest(table, man)
        ttl_cond = None
        if ttl_older_than is not None:
            # TTL folded into the merge — ClickHouse applies TTL exactly
            # here, when a merge rewrites parts anyway (zero extra passes)
            import datetime

            cutoff = ttl_older_than
            if isinstance(cutoff, str):
                cutoff = datetime.datetime.fromisoformat(cutoff)
            ttl_cond = F.col("event_ts") >= F.lit(cutoff)
        elif transform is None:
            # DECLARED TTL (set_table_ttl): the merge enforces it without
            # the caller re-stating the clause — the CH MODIFY TTL contract
            decl = self.table_ttl(table)
            if decl is not None:
                import datetime

                now_dt = now or datetime.datetime.now()
                cutoff = now_dt - datetime.timedelta(
                    days=decl["interval_days"]
                )
                if decl.get("group_by"):
                    transform = self._ttl_rollup_transform(
                        cutoff, decl["group_by"], decl["aggregates"],
                        decl["ttl_col"],
                    )
                else:
                    ttl_cond = F.coalesce(
                        F.col(decl["ttl_col"]) >= F.lit(cutoff), F.lit(True)
                    )
                    if decl.get("where"):
                        # conditional TTL: rows NOT matching the WHERE
                        # never expire (NULL predicate = not matching)
                        ttl_cond = ttl_cond | ~F.coalesce(
                            F.expr(decl["where"]), F.lit(False)
                        )
        row_set_transform = transform is not None
        colttl = self.column_ttls(table)
        if colttl:
            # declared COLUMN TTLs fold into every merge as one extra
            # projection (row count unchanged) — applied to raw rows
            # BEFORE any caller/rollup transform.  Column TTL alone does
            # NOT force a full merge: ClickHouse applies it to exactly
            # the parts a merge rewrites, so expired values inside
            # untouched generations wait for their generation's merge.
            import datetime

            now_dt = now or datetime.datetime.now()
            col_tf = self._column_ttl_transform(table, colttl, now_dt)
            inner = transform
            transform = (
                (lambda df: inner(col_tf(df)))
                if inner is not None
                else col_tf
            )
        if ttl_cond is not None:
            # TTL must see every row, including ones inside old compacted
            # generations a tiered pass would skip
            mode = "full"
        if row_set_transform:
            # a row-set rewrite (e.g. DEDUPLICATE, rollup TTL) must see
            # every row
            mode = "full"
        man = self.load_manifest(table)
        if man is not None:
            return self._compact_manifest(
                table, man, retain_old, ttl_cond, mode, max_generations,
                transform,
            )

        # -- plain layout: staging + rename swap (single-writer) -----------
        # go through read(): on a migrated table it reads with the declared
        # schema — a raw inferred read over mixed pre/post-ALTER files could
        # adopt an old file's schema and silently drop the added column
        df = self.read(table)
        if ttl_cond is not None:
            df = df.filter(ttl_cond)
        if transform is not None:
            df = transform(df)
        staging = self.path(f".{table}.compact-{uuid.uuid4().hex[:8]}")
        self._write_compacted(table, df, staging)
        final = self.path(table)
        backup = self.path(f".{table}.old-{uuid.uuid4().hex[:8]}")
        os.rename(final, backup)
        try:
            os.rename(staging, final)
        except BaseException:
            os.rename(backup, final)  # restore — never leave the table missing
            raise
        shutil.rmtree(backup)
        return self._count_parquet(final)

    def optimize_deduplicate(
        self, table: str, by: list[str] | None = None,
        retain_old: bool = False,
    ) -> dict:
        """``OPTIMIZE TABLE … FINAL DEDUPLICATE [BY col, …]`` analog: a
        full merge that removes duplicate rows.  Without ``by``, rows
        identical in EVERY column collapse to one (a set — no pick
        needed).  With ``by``, exactly one row per distinct by-tuple
        survives; stock ClickHouse keeps an arbitrary one, pinned
        deterministic here (first under a sort over the remaining
        columns) so repeated runs and tests converge.  Runs as the same
        snapshot-rewrite-flip as ``compact`` — appends landing mid-merge
        survive the pointer flip.  Returns ``{"rows_before",
        "rows_after", "rows_removed"}``."""
        before = self.read(table).count()
        if by is None:
            transform = lambda df: df.dropDuplicates()  # noqa: E731
        else:
            by_cols = list(by)

            def transform(df: DataFrame) -> DataFrame:
                others = [c for c in df.columns if c not in by_cols]
                w = Window.partitionBy(*by_cols).orderBy(
                    *[F.col(c).asc_nulls_last() for c in others]
                ) if others else Window.partitionBy(*by_cols).orderBy(
                    F.lit(1)
                )
                return (
                    df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )

        self.compact(table, retain_old=retain_old, transform=transform)
        after = self.read(table).count()
        return {
            "rows_before": before,
            "rows_after": after,
            "rows_removed": before - after,
        }

    def _write_compacted(self, table: str, df: DataFrame, target: str) -> None:
        """One sorted file per event_date (hash-repartition on event_date:
        every date lands in exactly one task, dates run in parallel)."""
        par = self.spark.sparkContext.defaultParallelism
        if self._is_date_partitioned(table) and "event_date" in df.columns:
            out = df.repartition(par, "event_date").sortWithinPartitions(
                *self._sort_key(table)
            )
            self._writer(out).mode("overwrite").partitionBy("event_date").parquet(target)
        elif self._sort_key(table) is not None:
            # ORDER-BY-only layout: one sorted file, no date directories
            out = df.coalesce(1).sortWithinPartitions(*self._sort_key(table))
            self._writer(out).mode("overwrite").parquet(target)
        else:
            self._writer(df.coalesce(1)).mode("overwrite").parquet(target)

    def _compact_manifest(
        self,
        table: str,
        man: dict,
        retain_old: bool,
        ttl_cond=None,
        mode: str = "full",
        max_generations: int = 4,
        transform=None,
    ) -> int:
        import shutil
        import uuid

        snapshot = list(man["members"])
        if mode == "tiered":
            # ClickHouse-merge discipline: a background (minor) merge folds
            # only the NEW parts — batch dirs since the last compaction —
            # into one generation, so its cost is ∝ the ingest window, NOT
            # the table (the full-rewrite default's cost grows with every
            # cycle: the ingest soak measured 8.5 s → 12.8 s over 100
            # batches).  Generations are capped: when ``max_generations``
            # compacted members exist, the next pass folds them too (a
            # major merge — LSM-style amortized O(table/k) per cycle).
            # ``mode="full"`` remains the OPTIMIZE TABLE FINAL analog.
            gens = [m for m in snapshot if m.startswith("compacted-")]
            fresh = [m for m in snapshot if not m.startswith("compacted-")]
            snapshot = fresh + (gens if len(gens) >= max_generations else [])
        if not snapshot:
            live = man["members"]
            return sum(
                self._count_parquet(os.path.join(self.path(table), m))
                for m in live
            )
        new_member = f"compacted-{uuid.uuid4().hex[:8]}"
        merged = self._read_members(table, snapshot)
        if ttl_cond is not None:
            merged = merged.filter(ttl_cond)
        if transform is not None:
            merged = transform(merged)
        self._write_compacted(
            table,
            merged,
            os.path.join(self.path(table), new_member),
        )
        with self._manifest_lock(table):
            cur = self.load_manifest(table)
            gone = set(snapshot)
            cur["members"] = [new_member] + [
                m for m in cur["members"] if m not in gone
            ]
            cur["version"] += 1
            self._write_manifest(table, cur)
        if not retain_old:
            for m in snapshot:
                shutil.rmtree(
                    os.path.join(self.path(table), m), ignore_errors=True
                )
        # the rewrite materialized any deletion-vector mask for the folded
        # members (the merged read applies DVs); DVs that now reference no
        # live file are spent
        self.gc_deletes(table)
        # cast chains / CLEAR overlays addressed to the folded members are
        # now physically materialized — retire spent entries (footer
        # metadata only, no data scan)
        self._gc_alter_overlays(table)
        live = self.load_manifest(table)["members"]
        return sum(
            self._count_parquet(os.path.join(self.path(table), m))
            for m in live
        )

    def _gc_alter_overlays(self, table: str) -> None:
        """Retire MODIFY-COLUMN cast chains whose every live member
        already stores the declared type, and CLEAR COLUMN entries whose
        addressed members have all been rewritten away — both become
        physical as merges rewrite members, after which the metadata is
        dead weight on every read.  Footer metadata only, no data scan."""
        man = self.load_manifest(table)
        if man is None:
            return
        live = list(man["members"])
        casts = self.column_casts(table)
        if casts:
            stale: set = set()
            for m in live:
                fp = self._first_parquet(os.path.join(self.path(table), m))
                if fp is None:
                    continue
                ftypes = self._parquet_field_types(fp)
                for c, ddl in casts.items():
                    if c in ftypes and ftypes[c].simpleString() != ddl:
                        stale.add(c)
            kept = {c: d for c, d in casts.items() if c in stale}
            if kept != casts:
                self.save_column_casts(table, kept)
        entries = self.cleared_entries(table)
        if entries:
            kept_e = [e for e in entries if set(e["members"]) & set(live)]
            if len(kept_e) != len(entries):
                self.save_cleared_entries(table, kept_e)

    def materialize_column(self, table: str, name: str) -> dict:
        """``ALTER TABLE … MATERIALIZE COLUMN name`` — rewrite ONLY the
        members whose parquet footers predate the computed column, so its
        values become stored bytes (the read-side back-fill stops paying
        for those members and direct file readers see the column).
        Members written after the ADD COLUMN are untouched — the
        ClickHouse materialize-mutation contract (mutations address the
        parts that need them).  Returns ``{"members_rewritten",
        "members_kept"}``."""
        stored = self._stored_computed(table)
        if name not in stored:
            raise ValueError(
                f"column {name!r} of {table!r} is not a stored "
                "(DEFAULT/MATERIALIZED) computed column"
            )
        if not self.exists(table):
            return {"members_rewritten": 0, "members_kept": 0}
        man = self.load_manifest(table)
        if man is None:
            # plain layout: one staged rewrite through the back-filling read
            out = self.read(table).localCheckpoint(eager=True)
            self.overwrite(table, out)
            self._log_mutation(
                table, "materialize_column", f"MATERIALIZE COLUMN {name}",
                members_rewritten=1,
            )
            return {"members_rewritten": 1, "members_kept": 0}
        snapshot = list(man["members"])
        rewritten: dict[str, str] = {}
        for m in snapshot:
            root = os.path.join(self.path(table), m)
            if self._count_parquet(root) == 0:
                continue
            if not self._computed_cols_lacking(
                root, [name], first_file_only=True
            ):
                continue  # column already stored in this member
            new_member = f"materialized-{uuid.uuid4().hex[:8]}"
            # the member read back-fills the expression (and applies any
            # DV/patch/cast overlays, which materialize along the way)
            self._write_compacted(
                table,
                self._read_members(table, [m]),
                os.path.join(self.path(table), new_member),
            )
            rewritten[m] = new_member
        if rewritten:
            with self._manifest_lock(table):
                cur = self.load_manifest(table)
                cur["members"] = [
                    rewritten.get(m, m) for m in cur["members"]
                ]
                cur["version"] += 1
                self._write_manifest(table, cur)
            for m in rewritten:
                shutil.rmtree(
                    os.path.join(self.path(table), m), ignore_errors=True
                )
            self.gc_deletes(table)
            self._gc_alter_overlays(table)
        self._log_mutation(
            table, "materialize_column", f"MATERIALIZE COLUMN {name}",
            members_rewritten=len(rewritten),
        )
        return {
            "members_rewritten": len(rewritten),
            "members_kept": len(snapshot) - len(rewritten),
        }

    # -- mutations (ALTER TABLE … DELETE / UPDATE / DROP PARTITION, TTL) ----
    #
    # ClickHouse mutations rewrite only the PARTS that contain matching rows
    # and commit by swapping the part set (clickhouse/init/01_bronze_tables
    # MergeTree tables are mutated this way by ALTER … DELETE/UPDATE).  The
    # manifest layout gives the same discipline: snapshot the live members,
    # rewrite only members the predicate touches into new ``mutated-*``
    # members, flip the pointer.  Appends landing mid-mutation register
    # themselves and survive the flip; the ``committed_batches`` ledger is
    # untouched, so exactly-once replay semantics survive mutations exactly
    # as they survive compaction.  One maintenance writer (mutation OR
    # compaction) at a time — the same discipline ClickHouse applies to
    # merges/mutations owning parts.

    def delete_where(
        self, table: str, condition, retain_old: bool = False,
        partition=None,
    ) -> dict:
        """``ALTER TABLE … DELETE [IN PARTITION p] WHERE condition``
        analog.  ``condition`` is a SQL expression string or Column
        selecting rows to DELETE.  Members with no matching rows are kept
        as-is (the match probe is a count with the predicate pushed into
        the parquet scan, so row-group stats skip untouched members
        cheaply); with ``partition`` the probe SKIPS members that lack
        the partition directory entirely — no job at all for them, the
        CH IN PARTITION mutation-scoping.  Returns ``{"rows_deleted",
        "members_rewritten", "members_kept"}``."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        res = self._mutate(table, cond, None, retain_old,
                           partition=partition)
        self._log_mutation(
            table, "ALTER_DELETE",
            "ALTER DELETE"
            + (f" IN PARTITION '{partition}'" if partition else "")
            + f" WHERE {condition}",
            rows_affected=res.get("rows_deleted", 0),
            members_rewritten=res.get("members_rewritten", 0),
        )
        return res

    def update_set(
        self,
        table: str,
        assignments: dict[str, object],
        condition,
        retain_old: bool = False,
        partition=None,
    ) -> dict:
        """``ALTER TABLE … UPDATE col = expr, … [IN PARTITION p] WHERE
        condition`` analog.  ``assignments`` maps column name → SQL
        expression string or Column; rows matching ``condition`` get the
        new values, other rows pass through unchanged; ``partition``
        scopes the mutation to one event_date (members without it are
        never probed).  Returns ``{"rows_updated", "members_rewritten",
        "members_kept"}``."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        res = self._mutate(table, cond, assignments, retain_old,
                           partition=partition)
        self._log_mutation(
            table, "ALTER_UPDATE",
            "ALTER UPDATE %s%s WHERE %s" % (
                ", ".join(f"{c} = {e}" for c, e in assignments.items()),
                f" IN PARTITION '{partition}'" if partition else "",
                condition,
            ),
            rows_affected=res.get("rows_updated", 0),
            members_rewritten=res.get("members_rewritten", 0),
        )
        return res

    def _mutate(
        self,
        table: str,
        cond,
        assignments: dict[str, object] | None,
        retain_old: bool,
        partition=None,
    ) -> dict:
        import shutil
        import uuid

        verb = "rows_updated" if assignments is not None else "rows_deleted"
        if not self.exists(table):
            return {verb: 0, "members_rewritten": 0, "members_kept": 0}
        if partition is not None:
            # IN PARTITION: the predicate gains the partition equality so
            # rows outside it are untouched even inside probed members
            cond = cond & (
                F.col("event_date") == F.to_date(F.lit(str(partition)))
            )
        if assignments:
            missing = [
                c for c in assignments if c not in self.read(table).columns
            ]
            if missing:
                raise ValueError(
                    f"UPDATE of {table!r} assigns unknown columns {missing}"
                )

        def rewrite(df: DataFrame, target: str) -> None:
            if assignments is None:
                out = df.filter(~cond)
            else:
                sets = {
                    k: F.expr(v) if isinstance(v, str) else v
                    for k, v in assignments.items()
                }
                out = df.select(
                    *[
                        F.when(cond, sets[c]).otherwise(F.col(c)).alias(c)
                        if c in sets
                        else F.col(c)
                        for c in df.columns
                    ]
                )
            self._write_compacted(table, out, target)

        man = self.load_manifest(table)
        if man is None and self._batch_layout(table):
            with self._manifest_lock(table):
                if self.load_manifest(table) is None:
                    boot = self._bootstrap_manifest(table)
                    boot["version"] = 1
                    self._write_manifest(table, boot)
            man = self.load_manifest(table)

        if man is None:
            # plain layout: single-writer staging + rename swap (compact's)
            df = self.read(table)
            n = df.filter(cond).count()
            if n == 0:
                return {verb: 0, "members_rewritten": 0, "members_kept": 1}
            staging = self.path(f".{table}.mutate-{uuid.uuid4().hex[:8]}")
            rewrite(df, staging)
            final = self.path(table)
            backup = self.path(f".{table}.old-{uuid.uuid4().hex[:8]}")
            os.rename(final, backup)
            try:
                os.rename(staging, final)
            except BaseException:
                os.rename(backup, final)
                raise
            shutil.rmtree(backup)
            return {verb: n, "members_rewritten": 1, "members_kept": 0}

        # manifest layout: rewrite ONLY affected members, flip the pointer
        snapshot = list(man["members"])
        rewritten: dict[str, str | None] = {}
        total = 0
        skipped_by_partition = 0
        # the directory fast path is only sound when members actually
        # carry event_date= levels: an ORDER-BY-only table has none, and
        # skipping on the missing directory would silently mutate nothing.
        # There, fall back to predicate probing (cond already carries the
        # partition equality) — loud AnalysisException if the table has
        # no event_date column at all, like CH's unknown-partition error.
        partition_dirs = partition is not None and (
            self._is_date_partitioned(table) or self._has_date_dirs(table)
        )
        # footer-stats member pruning (VERDICT r11 #4): candidate members
        # are chosen from driver-side parquet metadata before any probe
        # job launches, so mutation cost scales with MATCHED parts — the
        # CH part-scoping discipline.  Conservative: unparseable
        # predicates prune nothing.
        stats_kept, skipped_by_stats = self._prune_members_for_mutation(
            table, snapshot, cond
        )
        stats_kept_set = set(stats_kept)
        for m in snapshot:
            if partition_dirs and not os.path.isdir(
                os.path.join(
                    self.path(table), m, f"event_date={partition}"
                )
            ):
                # IN PARTITION fast path: the member has no directory for
                # the partition — no probe job at all (directory metadata)
                skipped_by_partition += 1
                continue
            if m not in stats_kept_set:
                continue
            mdf = self._read_members(table, [m])
            n = mdf.filter(cond).count()
            if n == 0:
                continue
            total += n
            new_member = f"mutated-{uuid.uuid4().hex[:8]}"
            target = os.path.join(self.path(table), new_member)
            rewrite(mdf, target)
            if self._count_parquet(target) == 0:
                # a DELETE matched every row of the member: drop the member
                # instead of keeping an empty parquet dir (unreadable)
                shutil.rmtree(target, ignore_errors=True)
                rewritten[m] = None
            else:
                rewritten[m] = new_member
        if not rewritten:
            return {verb: 0, "members_rewritten": 0,
                    "members_kept": len(snapshot),
                    "members_skipped_by_partition": skipped_by_partition,
                    "members_skipped_by_stats": skipped_by_stats}
        with self._manifest_lock(table):
            cur = self.load_manifest(table)
            members = []
            for m in cur["members"]:
                if m not in rewritten:
                    members.append(m)
                elif rewritten[m] is not None:
                    members.append(rewritten[m])
            cur["members"] = members
            cur["version"] += 1
            self._write_manifest(table, cur)
        if not retain_old:
            for m in rewritten:
                shutil.rmtree(
                    os.path.join(self.path(table), m), ignore_errors=True
                )
        return {
            verb: total,
            "members_rewritten": len(rewritten),
            "members_kept": len(snapshot) - len(rewritten),
            "members_skipped_by_partition": skipped_by_partition,
            "members_skipped_by_stats": skipped_by_stats,
        }

    def _remap_overlays_for_drop(
        self, table: str, part: str, replaced: dict[str, str | None]
    ) -> list[str]:
        """Rewrite live deletion vectors / patches for a DROP PARTITION
        member swap.  Overlay rows address (file, position) of the OLD
        member paths; the hardlink clones preserve every relative path,
        so the remap is a member-prefix substitution — without it the
        clone resurrects DV-deleted rows and reverts patched rows in the
        SURVIVING partitions, and the next gc_deletes then collects the
        orphaned overlays permanently.  Rows addressing the dropped
        partition itself are removed (their originals are gone; a stale
        patch row would otherwise be re-injected by the patch union).

        Remapped overlays are written as NEW entries (same embedded seq,
        fresh suffix) BEFORE the manifest flip; the caller deletes the
        old entries AFTER the flip.  Every crash window is consistent:
        pre-flip readers scan old paths (old entries apply, new ones
        no-op outside the scan), post-flip readers scan new paths (new
        entries apply, old ones no-op), duplicate rows for unreplaced
        members are identical in both entries."""
        pairs = [
            (
                os.path.abspath(os.path.join(self.path(table), old)) + "/",
                os.path.abspath(os.path.join(self.path(table), new)) + "/",
            )
            for old, new in replaced.items()
            if new is not None
        ]
        old_paths: list[str] = []
        for kind, names in (
            ("dv", self._dv_files(table)),
            ("patch", self._patch_files(table)),
        ):
            d = self._dv_dir(table) if kind == "dv" else self._patch_dir(table)
            for name in names:
                src = os.path.join(d, name)
                old_paths.append(src)
                df = self.spark.read.parquet(src)
                col = F.col("__dv_file")
                for old_p, new_p in pairs:
                    col = F.regexp_replace(col, re.escape(old_p), new_p)
                out = df.withColumn("__dv_file", col).filter(
                    ~F.col("__dv_file").contains(f"/{part}/")
                )
                staging = os.path.join(
                    self.path(table),
                    f".overlay-remap-{uuid.uuid4().hex[:8]}",
                )
                self._writer(out.coalesce(1)).mode("overwrite").parquet(
                    staging
                )
                if self._count_rows_parquet(staging) == 0:
                    shutil.rmtree(staging, ignore_errors=True)
                    continue
                m = re.match(rf"{kind}-(\d+)", name)
                seq = int(m.group(1)) if m else 0
                final = os.path.join(
                    d, f"{kind}-{seq:06d}-{uuid.uuid4().hex[:8]}"
                )
                os.rename(staging, final)
        return old_paths

    def drop_partition(self, table: str, date, retain_old: bool = False) -> int:
        """``ALTER TABLE … DROP PARTITION`` analog — remove one
        ``event_date`` partition WITHOUT scanning or rewriting rows.  Each
        affected member is replaced by a hardlink clone excluding the
        dropped partition directory (metadata-only, O(files) not O(rows) —
        the reason ClickHouse DROP PARTITION is instant at any size), and
        the pointer flips.  Returns the number of members affected."""
        import shutil
        import uuid

        if not self.exists(table):
            return 0
        part = f"event_date={date}"
        man = self.load_manifest(table)
        if man is None and self._batch_layout(table):
            with self._manifest_lock(table):
                if self.load_manifest(table) is None:
                    boot = self._bootstrap_manifest(table)
                    boot["version"] = 1
                    self._write_manifest(table, boot)
            man = self.load_manifest(table)

        def clone_excluding(src: str, dst: str) -> bool:
            """Hardlink every data file of ``src`` into ``dst`` except those
            under the dropped partition.  True when dst has any data."""
            kept = False
            for root, _dirs, files in os.walk(src):
                rel = os.path.relpath(root, src)
                if part in rel.split(os.sep):
                    continue
                for f in files:
                    if f.startswith("."):
                        continue
                    d = os.path.join(dst, rel)
                    os.makedirs(d, exist_ok=True)
                    os.link(os.path.join(root, f), os.path.join(d, f))
                    if f.endswith(".parquet"):
                        kept = True
            return kept

        if man is None:
            src = self.path(table)
            if not os.path.isdir(os.path.join(src, part)):
                return 0
            staging = self.path(f".{table}.drop-{uuid.uuid4().hex[:8]}")
            os.makedirs(staging, exist_ok=True)
            clone_excluding(src, staging)
            backup = self.path(f".{table}.old-{uuid.uuid4().hex[:8]}")
            os.rename(src, backup)
            try:
                os.rename(staging, src)
            except BaseException:
                os.rename(backup, src)
                raise
            shutil.rmtree(backup)
            return 1

        snapshot = list(man["members"])
        replaced: dict[str, str | None] = {}
        for m in snapshot:
            src = os.path.join(self.path(table), m)
            if not os.path.isdir(os.path.join(src, part)):
                continue
            new_member = f"mutated-{uuid.uuid4().hex[:8]}"
            dst = os.path.join(self.path(table), new_member)
            os.makedirs(dst, exist_ok=True)
            has_data = clone_excluding(src, dst)
            if not has_data:
                shutil.rmtree(dst, ignore_errors=True)
                replaced[m] = None  # member was entirely the dropped partition
            else:
                replaced[m] = new_member
        if not replaced:
            return 0
        old_overlays = self._remap_overlays_for_drop(table, part, replaced)
        # CLEAR COLUMN overlays address members BY NAME; the hardlink
        # clones carry the same (unmasked) bytes under new names, so each
        # entry's member list must follow the rename or the mask silently
        # stops applying (dropped-away members leave the list)
        entries = self.cleared_entries(table)
        if entries:
            remapped = []
            for e in entries:
                ms = [
                    replaced.get(m, m)
                    for m in e["members"]
                    if replaced.get(m, m) is not None
                ]
                if ms:
                    remapped.append({**e, "members": ms})
            self.save_cleared_entries(table, remapped)
        with self._manifest_lock(table):
            cur = self.load_manifest(table)
            members = []
            for m in cur["members"]:
                if m not in replaced:
                    members.append(m)
                elif replaced[m] is not None:
                    members.append(replaced[m])
            cur["members"] = members
            cur["version"] += 1
            self._write_manifest(table, cur)
        for p in old_overlays:
            shutil.rmtree(p, ignore_errors=True)
        if not retain_old:
            for m in replaced:
                shutil.rmtree(
                    os.path.join(self.path(table), m), ignore_errors=True
                )
        return len(replaced)

    def drop_member(self, table: str, member: str) -> bool:
        """Remove one manifest member (pointer flip + dir delete) —
        the primitive behind member-scoped invalidation of derived
        tables (a projection dropping exactly the fold batches whose
        base members a lightweight mutation touched).  Idempotent: a
        member already gone (a crashed earlier attempt) returns False
        without a version bump.  The replay ledger is left untouched —
        callers mint monotonically increasing batch ids, so a dropped
        batch id is never reused."""
        changed = False
        with self._manifest_lock(table):
            man = self.load_manifest(table)
            if man is not None and member in man["members"]:
                man["members"] = [m for m in man["members"] if m != member]
                man["version"] += 1
                self._write_manifest(table, man)
                changed = True
        shutil.rmtree(
            os.path.join(self.path(table), member), ignore_errors=True
        )
        return changed

    def attach_partition(
        self, src_table: str, dst_table: str, date, replace: bool = False
    ) -> int:
        """``ALTER TABLE dst ATTACH/REPLACE PARTITION date FROM src``
        analog: hardlink-clone the source partition's data files into a
        new manifest member of the destination and flip the pointer —
        metadata-only (O(files), zero rows moved), exactly why the
        ClickHouse operation is instant at any size.  ``replace=True``
        drops the destination's existing partition first (REPLACE
        PARTITION); the source is never modified.

        Refused when the source carries deletion vectors: DVs reference
        the SOURCE file paths, so hardlinked clones would resurrect
        masked rows — compact the source first to materialize its mask.
        Returns the number of data files attached."""
        part = f"event_date={date}"
        if self._dv_files(src_table) or self._patch_files(src_table):
            raise ValueError(
                f"source {src_table!r} has live deletion vectors or "
                "patches; compact() it first so the overlay is "
                "materialized"
            )
        src_man = self.load_manifest(src_table)
        if src_man is not None:
            src_roots = [
                os.path.join(self.path(src_table), m)
                for m in src_man["members"]
            ]
        else:
            src_roots = [self.path(src_table)]
        if self.load_manifest(dst_table) is None:
            raise ValueError(
                f"attach needs a manifest-layout destination; {dst_table!r} "
                "has none (append with batch_id to create one)"
            )
        if replace:
            self.drop_partition(dst_table, date)
        new_member = f"attached-{uuid.uuid4().hex[:8]}"
        dst = os.path.join(self.path(dst_table), new_member, part)
        linked = 0
        for root in src_roots:
            p = os.path.join(root, part)
            if not os.path.isdir(p):
                continue
            os.makedirs(dst, exist_ok=True)
            for f in sorted(os.listdir(p)):
                if f.startswith(".") or not f.endswith(".parquet"):
                    continue
                src_f = os.path.join(p, f)
                dst_f = os.path.join(dst, f"{linked:05d}-{f}")
                try:
                    os.link(src_f, dst_f)
                except OSError:
                    # cross-filesystem attach (EXDEV): degrade to a copy —
                    # still O(partition), never O(table)
                    shutil.copy2(src_f, dst_f)
                linked += 1
        if linked == 0:
            shutil.rmtree(
                os.path.join(self.path(dst_table), new_member),
                ignore_errors=True,
            )
            return 0
        with self._manifest_lock(dst_table):
            cur = self.load_manifest(dst_table)
            cur["members"] = cur["members"] + [new_member]
            cur["version"] += 1
            self._write_manifest(dst_table, cur)
        return linked

    def backup_table(
        self, table: str, dest: str, base: str | None = None
    ) -> dict:
        """``BACKUP TABLE … TO Disk(…)`` analog: a CONSISTENT snapshot of
        the current manifest state — live members, deletion vectors,
        patches, schema override and the replay ledger — hardlink-cloned
        (copy across filesystems).  Taken under the manifest lock so a
        concurrent append/compaction pointer flip cannot tear it;
        O(files) + O(overlay bytes), zero data rows rewritten.  Restore
        with :meth:`restore_table`, which remaps the overlay file
        addresses to the restored location.

        ``base`` = a previous backup of the same table → INCREMENTAL
        backup (CH ``SETTINGS base_backup = Disk(…)``): members and
        overlay entries whose files are inode-identical to the base's
        hardlink clones are RECORDED, not re-cloned, so the new backup's
        size is ∝ what changed since the base.  The inode check is
        exact, not name-trust: writers replace whole files (a replayed
        ``ingest_batch=`` dir re-minted under the same name fails
        ``samefile`` and is cloned fully).  Restores resolve the chain
        transparently."""
        if os.path.exists(dest) and os.listdir(dest):
            raise ValueError(f"backup destination {dest!r} is not empty")
        os.makedirs(dest, exist_ok=True)

        def clone_tree(src: str, dst: str) -> int:
            n = 0
            for dirpath, _dirs, files in os.walk(src):
                rel = os.path.relpath(dirpath, src)
                od = os.path.join(dst, rel) if rel != "." else dst
                os.makedirs(od, exist_ok=True)
                for f in files:
                    sf, df_ = os.path.join(dirpath, f), os.path.join(od, f)
                    try:
                        os.link(sf, df_)
                    except OSError:
                        shutil.copy2(sf, df_)
                    n += 1
            return n

        def same_tree(live: str, backed: str) -> bool:
            """Every file under ``live`` is the SAME inode as the base
            backup's clone (and the file sets match) — i.e. the entry is
            bit-identical to what the base already holds."""
            if not os.path.isdir(backed):
                return False
            live_files, backed_files = [], []
            for root_, d, fs in os.walk(live):
                live_files += [
                    os.path.join(os.path.relpath(root_, live), f)
                    for f in fs
                ]
            for root_, d, fs in os.walk(backed):
                backed_files += [
                    os.path.join(os.path.relpath(root_, backed), f)
                    for f in fs
                ]
            if sorted(live_files) != sorted(backed_files):
                return False
            try:
                return all(
                    os.path.samefile(
                        os.path.join(live, rel), os.path.join(backed, rel)
                    )
                    for rel in live_files
                )
            except OSError:
                return False

        base_abs = os.path.abspath(base) if base else None
        # the base may itself be incremental: an entry it RECORDED from
        # its own base has no physical copy there — resolve the check
        # through the whole base chain
        base_chain: list[str] = []
        cur = base_abs
        while cur and cur not in base_chain:
            base_chain.append(cur)
            try:
                with open(os.path.join(cur, "backup.json")) as fh:
                    cur = json.load(fh).get("base_backup")
            except OSError:
                break

        def in_base(rel: str, live: str) -> bool:
            for d in base_chain:
                cand = os.path.join(d, rel)
                if os.path.isdir(cand):
                    return same_tree(live, cand)
            return False

        with self._manifest_lock(table):
            man = self.load_manifest(table)
            if man is None:
                raise ValueError(
                    f"backup needs the manifest layout; {table!r} has none"
                )
            files = 0
            base_members: list[str] = []
            for m in man["members"]:
                live = os.path.join(self.path(table), m)
                if base_abs and in_base(m, live):
                    base_members.append(m)
                    continue
                files += clone_tree(live, os.path.join(dest, m))
            overlay_entries: dict[str, list[str]] = {}
            base_overlays: dict[str, list[str]] = {}
            for sub in ("_deletes", "_patches"):
                p = os.path.join(self.path(table), sub)
                if not os.path.isdir(p):
                    continue
                overlay_entries[sub] = sorted(os.listdir(p))
                base_overlays[sub] = []
                for entry in overlay_entries[sub]:
                    live = os.path.join(p, entry)
                    if base_abs and in_base(
                        os.path.join(sub, entry), live
                    ):
                        base_overlays[sub].append(entry)
                        continue
                    files += clone_tree(
                        live, os.path.join(dest, sub, entry)
                    )
            meta = {
                "source_table_path": os.path.abspath(self.path(table)),
                "members": man["members"],
                "committed_batches": man.get("committed_batches", []),
                "overlay_entries": overlay_entries,
            }
            if base_abs:
                meta["base_backup"] = base_abs
                meta["base_members"] = base_members
                meta["base_overlays"] = base_overlays
            ov = self.schema_override(table)
            if ov is not None:
                meta["schema_override"] = ov.jsonValue()
        with open(os.path.join(dest, "backup.json"), "w") as fh:
            json.dump(meta, fh, indent=1)
        return {
            "files": files,
            "members": len(meta["members"]),
            "members_from_base": len(meta.get("base_members", [])),
        }

    def restore_table(self, src: str, table: str) -> dict:
        """``RESTORE TABLE`` analog: install a :meth:`backup_table`
        snapshot as ``table``.  Data files hardlink/copy back; deletion
        vectors and patches have their stored (file, position) addresses
        REWRITTEN from the backed-up table's path to the restored one —
        without this the overlays would reference dead paths and
        silently mask nothing.  Refuses to overwrite an existing
        table."""
        if self.exists(table):
            raise ValueError(f"table {table!r} already exists")
        # incremental chains (backup_table base=…): walk base_backup
        # pointers; a member / overlay entry restores from the NEAREST
        # backup in the chain that physically holds it
        chain: list[tuple[str, dict]] = []
        cur, seen = os.path.abspath(src), set()
        while cur and cur not in seen:
            seen.add(cur)
            with open(os.path.join(cur, "backup.json")) as fh:
                m_ = json.load(fh)
            chain.append((cur, m_))
            cur = m_.get("base_backup")
        meta = chain[0][1]

        def resolve(rel: str) -> tuple[str, dict]:
            for d, m_ in chain:
                if os.path.isdir(os.path.join(d, rel)):
                    return os.path.join(d, rel), m_
            raise FileNotFoundError(
                f"backup chain from {src!r} holds no entry {rel!r}"
            )

        new_root = os.path.abspath(self.path(table))
        for m in meta["members"]:
            sp, _owner = resolve(m)
            dp = os.path.join(new_root, m)
            for dirpath, _dirs, files in os.walk(sp):
                rel = os.path.relpath(dirpath, sp)
                od = os.path.join(dp, rel) if rel != "." else dp
                os.makedirs(od, exist_ok=True)
                for f in files:
                    sf, df_ = os.path.join(dirpath, f), os.path.join(od, f)
                    try:
                        os.link(sf, df_)
                    except OSError:
                        shutil.copy2(sf, df_)
        # overlay set at backup time: the recorded entry list (older
        # backups without the key fall back to what's physically in src)
        entries_by_sub = meta.get("overlay_entries")
        for sub in ("_deletes", "_patches"):
            if entries_by_sub is not None:
                entries = entries_by_sub.get(sub, [])
            else:
                sp0 = os.path.join(src, sub)
                entries = (
                    sorted(os.listdir(sp0)) if os.path.isdir(sp0) else []
                )
            for entry in entries:
                sp, owner = resolve(os.path.join(sub, entry))
                # remap from the OWNING backup's source path — chain
                # links may have been taken from different table roots
                old_root = owner["source_table_path"]
                df_ = self.spark.read.parquet(sp)
                remapped = df_.withColumn(
                    "__dv_file",
                    F.regexp_replace(
                        "__dv_file", re.escape(old_root), new_root
                    ),
                )
                remapped.coalesce(1).write.mode("overwrite").parquet(
                    os.path.join(new_root, sub, entry)
                )
        if "schema_override" in meta:
            self.save_schema_override(
                table, T.StructType.fromJson(meta["schema_override"])
            )
        with self._manifest_lock(table):
            self._write_manifest(
                table,
                {
                    "version": 1,
                    "members": meta["members"],
                    "committed_batches": meta["committed_batches"],
                },
            )
        return {"members": len(meta["members"])}

    def apply_ttl(
        self, table: str, older_than, ttl_col: str = "event_ts"
    ) -> dict:
        """Row TTL — ClickHouse ``TTL event_ts + INTERVAL …`` applied as a
        maintenance pass (CH applies TTL during merges; ``compact`` accepts
        the same cutoff via ``ttl_older_than`` to fold it into a merge).

        Fast path first (``ttl_only_drop_parts`` analog): every
        ``event_date`` partition STRICTLY before the cutoff's date is
        dropped via the metadata-only ``drop_partition`` — no scan, no
        rewrite.  Only the boundary date (which mixes expired and live rows)
        goes through the row-level ``delete_where`` rewrite.  Returns
        ``{"partitions_dropped", "rows_deleted"}``."""
        import datetime

        cutoff = older_than
        if isinstance(cutoff, str):
            cutoff = datetime.datetime.fromisoformat(cutoff)
        cutoff_date = cutoff.date()
        dropped = 0
        if self._sort_key(table) is not None or self._has_date_dirs(table):
            for d in self._partition_dates(table):
                if d < cutoff_date:
                    dropped += self.drop_partition(table, d)
        res = self.delete_where(table, F.col(ttl_col) < F.lit(cutoff))
        return {"partitions_dropped": dropped,
                "rows_deleted": res["rows_deleted"]}

    def show_create_table(self, table: str) -> str:
        """``SHOW CREATE TABLE`` analog: render the table's effective
        declaration — columns (with DEFAULT/MATERIALIZED/ALIAS kinds),
        PARTITION BY / ORDER BY, codec, and layout — as a CH-flavored DDL
        string.  Pure metadata; no data scan."""
        schema = self.schema_for(table)
        computed = self.computed_columns(table)
        lines = []
        for f in schema.fields:
            lines.append(f"  `{f.name}` {f.dataType.simpleString()}")
        for name, meta in computed.items():
            if meta["kind"] == "alias" or not any(
                f.name == name for f in schema.fields
            ):
                entry = f"  `{name}` {meta['type']}"
            else:
                # stored kinds already render above — annotate in place
                idx = [
                    i for i, f in enumerate(schema.fields) if f.name == name
                ][0]
                lines[idx] += f" {meta['kind'].upper()} {meta['expr']}"
                continue
            lines.append(f"{entry} {meta['kind'].upper()} {meta['expr']}")
        #: CH spelling per projection measure kind (moments serves avg/var)
        _kind_sql = {
            "count": lambda c: "count()", "sum": lambda c: f"sum({c})",
            "min": lambda c: f"min({c})", "max": lambda c: f"max({c})",
            "moments": lambda c: f"avg({c})", "uniq": lambda c: f"uniq({c})",
        }
        for iname, d in self.declared_skip_indexes(table).items():
            t = d["type"] + (
                f"({', '.join(str(p) for p in d['params'])})"
                if d.get("params") else ""
            )
            lines.append(f"  INDEX {iname} {d['col']} TYPE {t} GRANULARITY 1")
        for pname, d in self.declared_projections(table).items():
            sel = list(d["dims"]) + [
                _kind_sql[kind](col) for kind, col in d["measures"]
            ]
            lines.append(
                f"  PROJECTION {pname} (SELECT {', '.join(sel)} "
                f"GROUP BY {', '.join(d['dims'])})"
            )
        ddl = [f"CREATE TABLE {table} (", ",\n".join(lines), ")"]
        sort = self._sort_key(table)
        spec = self.table_engine(table)
        if spec is not None:
            args = (
                [spec["sign_col"]] if spec.get("sign_col") else []
            ) + (
                [spec["version_col"]] if spec.get("version_col") else []
            ) + list(spec.get("sum_cols") or [])
            engine = spec["engine"] + (
                f"({', '.join(args)})" if args else ""
            )
        else:
            engine = "MergeTree (manifest parquet)" if (
                self.load_manifest(table) is not None
            ) else "MergeTree (parquet)"
        ddl.append(f"ENGINE = {engine}")
        if sort is not None:
            # a table can be sorted without being date-partitioned
            # (set_partitioning(..., partitioned=False)): render PARTITION
            # BY only when the declared layout says so or date directories
            # actually exist on disk
            if self._is_date_partitioned(table) or self._has_date_dirs(table):
                ddl.append("PARTITION BY event_date")
            ddl.append(f"ORDER BY ({', '.join(sort)})")
        ttl = self.table_ttl(table)
        if ttl is not None:
            clause = (
                f"TTL {ttl['ttl_col']} + INTERVAL "
                f"{ttl['interval_days']:g} DAY"
            )
            if ttl.get("where"):
                clause += f" WHERE {ttl['where']}"
            if ttl.get("group_by"):
                clause += " GROUP BY " + ", ".join(ttl["group_by"])
                clause += " SET " + ", ".join(
                    f"{c} = {e}" for c, e in ttl["aggregates"].items()
                )
            ddl.append(clause)
        if self.codec:
            ddl.append(f"SETTINGS codec = '{self.codec}'")
        return "\n".join(ddl)

    def read_final(
        self,
        table: str,
        keys: list[str] | None = None,
        version_col: str | None = None,
        tiebreak: list[str] | None = None,
    ) -> DataFrame:
        """``SELECT … FINAL`` on a Replacing-semantics table: collapse to
        the latest version per key ACROSS parts at read time, without
        waiting for a merge (``OPTIMIZE FINAL DEDUPLICATE`` is the
        materializing twin).  One shuffle on the key — the same cost CH
        pays for FINAL's read-time merge, and at 100 TB the same advice
        applies: serve hot paths from merged/deduped tables and reserve
        FINAL for correctness-critical reads.

        ``keys``/``version_col`` default from the table's DECLARED layout
        — the ORDER BY sort key and the ``ReplacingMergeTree(version)``
        engine argument (:meth:`set_table_engine`, or a parsed CREATE
        TABLE via plans/ddl.py) — exactly how ClickHouse resolves a bare
        ``SELECT … FINAL``."""
        from ..operators.dedupe import replacing_dedupe

        if keys is None or version_col is None:
            spec = self.table_engine(table) or {}
            if keys is None:
                keys = self._sort_key(table)
            if version_col is None:
                version_col = spec.get("version_col")
            if keys is None or version_col is None:
                raise ValueError(
                    f"read_final({table!r}) without keys/version_col needs "
                    "a declared ORDER BY and ReplacingMergeTree(version) "
                    "engine (set_table_engine / create_table_from_ddl)"
                )
        return replacing_dedupe(
            self.read(table), keys, version_col, tiebreak=tiebreak
        )

    def freeze_partition(self, table: str, date) -> str:
        """``ALTER TABLE … FREEZE PARTITION`` — a hardlink snapshot of one
        partition's live members into ``_shadow/<increment>/<table>/``
        (the CH shadow/ layout): O(files) metadata work, zero data copy,
        immune to subsequent mutations/compactions because those mint NEW
        member files rather than rewriting linked ones.  Returns the
        shadow directory.  Unlike :meth:`backup_table` this is partition-
        scoped and overlay-free by design: live DV/patch overlays address
        row positions, so a frozen partition with pending lightweight
        mutations reflects the ON-DISK (pre-overlay) rows — the exact CH
        FREEZE contract (mutations-in-flight are not applied to parts)."""
        date_str = str(date)
        shadow_root = os.path.join(self.root, "_shadow")
        os.makedirs(shadow_root, exist_ok=True)
        inc = 1 + max(
            (int(d) for d in os.listdir(shadow_root) if d.isdigit()),
            default=0,
        )
        dst_root = os.path.join(shadow_root, str(inc), table)
        man = self.load_manifest(table)
        members = man["members"] if man is not None else [""]
        n_linked = 0
        for m in members:
            src = os.path.join(self.path(table), m, f"event_date={date_str}")
            if not os.path.isdir(src):
                continue
            dst = os.path.join(dst_root, m or "flat",
                               f"event_date={date_str}")
            os.makedirs(dst, exist_ok=True)
            for f in os.listdir(src):
                s = os.path.join(src, f)
                if os.path.isfile(s):
                    try:
                        os.link(s, os.path.join(dst, f))
                    except OSError:
                        shutil.copy2(s, os.path.join(dst, f))
                    n_linked += 1
        if n_linked == 0:
            shutil.rmtree(os.path.join(shadow_root, str(inc)),
                          ignore_errors=True)
            raise ValueError(
                f"no files for partition {date_str!r} of {table!r}"
            )
        return dst_root

    def read_summed(
        self,
        table: str,
        keys: list[str] | None = None,
        sum_cols: list[str] | None = None,
        order_col: str | None = None,
    ) -> DataFrame:
        """``SummingMergeTree`` read semantics: collapse to one row per
        sort key with ``sum_cols`` summed; every other column takes the
        value of the first row in ``order_col`` order (CH keeps an
        arbitrary one — we pin it; defaults to the first key).  Like
        :meth:`read_final` this is the read-time merge — partial states
        in different parts stay correct without waiting for compaction.
        One shuffle on the key.  ``keys``/``sum_cols`` default from the
        declared ORDER BY and ``SummingMergeTree(cols)`` engine argument
        (:meth:`set_table_engine` / parsed CREATE TABLE)."""
        if keys is None or sum_cols is None:
            spec = self.table_engine(table) or {}
            keys = keys if keys is not None else self._sort_key(table)
            sum_cols = (
                sum_cols if sum_cols is not None else spec.get("sum_cols")
            )
            if keys is None or sum_cols is None:
                raise ValueError(
                    f"read_summed({table!r}) without keys/sum_cols needs "
                    "a declared ORDER BY and SummingMergeTree(cols) engine"
                )
        df = self.read(table)
        order_col = order_col or keys[0]
        others = [
            c for c in df.columns if c not in keys and c not in sum_cols
        ]
        aggs = [F.sum(c).alias(c) for c in sum_cols] + [
            F.min_by(c, order_col).alias(c) for c in others
        ]
        return df.groupBy(*keys).agg(*aggs).select(*df.columns)

    def read_collapsed(
        self,
        table: str,
        keys: list[str] | None = None,
        sign_col: str | None = None,
        version_col: str | None = None,
    ) -> DataFrame:
        """``CollapsingMergeTree(sign)`` / ``VersionedCollapsingMergeTree
        (sign, version)`` read semantics: per sort key, +1 ("state") and
        −1 ("cancel") rows annihilate pairwise; a key whose signs net to
        zero disappears, a key with a surviving +1 serves its LATEST
        state row (by ``version_col`` when given, else arrival order is
        undefined in CH — we require a version for determinism on
        multi-row keys).  This is the mutable-state-via-immutable-inserts
        idiom (the CH way to "update" at ingest rates); the read is one
        key shuffle.  ``keys``/``sign_col``/``version_col`` default from
        the declared ORDER BY and ``[Versioned]CollapsingMergeTree``
        engine arguments; the declared version column is dropped from the
        defaulted key set (CH VersionedCollapsing DDL puts the version
        LAST in ORDER BY, but collapsing groups by the key WITHOUT it)."""
        if keys is None or sign_col is None:
            spec = self.table_engine(table) or {}
            if keys is None:
                keys = self._sort_key(table)
                if keys is not None and spec.get("version_col"):
                    keys = [
                        k for k in keys if k != spec["version_col"]
                    ] or None
            sign_col = sign_col if sign_col is not None else spec.get(
                "sign_col")
            if version_col is None:
                version_col = spec.get("version_col")
            if keys is None or sign_col is None:
                raise ValueError(
                    f"read_collapsed({table!r}) without keys/sign_col "
                    "needs a declared ORDER BY and CollapsingMergeTree "
                    "engine"
                )
        df = self.read(table)
        order = (
            [F.col(version_col).desc()] if version_col is not None else []
        ) + [F.col(sign_col).desc()]
        w = Window.partitionBy(*keys).orderBy(*order)
        return (
            df.withColumn(
                "__net", F.sum(sign_col).over(Window.partitionBy(*keys))
            )
            .filter(F.col("__net") > 0)
            .filter(F.col(sign_col) > 0)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__net", "__rn")
        )

    def _ttl_rollup_transform(
        self,
        cutoff,
        group_by: list[str],
        aggregates: dict[str, str],
        ttl_col: str,
        stats_sink: dict | None = None,
    ):
        """The rollup-TTL compact transform: live rows pass through,
        rows past the cutoff collapse to one row per group with the SET
        aggregates applied; uncovered columns take the group minimum (CH
        picks ``any`` — min is the deterministic choice of one)."""

        def transform(df: DataFrame) -> DataFrame:
            expired_cond = F.coalesce(
                F.col(ttl_col) < F.lit(cutoff), F.lit(False)
            )
            live = df.filter(~expired_cond)
            expired = df.filter(expired_cond)
            agg_exprs = [
                F.expr(e).alias(c) for c, e in aggregates.items()
            ]
            leftovers = [
                c for c in df.columns
                if c not in group_by and c not in aggregates
            ]
            rolled = (
                expired.groupBy(*group_by)
                .agg(*agg_exprs,
                     *[F.min(c).alias(c) for c in leftovers])
                .select(*df.columns)
            )
            # restore declared types (SQL aggregates can widen, e.g.
            # sum(int) -> bigint, and the member swap must stay uniform)
            rolled = rolled.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in df.schema.fields
                ]
            )
            if stats_sink is not None:
                stats_sink["rows_before"] = df.count()
            return live.unionByName(rolled)

        return transform

    def apply_ttl_group_by(
        self,
        table: str,
        older_than,
        group_by: list[str],
        aggregates: dict[str, str],
        ttl_col: str = "event_ts",
        stats: bool = False,
    ) -> dict:
        """Rollup TTL — ClickHouse ``TTL ts + INTERVAL … GROUP BY k…
        SET col = agg(col), …``: rows past the cutoff are AGGREGATED into
        one row per group instead of deleted, so old data keeps serving
        coarse analytics at a fraction of the storage (the CH downsampling
        idiom).  ``aggregates`` maps column → SQL aggregate expression
        (the SET list); columns covered by neither ``group_by`` nor
        ``aggregates`` take the group minimum (CH picks ``any`` value —
        min is the deterministic choice of one).

        Applied as a compact-fold (CH applies TTL during merges): live
        rows pass through, expired rows collapse, the member swap is
        atomic.  The rollup is ONE data pass; row-count bookkeeping costs
        three more full-table actions, so it is opt-in: with
        ``stats=True`` returns {"rows_before", "rows_after", "groups"},
        else an empty dict."""
        import datetime

        cutoff = older_than
        if isinstance(cutoff, str):
            cutoff = datetime.datetime.fromisoformat(cutoff)
        want_stats = stats
        stats = {}
        transform = self._ttl_rollup_transform(
            cutoff, group_by, aggregates, ttl_col,
            stats_sink=stats if want_stats else None,
        )

        if self.load_manifest(table) is not None:
            self.compact(table, transform=transform)
        else:
            out = transform(self.read(table)).localCheckpoint(eager=True)
            self.overwrite(table, out)
        if want_stats:
            after = self.read(table)
            stats["rows_after"] = after.count()
            stats["groups"] = (
                after.filter(
                    F.coalesce(F.col(ttl_col) < F.lit(cutoff), F.lit(False))
                ).count()
            )
        self._log_mutation(
            table, "ttl_group_by",
            f"TTL {ttl_col} < {cutoff} GROUP BY {', '.join(group_by)}",
            rows_affected=(
                stats["rows_before"] - stats["rows_after"]
                if want_stats else None
            ),
        )
        return stats

    def _has_date_dirs(self, table: str) -> bool:
        return bool(self._partition_dates(table))

    def _partition_dates(self, table: str) -> list:
        """Distinct ``event_date`` partition values present on disk (from
        directory names — no data scan)."""
        import datetime

        dates: set = set()
        root = self.path(table)
        if not os.path.isdir(root):
            return []
        man = self.load_manifest(table)
        roots = (
            [os.path.join(root, m) for m in man["members"]]
            if man is not None
            else [root]
        )
        for r in roots:
            if not os.path.isdir(r):
                continue
            for e in os.listdir(r):
                if e.startswith("event_date="):
                    try:
                        dates.add(
                            datetime.date.fromisoformat(e.split("=", 1)[1])
                        )
                    except ValueError:
                        pass
        return sorted(dates)

    def gc(self, table: str, min_age_sec: float = 3600.0) -> list[str]:
        """Sweep data directories no RETAINED manifest version references —
        the leftovers of (a) a compactor that crashed between writing its
        ``compacted-*`` member and flipping the pointer, and (b) superseded
        members kept by ``compact(retain_old=True)`` whose snapshots have
        since been pruned from the version window.

        ``min_age_sec`` is the in-flight guard: an append writes its data
        dir BEFORE registering it, and a concurrent compactor's new member
        is unreferenced until its flip — both look orphaned for a few
        seconds.  Only dirs untouched for the window are swept, under the
        manifest lock so no flip can race the re-check.  Returns the swept
        directory names."""
        import shutil
        import time as _time

        d = self._manifest_dir(table)
        if not os.path.isdir(d):
            return []
        swept: list[str] = []
        with self._manifest_lock(table):
            referenced: set[str] = set()
            for f in os.listdir(d):
                if f.startswith("v") and f.endswith(".json"):
                    with open(os.path.join(d, f)) as fh:
                        referenced.update(json.load(fh)["members"])
            now = _time.time()
            for e in sorted(os.listdir(self.path(table))):
                full = os.path.join(self.path(table), e)
                if (
                    e.startswith((".", "_"))
                    or not os.path.isdir(full)
                    or e in referenced
                ):
                    continue
                if not e.startswith(("ingest_batch=", "compacted-", "mutated-")):
                    continue
                try:
                    age = now - os.path.getmtime(full)
                except OSError:
                    continue
                if age >= min_age_sec:
                    shutil.rmtree(full, ignore_errors=True)
                    swept.append(e)
        return swept

    # -- table lifecycle: DROP / UNDROP / TRUNCATE / EXCHANGE ----------------

    def _trash_dir(self) -> str:
        return os.path.join(self.root, "_trash")

    def drop_table(self, table: str) -> str:
        """``DROP TABLE`` — the data moves to a timestamped trash entry
        (with its per-table metadata) instead of vanishing, the CH Atomic
        database behavior (``database_atomic_delay_before_drop_table``):
        ``undrop_table`` restores it until ``purge_dropped`` reclaims the
        space.  Returns the trash entry name."""
        if not self.exists(table):
            raise ValueError(f"no table {table!r} to drop")
        entry = f"{table}@{int(time.time() * 1000)}"
        dst = os.path.join(self._trash_dir(), entry)
        os.makedirs(os.path.join(dst, "_meta"), exist_ok=True)
        os.rename(self.path(table), os.path.join(dst, "data"))
        for p in self._table_meta_paths(table):
            if os.path.exists(p):
                os.rename(
                    p, os.path.join(dst, "_meta", os.path.basename(p))
                )
        self._override_cache.pop(table, None)
        return entry

    def dropped_tables(self) -> list[str]:
        """Trash entries, newest first."""
        d = self._trash_dir()
        if not os.path.isdir(d):
            return []
        return sorted(os.listdir(d), reverse=True)

    def undrop_table(self, table: str) -> None:
        """``UNDROP TABLE`` — restore the NEWEST trash entry for the
        name, metadata included.  Refused when a live table with the
        name exists (as in ClickHouse)."""
        if self.exists(table):
            raise ValueError(
                f"cannot UNDROP {table!r}: a live table holds the name"
            )
        entry = next(
            (e for e in self.dropped_tables()
             if e.rsplit("@", 1)[0] == table),
            None,
        )
        if entry is None:
            raise LookupError(f"no dropped table {table!r} in the trash")
        src = os.path.join(self._trash_dir(), entry)
        os.rename(os.path.join(src, "data"), self.path(table))
        meta = os.path.join(src, "_meta")
        if os.path.isdir(meta):
            os.makedirs(os.path.join(self.root, "_schemas"), exist_ok=True)
            for f in os.listdir(meta):
                os.rename(
                    os.path.join(meta, f),
                    os.path.join(self.root, "_schemas", f),
                )
        shutil.rmtree(src, ignore_errors=True)
        self._override_cache.pop(table, None)

    def purge_dropped(self, older_than_sec: float = 8 * 3600) -> list[str]:
        """Reclaim trash entries older than the retention window (the CH
        delayed-drop sweep).  Returns the purged entry names."""
        purged = []
        now_ms = time.time() * 1000
        for e in self.dropped_tables():
            try:
                ts = int(e.rsplit("@", 1)[1])
            except (IndexError, ValueError):
                continue
            if now_ms - ts >= older_than_sec * 1000:
                shutil.rmtree(
                    os.path.join(self._trash_dir(), e), ignore_errors=True
                )
                purged.append(e)
        return purged

    def truncate_table(self, table: str) -> None:
        """``TRUNCATE TABLE`` — all rows (and overlays, manifest, the
        committed-batches ledger) go; the DECLARED shape stays: schema
        override, computed columns, TTLs, rename/cast chains survive, so
        the next insert lands into the same table definition — the CH
        contract (TRUNCATE keeps the table, drops the parts)."""
        if not self.exists(table):
            return
        shutil.rmtree(self.path(table), ignore_errors=True)

    def exchange_tables(self, a: str, b: str) -> None:
        """``EXCHANGE TABLES a AND b`` — swap the two tables' data AND
        their per-table metadata (the blue/green cutover primitive; CH
        does this atomically in the Atomic database engine).  Here it is
        three renames per artifact under the single-maintenance-writer
        discipline — readers resolve manifests per query, and
        ``load_manifest`` re-resolves when the swap lands between its
        CURRENT read and the version-file open (the r12 soak's
        readers-active drill caught that crash).  Residual window,
        documented: a reader that resolved a manifest BEFORE the swap
        lists member paths under the swapped directory — missing members
        are skipped and a same-named member (``ingest_batch=<id>`` names
        can collide across tables) would serve the OTHER side's rows for
        that member.  The supported concurrent-reader pattern is the
        blue/green cutover this op exists for — the green side is a
        rebuilt CONTENT-EQUIVALENT of blue, so any interleaving reads
        equivalent rows (soak-verified); swapping two tables with
        DIFFERENT content wants a reader quiesce, as in CH non-Atomic
        RENAME-based swaps."""
        if not self.exists(a) or not self.exists(b):
            raise ValueError(f"EXCHANGE needs both tables ({a!r}, {b!r})")
        if not _rename_exchange(self.path(a), self.path(b)):
            # non-Linux fallback: three renames leave a µs window where
            # name `a` is missing; concurrent readers there serve
            # declared-empty (the atomic path above has no such window)
            tmp = self.path(f".exchange-{uuid.uuid4().hex[:8]}")
            os.rename(self.path(a), tmp)
            os.rename(self.path(b), self.path(a))
            os.rename(tmp, self.path(b))
        for pa, pb in zip(self._table_meta_paths(a),
                          self._table_meta_paths(b)):
            ea, eb = os.path.exists(pa), os.path.exists(pb)
            if not (ea or eb):
                continue
            t = pa + ".xchg"
            if ea:
                os.rename(pa, t)
            if eb:
                os.rename(pb, pa)
            if ea:
                os.rename(t, pb)
        self._override_cache.pop(a, None)
        self._override_cache.pop(b, None)

    # -- SYSTEM STOP/START MERGES --------------------------------------------

    def _stop_merges_path(self, table: str) -> str:
        return os.path.join(self.root, "_schemas", table + ".stopmerges")

    def stop_merges(self, table: str) -> None:
        """``SYSTEM STOP MERGES table`` — background merges (``compact``)
        become no-ops until ``start_merges``; appends, reads, and
        mutations continue (the CH maintenance freeze ops use around
        delicate operations).  Persisted so a restarted maintenance loop
        honors it."""
        p = self._stop_merges_path(table)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as fh:
            fh.write("stopped\n")
        self._log_mutation(table, "stop_merges", "SYSTEM STOP MERGES")

    def start_merges(self, table: str) -> None:
        """``SYSTEM START MERGES table``."""
        try:
            os.remove(self._stop_merges_path(table))
            self._log_mutation(table, "start_merges", "SYSTEM START MERGES")
        except OSError:
            pass

    def merges_stopped(self, table: str) -> bool:
        return os.path.exists(self._stop_merges_path(table))

    # -- predicate → member pruning (mutation fast path) ---------------------

    def _simple_conjuncts(self, cond) -> list[tuple]:
        """Best-effort extraction of ``(column, op, literal)`` conjuncts
        from a Spark Column predicate by walking its UNRESOLVED node tree
        (``and``/comparison ``UnresolvedFunction`` nodes over
        attribute-vs-literal pairs; SQL-string conditions go through the
        session's Catalyst expression parser first).  Anything else — OR
        chains, function calls, column-to-column compares, non-primitive
        literals — contributes nothing: the result is only ever used to
        SKIP members whose parquet footer stats prove a conjunct can't
        match, so an empty list just means no pruning, never a wrong
        answer.  This is how ClickHouse mutations scope work: the WHERE
        clause is pushed through the primary-key/minmax index to select
        candidate parts before any rows are touched."""
        cmp_ops = {"=", "==", "<", "<=", ">", ">="}
        cat_ops = {
            "EqualTo": "=", "LessThan": "<", "GreaterThan": ">",
            "LessThanOrEqual": "<=", "GreaterThanOrEqual": ">=",
        }
        flip = {"=": "=", "==": "=", "<": ">", ">": "<",
                "<=": ">=", ">=": "<="}
        out: list[tuple] = []

        def py_literal(v):
            if v is None or isinstance(v, bool):
                return None
            if isinstance(v, (int, float, str)):
                return v
            try:
                cls = v.getClass().getSimpleName()
                if cls == "UTF8String":
                    return v.toString()
                if cls == "Decimal":  # Catalyst parses 250.0 as Decimal
                    return float(v.toString())
            except Exception:
                pass
            return None

        def walk_catalyst(e):
            cls = e.getClass().getSimpleName()
            if cls == "And":
                walk_catalyst(e.left())
                walk_catalyst(e.right())
                return
            op = cat_ops.get(cls)
            if op is None:
                return
            for left, right, o in (
                (e.left(), e.right(), op),
                (e.right(), e.left(), flip[op]),
            ):
                if (
                    left.getClass().getSimpleName() == "UnresolvedAttribute"
                    and right.getClass().getSimpleName() == "Literal"
                ):
                    v = py_literal(right.value())
                    if v is not None:
                        out.append((str(left.name()), o, v))
                    return

        def walk_node(n):
            cls = n.getClass().getSimpleName()
            if cls == "SqlExpression":
                # a string condition (F.expr): Catalyst's parser yields
                # the classic And/EqualTo/… tree to walk instead
                parsed = (
                    self.spark._jsparkSession.sessionState().sqlParser()
                    .parseExpression(n.expression())
                )
                walk_catalyst(parsed)
                return
            if cls != "UnresolvedFunction":
                return
            fn = n.functionName().lower()
            args = n.arguments()
            if fn == "and" and args.size() == 2:
                walk_node(args.apply(0))
                walk_node(args.apply(1))
                return
            if fn in cmp_ops and args.size() == 2:
                for i, j, o in ((0, 1, fn), (1, 0, flip[fn])):
                    a, b = args.apply(i), args.apply(j)
                    if (
                        a.getClass().getSimpleName() == "UnresolvedAttribute"
                        and b.getClass().getSimpleName() == "Literal"
                    ):
                        v = py_literal(b.value())
                        nm = a.nameParts()
                        if v is not None and nm.size() == 1:
                            out.append(
                                (str(nm.apply(0)), "=" if o == "==" else o, v)
                            )
                        return

        try:
            walk_node(cond._jc.node())
        except Exception:
            return []
        return out

    def _member_matches_stats(
        self, table: str, member: str, preds: list[tuple]
    ) -> bool:
        """True unless EVERY row group of the member is provably disjoint
        from ``preds`` per parquet footer min/max — the driver-side
        metadata check that lets a mutation skip a member without
        launching a probe job (the EXPLAIN ESTIMATE machinery, short-
        circuited on the first surviving row group).  Conservative: a
        missing column, absent stats, or type mismatch counts as a
        match."""
        root = (
            os.path.join(self.path(table), member) if member
            else self.path(table)
        )
        return self._path_matches_stats(root, preds)

    def _path_matches_stats(self, root: str, preds: list[tuple]) -> bool:
        import pyarrow.parquet as pq

        for r, _dirs, files in os.walk(root):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                try:
                    md = pq.ParquetFile(os.path.join(r, f)).metadata
                except Exception:
                    return True
                names = [
                    md.schema.column(i).name for i in range(md.num_columns)
                ]
                for i in range(md.num_row_groups):
                    rg = md.row_group(i)
                    survives = True
                    for col, op, val in preds:
                        try:
                            ci = names.index(col)
                        except ValueError:
                            continue
                        st = rg.column(ci).statistics
                        if st is None or not st.has_min_max:
                            continue
                        lo, hi = st.min, st.max
                        try:
                            if op == "=" and not (lo <= val <= hi):
                                survives = False
                            elif op == "<" and not (lo < val):
                                survives = False
                            elif op == "<=" and not (lo <= val):
                                survives = False
                            elif op == ">" and not (hi > val):
                                survives = False
                            elif op == ">=" and not (hi >= val):
                                survives = False
                        except TypeError:
                            continue
                        if not survives:
                            break
                    if survives:
                        return True
        return False

    def _prune_members_for_mutation(
        self, table: str, members: list[str], cond
    ) -> tuple[list[str], int]:
        """(surviving members, n skipped) for a mutation predicate: the
        footer-stats prune applied over best-effort conjuncts.  At 100 TB
        this is what keeps mutation cost ∝ MATCHED parts, not table size
        — candidate parts are chosen from driver-side metadata before any
        scan task launches, exactly CH's part-level mutation scoping.

        SOUNDNESS GUARD: a live patch overlay can rewrite a row's value
        so it matches a predicate the ORIGINAL file's stats exclude, so
        the PATCH FILES' own stats are checked first — a patch row that
        could match forces a full scan, since its original member is
        unknowable from metadata (DV masks only ever remove rows — they
        can't create a match — and clear/TTL overlays only NULL values,
        which no conjunct matches)."""
        preds = self._simple_conjuncts(cond)
        if not preds:
            return members, 0
        for pf in self._patch_files(table):
            if self._path_matches_stats(
                os.path.join(self._patch_dir(table), pf), preds
            ):
                return members, 0
        kept = [
            m for m in members
            if self._member_matches_stats(table, m, preds)
        ]
        return kept, len(members) - len(kept)

    # -- EXPLAIN ESTIMATE ----------------------------------------------------

    def explain_estimate(
        self, table: str, predicates: list[tuple] | None = None
    ) -> dict:
        """``EXPLAIN ESTIMATE SELECT … WHERE …`` analog: how many members
        (parts), row groups (the granule/mark analog), and rows a query
        with ``predicates`` MIGHT read, decided from parquet row-group
        min/max statistics alone — footer metadata, no data scan at any
        table size.  ``predicates``: ``[(col, op, value)]`` with op in
        ``< <= > >= =``; a row group without usable stats for a
        predicate column is counted as a candidate (conservative, like
        ClickHouse counting a granule whose mark range overlaps)."""
        import pyarrow.parquet as pq

        preds = predicates or []
        man = self.load_manifest(table)
        members = (
            man["members"] if man is not None
            else ([""] if self.exists(table) else [])
        )
        total = {"parts": 0, "files": 0, "row_groups": 0, "rows": 0}
        est = {"parts": 0, "files": 0, "row_groups": 0, "rows": 0}

        def rg_survives(md, rg_i: int, names: list[str]) -> tuple[bool, int]:
            rg = md.row_group(rg_i)
            nrows = rg.num_rows
            for col, op, val in preds:
                try:
                    ci = names.index(col)
                except ValueError:
                    continue  # partition/virtual column: no file stats
                st = rg.column(ci).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats → candidate
                lo, hi = st.min, st.max
                try:
                    if op in ("=", "=="):
                        if not (lo <= val <= hi):
                            return False, nrows
                    elif op == "<" and not (lo < val):
                        return False, nrows
                    elif op == "<=" and not (lo <= val):
                        return False, nrows
                    elif op == ">" and not (hi > val):
                        return False, nrows
                    elif op == ">=" and not (hi >= val):
                        return False, nrows
                except TypeError:
                    # stats type ≠ predicate type (e.g. a pre-retype file
                    # after MODIFY COLUMN): conservative candidate
                    continue
            return True, nrows

        for m in members:
            root = os.path.join(self.path(table), m) if m else self.path(table)
            part_hit = False
            for r, _dirs, files in os.walk(root):
                for f in sorted(files):
                    if not f.endswith(".parquet"):
                        continue
                    fp = os.path.join(r, f)
                    md = pq.ParquetFile(fp).metadata
                    names = [
                        md.schema.column(i).name
                        for i in range(md.num_columns)
                    ]
                    total["files"] += 1
                    file_hit = False
                    for i in range(md.num_row_groups):
                        total["row_groups"] += 1
                        survives, nrows = rg_survives(md, i, names)
                        total["rows"] += nrows
                        if survives:
                            est["row_groups"] += 1
                            est["rows"] += nrows
                            file_hit = part_hit = True
                    if file_hit:
                        est["files"] += 1
            total["parts"] += 1
            if part_hit:
                est["parts"] += 1
        return {
            "estimate": est,
            "total": total,
            "predicates": [list(p) for p in preds],
        }

    def parts_columns(self, table: str) -> DataFrame:
        """``system.parts_columns`` analog: one row per (member, column)
        with row count, compressed and uncompressed bytes, and the
        compression ratio — the per-column storage census ClickHouse
        operators use to pick codecs and spot bloated columns.  Parquet
        footer metadata only, no data scan."""
        import pyarrow.parquet as pq

        agg: dict[tuple, list] = {}
        man = self.load_manifest(table)
        members = (
            man["members"] if man is not None
            else ([""] if self.exists(table) else [])
        )
        for m in members:
            root = os.path.join(self.path(table), m) if m else self.path(table)
            for r, _dirs, files in os.walk(root):
                for f in sorted(files):
                    if not f.endswith(".parquet"):
                        continue
                    md = pq.ParquetFile(os.path.join(r, f)).metadata
                    for rg_i in range(md.num_row_groups):
                        rg = md.row_group(rg_i)
                        for ci in range(md.num_columns):
                            col = rg.column(ci)
                            key = (m or "(root)", md.schema.column(ci).name)
                            s = agg.setdefault(key, [0, 0, 0])
                            s[0] += rg.num_rows
                            s[1] += col.total_compressed_size
                            s[2] += col.total_uncompressed_size
        rows = [
            (
                table, mem, col, n, comp, uncomp,
                round(uncomp / comp, 3) if comp else None,
            )
            for (mem, col), (n, comp, uncomp) in sorted(agg.items())
        ]
        return self.spark.createDataFrame(
            rows,
            "table string, member string, column string, rows long, "
            "compressed_bytes long, uncompressed_bytes long, "
            "compression_ratio double",
        )

    def parts(self, table: str) -> DataFrame:
        """``system.parts`` analog: one row per live member (part) with its
        file count, on-disk bytes, partition count, and whether it's an
        ingest batch, a compacted generation, or a mutation rewrite — the
        operational view ClickHouse admins query to watch merge health
        (reference monitoring reads system.parts for part counts).  Pure
        directory metadata — no data scan at any table size."""
        rows = []
        man = self.load_manifest(table)
        members = (
            man["members"] if man is not None
            else ([""] if self.exists(table) else [])
        )
        for m in members:
            root = os.path.join(self.path(table), m) if m else self.path(table)
            n_files, n_bytes, dates = 0, 0, set()
            for r, _dirs, files in os.walk(root):
                rel = os.path.relpath(r, root)
                for part in rel.split(os.sep):
                    if part.startswith("event_date="):
                        dates.add(part.split("=", 1)[1])
                for f in files:
                    if f.endswith(".parquet"):
                        n_files += 1
                        try:
                            n_bytes += os.path.getsize(os.path.join(r, f))
                        except OSError:
                            pass
            kind = (
                "batch" if m.startswith("ingest_batch=")
                else "compacted" if m.startswith("compacted-")
                else "mutated" if m.startswith("mutated-")
                else "attached" if m.startswith("attached-")
                else "plain"
            )
            rows.append((table, m or "(root)", kind, n_files, n_bytes,
                         len(dates)))
        # overlay rows: live deletion vectors and patches are part state an
        # operator must see (they mask/replace rows until a merge folds
        # them), exactly ClickHouse's _row_exists masks and patch parts
        for sub, kind in (("_deletes", "deletion_vector"),
                          ("_patches", "patch")):
            d = os.path.join(self.path(table), sub)
            if not os.path.isdir(d):
                continue
            for entry in sorted(os.listdir(d)):
                if entry.startswith("."):
                    continue
                n_files, n_bytes = 0, 0
                for r, _dirs, files in os.walk(os.path.join(d, entry)):
                    for f in files:
                        if f.endswith(".parquet"):
                            n_files += 1
                            try:
                                n_bytes += os.path.getsize(
                                    os.path.join(r, f)
                                )
                            except OSError:
                                pass
                rows.append((table, entry, kind, n_files, n_bytes, 0))
        schema = (
            "table string, member string, kind string, n_files long,"
            " bytes long, n_partitions long"
        )
        return self.spark.createDataFrame(rows, schema)

    def tables(self) -> DataFrame:
        """``system.tables`` analog: one row per warehouse table with its
        layout (manifest vs plain), live manifest version, member count,
        replay-ledger size, file count and on-disk bytes — directory
        metadata only, no data scan (reference admins join system.tables
        to system.parts for merge health; same shape here)."""
        rows = []
        try:
            names = sorted(
                d for d in os.listdir(self.root)
                if not d.startswith((".", "_"))
                and os.path.isdir(os.path.join(self.root, d))
            )
        except OSError:
            names = []
        for t in names:
            if not self.exists(t):
                continue
            man = self.load_manifest(t)
            n_files, n_bytes = 0, 0
            for r, _dirs, files in os.walk(self.path(t)):
                for f in files:
                    if f.endswith(".parquet"):
                        n_files += 1
                        try:
                            n_bytes += os.path.getsize(os.path.join(r, f))
                        except OSError:
                            pass
            rows.append((
                t,
                "manifest" if man is not None else "plain",
                man["version"] if man is not None else 0,
                len(man["members"]) if man is not None else 1,
                len(man.get("committed_batches", [])) if man else 0,
                n_files, n_bytes,
            ))
        schema = (
            "table string, layout string, version long, n_members long,"
            " n_committed_batches long, n_files long, bytes long"
        )
        return self.spark.createDataFrame(rows, schema)

    def table_columns(self, table: str) -> DataFrame:
        """``system.columns`` analog: one row per column with name, Spark
        type, nullability, and position — from the declared schema override
        when an ALTER has been applied, else the parquet footer of one live
        file (a metadata read, not a scan)."""
        schema = self.schema_override(table)
        if schema is None:
            schema = self.read(table).schema
        rows = [
            (table, f.name, f.dataType.simpleString(), f.nullable, i)
            for i, f in enumerate(schema.fields)
        ]
        return self.spark.createDataFrame(
            rows,
            "table string, column string, type string, nullable boolean,"
            " position long",
        )

    @staticmethod
    def _count_parquet(path: str) -> int:
        n = 0
        for _root, _dirs, files in os.walk(path):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    def _prep(self, table: str, df: DataFrame) -> DataFrame:
        # conform insert TYPES to the declared schema (ClickHouse inserts
        # cast to the column's type): after a MODIFY COLUMN a writer still
        # supplying the old type must not mint new old-type files forever —
        # the cast chain could then never retire.  Names/extra columns are
        # left alone; only same-name type mismatches are cast.
        try:
            declared_fields = self.schema_for(table).fields
        except KeyError:
            # internal side table (projection state, staging) without a
            # declared schema: nothing to conform to
            declared_fields = []
        declared = {f.name: f.dataType for f in declared_fields}
        mismatched = {
            f.name: declared[f.name]
            for f in df.schema.fields
            if f.name in declared and f.dataType != declared[f.name]
        }
        if mismatched:
            df = df.select(
                *[
                    F.col(c).cast(mismatched[c]).alias(c)
                    if c in mismatched
                    else F.col(c)
                    for c in df.columns
                ]
            )
        sort_key = self._sort_key(table)
        if sort_key is not None:
            if (
                self._is_date_partitioned(table)
                and "event_date" not in df.columns
            ):
                df = df.withColumn("event_date", F.to_date("event_ts"))
            df = df.sortWithinPartitions(*sort_key)
        return df
