"""CH-flavored ``CREATE TABLE`` DDL → warehouse declaration.

The reference provisions its tables with ClickHouse DDL
(clickhouse/init/01_bronze_tables.sql — MergeTree tables with
``PARTITION BY toDate(event_ts)`` and composite ``ORDER BY`` keys); a
user switching engines should be able to paste that DDL and get the
same declared table here.  ``create_table_from_ddl`` parses:

- **column types** in ClickHouse spelling (String, UInt*/Int*, Float*,
  DateTime/DateTime64, Date/Date32, Bool, UUID, Decimal(p,s),
  Array(T), LowCardinality(T), Nullable(T), FixedString(n), Enum8/16)
  AND Spark ``simpleString`` spelling — so ``show_create_table`` output
  round-trips through this parser to the identical declaration;
- **column kinds** DEFAULT / MATERIALIZED / ALIAS (expression passed to
  the computed-column machinery after a small CH→Spark function
  rewrite, and validated by planning before anything commits);
- **PARTITION BY** — any date-shaped expression (``toDate(col)``,
  ``toYYYYMMDD(col)``, ``event_date``) maps onto the engine's daily
  ``event_date`` directory convention (the storage layout is the
  engine's, the INTENT — prune by day — is preserved);
- **ORDER BY** (tuple or single column) → the in-partition sort key;
- **TTL** table clause (``col + INTERVAL n DAY|WEEK|MONTH [WHERE p]``)
  and per-column TTLs;
- **ENGINE/SETTINGS/CODEC** are accepted and recorded but do not alter
  behavior beyond the engine's defaults (parquet + manifest parts play
  the MergeTree role; per-column codecs are a parquet writer concern).

Only declarations are produced — no data is written; the first append
adopts the declared shape exactly like a ClickHouse insert.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .warehouse import Warehouse

#: ClickHouse type name (lowercased) → Spark type constructor
_CH_SIMPLE = {
    "string": T.StringType,
    "fixedstring": T.StringType,   # parametrized form handled below
    "uuid": T.StringType,
    "ipv4": T.StringType,          # canonicalized strings (functions/ip.py
    "ipv6": T.StringType,          # applies the RFC 5952 toIPv6OrNull guard)
    "bool": T.BooleanType,
    "boolean": T.BooleanType,
    "int8": T.ByteType,
    "int16": T.ShortType,
    "uint16": T.IntegerType,
    "int32": T.IntegerType,
    # UInt8/UInt32 follow the engine's hand-declared conventions
    # (schemas.py: is_current/quarter/… UInt8 → Integer, date_key/time_key
    # UInt32 → Integer — toYYYYMMDD/HHMMSS-shaped values fit; a column
    # needing the full UInt32 range should be declared UInt64 → Long) so
    # the reference's own gold DDL reproduces GOLD_SCHEMAS exactly
    "uint8": T.IntegerType,
    "uint32": T.IntegerType,
    "int64": T.LongType,
    "uint64": T.LongType,          # documented: top bit folds into sign
    "float32": T.FloatType,
    "float64": T.DoubleType,
    "date": T.DateType,
    "date32": T.DateType,
    "datetime": T.TimestampType,
    # spark simpleString spellings (round-trip of show_create_table)
    "tinyint": T.ByteType,
    "smallint": T.ShortType,
    "int": T.IntegerType,
    "bigint": T.LongType,
    "float": T.FloatType,
    "double": T.DoubleType,
    "timestamp": T.TimestampType,
    "timestamp_ntz": T.TimestampNTZType,
}

#: CH function spellings → Spark SQL equivalents (computed-column /
#: partition expressions; extend as needed — unparseable expressions
#: fail loudly at plan time, never silently)
_FN_REWRITES = [
    (re.compile(r"\btoDate\s*\(", re.I), "to_date("),
    (re.compile(r"\btoString\s*\(", re.I), "cast_to_string("),
    (re.compile(r"\btoStartOfDay\s*\(", re.I), "date_trunc('day', "),
    (re.compile(r"\bnow\s*\(\s*\)", re.I), "current_timestamp()"),
    (re.compile(r"\btoUInt64\s*\(", re.I), "bigint("),
    (re.compile(r"\btoInt64\s*\(", re.I), "bigint("),
]


def _rewrite_expr(expr: str) -> str:
    out = expr
    for pat, repl in _FN_REWRITES:
        out = pat.sub(repl, out)
    # cast_to_string(x) placeholder → CAST(x AS STRING) (regex above can't
    # emit the suffix form directly)
    while "cast_to_string(" in out:
        i = out.index("cast_to_string(")
        depth, j = 0, i + len("cast_to_string(")
        start = j
        while j < len(out):
            if out[j] == "(":
                depth += 1
            elif out[j] == ")":
                if depth == 0:
                    break
                depth -= 1
            j += 1
        inner = out[start:j]
        out = out[:i] + f"CAST({inner} AS STRING)" + out[j + 1:]
    return out


def parse_type(s: str) -> T.DataType:
    """One ClickHouse or Spark type spelling → Spark DataType."""
    s = s.strip()
    m = re.fullmatch(r"(?i)nullable\s*\((.*)\)", s)
    if m:
        return parse_type(m.group(1))  # Spark columns are nullable anyway
    m = re.fullmatch(r"(?i)lowcardinality\s*\((.*)\)", s)
    if m:
        return parse_type(m.group(1))  # dictionary encoding = parquet's job
    m = re.fullmatch(r"(?i)array\s*\((.*)\)", s)
    if m:
        return T.ArrayType(parse_type(m.group(1)))
    m = re.fullmatch(r"(?i)fixedstring\s*\(\s*\d+\s*\)", s)
    if m:
        return T.StringType()
    m = re.fullmatch(r"(?i)datetime(64)?\s*(\(.*\))?", s)
    if m:
        # precision and timezone parameters (DateTime64(3, 'Asia/Jakarta'))
        # collapse to the engine's UTC-instant timestamps (SURVEY.md §1.2)
        return T.TimestampType()
    m = re.fullmatch(r"(?i)decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"(?i)enum(8|16)\s*\(.*\)", s)
    if m:
        return T.StringType()  # enums read/write as their string labels
    key = s.lower()
    if key in _CH_SIMPLE:
        return _CH_SIMPLE[key]()
    # fall back to Spark's own DDL parser (struct<...>, map<...>, …)
    return T._parse_datatype_string(s)


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parentheses/backticks/quotes — and outside
    Spark ``<...>`` generics (``map<string,int>``, ``struct<a:int,b:string>``)
    so show_create_table output with multi-parameter generic columns
    round-trips.  A ``<`` opens a generic only when it directly follows an
    identifier character (``map<``), so comparison operators in DEFAULT
    expressions (``a < b``) never unbalance the scan."""
    parts, depth, angle, buf, q = [], 0, 0, [], None
    for ch in s:
        if q:
            buf.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'`\"":
            q = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "<" and buf and (buf[-1].isalnum() or buf[-1] == "_"):
            angle += 1
            buf.append(ch)
        elif ch == ">" and angle > 0 and (not buf or buf[-1] != "-"):
            angle -= 1
            buf.append(ch)
        elif ch == sep and depth == 0 and angle == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf).strip())
    return [p for p in parts if p]


_INTERVAL_DAYS = {"day": 1.0, "week": 7.0, "month": 30.0, "hour": 1 / 24}

_NAME_RE = re.compile(r"^`?(?P<name>\w+)`?\s+", re.S)


def _take_type(s: str) -> tuple[str, str]:
    """Split ``s`` into (type token, rest): an identifier optionally
    followed by ONE balanced paren group (nested types like
    ``Array(LowCardinality(String))`` need balance, not regex) or a
    Spark ``<...>`` generic."""
    m = re.match(r"[A-Za-z_][\w]*", s)
    if m is None:
        raise ValueError(f"missing type in column definition: {s!r}")
    i = m.end()
    rest = s[i:]
    stripped = rest.lstrip()
    if stripped.startswith("(") or stripped.startswith("<"):
        open_c = stripped[0]
        close_c = ")" if open_c == "(" else ">"
        j = len(rest) - len(stripped)  # index of the opener in rest
        depth = 0
        for k in range(j, len(rest)):
            if rest[k] == open_c:
                depth += 1
            elif rest[k] == close_c:
                depth -= 1
                if depth == 0:
                    return s[: i + k + 1], rest[k + 1:]
        raise ValueError(f"unbalanced type parentheses: {s!r}")
    return s[:i], rest


def bootstrap_from_ddl(wh: Warehouse, sql: str) -> list[str]:
    """Run every ``CREATE TABLE`` statement in a SQL script through
    :func:`create_table_from_ddl` — the engine's DDL bootstrap.  Pointing
    this at the reference's own init scripts
    (clickhouse/init/01_bronze_tables.sql + 03_gold_tables.sql) declares
    the complete bronze+gold star schema verbatim from the files the
    reference provisions ClickHouse with (tested: the parsed declarations
    ≡ the hand-declared schemas.py BRONZE_SCHEMAS/GOLD_SCHEMAS).  Non-DDL
    statements are skipped; returns the created table names in order."""
    created: list[str] = []
    for stmt in sql.split(";"):
        if "CREATE TABLE" in stmt.upper():
            created.append(create_table_from_ddl(wh, stmt))
    return created


#: CH aggregate spellings → projection Measure kinds (avg is served by the
#: exact integer-cents moments state; uniq by the mergeable HLL state)
_PROJ_AGGS = {
    "count": "count", "sum": "sum", "min": "min", "max": "max",
    "avg": "moments", "uniq": "uniq", "uniqexact": "uniq",
}


def _parse_projection(body: str) -> tuple[list[str], list[tuple]]:
    """``SELECT dims…, aggs… GROUP BY dims…`` inside a PROJECTION clause
    → (dims, [(measure kind, col)]).  Plain identifiers in the select
    list are dimensions and must match the GROUP BY; aggregates map via
    _PROJ_AGGS; anything else is rejected loudly."""
    m = re.match(
        r"(?is)^\s*SELECT\s+(?P<sel>.*?)\s+GROUP\s+BY\s+(?P<grp>.*)$",
        body.strip(),
    )
    if m is None:
        raise ValueError(f"unsupported PROJECTION body {body!r}: "
                         "SELECT … GROUP BY … only")
    dims = [
        g.strip().strip("`") for g in _split_top(m.group("grp"))
    ]
    measures: list[tuple] = []
    for item in _split_top(m.group("sel")):
        item = item.strip()
        am = re.fullmatch(r"(?i)(\w+)\s*\(\s*`?(\w*)`?\s*\)", item)
        if am:
            kind = _PROJ_AGGS.get(am.group(1).lower())
            if kind is None:
                raise ValueError(
                    f"unsupported PROJECTION aggregate {item!r} "
                    f"(supported: {sorted(_PROJ_AGGS)})"
                )
            measures.append((kind, am.group(2) or None))
            continue
        ident = item.strip("`")
        if not re.fullmatch(r"\w+", ident):
            raise ValueError(f"unsupported PROJECTION select item {item!r}")
        if ident not in dims:
            raise ValueError(
                f"PROJECTION select column {ident!r} missing from GROUP BY"
            )
    return dims, measures


def _parse_order_by(rest: str) -> list[str]:
    """The text after ``ORDER BY`` → sort columns.  Tuple bodies are
    scanned with balanced parens (``_split_top``), so function calls in
    the key don't shear at inner commas.  Plain identifiers pass through;
    ``ifNull(col, default)`` — the reference's NULL-safe sort spelling
    (03_gold_tables.sql gold.dim_host ``ORDER BY (ifNull(host_name, ''),
    effective_from)``) — maps to the column itself (parquet sorts NULLs
    first; the prune/cluster intent is identical); any other expression
    is rejected loudly instead of registering a broken column name.
    ``ORDER BY tuple()`` (a ClickHouse unsorted MergeTree) → []."""
    rest = rest.lstrip()
    if rest.startswith("("):
        depth = 0
        for k, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
        else:
            raise ValueError(f"unbalanced ORDER BY tuple: {rest!r}")
        entries = _split_top(rest[1:k])
    else:
        m = re.match(r"(?i)tuple\s*\(\s*\)", rest)
        if m:
            return []
        m = re.match(r"[\w`]+(\s*\([^)]*\))?", rest)
        entries = [m.group(0)] if m else []
    cols: list[str] = []
    for e in entries:
        e = e.strip()
        if re.fullmatch(r"(?i)tuple\s*\(\s*\)", e):
            continue
        im = re.fullmatch(
            r"(?i)ifNull\s*\(\s*`?(\w+)`?\s*,\s*[^()]*\)", e
        )
        if im:
            cols.append(im.group(1))
            continue
        cm = re.fullmatch(r"`?(\w+)`?", e)
        if cm is None:
            raise ValueError(
                f"unsupported ORDER BY entry {e!r}: plain columns or "
                "ifNull(col, default) only"
            )
        cols.append(cm.group(1))
    return cols


#: MergeTree engine-family spellings this parser maps onto the engine's
#: read_final/read_summed/read_collapsed semantics.  Plain MergeTree (and
#: this engine's own "MergeTree (manifest parquet)" show_create rendering)
#: carries no merge semantics and produces no declaration.
_ENGINE_RE = re.compile(
    r"(?i)\bENGINE\s*=\s*(?P<name>\w+)\s*(?:\((?P<args>[^)]*)\))?"
)


def _parse_engine(tail: str) -> dict | None:
    m = _ENGINE_RE.search(tail)
    if m is None:
        return None
    name = m.group("name")
    args = [
        a.strip().strip("`")
        for a in (m.group("args") or "").split(",")
        if a.strip()
    ]
    low = name.lower()
    if low == "replacingmergetree":
        return {
            "engine": "ReplacingMergeTree",
            "version_col": args[0] if args else None,
        }
    if low == "summingmergetree":
        return {"engine": "SummingMergeTree", "sum_cols": args or None}
    if low == "collapsingmergetree":
        return {
            "engine": "CollapsingMergeTree",
            "sign_col": args[0] if args else "sign",
        }
    if low == "versionedcollapsingmergetree":
        return {
            "engine": "VersionedCollapsingMergeTree",
            "sign_col": args[0] if args else "sign",
            "version_col": args[1] if len(args) > 1 else None,
        }
    return None  # MergeTree / Log / unknown: plain append semantics


def create_table_from_ddl(wh: Warehouse, ddl: str) -> str:
    """Parse one CH-flavored CREATE TABLE and register the declaration
    on ``wh`` (schema override, sort key/partitioning, computed columns,
    table and column TTLs).  Returns the table name.  Round-trip
    property: feeding ``wh.show_create_table(t)`` back through this
    produces the identical declared state (tested)."""
    src = ddl.strip().rstrip(";")
    m = re.match(
        r"(?is)^CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?"
        r"(?:(?P<db>\w+)\.)?`?(?P<name>\w+)`?\s*\((?P<body>.*)\)\s*"
        r"(?P<tail>ENGINE\s*=.*)?$",
        src,
    )
    if m is None:
        raise ValueError("unparseable CREATE TABLE statement")
    # body/tail boundary: the regex is greedy — re-split on the LAST ')'
    # before ENGINE by scanning parens from the first '('
    i = src.index("(")
    depth, j = 0, i
    for j in range(i, len(src)):
        if src[j] == "(":
            depth += 1
        elif src[j] == ")":
            depth -= 1
            if depth == 0:
                break
    body = src[i + 1:j]
    # clause regexes are line-agnostic: fold the tail's whitespace (a
    # quoted literal containing runs of spaces would be collapsed — not a
    # shape that occurs in DDL predicates)
    tail = re.sub(r"\s+", " ", src[j + 1:])
    table = m.group("name")

    fields: list[T.StructField] = []
    computed: list[tuple[str, T.DataType, str, str]] = []
    col_ttls: list[tuple[str, float, str]] = []
    indexes: list[tuple[str, str, str, list]] = []
    projections: list[tuple[str, list[str], list[tuple]]] = []
    for coldef in _split_top(body):
        im = re.match(
            r"(?i)^INDEX\s+`?(?P<n>\w+)`?\s+`?(?P<c>\w+)`?\s+TYPE\s+"
            r"(?P<t>\w+)\s*(\((?P<p>[^)]*)\))?", coldef,
        )
        if im:
            params = [
                x.strip() for x in (im.group("p") or "").split(",")
                if x.strip()
            ]
            indexes.append((
                im.group("n"), im.group("c"), im.group("t"), params,
            ))
            continue
        pm = re.match(
            r"(?is)^PROJECTION\s+`?(?P<n>\w+)`?\s*\((?P<body>.*)\)$",
            coldef,
        )
        if pm:
            projections.append(
                (pm.group("n"), *_parse_projection(pm.group("body")))
            )
            continue
        if re.match(r"(?i)^CONSTRAINT\b", coldef):
            continue  # CHECK constraints: quality layer's job
        nm = _NAME_RE.match(coldef)
        if nm is None:
            raise ValueError(f"unparseable column definition: {coldef!r}")
        name = nm.group("name")
        ctype, rest = _take_type(coldef[nm.end():])
        rest = rest.strip()
        dtype = parse_type(ctype)
        # per-column TTL: `raw String TTL event_ts + INTERVAL 30 DAY`
        tm = re.search(
            r"(?i)\bTTL\s+(\w+)\s*\+\s*INTERVAL\s+(\d+(?:\.\d+)?)\s+"
            r"(DAY|WEEK|MONTH|HOUR)", rest,
        )
        if tm:
            col_ttls.append((
                name,
                float(tm.group(2)) * _INTERVAL_DAYS[tm.group(3).lower()],
                tm.group(1),
            ))
            rest = rest[:tm.start()] + rest[tm.end():]
        rest = re.sub(r"(?i)\bCODEC\s*\(.*?\)", "", rest).strip()
        km = re.match(
            r"(?i)^(DEFAULT|MATERIALIZED|ALIAS)\s+(.*)$", rest
        )
        if km:
            computed.append((
                name, dtype, km.group(1).lower(),
                _rewrite_expr(km.group(2).strip()),
            ))
        else:
            fields.append(T.StructField(name, dtype, True))

    # tail clauses
    part = re.search(
        r"(?i)\bPARTITION\s+BY\s+(.+?)(?=\bORDER\s+BY|\bTTL\b|"
        r"\bSETTINGS\b|$)", tail,
    )
    order = re.search(r"(?i)\bORDER\s+BY\s+", tail)
    ttl_m = re.search(
        r"(?i)\bTTL\s+(\w+)\s*\+\s*INTERVAL\s+(\d+(?:\.\d+)?)\s+"
        r"(DAY|WEEK|MONTH|HOUR)(\s+WHERE\s+(?P<w>.+?))?"
        r"(?=\s*\bGROUP\s+BY|\s*\bSETTINGS\b|\s*$)", tail,
    )
    date_partitioned = False
    if part is not None:
        pexpr = part.group(1).strip()
        if not re.fullmatch(
            r"(?i)(event_date|toDate\s*\(\s*\w+\s*\)|"
            r"toYYYYMM(DD)?\s*\(\s*\w+\s*\))", pexpr,
        ):
            raise ValueError(
                f"unsupported PARTITION BY {pexpr!r}: this engine "
                "partitions by day (event_date) — date-shaped "
                "expressions only"
            )
        date_partitioned = True

    if date_partitioned and not any(
        f.name == "event_date" for f in fields
    ):
        fields.append(T.StructField("event_date", T.DateType(), True))

    schema = T.StructType(fields)
    if order is not None:
        sort_cols = _parse_order_by(tail[order.end():])
        if sort_cols:
            # an ORDER-BY-only MergeTree (every dim in the reference's
            # 03_gold_tables.sql) stays unpartitioned: files are written
            # sorted but no event_date directory level is minted
            wh.set_partitioning(table, sort_cols,
                                partitioned=date_partitioned)
    wh.save_schema_override(table, schema)
    engine = _parse_engine(tail)
    if engine is not None:
        wh.set_table_engine(table, **engine)
    for iname, icol, itype, iparams in indexes:
        wh.declare_skip_index(table, iname, icol, itype, iparams)
    for pname, pdims, pmeasures in projections:
        wh.declare_projection(table, pname, pdims, pmeasures)
    for name, dtype, kind, expr in computed:
        from ..quality import SchemaMigrator

        SchemaMigrator(wh).add_computed_column(
            table, name, dtype, expr, kind=kind
        )
    if ttl_m is not None:
        # rollup form: TTL … GROUP BY k,… SET col = agg(col), …
        gm = re.search(
            r"(?i)\bTTL\b.*?\bGROUP\s+BY\s+(?P<g>[`\w,\s]+?)\s+"
            r"SET\s+(?P<s>.+?)(?=\bSETTINGS\b|$)", tail,
        )
        group_by = aggregates = None
        if gm is not None:
            group_by = [
                c.strip().strip("`")
                for c in gm.group("g").split(",") if c.strip()
            ]
            aggregates = {}
            for item in _split_top(gm.group("s")):
                am = re.match(r"`?(\w+)`?\s*=\s*(.+)$", item.strip())
                if am is None:
                    raise ValueError(
                        f"unparseable TTL SET assignment {item!r}"
                    )
                aggregates[am.group(1)] = _rewrite_expr(
                    am.group(2).strip()
                )
        wh.set_table_ttl(
            table,
            float(ttl_m.group(2)) * _INTERVAL_DAYS[ttl_m.group(3).lower()],
            ttl_col=ttl_m.group(1),
            where=ttl_m.group("w").strip() if ttl_m.group("w") else None,
            group_by=group_by,
            aggregates=aggregates,
        )
    for col, days, ttl_col in col_ttls:
        wh.set_column_ttl(table, col, days, ttl_col=ttl_col)
    # validate the whole declaration plans (empty frame through the
    # computed-read path)
    wh.read(table).schema
    return table
