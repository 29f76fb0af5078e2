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
    "uint8": T.ShortType,
    "int16": T.ShortType,
    "uint16": T.IntegerType,
    "int32": T.IntegerType,
    "uint32": T.LongType,
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
    """Split on ``sep`` outside parentheses/backticks/quotes."""
    parts, depth, buf, q = [], 0, [], None
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
        elif ch == sep and depth == 0:
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
    for coldef in _split_top(body):
        if re.match(r"(?i)^(INDEX|PROJECTION|CONSTRAINT)\b", coldef):
            continue  # skip-index/projection declarations: separate APIs
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
    order = re.search(
        r"(?i)\bORDER\s+BY\s+(\(([^)]*)\)|(\w+))", tail
    )
    ttl_m = re.search(
        r"(?i)\bTTL\s+(\w+)\s*\+\s*INTERVAL\s+(\d+(?:\.\d+)?)\s+"
        r"(DAY|WEEK|MONTH|HOUR)(\s+WHERE\s+(?P<w>.+?))?"
        r"(?=\bGROUP\s+BY|\bSETTINGS\b|$)", tail,
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
        sort_cols = [
            c.strip().strip("`")
            for c in (order.group(2) or order.group(3)).split(",")
            if c.strip()
        ]
        wh.set_partitioning(table, sort_cols)
    wh.save_schema_override(table, schema)
    for name, dtype, kind, expr in computed:
        from ..quality import SchemaMigrator

        SchemaMigrator(wh).add_computed_column(
            table, name, dtype, expr, kind=kind
        )
    if ttl_m is not None:
        wh.set_table_ttl(
            table,
            float(ttl_m.group(2)) * _INTERVAL_DAYS[ttl_m.group(3).lower()],
            ttl_col=ttl_m.group(1),
            where=ttl_m.group("w").strip() if ttl_m.group("w") else None,
        )
    for col, days, ttl_col in col_ttls:
        wh.set_column_ttl(table, col, days, ttl_col=ttl_col)
    # validate the whole declaration plans (empty frame through the
    # computed-read path)
    wh.read(table).schema
    return table
