"""IP address validation + canonicalization, entirely JVM-side.

Re-expresses the reference's ``toIPv6OrNull`` ingest guard
(clickhouse/init/02_kafka_ingest.sql.tmpl:42-43; ``Nullable(IPv6)`` columns in
01_bronze_tables.sql:8-9): every IP-typed field is validated at extraction and
normalized to ONE canonical string so that ``'::ffff:1.2.3.4'``,
``'0:0:0:0:0:FFFF:102:304'`` and ``'1.2.3.4'`` equi-join, and the SCD2
agent-IP change predicate cannot fire on formatting noise.

Canonical form (matches ClickHouse's IPv6 rendering / RFC 5952):
lowercase hex, leading zeros stripped, the leftmost-longest run of ≥2 zero
groups compressed to ``::``, and v4-mapped addresses rendered with the
embedded dotted quad (``::ffff:1.2.3.4``).  Plain IPv4 input becomes its
v4-mapped IPv6 — exactly ``toIPv6OrNull('1.2.3.4')``.  Invalid input → NULL.

Everything is Spark built-ins (split/transform/aggregate/conv) — no Python
workers in the ingest hot path.  Intermediates are LET-BOUND through the
single-element-array ``transform`` idiom (``transform(array(x), v -> f(v))[0]``)
so each subexpression exists ONCE in the Catalyst tree; naive nesting
duplicates the whole parse at every reference and blows the task binary to
tens of MB.  Property-tested against Python's ``ipaddress`` module in
tests/test_functions.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_RE = rf"^{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}$"
# structural shells (group content re-checked after splitting)
_FULL_RE = r"^[0-9a-f]{1,4}(:[0-9a-f]{1,4}){7}$"
_COMP_RE = r"^([0-9a-f]{1,4}(:[0-9a-f]{1,4})*)?::([0-9a-f]{1,4}(:[0-9a-f]{1,4})*)?$"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _let(val: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``val`` to a lambda variable so ``body`` can reference it many
    times without duplicating its expression tree."""
    return F.transform(F.array(val), body)[0]


def _quad_to_hex_groups(quad: Column) -> Column:
    """'1.2.3.4' -> array('102', '304') (lowercase hex, no leading zeros)."""
    return _let(F.split(quad, r"\."), lambda o: F.array(
        F.lower(F.conv((o[0].cast("long") * 256 + o[1].cast("long")).cast("string"), 10, 16)),
        F.lower(F.conv((o[2].cast("long") * 256 + o[3].cast("long")).cast("string"), 10, 16)),
    ))


def _strip_zeros(g: Column) -> Column:
    """'0db8' -> 'db8', '0000' -> '0'."""
    return _let(F.regexp_replace(g, "^0+", ""),
                lambda t: F.when(t == "", F.lit("0")).otherwise(t))


def _hex_tail(s: Column) -> Column:
    """Replace a trailing dotted quad (v4-mapped/compat spelling) with its two
    hex groups; NULL when the tail looks dotted but is not a valid quad."""
    return _let(
        F.regexp_extract(s, r":((\d{1,3}\.){3}\d{1,3})$", 1),
        lambda quad: F.when(quad == "", s).otherwise(
            F.when(
                quad.rlike(IPV4_RE),
                F.concat(
                    F.substring(s, F.lit(1), F.length(s) - F.length(quad)),
                    F.concat_ws(":", _quad_to_hex_groups(quad)),
                ),
            )
        ),
    )


def _expand_groups(sh: Column) -> Column:
    """Structurally-valid hex form -> array of exactly 8 zero-stripped groups;
    NULL when the group counts don't add up."""
    return _let(F.split(sh, "::"), lambda parts: _let(
        F.struct(
            F.filter(F.split(parts[0], ":"), lambda g: g != "").alias("l"),
            F.when(
                F.size(parts) == 2,
                F.filter(F.split(parts[1], ":"), lambda g: g != ""),
            ).otherwise(F.array().cast("array<string>")).alias("r"),
            F.size(parts).alias("np"),
        ),
        lambda t: F.when(
            F.when(t.np == 1, F.size(t.l) == 8).otherwise(
                (t.np == 2) & (F.size(t.l) + F.size(t.r) <= 7)
            ),
            F.when(t.np == 1, F.transform(t.l, _strip_zeros)).otherwise(
                F.concat(
                    F.transform(t.l, _strip_zeros),
                    F.transform(
                        F.sequence(F.lit(1), 8 - F.size(t.l) - F.size(t.r)),
                        lambda _: F.lit("0"),
                    ),
                    F.transform(t.r, _strip_zeros),
                )
            ),
        ),
    ))


def _render(groups: Column) -> Column:
    """8 canonical groups -> RFC 5952 string (v4-mapped rendered dotted)."""
    is_v4m = (F.slice(groups, 1, 5) == F.array(*[F.lit("0")] * 5)) & (
        groups[5] == "ffff"
    )
    v4m = _let(
        F.struct(
            F.conv(groups[6], 16, 10).cast("long").alias("hi"),
            F.conv(groups[7], 16, 10).cast("long").alias("lo"),
        ),
        lambda w: F.concat(
            F.lit("::ffff:"),
            F.floor(w.hi / 256).cast("string"), F.lit("."),
            (w.hi % 256).cast("string"), F.lit("."),
            F.floor(w.lo / 256).cast("string"), F.lit("."),
            (w.lo % 256).cast("string"),
        ),
    )
    # leftmost-longest zero-group run (>=2) -> '::'; acc = (best, start, cur, idx)
    run = F.aggregate(
        groups,
        F.struct(
            F.lit(0).alias("best"), F.lit(0).alias("best_start"),
            F.lit(0).alias("cur"), F.lit(0).alias("idx"),
        ),
        lambda acc, g: _let(
            F.when(g == "0", acc.cur + 1).otherwise(F.lit(0)),
            lambda cur: F.struct(
                F.when(cur > acc.best, cur).otherwise(acc.best).alias("best"),
                F.when(cur > acc.best, acc.idx - cur + 1)
                .otherwise(acc.best_start).alias("best_start"),
                cur.alias("cur"),
                (acc.idx + 1).alias("idx"),
            ),
        ),
    )
    compressed = _let(run, lambda r: F.when(
        r.best >= 2,
        F.concat(
            F.concat_ws(":", F.slice(groups, 1, r.best_start)),
            F.lit("::"),
            F.concat_ws(
                ":",
                F.when(
                    r.best_start + r.best >= 8, F.array().cast("array<string>")
                ).otherwise(
                    F.slice(groups, r.best_start + r.best + 1, 8 - r.best_start - r.best)
                ),
            ),
        ),
    ).otherwise(F.concat_ws(":", groups)))
    return F.when(is_v4m, v4m).otherwise(compressed)


def to_ipv6_or_null(ip: Column | str) -> Column:
    """Canonical IPv6 string (RFC 5952 / ClickHouse display form) or NULL.

    IPv4 input maps to ``::ffff:a.b.c.d``; IPv6 input (full, compressed, or
    with an embedded dotted quad) is expanded, validated, and re-compressed
    canonically; anything else (including zone-indexed addresses) is NULL.
    """
    return _let(F.lower(F.trim(_col(ip))), lambda s: F.when(
        s.rlike(IPV4_RE), F.concat(F.lit("::ffff:"), s)
    ).otherwise(
        F.when(
            s.contains(":"),
            _let(_hex_tail(s), lambda sh: F.when(
                sh.rlike(_FULL_RE) | sh.rlike(_COMP_RE),
                _let(_expand_groups(sh), lambda groups: F.when(
                    groups.isNotNull(), _render(groups)
                )),
            )),
        )
    ))


def ip_canonical(ip: Column | str) -> Column:
    """Join-friendly canonical IP string: like :func:`to_ipv6_or_null` but
    keeps plain-IPv4 (and v4-mapped IPv6) in dotted-quad form ``a.b.c.d`` —
    convenient when downstream consumers expect IPv4 strings.  NULL when
    invalid."""
    return _let(to_ipv6_or_null(ip), lambda v6: F.when(
        v6.startswith("::ffff:") & v6.rlike(r"\."),
        F.substring(v6, 8, 15),
    ).otherwise(v6))
