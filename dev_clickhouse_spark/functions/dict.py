"""ClickHouse external-dictionary analog: ``dictGet`` as an expression.

ClickHouse dictionaries pin a bounded dimension in every server's memory so
``dictGet('dict', 'attr', key)`` is a hash lookup inside any expression —
no join in the plan (the reference's stack is exactly the kind of consumer
that layers dictionaries over small dims like nation/region).  The
Spark-first equivalent for a BOUNDED dim is a literal ``MAP`` expression:
built once from the dim, embedded in the plan, shipped to every executor
with the task closure — Catalyst evaluates the lookup inside whole-stage
codegen, and the scan side never shuffles.  For dims that scale with the
data this is the WRONG tool (that's a broadcast/shuffle join, which the
gold layer already uses); ``max_rows`` enforces the boundedness contract
loudly instead of letting a 10M-row "dictionary" melt the driver.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class SparkDictionary:
    """An in-plan dictionary built from a bounded dimension DataFrame.

    >>> d = SparkDictionary(nation, "n_nationkey", ["n_name", "n_regionkey"])
    >>> customers.select(d.get("n_name", F.col("c_nationkey")))

    ``get`` returns a Column (a map-literal element_at), so it composes in
    filters, projections, and aggregations exactly like ClickHouse's
    ``dictGet`` — and ``getOrDefault`` mirrors ``dictGetOrDefault``.
    """

    #: dictionaries are for BOUNDED dims; beyond this, use a join
    DEFAULT_MAX_ROWS = 100_000

    def __init__(
        self,
        dim: DataFrame,
        key_col: str,
        attr_cols: list[str],
        max_rows: int | None = None,
    ):
        limit = max_rows or self.DEFAULT_MAX_ROWS
        # limit+1 bounds the collect itself: a runaway dim fetches one row
        # past the contract, never the whole table
        rows = dim.select(key_col, *attr_cols).limit(limit + 1).collect()
        if len(rows) > limit:
            raise ValueError(
                f"dictionary source exceeds {limit} rows; a dim this size "
                "should be a (broadcast) join, not an in-plan literal map"
            )
        self.key_col = key_col
        self._maps: dict[str, Column] = {}
        for attr in attr_cols:
            pairs = [
                (r[key_col], r[attr]) for r in rows if r[key_col] is not None
            ]
            if len({k for k, _ in pairs}) != len(pairs):
                raise ValueError(
                    f"dictionary key {key_col!r} is not unique in the source"
                )
            self._maps[attr] = F.create_map(
                *[F.lit(x) for x in chain.from_iterable(pairs)]
            )
        keys = [r[key_col] for r in rows if r[key_col] is not None]
        self._has = F.create_map(
            *[F.lit(x) for k in keys for x in (k, True)]
        )
        self.n_keys = len(keys)

    def set_hierarchy(self, parent_col_map: dict) -> None:
        """Declare the dictionary HIERARCHICAL (CH layout ``hierarchical:
        true``): ``parent_col_map`` maps key → parent key; a key absent
        from the map (or mapping to NULL) is a root.  Cycle-checked and
        depth-measured at build time so the in-plan walk can be unrolled
        to exactly the hierarchy's depth."""
        depth = 0
        for k in parent_col_map:
            seen = set()
            cur, d = k, 0
            while cur is not None and cur in parent_col_map:
                if cur in seen:
                    raise ValueError(
                        f"hierarchy cycle through key {cur!r}"
                    )
                seen.add(cur)
                cur = parent_col_map[cur]
                d += 1
            depth = max(depth, d)
        pairs = [
            (k, v) for k, v in parent_col_map.items()
            if k is not None and v is not None
        ]
        self._parent = F.create_map(
            *[F.lit(x) for x in chain.from_iterable(pairs)]
        )
        self._depth = depth

    def get_hierarchy(self, key) -> Column:
        """``dictGetHierarchy``: the array ``[key, parent, …, root]`` —
        an UNROLLED chain of in-plan map lookups (depth measured at
        build), trailing NULLs filtered, entirely inside whole-stage
        codegen.  A key unknown to the dictionary yields ``[key]``."""
        key = F.col(key) if isinstance(key, str) else key
        steps = [key]
        cur = key
        for _ in range(self._depth):
            cur = F.element_at(self._parent, cur)
            steps.append(cur)
        return F.filter(F.array(*steps), lambda x: x.isNotNull())

    def is_in(self, child, ancestor) -> Column:
        """``dictIsIn``: whether ``ancestor`` appears in ``child``'s
        hierarchy chain (including child itself, the CH contract)."""
        ancestor = (
            F.col(ancestor) if isinstance(ancestor, str) else F.lit(ancestor)
            if not isinstance(ancestor, Column) else ancestor
        )
        return F.array_contains(self.get_hierarchy(child), ancestor)

    def get(self, attr: str, key) -> Column:
        """``dictGet``: the attribute for ``key``, NULL when absent."""
        key = F.col(key) if isinstance(key, str) else key
        return F.element_at(self._maps[attr], key)

    def get_or_default(self, attr: str, key, default) -> Column:
        """``dictGetOrDefault``: absent keys yield ``default``."""
        return F.coalesce(self.get(attr, key), F.lit(default))

    def has(self, key) -> Column:
        """``dictHas``: key membership — true even when every attribute of
        the key is NULL (a value-map probe couldn't tell those apart)."""
        key = F.col(key) if isinstance(key, str) else key
        return F.coalesce(F.element_at(self._has, key), F.lit(False))
