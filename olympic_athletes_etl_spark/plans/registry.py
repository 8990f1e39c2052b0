"""Registration machinery for the driver-facing query surface.

A query is a ``(spark, sf_dir) -> DataFrame`` callable plus, when the
semantics are ANSI-SQL-expressible, a DuckDB oracle string run against the
same parquet tables. The driver compares row count + schema (column names)
+ order-insensitive value hash, with columns sorted by name — so every
computed column is aliased identically on both sides, float aggregates are
rounded identically on both sides, and timestamps are cast to string on
both sides (Spark session TZ pinned to UTC == DuckDB's naive-UTC).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator (the
    driver then records a weaker rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def promote(names: list[str]) -> None:
    """Move ``names`` (in the given order) to the front of the registry.

    The driver's correctness gate audits a prefix of the registry (50 of 93
    in rounds 1-2), so insertion order decides which queries get a fresh
    driver row this round. Plan modules register in import order; callers
    (plans/__init__) then promote the queries that most need re-auditing:
    freshly fixed oracles, brand-new queries, and families whose last
    driver-green row is oldest. Unknown names are an error — a rename that
    silently dropped a promotion would un-audit the wrong queries.
    """
    missing = [n for n in names if n not in _REGISTRY]
    if missing:
        raise KeyError(f"promote: unknown query names {missing}")
    front = {n: _REGISTRY.pop(n) for n in names}
    rest = dict(_REGISTRY)
    _REGISTRY.clear()
    _REGISTRY.update(front)
    _REGISTRY.update(rest)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _REGISTRY.items() if sql is not None}
