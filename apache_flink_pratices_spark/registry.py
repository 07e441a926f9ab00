"""Query registry: single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers a :class:`QuerySpec`
here; ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry. Specs without ``oracle`` are genuinely non-SQL-expressible
(custom stateful streaming) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB over the same parquet views
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench, tags=tags)
        return fn

    return deco


def get_spec(name: str) -> QuerySpec:
    """Spec lookup WITHOUT triggering the full operators-package import.

    For operator modules that compose other operators' oracles at module
    import time (the caller must import the producing module first);
    external callers want :func:`all_specs`."""
    return _REGISTRY[name]


def all_specs() -> dict[str, QuerySpec]:
    # Import operator modules for their registration side effects.
    from apache_flink_pratices_spark import operators  # noqa: F401

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}
