"""Query registry: single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers a :class:`QuerySpec`
here; ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry. Specs without ``oracle`` are genuinely non-SQL-expressible
(custom stateful streaming) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

import glob
import json
import os
import re
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: §2-critical queries that must stay inside the driver's checked window
#: even when they already have a recent green row (the driver checks the
#: FIRST N entries of ``queries()``; everything §2-anchoring belongs
#: there every round, not just on rotation).
CRITICAL = (
    "fraud_alerts",  # J2 temporal correlation (reference flagship, batch twin)
    "p_market_pipeline",  # P4-P7 parse/validate/normalize/event-time
    "wordcount",  # P2 flat_map + A1 keyed reduce
    "ob_imbalance",  # A4
    "ob_density_change",  # A3 + A5
    "proto_roundtrip_trades",  # P8
    "proto_roundtrip_orderbook",  # P8
    "q_distinct_users",  # A6 counters
    "q1_pricing_summary",  # flagship TPC-H shape (entry())
    "dedup_simhash",
    "ann_ivf_topk",
    "sketch_kmv_distinct",
)


def _driver_check_history() -> dict[str, int]:
    """query name -> latest round with a driver CORRECTNESS row.

    Read from the ``CORRECTNESS_r*.json`` files the driver commits into
    the repo root each round. Queries absent from every file have never
    been driver-checked."""
    hist: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name in data:
            hist[name] = max(hist.get(name, 0), rnd)
    return hist


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
    """Every registered spec, in driver-gate priority order.

    The driver's correctness gate checks the FIRST ~50 entries of
    ``queries()`` (dict iteration order), so ordering is part of the
    contract. Priority: (1) queries never driver-checked in any recorded
    round, (2) queries whose last green row is oldest, (3) within the
    same round, the §2-critical set (:data:`CRITICAL`) before the rest,
    each group in registration order. This keeps every §2-anchoring query
    plus the full never-checked backlog inside the checked window and
    rotates stale rows back to the front in later rounds automatically
    (the history is re-read from the CORRECTNESS files the driver
    commits)."""
    # Import operator modules for their registration side effects.
    from apache_flink_pratices_spark import operators  # noqa: F401

    hist = _driver_check_history()
    crit = {n: i for i, n in enumerate(CRITICAL)}
    reg_idx = {n: i for i, n in enumerate(_REGISTRY)}

    def key(name: str) -> tuple[int, int, int, int]:
        return (
            hist.get(name, -1),  # never-checked (-1) first, then oldest round
            0 if name in crit else 1,
            crit.get(name, 0),
            reg_idx[name],
        )

    return {n: _REGISTRY[n] for n in sorted(_REGISTRY, key=key)}


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}
