"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``,
- an equivalent DuckDB ANSI-SQL oracle (or ``None`` for genuinely
  non-SQL-expressible ops, which get the weaker rows-only check),
- whether it belongs to the bench headline set.

``__spark_entry__.py`` and ``bench.py`` are thin views over this
module. Column names are part of the contract: the driver hash-compares
Spark vs DuckDB results after sorting columns by name, so the Spark
DataFrame and the oracle SQL must alias every computed column
identically.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None
    bench: bool = False
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QuerySpec] = {}

#: Modules whose import populates the registry.
_QUERY_MODULES = (
    "mapreduce_citation_spark.operators.citation_queries",
    "mapreduce_citation_spark.operators.relational",
    "mapreduce_citation_spark.operators.windows",
    "mapreduce_citation_spark.operators.joins",
    "mapreduce_citation_spark.operators.stats",
    "mapreduce_citation_spark.operators.graph",
    "mapreduce_citation_spark.operators.events",
    "mapreduce_citation_spark.operators.dedup",
    "mapreduce_citation_spark.operators.similarity",
    "mapreduce_citation_spark.operators.text",
    "mapreduce_citation_spark.operators.multimodal",
)


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            fn=fn, oracle=oracle, bench=bench, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def _load() -> None:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Module not built yet (incremental rounds) — skip, but only
            # for the query module itself, never for real import errors.
            if e.name != mod:
                raise


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }


def bench_queries() -> dict[str, QuerySpec]:
    return {n: s for n, s in all_specs().items() if s.bench}
