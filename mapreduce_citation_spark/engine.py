"""AnalyticsEngine — the user-facing facade.

One object that holds the session, registers the fixture tables as SQL
views, and exposes the engine's three query surfaces:

- ``sql(...)``: raw Spark SQL over the registered views,
- ``query(name)``: the registry's named operators (SURVEY §2 +
  north-star),
- ``citations()``: the reference-compatible citation API.

A user of the reference system migrates by pointing ``from_dir`` at
their data and calling ``citations().top_cited(30).write_report(...)``
— or any of the 60+ registered relational / dedup / similarity / text
operators the reference never had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .citations import CitationAnalytics, edges_from_orders
from .registry import all_specs
from .session import get_spark
from .sources.readers import FIXTURE_TABLES, load_table


class AnalyticsEngine:
    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        self._views_registered = False

    # -- catalog -----------------------------------------------------
    def register_views(self, sf_dir: str | None = None) -> "AnalyticsEngine":
        """Register every fixture table as a temp view for SQL use."""
        d = sf_dir or self.sf_dir
        if d is None:
            raise ValueError("sf_dir required to register views")
        for t in FIXTURE_TABLES:
            try:
                load_table(self.spark, d, t).createOrReplaceTempView(t)
            except Exception:  # table absent at this SF — skip
                continue
        self._views_registered = True
        return self

    # -- query surfaces ----------------------------------------------
    def sql(self, query: str) -> DataFrame:
        if not self._views_registered:
            self.register_views()
        return self.spark.sql(query)

    def query(self, name: str) -> DataFrame:
        """Run a registered operator by name at this engine's sf_dir."""
        spec = all_specs()[name]
        if self.sf_dir is None:
            raise ValueError("sf_dir required for registered queries")
        return spec.fn(self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        return sorted(all_specs())

    def table(self, name: str) -> DataFrame:
        if self.sf_dir is None:
            raise ValueError("sf_dir required")
        return load_table(self.spark, self.sf_dir, name)

    def citations(self, edges: DataFrame | None = None) -> CitationAnalytics:
        """Citation analytics over an edge DataFrame (defaults to the
        orders-derived graph used by the driver fixtures)."""
        if edges is None:
            edges = edges_from_orders(self.table("orders"))
        return CitationAnalytics(edges)
