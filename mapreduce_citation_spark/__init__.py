"""mapreduce_citation_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference MapReduce citation-analysis system (see SURVEY.md), built
Spark-first: the DataFrame/SQL API declares logical plans and Catalyst/
Tungsten provide partitioning, partial aggregation, shuffle, and top-k
that the reference implements by hand (reference: master/master.py,
worker/mapper/mapper.py, worker/reducer/reducer.py).

Layout
------
- ``session``     SparkSession factory tuned for local dev + scale.
- ``sources``     readers (edge-list text, parquet/csv/json) + catalog.
- ``citations``   the reference's query surface: citation counts,
                  top-k ranked report, formatted report sink.
- ``operators``   general relational operators + LLM-data-pipeline
                  operators (dedup, similarity search, text analysis,
                  multimodal plumbing).
- ``functions``   reusable column expressions (tokenization, shingles,
                  vector math) — JVM-side built-ins wherever possible.
- ``plans``       explain/plan-inspection helpers used by tests to
                  assert pushdown / broadcast / codegen properties.
- ``streaming``   Structured Streaming operators over event data.
- ``registry``    the query registry consumed by ``__spark_entry__``.
"""

__version__ = "0.1.0"
