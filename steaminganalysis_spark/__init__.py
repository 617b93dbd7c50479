"""steaminganalysis_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference project ``Onestarko/SteamingAnalysis`` (a Spark 2.4 DStream +
Kafka + Redis order-log streaming job; see SURVEY.md), widened to a full
relational batch surface, a Structured Streaming core, and
LLM-data-pipeline operators (dedup / similarity search / text analysis),
all designed for 100 TB scale:

- declarative DataFrame/SQL plans (Catalyst optimizes; no hand-scheduling)
- broadcast joins for dimension tables, AQE for runtime re-planning
- map-side partial aggregation everywhere (plain ``groupBy().agg``)
- Arrow-vectorized pandas UDFs on the rare Python path
- no driver-side ``collect()`` on any data path

Public entry points:
- :mod:`steaminganalysis_spark.session` — tuned SparkSession builder
- :mod:`steaminganalysis_spark.sources` — fixture/table registry, readers
- :mod:`steaminganalysis_spark.operators` — batch query/operator library
- :mod:`steaminganalysis_spark.streaming` — Structured Streaming pipelines
- :mod:`steaminganalysis_spark.registry` — the (queries, oracle) registry
  consumed by ``__spark_entry__.py``
"""

__version__ = "0.1.0"
