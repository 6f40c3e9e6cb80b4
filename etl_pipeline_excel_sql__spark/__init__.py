"""etl_pipeline_excel_sql__spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``RogerThat8922/ETL-Pipeline-Excel-SQL-``
(see SURVEY.md), widened with the standard analytics surface the reference
lacks (joins, aggregations, windows, set ops) and the LLM-training-data
pipeline operators the project targets (dedup, similarity search, text
analysis, multimodal plumbing, streaming).

Design principles (SURVEY.md §4, §7):

* **Declarative first.** Every operator is a composition of DataFrame /
  Spark SQL expressions so Catalyst gets predicate pushdown, column pruning,
  join planning and AQE for free. No RDDs, no custom Catalyst rules.
* **JVM-side hot path.** Built-in ``pyspark.sql.functions`` everywhere;
  Python appears only in driver-side metadata logic (schema reconciliation,
  Excel rendering) and clearly-gated multimodal stubs.
* **Scale-aware.** Dimension joins are broadcast, aggregations are
  partial-ready, money math is decimal, and nothing materializes on the
  driver except terminal template-scale sinks.
"""

from etl_pipeline_excel_sql__spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
