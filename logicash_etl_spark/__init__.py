"""logicash_etl_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference ETL project (PauloZapata/logicash-etl): medallion batch ETL
(Bronze CSV -> Silver Parquet -> Gold aggregates), a data-quality rule
engine, SQL-over-views analytics, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal columns) that the reference's scale never needed.

Design stance (SURVEY.md section 7): declare logical plans with the
DataFrame/SQL API and let Catalyst + Tungsten pick physical strategy;
Pandas UDFs only where built-ins genuinely cannot express semantics;
every operator shuffle-aware for 100 TB scale.
"""

from logicash_etl_spark.session import get_spark, session_config

__version__ = "0.1.0"

__all__ = ["get_spark", "session_config", "__version__"]
