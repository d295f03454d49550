"""Pipeline runner + the LogiCash-shaped medallion pipeline."""

from logicash_etl_spark.pipeline.runner import Pipeline, Step
from logicash_etl_spark.pipeline.logicash import LogicashConfig, run_logicash_pipeline

__all__ = ["Pipeline", "Step", "LogicashConfig", "run_logicash_pipeline"]
