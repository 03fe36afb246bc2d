from chronon_spark.operators.agg_registry import AGG_REGISTRY  # noqa: F401
