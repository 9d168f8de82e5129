from dist_mapreduce_spark.plans.registry import ORACLES, QUERIES, query  # noqa: F401
