from dist_mapreduce_spark.functions.hashing import (  # noqa: F401
    fnv1a_bucket_spark_sql,
    fnv1a_duckdb_sql,
    fnv1a_spark_sql,
    md5_prefix_long_duckdb_sql,
    md5_prefix_long_spark_sql,
)
from dist_mapreduce_spark.functions.vectors import (  # noqa: F401
    cosine_duckdb_sql,
    cosine_spark_sql,
)
