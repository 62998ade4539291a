from copperhead_spark.functions.exact import (  # noqa: F401
    exact_avg,
    exact_avg_sql,
    exact_sum,
    exact_sum_sql,
)
