from ua2sql_spark.plans.explain import (  # noqa: F401
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    scan_read_schema,
    shuffle_count,
    simple_plan,
    sortmerge_join_count,
    wholestage_codegen_count,
)
