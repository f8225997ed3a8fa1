from ua2sql_spark.plans.explain import (  # noqa: F401
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    shuffle_count,
    wholestage_codegen_count,
)
