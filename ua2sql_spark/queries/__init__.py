"""Query modules — importing this package populates the registry."""

from ua2sql_spark.queries import (  # noqa: F401
    relational,
    aggregates,
    windows,
    funcs,
    events_analytics,
    dedup,
    similarity,
    text_analysis,
    multimodal,
    advanced,
    tpch_style,
    pipeline_ops,
    udf_surface,
    corpus_ops,
    layout_ops,
    versioned,
)
