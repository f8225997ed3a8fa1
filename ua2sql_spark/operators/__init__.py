"""Generic DataFrame operators — the engine's reusable API surface.

Each takes caller-supplied DataFrames/column names (not fixed test
tables) and composes built-in Spark operations; the query registry
(`ua2sql_spark.queries`) instantiates these against the test fixtures.
"""

from ua2sql_spark.operators.asof import asof_join  # noqa: F401
from ua2sql_spark.operators.dedup import exact_dedup, minhash_lsh_pairs  # noqa: F401
from ua2sql_spark.operators.sessionize import sessionize  # noqa: F401
from ua2sql_spark.operators.topk import top_k_per_group  # noqa: F401
