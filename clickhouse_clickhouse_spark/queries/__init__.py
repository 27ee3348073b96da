"""Named query surface — one entry per implemented operator (SURVEY.md §2).

Importing this package registers every query with the registry; the driver
contract (``__spark_entry__.py``) and local checker both consume it.
"""

from clickhouse_clickhouse_spark.queries import (  # noqa: F401
    basic,
    joins_q,
    aggregates_q,
    windows_q,
    setops_q,
    scalars_q,
    events_q,
    text_q,
    vectors_q,
    advanced_q,
    tpch_q,
    tpch_full_q,
    tpch_dialect_q,
    clickbench_q,
    formats_q,
    # LAST on purpose: rows-only estimate twins register after the driver's
    # sampled first-50 prefix (see zz_estimates_q docstring).
    zz_estimates_q,
)
