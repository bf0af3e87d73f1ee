"""Physical-plan inspection helpers (scale hygiene).

The reference has no optimizer (SURVEY.md §4); here Catalyst does the
optimizing and these helpers make its decisions observable so every
operator can be audited for the 100 TB design point:

    >>> from clickhouse_migrator_spark.plans import plan_report
    >>> print(plan_report(df))   # shuffles, broadcasts, scans, pushdown
"""

from .inspect import count_shuffles, plan_report, pushed_filters, scan_columns  # noqa: F401
