from .partitioning import explain_scan_pushdown, salted_repartition, skewed_group_agg  # noqa: F401
