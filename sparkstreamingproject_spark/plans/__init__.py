from .inspect import explain_str, has_broadcast_join, pushed_filters, scan_columns

__all__ = ["explain_str", "pushed_filters", "scan_columns", "has_broadcast_join"]
