from .flatten import (
    explode_actions,
    explode_displays,
    flatten_common,
    page_log,
    parse_log_envelope,
    start_log,
)
from .routing import map_cdc_optype, route_dynamic_topic, split_log_streams

__all__ = [
    "parse_log_envelope", "flatten_common", "page_log", "start_log",
    "explode_displays", "explode_actions",
    "map_cdc_optype", "route_dynamic_topic", "split_log_streams",
]
