from .batch import load_table, load_tables, read_json_lines, read_parquet
from .streams import file_stream, rate_stream

__all__ = [
    "load_table", "load_tables", "read_parquet", "read_json_lines",
    "file_stream", "rate_stream",
]
