"""Scan / sink layer — SURVEY.md §2.1 (S1-S10)."""

from .registry import load_table, load_tables, register_views
from .csvio import read_csv_all_string, read_csv_inferred, NULL_TOKENS
from .parquetio import (
    write_partitioned,
    read_partitioned,
    list_partitions,
    sanitize_path_component,
)

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_csv_all_string",
    "read_csv_inferred",
    "NULL_TOKENS",
    "write_partitioned",
    "read_partitioned",
    "list_partitions",
    "sanitize_path_component",
]
