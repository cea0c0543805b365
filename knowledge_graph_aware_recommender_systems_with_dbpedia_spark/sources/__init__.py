from .tables import TPCH_TABLES, load_table, load_tables, register_views
from .typed_csv import read_typed_csv, write_typed_csv
from .raw_csv import read_csv, read_csv_multichar_sep, read_ndjson, remote_fanout
from .datasets import DATASETS

__all__ = [
    "TPCH_TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_typed_csv",
    "write_typed_csv",
    "read_csv",
    "read_csv_multichar_sep",
    "read_ndjson",
    "remote_fanout",
    "DATASETS",
]
