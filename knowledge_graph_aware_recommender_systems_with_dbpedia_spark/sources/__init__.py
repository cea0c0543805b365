from .tables import TPCH_TABLES, load_table, load_tables, register_views
from .typed_csv import read_typed_csv, write_typed_csv

__all__ = [
    "TPCH_TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_typed_csv",
    "write_typed_csv",
]
