from .catalog import TABLES, load, load_csv, register_all, schema_for
from .sinks import read_csv, write_csv, write_parquet

__all__ = [
    "TABLES",
    "load",
    "load_csv",
    "register_all",
    "schema_for",
    "read_csv",
    "write_csv",
    "write_parquet",
]
