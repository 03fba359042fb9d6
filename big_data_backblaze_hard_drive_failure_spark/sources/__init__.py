from .catalog import TABLES, load, register_all, schema_for

__all__ = ["TABLES", "load", "register_all", "schema_for"]
