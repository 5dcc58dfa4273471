from .tpch import TPCH_TABLES, load_table, register_tables

__all__ = ["TPCH_TABLES", "load_table", "register_tables"]
