"""Sources and sinks (SURVEY §2.1 S1-S7)."""

from nlp_to_nosql_spark.sources.catalog import TABLES, load_table, register_tables

__all__ = ["TABLES", "load_table", "register_tables"]
