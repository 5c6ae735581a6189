"""Sources: parquet table catalog + the Pulsar-shaped streaming source."""

from mi_inbound_pulsar_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_views"]
