from bdqc_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views
from bdqc_spark.sources.iceberg import IcebergishTable

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "IcebergishTable",
]
