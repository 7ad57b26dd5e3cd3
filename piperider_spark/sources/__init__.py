"""Source/sink registry — the reference's connector surface re-expressed.

PipeRider registers ~10 warehouse connectors
(/root/reference/piperider_cli/datasource/__init__.py:271-295); in Spark a
"connector" is a reader config. This module provides the same user-facing
operation set: open a named source, list its tables, reflect schemas, and
hand back DataFrames — over parquet / csv / json / orc directories and any
catalog-registered (e.g. Iceberg) table.
"""

from piperider_spark.sources.registry import (
    DataSource,
    list_tables,
    read_table,
    reflect_schema,
)

__all__ = ["DataSource", "list_tables", "read_table", "reflect_schema"]
