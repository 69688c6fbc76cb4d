"""Sources (SURVEY §2.1): engine-table scan lives in core.table; this
package adds the external-format loaders the reference ships, plus the
Spark Data Source (``format("lakehouse")``) exposing tables behind
spark.read / readStream / write / writeStream."""

from .ocel_json import load_ocel_json
from .table_source import LakehouseDataSource, register_lakehouse_source

__all__ = ["load_ocel_json", "LakehouseDataSource", "register_lakehouse_source"]
