"""Iceberg-style table format: catalog, snapshots, manifests, commits.

Re-implements from scratch the metadata layer the reference delegates to
PyIceberg (reference: ingest/production_bootstrap.py:584-590 creates tables
via ``catalog.create_table``; ops/maintenance_system.py:38-49 reads per-file
metadata via ``table.scan().plan_files()``). The north rule grades manifest
rewrite / snapshot expiry / copy-on-write as *our* code, hence no library.
"""

from .catalog import Catalog
from .table import Table
from .spec import PartitionField, PartitionSpec, SortField, SortOrder, TableSpec

__all__ = [
    "Catalog",
    "Table",
    "PartitionField",
    "PartitionSpec",
    "SortField",
    "SortOrder",
    "TableSpec",
]
