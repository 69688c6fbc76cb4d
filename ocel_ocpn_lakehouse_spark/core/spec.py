"""Table specification: partition transforms, sort orders, properties.

Mirrors the reference's layout contract (SURVEY.md §1.4): partition
transforms year/month/bucket/identity (reference
ingest/production_bootstrap.py:220-269,317-334), multi-column sort orders
(:226-230), and write properties incl. 256 MB target file size (:238).

Transforms are evaluated as Spark Column expressions so partition values
are computed executor-side at write time — no driver involvement.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

PARTITION_COL_PREFIX = "_p_"


@dataclass(frozen=True)
class PartitionField:
    """One partition dimension: a transform applied to a source column.

    transform ∈ {"identity", "bucket", "year", "month", "day"};
    ``num_buckets`` only for "bucket".
    """

    source: str
    transform: str
    name: str
    num_buckets: int = 0

    def to_column(self) -> Column:
        src = F.col(self.source)
        if self.transform == "identity":
            return src
        if self.transform == "bucket":
            # xxhash64-based bucketing: stable across engines/sessions
            # (reference used Iceberg BUCKET(64, event_id),
            # production_bootstrap.py:252-254; we standardize on xxhash64
            # because Python hash() is salted — SURVEY.md §2.7 F5).
            return F.pmod(F.xxhash64(src), F.lit(self.num_buckets)).cast("int")
        if self.transform == "year":
            return F.year(src)
        if self.transform == "month":
            return F.date_format(src, "yyyy-MM")
        if self.transform == "day":
            return F.to_date(src).cast("string")
        raise ValueError(f"unknown transform {self.transform}")

    @property
    def partition_column(self) -> str:
        return PARTITION_COL_PREFIX + self.name

    def to_dict(self) -> dict:
        return {
            "source": self.source,
            "transform": self.transform,
            "name": self.name,
            "num_buckets": self.num_buckets,
        }

    @staticmethod
    def from_dict(d: dict) -> "PartitionField":
        return PartitionField(d["source"], d["transform"], d["name"], d.get("num_buckets", 0))


@dataclass(frozen=True)
class PartitionSpec:
    fields: tuple[PartitionField, ...] = ()

    @staticmethod
    def unpartitioned() -> "PartitionSpec":
        return PartitionSpec(())

    @staticmethod
    def bucket(source: str, n: int, name: str | None = None) -> "PartitionSpec":
        return PartitionSpec((PartitionField(source, "bucket", name or f"{source}_bucket", n),))

    def partition_columns(self) -> list[str]:
        return [f.partition_column for f in self.fields]

    def to_list(self) -> list[dict]:
        return [f.to_dict() for f in self.fields]

    @staticmethod
    def from_list(lst: list[dict]) -> "PartitionSpec":
        return PartitionSpec(tuple(PartitionField.from_dict(d) for d in lst))


@dataclass(frozen=True)
class SortField:
    column: str
    descending: bool = False


@dataclass(frozen=True)
class SortOrder:
    fields: tuple[SortField, ...] = ()

    @staticmethod
    def by(*cols: str) -> "SortOrder":
        return SortOrder(tuple(SortField(c) for c in cols))

    def to_list(self) -> list[dict]:
        return [{"column": f.column, "descending": f.descending} for f in self.fields]

    @staticmethod
    def from_list(lst: list[dict]) -> "SortOrder":
        return SortOrder(tuple(SortField(d["column"], d.get("descending", False)) for d in lst))


# Default write properties mirror the reference policy constants
# (ops/maintenance_system.py:58-60,139; production_bootstrap.py:238).
DEFAULT_PROPERTIES = {
    "write.target-file-size-bytes": str(256 * 1024 * 1024),
    "compact.small-file-bytes": str(64 * 1024 * 1024),
    "snapshot.retention-days": "30",
    "snapshot.keep-last-n": "5",
}


@dataclass
class TableSpec:
    """Everything needed to create a table (schema passed separately)."""

    partition_spec: PartitionSpec = field(default_factory=PartitionSpec.unpartitioned)
    sort_order: SortOrder = field(default_factory=SortOrder)
    properties: dict[str, str] = field(default_factory=dict)

    def merged_properties(self) -> dict[str, str]:
        props = dict(DEFAULT_PROPERTIES)
        props.update(self.properties)
        return props
