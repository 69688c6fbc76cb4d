"""Table metadata: snapshots + schema + specs, with atomic commits.

Layout per table (Hadoop-catalog style — reference's analog is the
PyIceberg SQL catalog over file:// warehouse, catalogs/local.yaml:1-4):

    <table_root>/
      metadata/
        v00000001.metadata.json      # immutable, one per commit
        version-hint.text            # pointer to current version (atomic rename)
        manifest-<n>-<uuid>.parquet  # manifest files (see manifests.py)
      data/...                       # parquet data files
      _staging/...                   # two-phase-commit scratch

Commit protocol (optimistic concurrency):
  1. read version-hint -> N, load vN
  2. build vN+1 metadata
  3. create vN+1.metadata.json with O_EXCL (loser of a race gets
     FileExistsError and retries)
  4. atomically rename a tmp file over version-hint.text

A crash between data-file write and step 3 leaves orphan files in
_staging/ but never a corrupt table — the same guarantee the reference's
staged-commit flow aims at (ops/commit_staged_files.py:47-88, orphan
detection ops/fix_iceberg_registration.py:45-74).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

METADATA_DIR = "metadata"
VERSION_HINT = "version-hint.text"


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    sequence_number: int
    timestamp_ms: int
    operation: str  # append | overwrite | replace | delete | expire
    manifests: list[str]  # manifest file names (relative to metadata/)
    summary: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "snapshot_id": self.snapshot_id,
            "parent_id": self.parent_id,
            "sequence_number": self.sequence_number,
            "timestamp_ms": self.timestamp_ms,
            "operation": self.operation,
            "manifests": self.manifests,
            "summary": self.summary,
        }

    @staticmethod
    def from_dict(d: dict) -> "Snapshot":
        return Snapshot(
            d["snapshot_id"],
            d.get("parent_id"),
            d["sequence_number"],
            d["timestamp_ms"],
            d["operation"],
            list(d["manifests"]),
            dict(d.get("summary", {})),
        )


@dataclass
class TableMetadata:
    table_uuid: str
    location: str  # absolute table root
    schema_json: str  # Spark StructType JSON
    schema_fields: list[dict]  # [{id, name}] — additive-evolution bookkeeping
    partition_spec: list[dict]
    sort_order: list[dict]
    properties: dict[str, str]
    current_snapshot_id: int | None = None
    snapshots: list[Snapshot] = field(default_factory=list)
    last_sequence_number: int = 0
    version: int = 0  # metadata file version (set on load/commit)
    # named refs (Iceberg table-refs analog): tag name → snapshot id.
    # Tags pin snapshots against expiry and give scans stable names
    # ("prod-cut") independent of snapshot ids.
    refs: dict[str, int] = field(default_factory=dict)
    # ref names that are BRANCHES (advanceable heads for write-audit-publish)
    # rather than immutable tags; every branch name also appears in refs.
    branches: list[str] = field(default_factory=list)

    # ---- snapshot helpers -------------------------------------------------
    def snapshot_by_id(self, snapshot_id: int) -> Snapshot:
        for s in self.snapshots:
            if s.snapshot_id == snapshot_id:
                return s
        raise KeyError(f"snapshot {snapshot_id} not found (expired or never existed)")

    def current_snapshot(self) -> Snapshot | None:
        if self.current_snapshot_id is None:
            return None
        return self.snapshot_by_id(self.current_snapshot_id)

    def snapshot_as_of(self, timestamp_ms: int) -> Snapshot:
        eligible = [s for s in self.snapshots if s.timestamp_ms <= timestamp_ms]
        if not eligible:
            raise KeyError(f"no snapshot at or before {timestamp_ms}")
        return max(eligible, key=lambda s: s.sequence_number)

    def new_snapshot(self, operation: str, manifests: list[str], summary: dict) -> Snapshot:
        snap = Snapshot(
            snapshot_id=self.last_sequence_number + 1,
            parent_id=self.current_snapshot_id,
            sequence_number=self.last_sequence_number + 1,
            timestamp_ms=int(time.time() * 1000),
            operation=operation,
            manifests=manifests,
            summary=summary,
        )
        return snap

    def apply_snapshot(self, snap: Snapshot) -> None:
        self.snapshots.append(snap)
        self.current_snapshot_id = snap.snapshot_id
        self.last_sequence_number = snap.sequence_number

    # ---- serde ------------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "format": "ocel-ocpn-lakehouse-spark/1",
                "table_uuid": self.table_uuid,
                "location": self.location,
                "schema_json": self.schema_json,
                "schema_fields": self.schema_fields,
                "partition_spec": self.partition_spec,
                "sort_order": self.sort_order,
                "properties": self.properties,
                "current_snapshot_id": self.current_snapshot_id,
                "snapshots": [s.to_dict() for s in self.snapshots],
                "last_sequence_number": self.last_sequence_number,
                "refs": self.refs,
                "branches": self.branches,
            },
            indent=1,
        )

    @staticmethod
    def from_json(text: str, version: int) -> "TableMetadata":
        d = json.loads(text)
        md = TableMetadata(
            table_uuid=d["table_uuid"],
            location=d["location"],
            schema_json=d["schema_json"],
            schema_fields=d["schema_fields"],
            partition_spec=d["partition_spec"],
            sort_order=d["sort_order"],
            properties=d["properties"],
            current_snapshot_id=d.get("current_snapshot_id"),
            snapshots=[Snapshot.from_dict(s) for s in d.get("snapshots", [])],
            last_sequence_number=d.get("last_sequence_number", 0),
            version=version,
            refs={k: int(v) for k, v in d.get("refs", {}).items()},
            branches=list(d.get("branches", [])),
        )
        return md


# ---- filesystem-level load/commit ------------------------------------------


def metadata_dir(table_root: str) -> str:
    return os.path.join(table_root, METADATA_DIR)


def _version_path(table_root: str, version: int) -> str:
    return os.path.join(metadata_dir(table_root), f"v{version:08d}.metadata.json")


def current_version(table_root: str) -> int | None:
    hint = os.path.join(metadata_dir(table_root), VERSION_HINT)
    try:
        with open(hint) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def load_metadata(table_root: str, version: int | None = None) -> TableMetadata:
    if version is None:
        version = current_version(table_root)
        if version is None:
            raise FileNotFoundError(f"no table at {table_root}")
    with open(_version_path(table_root, version)) as f:
        return TableMetadata.from_json(f.read(), version)


def commit_metadata(table_root: str, md: TableMetadata, expected_version: int) -> TableMetadata:
    """CAS-commit: write metadata as version expected_version+1.

    Raises ConflictError if another writer committed first.
    """
    new_version = expected_version + 1
    mdir = metadata_dir(table_root)
    os.makedirs(mdir, exist_ok=True)
    path = _version_path(table_root, new_version)
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(md.to_json())
        f.flush()
        os.fsync(f.fileno())
    try:
        # O_EXCL-style CAS: hard-link tmp into place; fails if path exists.
        os.link(tmp, path)
    except FileExistsError as e:
        os.unlink(tmp)
        raise ConflictError(f"concurrent commit at version {new_version}") from e
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    # Pointer update: atomic rename (overwrite allowed — path content is
    # derivable by listing versions; hint is an optimization).
    hint = os.path.join(mdir, VERSION_HINT)
    hint_tmp = hint + f".tmp-{uuid.uuid4().hex}"
    with open(hint_tmp, "w") as f:
        f.write(str(new_version))
        f.flush()
        os.fsync(f.fileno())
    os.rename(hint_tmp, hint)
    md.version = new_version
    return md


class ConflictError(RuntimeError):
    pass
