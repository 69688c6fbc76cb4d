"""Optimistic-concurrency retry for maintenance commits.

The commit layer is deliberately fail-fast: commit_replace /
commit_delete_vectors raise ConflictError whenever a concurrent commit
invalidated the plan (file rewritten or dropped, tombstone set grown,
table moved past a pinned snapshot). That is the correct ATOMIC behavior —
never the data — but a production scheduler wants the Iceberg semantics on
top: refresh, REPLAN against the new table state, and try again
(Iceberg's ``commit.retry.num-retries``; full replans here because every
conflict class we raise invalidates the plan itself, not just the
metadata pointer).

Every maintenance entrypoint already replans from the CURRENT snapshot
when invoked fresh (execute_compaction(groups=None), execute_cluster,
merge_into), and plan/group identity includes the inputs' delete-vector
state, so a retried attempt can never resume stale outputs (see
compact._group_id). The helper below is therefore just the loop + refresh
discipline.
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

from ..core import metadata as meta

T = TypeVar("T")


def run_with_conflict_retry(
    attempt: Callable[[], T],
    table,
    retries: int = 2,
    backoff_s: float = 0.0,
) -> T:
    """Run ``attempt`` (a maintenance op that plans from the table's CURRENT
    state), refreshing the table and retrying on ConflictError up to
    ``retries`` times. Raises the last ConflictError when exhausted —
    persistent conflict means a live writer feud the operator must see."""
    last: meta.ConflictError | None = None
    for i in range(retries + 1):
        if i and backoff_s:
            time.sleep(backoff_s * i)
        try:
            return attempt()
        except meta.ConflictError as e:
            last = e
            table.refresh()
    assert last is not None
    raise last
