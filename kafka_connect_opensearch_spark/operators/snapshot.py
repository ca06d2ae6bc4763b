"""Index lifecycle operations: aliases and snapshot/restore.

OpenSearch counterparts: the ``_aliases`` API (atomic alias swap — the
zero-downtime reindex pattern the connector's users rely on when a
mapping changes) and the ``_snapshot`` API (point-in-time copies).
Spark-first re-cast: an index is a directory whose manifest names its
active segments, so

- an **alias** is a one-line JSON pointer file; ``swap_alias`` writes it
  atomically (tmp + rename), so readers resolving the alias see either
  the old or the new index, never a torn state — exactly the _aliases
  atomicity contract;
- a **snapshot** is a file-level copy of the index directory taken from
  its committed state. Manifest commits are atomic renames, so a
  snapshot is always a consistent point-in-time image (a concurrent
  in-flight batch simply isn't in the copied manifest — same contract as
  an OpenSearch snapshot of committed segments). Restore materializes
  the copy at a target path; the restored index is independent (later
  merges/deletes on the source don't touch it).

No per-row data movement happens on the driver — these are metadata /
filesystem ops, O(index files), exactly like the reference's delegated
cluster APIs.
"""

from __future__ import annotations

import json
import os
import shutil


def create_alias(aliases_dir: str, alias: str, index_dir: str) -> None:
    """Point ``alias`` at ``index_dir`` (atomic create-or-replace)."""
    os.makedirs(aliases_dir, exist_ok=True)
    path = os.path.join(aliases_dir, f"{alias}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"index": os.path.abspath(index_dir)}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def resolve_alias(aliases_dir: str, alias: str) -> str:
    """The index dir an alias points at (KeyError if absent)."""
    path = os.path.join(aliases_dir, f"{alias}.json")
    if not os.path.exists(path):
        raise KeyError(f"alias {alias!r} does not exist")
    with open(path) as f:
        return json.load(f)["index"]


def swap_alias(aliases_dir: str, alias: str, new_index_dir: str) -> str:
    """Atomically repoint ``alias``; returns the previous target (the
    _aliases remove+add action pair, one atomic rename here)."""
    old = resolve_alias(aliases_dir, alias)
    create_alias(aliases_dir, alias, new_index_dir)
    return old


def list_aliases(aliases_dir: str) -> dict[str, str]:
    if not os.path.isdir(aliases_dir):
        return {}
    out = {}
    for fn in sorted(os.listdir(aliases_dir)):
        if fn.endswith(".json"):
            with open(os.path.join(aliases_dir, fn)) as f:
                out[fn[:-5]] = json.load(f)["index"]
    return out


def snapshot_index(index_dir: str, snapshot_dir: str) -> dict:
    """Point-in-time copy of a committed index; returns a small summary.

    The copy is taken file-by-file; because every manifest commit is an
    atomic rename, the copied manifest set names only fully-written
    segments — the snapshot is consistent without pausing writers."""
    if os.path.exists(snapshot_dir):
        raise FileExistsError(f"snapshot target exists: {snapshot_dir}")
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        raise FileNotFoundError(f"not an index: {index_dir}")
    shutil.copytree(index_dir, snapshot_dir)
    n_files = sum(len(fs) for _, _, fs in os.walk(snapshot_dir))
    return {"source": os.path.abspath(index_dir),
            "snapshot": os.path.abspath(snapshot_dir),
            "files": n_files}


def restore_index(snapshot_dir: str, target_dir: str) -> str:
    """Materialize a snapshot as an independent index at ``target_dir``."""
    if os.path.exists(target_dir):
        raise FileExistsError(f"restore target exists: {target_dir}")
    if not os.path.exists(os.path.join(snapshot_dir, "meta.json")):
        raise FileNotFoundError(f"not a snapshot: {snapshot_dir}")
    shutil.copytree(snapshot_dir, target_dir)
    return target_dir
