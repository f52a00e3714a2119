"""Blue/green serving for the index tier: named refs + hardlink clones.

``SearchIndex.reshard`` / ``VectorIndex.retrain`` grow capacity with an
atomic staged swap, but the install itself has a brief window where the
live data directory is mid-rename — acceptable in a single-writer
maintenance window, not for a serving replica that must answer every
query. The production pattern (Elasticsearch index aliases, Iceberg
branch flips — the same shape as ``tables/snapshots.py`` refs) is
BLUE/GREEN:

    refs = ServingRefs(dir)
    refs.set_ref("prod", blue_root)            # serving reads resolve here
    green = clone_index(blue_root, green_root) # O(files) hardlinks
    SearchIndex(spark, green_root, ...).reshard(256)   # blue untouched
    refs.set_ref("prod", green_root)           # atomic flip
    shutil.rmtree(blue_root)                   # after draining readers

``clone_index`` is cheap because both index classes are
REPLACE-ON-WRITE: compaction, apply_deletes, merge, reshard and retrain
all stage new files and swap directories — no file is ever modified in
place — so hardlinked clones share bytes safely (a rewrite in either
tree breaks the link, never the sibling). Deletion sidecars and the
metadata sidecar are copied, not linked: they are the only files whose
logical content diverges between the trees immediately.

Reference analogue: the reference serves its marts through dbt's
view-over-table indirection (a rebuilt table swaps under a stable view
name); this is the same stable-name-over-swappable-storage contract for
the index tier.
"""

from __future__ import annotations

import json
import os
import shutil

_TORN_KEYS = ("consumed_by", "pending_merge", "pending_reshard", "pending_retrain")


def clone_index(src_root: str, dst_root: str) -> str:
    """Clone a QUIESCENT serving index with hardlinks — O(files) link
    syscalls, zero bytes copied for the data tree (falls back to copy
    across filesystems). Refuses a torn source (a mid-merge/mid-growth
    tree has files whose meaning depends on a marker that resume would
    mutate in exactly one of the clones — heal first, then clone).
    ``_meta.json`` and the ``_deletes`` sidecars are real copies: both
    trees mutate them independently from the first append/erase on."""
    meta_path = os.path.join(src_root, "_meta.json")
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(f"no index at {src_root} — nothing to clone")
    torn = [k for k in _TORN_KEYS if meta.get(k)]
    if torn:
        raise ValueError(
            f"index at {src_root} is torn ({', '.join(torn)}) — heal it "
            "(re-call the pending op / open a handle) before cloning"
        )
    if os.path.exists(dst_root) and os.listdir(dst_root):
        raise FileExistsError(f"clone target {dst_root} is not empty")
    for dirpath, _dirs, files in os.walk(src_root):
        rel = os.path.relpath(dirpath, src_root)
        tgt_dir = dst_root if rel == "." else os.path.join(dst_root, rel)
        os.makedirs(tgt_dir, exist_ok=True)
        # sidecar trees diverge between clones from the first mutation —
        # copy them; everything else shares bytes via hardlinks
        copy_tree = rel == "." or rel.split(os.sep, 1)[0] == "_deletes"
        for f in files:
            src = os.path.join(dirpath, f)
            dst = os.path.join(tgt_dir, f)
            if f == "_meta.json" or (copy_tree and rel != "."):
                shutil.copy2(src, dst)
            elif rel == ".":
                # stray root-level files (markers were refused above)
                shutil.copy2(src, dst)
            else:
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)
    return dst_root


class ServingRefs:
    """Atomic name → index-root indirection (``_serving_refs.json``,
    tmp+fsync+rename like every sidecar in the repo): serving code
    resolves the name per query batch, maintenance flips it once. The
    flip is a single ``os.replace`` — a reader sees the old root or the
    new root, never a torn in-between."""

    def __init__(self, dir_path: str) -> None:
        os.makedirs(dir_path, exist_ok=True)
        self._path = os.path.join(dir_path, "_serving_refs.json")

    def refs(self) -> dict[str, str]:
        try:
            with open(self._path) as f:
                return dict(json.load(f))
        except FileNotFoundError:
            return {}

    def _write(self, refs: dict[str, str]) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(refs, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path)

    def set_ref(self, name: str, root: str) -> None:
        if not os.path.exists(os.path.join(root, "_meta.json")):
            raise FileNotFoundError(f"no index at {root} — refusing to ref it")
        refs = self.refs()
        refs[name] = os.path.abspath(root)
        self._write(refs)

    def resolve(self, name: str) -> str:
        refs = self.refs()
        if name not in refs:
            raise KeyError(f"no serving ref {name!r}")
        return refs[name]

    def drop_ref(self, name: str) -> None:
        refs = self.refs()
        refs.pop(name, None)
        self._write(refs)
