"""NRT index replication — the Lucene replicator re-expressed
(reference lucene/replicator/src/java/org/apache/lucene/replicator/
IndexReplicationHandler.java:48 and nrt/ReplicaNode.java:66): a replica
syncs the primary's LAST COMMIT POINT by copying only the files it is
missing, then publishes the new manifest (the segments_N analog) LAST —
a reader opened on the replica after `replicate` returns always sees a
complete, consistent point-in-time commit, and a crash mid-sync leaves
only invisible extra files (the same crash contract as the tiered
writer: manifest['gens'] is the live set).

What ships is exactly the searcher-visible artifact set:

  - postings generations — IMMUTABLE once published (the tiered block
    invariant), so they sync copy-if-absent, like Lucene segment files
    which are write-once and copied only when the replica lacks them
    (ReplicaNode.launchPreCopyFiles);
  - tombstone batches (`deletes/batch_*`) — append-only, copy-if-absent;
  - docvalues generations — immutable gens, copy-if-absent;
  - terms / docmap / stats / lineage — REWRITTEN by refresh (like
    Lucene's per-commit .si/liveDocs rewrites), so they re-ship fully
    each sync into a temp dir and swap in.

Writer-private state never replicates (runs/, inverted_stream/,
state.json, _checkpoint/, deletes_staging/, terms_gens/): replication
ships committed read artifacts, never the writer's buffers — a replica
is a SEARCH node, not a failover writer (Lucene's replicator makes the
same split; promote a replica by re-indexing or by shipping the writer
state explicitly).

Scale note: copies here are driver-side file ops on a local directory
tree; on a real deployment the identical manifest-diff plan drives
object-store server-side copies (S3 CopyObject batches / DistCp), which
is where 100 TB of postings actually move — the portable part is the
PLAN: diff against the replica's manifest, copy immutable dirs that are
missing, re-ship mutable small tables, publish the manifest last."""

from __future__ import annotations

import json
import os
import shutil

# mutable, refresh-rewritten artifacts: full re-ship + swap each sync.
# termvectors (the doc-major side table) and ivf (the trained vector
# index) are rebuilt wholesale by their writers, so they re-ship too —
# a replica must serve term_vector()/ivf_search() like the primary
_MUTABLE_DIRS = ("terms", "docmap", "stats", "lineage", "termvectors", "ivf")
# append-only / generational artifact roots: copy-if-absent per child
_APPEND_ROOTS = ("deletes", "docvalues")


def _atomic_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _swap_in(src: str, dst: str) -> None:
    """Replace dst dir with a copy of src via a sibling temp + rename."""
    tmp = dst + ".sync_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    old = dst + ".sync_old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(dst):
        os.replace(dst, old)
    os.replace(tmp, dst)
    shutil.rmtree(old, ignore_errors=True)


def replicate(src_dir: str, dst_dir: str) -> dict:
    """Sync the replica at ``dst_dir`` to the primary's current commit
    point. Idempotent; incremental (immutable generations already
    present are skipped). Returns {"copied": [...], "skipped": [...],
    "manifest": <published manifest>} with repo-relative paths."""
    mpath = os.path.join(src_dir, "manifest.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"{src_dir} has no manifest.json — nothing is committed yet"
        )
    with open(mpath) as f:
        manifest = json.load(f)
    os.makedirs(dst_dir, exist_ok=True)
    copied: list[str] = []
    skipped: list[str] = []

    # -- postings: immutable once published ------------------------------
    if manifest.get("incremental"):
        # tiered: only the ACTIVE generations are part of the commit
        for g in manifest.get("gens", []):
            rel = os.path.join("postings", f"gen={g}")
            sp, dp = os.path.join(src_dir, rel), os.path.join(dst_dir, rel)
            if os.path.isdir(dp):
                skipped.append(rel)
            else:
                shutil.copytree(sp, dp)
                copied.append(rel)
        # stale replica gens (compacted away on the primary) stay on
        # disk but are invisible: the new manifest's gens list prunes
        # them at read time, exactly like the primary's crash contract
    else:
        # batch layout: the postings dir IS the single generation; a
        # batch rebuild changes the manifest identity, so re-ship when
        # the commit differs (cheap check: manifest equality)
        rel = "postings"
        dmp = os.path.join(dst_dir, "manifest.json")
        same = False
        if os.path.exists(dmp):
            with open(dmp) as f:
                same = json.load(f) == manifest
        if same and os.path.isdir(os.path.join(dst_dir, rel)):
            skipped.append(rel)
        else:
            _swap_in(os.path.join(src_dir, rel), os.path.join(dst_dir, rel))
            copied.append(rel)

    # -- append-only / generational roots --------------------------------
    # terminal artifact dirs (tombstone batches `deletes/batch_*`, dv
    # generations `docvalues/<field>/gen=N`) are immutable parquet dirs:
    # present on the replica => skip wholesale, absent => copytree
    def _is_artifact(base: str, files: list[str]) -> bool:
        return any(f.endswith(".parquet") or f == "_SUCCESS" for f in files)

    for root in _APPEND_ROOTS:
        sroot = os.path.join(src_dir, root)
        if not os.path.isdir(sroot):
            continue
        for base, dirs, files in os.walk(sroot):
            rel = os.path.relpath(base, src_dir)
            if _is_artifact(base, files):
                dirs[:] = []  # never descend into an artifact dir
                dp = os.path.join(dst_dir, rel)
                if os.path.isdir(dp):
                    skipped.append(rel)
                else:
                    shutil.copytree(base, dp)
                    copied.append(rel)
            else:
                os.makedirs(os.path.join(dst_dir, rel), exist_ok=True)

    # -- mutable rewritten tables ----------------------------------------
    for root in _MUTABLE_DIRS:
        sroot = os.path.join(src_dir, root)
        if os.path.isdir(sroot):
            _swap_in(sroot, os.path.join(dst_dir, root))
            copied.append(root)

    # -- publish: manifest LAST (the commit point) ------------------------
    _atomic_json(os.path.join(dst_dir, "manifest.json"), manifest)
    return {"copied": copied, "skipped": skipped, "manifest": manifest}
