"""Index snapshot / restore — the ES ``_snapshot`` operational analog
for the parquet index leg (the reference's operational tier keeps
restorable state the same way its ingest keeps checkpoints;
cf. `MediaServiceLive.scala` sync/recovery around its stores).

A snapshot is a plain directory: every index file copied verbatim
plus a ``_snapshot_manifest.json`` listing (relative path, size) for
each file.  Write order is the commit protocol:

  1. data files (postings / term_stats / docs / deletes / ...),
  2. ``_meta`` (the index's own commit point) LAST among files,
  3. the manifest last of all — a snapshot without a manifest is
     invisible to verify/restore, so a crashed snapshot can never be
     restored half-written.

Consistency: the copy runs under the index's ``recovery_lock`` (the
same lease compaction swaps hold), refuses while any
``_meta/pending_*.json`` marker exists — an in-flight append/delete
must first be recovered by opening the index (builder/engine open
runs marker recovery) — and, because appends/deletes commit WITHOUT
that lock, re-verifies after the copy that the file listing and the
meta.json bytes are unchanged, aborting (manifest never written) if a
mutation landed mid-copy.  Everything goes through ``fsio``, so the same
code snapshots a local tree or an HDFS/S3A prefix; at 100 TB the
per-file copies are embarrassingly parallel and FileUtil.copy can be
swapped for a distcp-style job without touching the manifest format.
"""

from __future__ import annotations

import json
import logging

from sotohp_spark import fsio
from sotohp_spark.index.build import recovery_lock

log = logging.getLogger(__name__)

MANIFEST = "_snapshot_manifest.json"


def _rel_files(spark, path: str) -> list:
    return [
        (rel, size)
        for rel, size in fsio.list_files(spark, path)
        if rel != MANIFEST and not rel.endswith("._recovery.lock")
    ]


def snapshot_index(spark, index_path: str, snapshot_path: str) -> dict:
    """Point-in-time copy of a parquet index (see module doc).

    Returns the manifest dict.  Raises if the destination already
    holds a manifest (snapshots are immutable — pick a new path) or
    if the index has pending mutation markers (open the index once to
    run recovery, then snapshot)."""
    index_path = index_path.rstrip("/")
    snapshot_path = snapshot_path.rstrip("/")
    if fsio.exists(spark, f"{snapshot_path}/{MANIFEST}"):
        raise ValueError(
            f"snapshot already exists at {snapshot_path} "
            "(snapshots are immutable — use a fresh path)"
        )
    with recovery_lock(spark, index_path):
        pending = fsio.glob(
            spark, f"{index_path}/_meta/pending_*.json"
        )
        if pending:
            raise RuntimeError(
                f"index has in-flight mutation markers {pending} — "
                "open it once (marker recovery runs at open), then "
                "snapshot"
            )
        files = _rel_files(spark, index_path)
        if not any(rel.startswith("_meta/") for rel, _ in files):
            raise ValueError(f"{index_path} is not an index (no _meta)")
        # data first, _meta last: a torn copy can never carry a
        # commit point for files that are not all there yet
        ordered = (
            [f for f in files if not f[0].startswith("_meta/")]
            + [f for f in files if f[0].startswith("_meta/")]
        )
        meta_before = fsio.read_text(
            spark, f"{index_path}/_meta/meta.json"
        )
        for rel, _size in ordered:
            fsio.copy_file(
                spark, f"{index_path}/{rel}", f"{snapshot_path}/{rel}"
            )
        # torn-copy detection: the recovery lock only excludes
        # compaction swaps — appends/deletes commit without it, so a
        # mutation landing mid-copy must fail the snapshot BEFORE the
        # manifest makes it visible.  Re-list and byte-compare the
        # commit point; any divergence aborts (the partial copy stays
        # invisible: no manifest, verify/restore refuse it).
        after = _rel_files(spark, index_path)
        meta_after = fsio.read_text(
            spark, f"{index_path}/_meta/meta.json"
        )
        if after != files or meta_after != meta_before:
            raise RuntimeError(
                f"index {index_path} changed during the snapshot copy "
                "— a concurrent append/delete committed mid-copy; "
                "retry on a quiescent index (the partial snapshot has "
                "no manifest and is invisible)"
            )
        manifest = {
            "source": index_path,
            "files": [[rel, size] for rel, size in files],
            "n_files": len(files),
            "total_bytes": sum(s for _, s in files),
        }
        fsio.write_text_atomic(
            spark, f"{snapshot_path}/{MANIFEST}",
            json.dumps(manifest, indent=1),
        )
        log.info(
            "snapshot %s -> %s (%d files, %d bytes)", index_path,
            snapshot_path, manifest["n_files"], manifest["total_bytes"],
        )
        return manifest


def verify_snapshot(spark, snapshot_path: str) -> dict:
    """Check a snapshot against its manifest (presence + size of
    every file, no extras).  Returns the manifest; raises ValueError
    describing the first divergence."""
    snapshot_path = snapshot_path.rstrip("/")
    try:
        manifest = json.loads(
            fsio.read_text(spark, f"{snapshot_path}/{MANIFEST}")
        )
    except FileNotFoundError:
        raise ValueError(
            f"{snapshot_path} has no {MANIFEST} — not a completed "
            "snapshot"
        ) from None
    want = {rel: int(size) for rel, size in manifest["files"]}
    have = dict(_rel_files(spark, snapshot_path))
    missing = sorted(set(want) - set(have))
    extra = sorted(set(have) - set(want))
    if missing:
        raise ValueError(f"snapshot missing files: {missing[:5]}")
    if extra:
        raise ValueError(f"snapshot has unmanifested files: {extra[:5]}")
    for rel, size in want.items():
        if have[rel] != size:
            raise ValueError(
                f"snapshot file {rel} size {have[rel]} != "
                f"manifest {size}"
            )
    return manifest


def restore_index(spark, snapshot_path: str, dest_path: str,
                  overwrite: bool = False) -> dict:
    """Restore a snapshot into ``dest_path``: verify the manifest,
    copy into a staging sibling, then one directory move — on a
    rename-atomic filesystem the destination appears atomically (no
    reader can open a half-restored index).  ``overwrite=True``
    replaces an existing destination (its tree is removed AFTER the
    staging copy succeeded, never before).  On object stores (s3a/
    gs/abfs — rename is copy+delete) only FRESH-path restores are
    allowed, copied in commit order (data first, ``_meta`` last) so a
    concurrent open fails cleanly; replace a live index there by
    restoring to a new path and swapping an alias."""
    snapshot_path = snapshot_path.rstrip("/")
    dest_path = dest_path.rstrip("/")
    manifest = verify_snapshot(spark, snapshot_path)
    if fsio.exists(spark, dest_path) and not overwrite:
        raise ValueError(
            f"destination {dest_path} exists (pass overwrite=True)"
        )
    if not fsio.atomic_rename_supported(dest_path):
        # object stores rename by copy+delete — the staging move is
        # NOT atomic there.  A fresh-path restore is still safe
        # (manifest order: data first, _meta last — an engine open
        # mid-copy fails cleanly on the missing commit point), but
        # replacing a LIVE index in place is not; restore to a new
        # path and repoint the alias instead (index/alias.py).
        if fsio.exists(spark, dest_path):
            raise ValueError(
                f"{dest_path} is on a non-atomic-rename store and "
                "exists — restore to a FRESH path there and swap an "
                "alias (blue/green), never overwrite in place"
            )
        ordered = sorted(
            manifest["files"],
            key=lambda f: f[0].startswith("_meta/"),
        )
        for rel, _size in ordered:
            fsio.copy_file(
                spark, f"{snapshot_path}/{rel}", f"{dest_path}/{rel}"
            )
        log.info(
            "restored %s -> %s (%d files, object-store direct copy)",
            snapshot_path, dest_path, manifest["n_files"],
        )
        return manifest
    staging = dest_path + "._restore_tmp"
    if fsio.exists(spark, staging):
        fsio.rmtree(spark, staging)
    for rel, _size in manifest["files"]:
        fsio.copy_file(
            spark, f"{snapshot_path}/{rel}", f"{staging}/{rel}"
        )
    if fsio.exists(spark, dest_path):
        fsio.rmtree(spark, dest_path)
    fsio.move_dir(spark, staging, dest_path)
    log.info(
        "restored %s -> %s (%d files)", snapshot_path, dest_path,
        manifest["n_files"],
    )
    return manifest
