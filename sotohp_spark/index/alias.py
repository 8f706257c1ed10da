"""Index aliases — the ES ``_aliases`` operational analog: a stable
name whose target index can be swapped ATOMICALLY, so serving code
opens "transcripts-live" while builds/restores happen on versioned
paths (blue/green reindex, instant snapshot rollback — the pattern ES
documents for zero-downtime reindexing).

An alias is one small JSON file `{"index": <path>, "version": n}`
written through fsio.write_text_atomic (write-then-rename locally,
FileSystem overwrite on HDFS/S3A) — readers resolve either the old or
the new target, never a torn file.  Writes are LAST-WRITER-WINS (like
the ES aliases API): the version field is informational (read-bump-
write, no compare-and-set), so two racing swaps may write the same
version number and the "previous target" each returns is only a
valid rollback handle for the swap that actually landed last —
serialize swaps in the deployment pipeline, not here.

Composition: `snapshot_index` an index, build/restore a candidate at
a NEW path, validate it, then `swap_alias` — serving traffic moves in
one rename; the previous target stays intact for instant rollback
(swap back).
"""

from __future__ import annotations

import json
import logging

from sotohp_spark import fsio

log = logging.getLogger(__name__)


def write_alias(spark, alias_path: str, index_path: str) -> dict:
    """Create or overwrite an alias pointing at ``index_path``.
    The target must look like an index (its ``_meta`` must exist) —
    an alias can never point at nothing."""
    index_path = index_path.rstrip("/")
    if not fsio.exists(spark, f"{index_path}/_meta/meta.json"):
        raise ValueError(
            f"{index_path} is not a built index (no _meta/meta.json)"
        )
    version = 0
    try:
        version = int(
            json.loads(fsio.read_text(spark, alias_path)).get(
                "version", 0
            )
        ) + 1
    except (FileNotFoundError, ValueError):
        pass
    body = {"index": index_path, "version": version}
    fsio.write_text_atomic(spark, alias_path, json.dumps(body))
    log.info("alias %s -> %s (v%d)", alias_path, index_path, version)
    return body


def resolve_alias(spark, alias_path: str) -> str:
    """The alias's current target index path."""
    try:
        body = json.loads(fsio.read_text(spark, alias_path))
    except FileNotFoundError:
        raise ValueError(f"no alias at {alias_path}") from None
    return body["index"]


def swap_alias(spark, alias_path: str, new_index_path: str) -> str:
    """Atomically repoint an EXISTING alias; returns the previous
    target (kept intact — the instant-rollback handle, valid when
    this swap is the last writer; see module doc on races).  The new
    target is validated before the swap, so a half-restored index can
    never take traffic."""
    old = resolve_alias(spark, alias_path)
    write_alias(spark, alias_path, new_index_path)
    return old


def open_alias(spark, alias_path: str, **engine_kwargs):
    """QueryEngine over the alias's CURRENT target.  Each open
    re-resolves — a long-lived service re-opens after a swap (the ES
    client model: the alias is resolved per request, the engine is
    bound per open)."""
    from sotohp_spark.index.query import QueryEngine

    return QueryEngine(
        spark, resolve_alias(spark, alias_path), **engine_kwargs
    )
