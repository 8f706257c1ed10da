"""Filesystem shim for index metadata, markers, and file moves.

The index's SMALL control-plane state (meta.json, pending-append /
pending-compact markers, staged-file moves) needs plain file ops that
work both on a local disk and on any Hadoop-visible filesystem
(hdfs://, s3a://, file://, ...).  Bulk data I/O stays with Spark's
readers/writers; this module covers only the control plane.

Dispatch rule: a path containing ``://`` goes through the Hadoop
FileSystem API (via the live SparkSession's JVM); anything else takes
the local os/shutil fast path.  ``file://`` URIs therefore exercise
the FS-API code end-to-end on a local disk — which is how the tests
pin this layer.

Atomicity note: ``write_text_atomic`` and ``rename_overwrite`` are
atomic on POSIX and HDFS (rename).  On S3-like object stores a Hadoop
rename is copy+delete — not atomic, which is exactly why the engine's
commit protocol never relies on rename atomicity alone: every
multi-file transition is guarded by a marker written BEFORE the moves
and reconciled by crash recovery on open (streaming/incremental.py).

Reference analog: the reference keeps all state in an in-process LMDB
(modules/core), so it never faced remote-storage commits; a
Spark-native engine whose index lives on shared storage must.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil


import re

_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:/")


def is_remote(path: str) -> bool:
    """True for any URI-schemed path — including the single-slash form
    (``file:/tmp/x``) that Hadoop's Path.toString() emits."""
    return "://" in path or bool(_SCHEME.match(path))


def _jfs(spark, path: str):
    """(FileSystem, Path, jvm) for a URI path."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), p, jvm


def exists(spark, path: str) -> bool:
    if not is_remote(path):
        return os.path.exists(path)
    fs, p, _ = _jfs(spark, path)
    return fs.exists(p)


def mkdirs(spark, path: str) -> None:
    if not is_remote(path):
        os.makedirs(path, exist_ok=True)
        return
    fs, p, _ = _jfs(spark, path)
    fs.mkdirs(p)


def read_text(spark, path: str) -> str:
    """Read a small text file; raises FileNotFoundError if absent."""
    if not is_remote(path):
        with open(path) as f:
            return f.read()
    fs, p, jvm = _jfs(spark, path)
    if not fs.exists(p):
        raise FileNotFoundError(path)
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text_atomic(spark, path: str, text: str) -> None:
    """Write-then-rename: readers never observe a torn file (POSIX and
    HDFS give atomic rename; object stores are covered by the marker
    protocol, see module docstring)."""
    if not is_remote(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        return
    fs, p, jvm = _jfs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(p):
        fs.delete(p, False)
    # Hadoop rename reports failure by RETURNING false, not raising —
    # a swallowed failure here would mean a commit protocol proceeding
    # without its marker/meta, which recovery could never see
    if not fs.rename(tmp, p):
        raise OSError(f"atomic write failed: rename {tmp} -> {path}")


def remove(spark, path: str, missing_ok: bool = True) -> None:
    """Delete one file."""
    if not is_remote(path):
        try:
            os.remove(path)
        except FileNotFoundError:
            if not missing_ok:
                raise
        return
    fs, p, _ = _jfs(spark, path)
    if fs.exists(p):
        fs.delete(p, False)
    elif not missing_ok:
        raise FileNotFoundError(path)


def rmtree(spark, path: str) -> None:
    """Recursive delete, missing ok."""
    if not is_remote(path):
        shutil.rmtree(path, ignore_errors=True)
        return
    fs, p, _ = _jfs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def rename_overwrite(spark, src: str, dst: str) -> None:
    """os.replace semantics: move src to dst, clobbering dst.
    src and dst must be on the same filesystem."""
    if not is_remote(src):
        os.replace(src, dst)
        return
    fs, sp, jvm = _jfs(spark, src)
    dp = jvm.org.apache.hadoop.fs.Path(dst)
    if fs.exists(dp):
        fs.delete(dp, False)
    if not fs.rename(sp, dp):
        raise OSError(f"rename failed: {src} -> {dst}")


def move_dir(spark, src: str, dst: str) -> None:
    """Move a directory tree; dst must not exist."""
    if not is_remote(src):
        shutil.move(src, dst)
        return
    fs, sp, jvm = _jfs(spark, src)
    dp = jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(sp, dp):
        raise OSError(f"move failed: {src} -> {dst}")


def glob(spark, pattern: str) -> list:
    """Paths matching a Hadoop glob pattern, sorted."""
    if not is_remote(pattern):
        return sorted(_glob.glob(pattern))
    fs, p, _ = _jfs(spark, pattern)
    statuses = fs.globStatus(p)
    if statuses is None:
        return []
    return sorted(st.getPath().toString() for st in statuses)
