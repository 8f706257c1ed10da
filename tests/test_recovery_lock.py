"""Recovery lease: mutual exclusion between compaction swaps and the
marker-driven recovery every engine/builder open runs.

The race this pins closed: a reader opening while a writer is mid-swap
(marker present BY DESIGN) used to execute the same swap concurrently
— interleaved rmtree/rename could consume the staged bucket on one
side and fail the move on the other, losing the bucket entirely.
"""

import json
import threading
import time

import pytest

from sotohp_spark import fsio
from sotohp_spark.index.build import (
    compact_marker_path,
    recover_pending_compact,
    recovery_lock,
    recovery_lock_path,
    require_atomic_rename,
)


def test_create_exclusive_local_and_uri(spark, tmp_path):
    p = str(tmp_path / "a.lock")
    assert fsio.create_exclusive(spark, p, "one") is True
    assert fsio.create_exclusive(spark, p, "two") is False
    assert fsio.read_text(spark, p) == "one"

    u = f"file://{tmp_path}/b.lock"
    assert fsio.create_exclusive(spark, u, "one") is True
    assert fsio.create_exclusive(spark, u, "two") is False
    assert fsio.read_text(spark, u) == "one"


def test_lock_excludes_and_times_out(spark, tmp_path):
    idx = str(tmp_path / "idx")
    with recovery_lock(spark, idx):
        assert fsio.exists(spark, recovery_lock_path(idx))
        with pytest.raises(TimeoutError):
            with recovery_lock(spark, idx, stale_sec=999, timeout_sec=0.4):
                pass
    # released on exit; re-acquirable
    assert not fsio.exists(spark, recovery_lock_path(idx))
    with recovery_lock(spark, idx):
        pass


def test_stale_lock_is_broken(spark, tmp_path):
    idx = str(tmp_path / "idx2")
    fsio.create_exclusive(
        spark, recovery_lock_path(idx),
        json.dumps({"pid": 1, "ts": time.time() - 1000}),
    )
    t0 = time.time()
    with recovery_lock(spark, idx, stale_sec=120, timeout_sec=5):
        pass  # acquired by breaking the orphan, without waiting it out
    assert time.time() - t0 < 5


def test_reader_waits_out_writer_then_skips_recovery(spark, tmp_path):
    """A reader that sees the writer's marker must WAIT on the lease
    and, once the writer finished (marker gone), do nothing — never
    execute the swap the writer is running."""
    idx = str(tmp_path / "idx3")
    marker = compact_marker_path(idx)
    entered = threading.Event()

    def writer():
        with recovery_lock(spark, idx):
            fsio.write_text_atomic(spark, marker, "{}")
            entered.set()
            time.sleep(0.8)  # reader arrives inside this window
            fsio.remove(spark, marker)

    t = threading.Thread(target=writer)
    t.start()
    entered.wait(timeout=5)
    # marker IS present; without the lease this would run the swap
    # concurrently with the writer.  With it: wait, re-check, no-op.
    assert recover_pending_compact(spark, idx) is False
    t.join()
    assert not fsio.exists(spark, marker)


def test_atomic_rename_detection_and_guard(tmp_path):
    assert fsio.atomic_rename_supported(str(tmp_path))
    assert fsio.atomic_rename_supported("file:///tmp/x")
    assert fsio.atomic_rename_supported("hdfs://nn/x")
    assert not fsio.atomic_rename_supported("s3a://bucket/x")
    assert not fsio.atomic_rename_supported("gs://bucket/x")
    require_atomic_rename(str(tmp_path), "test")  # no raise
    with pytest.raises(ValueError, match="atomic-rename"):
        require_atomic_rename("s3a://bucket/idx", "compact swap")
