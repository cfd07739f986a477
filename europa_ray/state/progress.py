"""Live in-flight progress — the SignalR progress-stream analog.

The reference pushes a notification to the UI every 100 processed items
while a pass is RUNNING (``/root/reference/Api/Implementations/
DuplicatesByHash/DuplicateByHashFinder.cs:146-171``, ``SimilarImages/
SimilarImageFinder.cs:265-282``). The engine's manifest counters (A8,
``state/manifest.py``) record per-stage totals only after a stage
completes; this module adds the in-flight stream a user can subscribe to
during a multi-hour run:

- ``ProgressTracker`` — a zero-CPU Ray actor holding per-stage row
  counters. Stages report with fire-and-forget ``incr.remote`` calls (one
  per BATCH, not per row — thousands of rows per message, so the actor is
  never a bottleneck; batching replaces the reference's per-100-items
  modulus).
- ``Progress.count_stage(ds, stage)`` — wraps a Dataset with a zero-copy
  pass-through ``map_batches`` that reports each batch's row count as it
  streams by. Inserted only when progress is requested; the pipeline DAG
  is unchanged otherwise.
- ``Progress.watch()`` — a daemon thread that polls the actor and emits a
  line whenever counters changed (rate-limited to ``interval`` seconds),
  via a callback or a text stream. This is the subscription surface: a
  SignalR hub, tqdm bar, or log shipper plugs in as ``sink``.

Scale posture: one actor total, one remote message per batch per counted
stage, state is a small dict — nothing grows with corpus size. On a
multi-node cluster the actor lives wherever Ray places it; counters are
commutative increments so message ordering doesn't matter.
"""

from __future__ import annotations

import sys
import threading
import time
from collections.abc import Callable

import pyarrow as pa


class _Tracker:
    """Actor body (wrapped by ``ray.remote`` lazily — importing this module
    must not require an initialized Ray)."""

    def __init__(self) -> None:
        self._counts: dict[str, int] = {}

    def incr(self, stage: str, n: int) -> None:
        self._counts[stage] = self._counts.get(stage, 0) + int(n)

    def snapshot(self) -> dict[str, int]:
        return dict(self._counts)


def _passthrough_count(batch: pa.Table, *, handle, stage: str) -> pa.Table:
    handle.incr.remote(stage, batch.num_rows)  # fire-and-forget
    return batch


class Progress:
    """Driver-side handle: owns the tracker actor and the watcher thread."""

    def __init__(self) -> None:
        import ray

        # default max_concurrency=1: calls are serialized, so the
        # read-modify-write in incr() needs no locking (a threaded actor
        # would race it and lose counts)
        self._actor = ray.remote(num_cpus=0)(_Tracker).remote()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def count_stage(self, ds, stage: str):
        """Wrap ``ds`` so every batch streaming through reports its row
        count under ``stage`` (zero-copy pass-through)."""
        return ds.map_batches(
            _passthrough_count,
            fn_kwargs={"handle": self._actor, "stage": stage},
            batch_format="pyarrow",
        )

    def incr(self, stage: str, n: int) -> None:
        """Driver-side increment for stages that complete as one step."""
        self._actor.incr.remote(stage, n)

    def snapshot(self) -> dict[str, int]:
        import ray

        return ray.get(self._actor.snapshot.remote())

    # -- subscription surface -------------------------------------------
    def watch(
        self,
        sink: Callable[[dict[str, int]], None] | None = None,
        *,
        out=None,
        interval: float = 1.0,
    ) -> "Progress":
        """Start the watcher: every ``interval`` seconds, if any counter
        changed, call ``sink(snapshot)`` (default: print one line to
        ``out`` / stderr). Use as a context manager::

            with progress.watch():
                near_dup_pipeline(files, progress=progress)
        """
        stream = out or sys.stderr

        def default_sink(snap: dict[str, int]) -> None:
            line = " ".join(f"{k}={v}" for k, v in sorted(snap.items()))
            print(f"progress {line}", file=stream, flush=True)

        emit = sink or default_sink

        def run() -> None:
            last: dict[str, int] = {}
            while not self._stop.is_set():
                snap = self.snapshot()
                if snap != last:
                    emit(snap)
                    last = snap
                self._stop.wait(interval)
            snap = self.snapshot()
            if snap != last:
                emit(snap)

        self._stop.clear()
        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return self

    def stop(self, *, drain_seconds: float = 5.0) -> None:
        """Stop the watcher. Worker ``incr`` messages are fire-and-forget,
        so first wait (bounded) for the counters to go quiet — two equal
        snapshots 100 ms apart — before the watcher's final flush."""
        if self._thread is not None:
            deadline = time.monotonic() + drain_seconds
            last = None
            while time.monotonic() < deadline:
                snap = self.snapshot()
                if snap == last:
                    break
                last = snap
                time.sleep(0.1)
            self._stop.set()
            self._thread.join(timeout=10.0)
            self._thread = None

    def close(self) -> None:
        """Stop the watcher and terminate the tracker actor (a long-lived
        driver constructing one Progress per run would otherwise accumulate
        idle actors). ``snapshot()`` is invalid after close."""
        import ray

        self.stop()
        ray.kill(self._actor)

    def __enter__(self) -> "Progress":
        if self._thread is None:
            self.watch()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
