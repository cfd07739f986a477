"""europa_ray — Ray-Data-native near-duplicate detection engine.

Importing the package applies a glibc malloc tuning that is load-bearing for
multi-worker throughput (see ``_tune_malloc``). The import runs inside every
Ray worker that deserializes our UDFs, so the tuning reaches all processes
without controlling how the driver called ``ray.init``.
"""

from __future__ import annotations


def _tune_malloc() -> None:
    """Raise glibc's mmap/trim thresholds so large NumPy temporaries are
    served from the reusable heap instead of fresh ``mmap``/``munmap`` pairs.

    The signature kernels allocate multi-MB scratch arrays per batch; with
    glibc defaults each allocation is a fresh mmap and each free a munmap,
    and the resulting page-fault + TLB-shootdown storm serializes on kernel
    locks across worker processes — measured 3× end-to-end slowdown at 16
    workers on this engine's signature stage (it *anti-scaled* past 4 CPUs).
    ``mallopt`` is per-process and must run before the hot path; package
    import time is early enough for Ray workers.
    """
    try:
        import ctypes
        import ctypes.util

        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        threshold = 256 * 1024 * 1024
        libc.mallopt(M_MMAP_THRESHOLD, threshold)
        libc.mallopt(M_TRIM_THRESHOLD, threshold)
    except Exception:
        pass  # non-glibc platform: harmless no-op


_tune_malloc()
