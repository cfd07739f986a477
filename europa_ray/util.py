"""Low-level deterministic hashing primitives (NumPy-vectorized).

The reference uses Blake3 for content identity and XxHash3-64 for compact
ids / dict hashcodes (``/root/reference/Core/Entities/Commons/HashComparer.cs:16-19``,
``Api/Client/QdrantRepository.cs:84``). This engine keeps the *semantics* —
a cryptographic content digest (sha256, per the driver invariant) plus a fast
64-bit mixing hash for band keys and compact ids — implemented with public
algorithms only: sha256 via :mod:`hashlib`, 64-bit mixing via the public-domain
splitmix64 finalizer, and string hashing via ``pandas.util.hash_array`` (stable
for a fixed ``hash_key``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# Stable key for pandas' SipHash-based string hashing (must never change:
# signatures are persisted in checkpoint manifests).
HASH_KEY = "europa-ray-v1-00"  # must be exactly 16 bytes
assert len(HASH_KEY.encode()) == 16

_U64 = np.uint64
_GOLDEN = _U64(0x9E3779B97F4A7C15)
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """Public-domain splitmix64 finalizer, vectorized over uint64 arrays.

    Used wherever the reference uses XxHash3-64 (compact point ids, band-key
    hashing): a fast, well-mixed, deterministic 64-bit hash.
    """
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=_U64) + _GOLDEN
        z = (z ^ (z >> _U64(30))) * _MIX1
        z = (z ^ (z >> _U64(27))) * _MIX2
        return z ^ (z >> _U64(31))


def mix64(x: np.ndarray, seed: int | np.uint64 = 0) -> np.ndarray:
    """Seeded 64-bit mix: ``splitmix64(x ^ seed)`` (vectorized)."""
    return splitmix64(np.asarray(x, dtype=_U64) ^ _U64(seed))


def hash_strings(strings, *, seed_key: str = HASH_KEY) -> np.ndarray:
    """Deterministic uint64 hash of a sequence of Python strings.

    ``pd.util.hash_array`` is C-speed and stable across processes for a fixed
    ``hash_key`` (unlike builtin ``hash``, which is salted per process).

    PITFALL: pandas hashes the UTF-8 encoding as a C string, so the hash
    TRUNCATES at the first NUL byte — ``"a\\x00b"`` and ``"a\\x00c"``
    collide. Never join multi-field keys with ``"\\x00"`` before hashing;
    use ``"\\x1f"`` (unit separator) like ``manifest.fingerprint_of``.
    """
    arr = np.asarray(strings, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, hash_key=seed_key).astype(np.uint64)


def sha256_hex(texts) -> list[str | None]:
    """Per-row sha256 hex digest of UTF-8 encoded text.

    Mirrors ``HashGenerator.GenerateHash`` (``/root/reference/Api/Implementations/
    DuplicatesByHash/HashGenerator.cs:14-47``): empty content yields ``None``
    (the reference returns null for empty files and excludes them, ``:18-19``).

    hashlib releases the GIL into C code; the per-row loop is acceptable here
    because sha256 itself dominates and batches parallelize across Ray tasks.
    """
    out: list[str | None] = []
    for t in texts:
        if t is None or len(t) == 0:
            out.append(None)
        else:
            out.append(hashlib.sha256(t.encode("utf-8")).hexdigest())
    return out


def sha256_hex_arrow(col) -> list[str | None]:
    """sha256 hex per row straight from an Arrow string column's UTF-8
    buffer (memoryview slices — no Python string materialization).
    Empty/null rows → None (HashGenerator.cs:18-19 semantics)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return []
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[col.offset : col.offset + n + 1]
    mv = memoryview(bufs[2])
    out: list[str | None] = []
    for i in range(n):
        s, e = offs[i], offs[i + 1]
        if e == s:
            out.append(None)
        else:
            out.append(hashlib.sha256(mv[s:e]).hexdigest())
    return out


def sha256_prefix_hex_arrow(col, fraction: float = 0.1) -> list[str | None]:
    """sha256 hex of each row's first ``ceil(byte_len * fraction)`` UTF-8
    BYTES, straight from the Arrow buffer (no Python string round-trip).
    Byte- rather than character-prefix matches the reference, which hashes
    the first 10% of file BYTES (``HashGenerator.cs:14-47`` via
    ``bytesToHash``); any deterministic prefix function is a valid pass-1
    key (content equality ⇒ prefix equality). Empty/null rows → None."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return []
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[col.offset : col.offset + n + 1]
    lens = np.diff(offs)
    pref = -(-lens * max(1, int(round(fraction * 100))) // 100)
    mv = memoryview(bufs[2])
    out: list[str | None] = []
    for i in range(n):
        s = offs[i]
        if lens[i] == 0:
            out.append(None)
        else:
            out.append(hashlib.sha256(mv[s : s + pref[i]]).hexdigest())
    return out


def default_num_partitions(cap: int = 64) -> int:
    """Shuffle partition count sized to the cluster: Ray's hash-shuffle
    spawns aggregator actors proportional to the partition count, and a
    count exceeding available CPUs deadlocks small clusters. ``cpus − 2``
    leaves room for map/read tasks; capped for the sandbox (raise the cap on
    a real multi-node cluster)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(cap, cpus - 2))


def default_read_blocks(factor: int = 8, floor: int = 64) -> int:
    """Read-parallelism target: ~``factor``× cluster CPUs.

    Measured on the 480k-row scaling corpus: 2×CPUs blocks leaves a 2-wave
    schedule whose straggler tail wastes ~30% of the signature stage
    (8 CPUs: 34.3 s at 16 blocks → 23.7 s at 64; 32 CPUs: 16.6 s at 64 →
    11.7 s at 256); 8× is the knee — beyond it per-block scheduling
    overhead creeps back (8 CPUs / 256 blocks: 26.7 s). Low CPU counts are
    insensitive (2 CPUs: 85/83/84 s at 16/64/128), so the floor is 64."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(floor, factor * cpus)


def sorted_member(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Boolean membership of ``vals`` in a SORTED distinct array via
    ``searchsorted`` — the house broadcast-set-membership primitive (used
    for corpus-side flags in crossdup/ppjoin): O(|vals| log |set|), no
    Python sets, works on any comparable dtype including U256_DTYPE."""
    if sorted_arr.shape[0] == 0 or vals.shape[0] == 0:
        return np.zeros(vals.shape[0], dtype=bool)
    idx = np.minimum(np.searchsorted(sorted_arr, vals), sorted_arr.shape[0] - 1)
    return sorted_arr[idx] == vals


def hex_to_u64(hex_ids) -> np.ndarray:
    """Compact uint64 node id from a sha256 hex string (first 16 hex chars).

    The digest is uniform, so the 64-bit prefix is collision-safe far beyond
    10^9 distinct contents; mirrors the reference's
    ``XxHash3.HashToUInt64(blake3)`` point ids (``QdrantRepository.cs:84``).
    """
    return np.array([int(h[:16], 16) for h in hex_ids], dtype=np.uint64)


# full-digest key: 4×uint64 structured dtype — numpy sort/unique/searchsorted
# compare field-by-field, giving an exact total order over the whole 256-bit
# digest (no prefix-collision risk, unlike the 64-bit fast key)
U256_DTYPE = np.dtype([("q0", "<u8"), ("q1", "<u8"), ("q2", "<u8"), ("q3", "<u8")])


def hex_to_u256_arrow(col) -> np.ndarray:
    """Full 64-char sha256 hex column → structured (4×uint64) key array.

    Exact: equality of keys ⇔ equality of full digests. Used by the
    exact-dedup driver fast path so a 64-bit prefix collision between
    distinct contents can never fabricate a false duplicate cluster
    (the distributed fallback groups on the full digest string — both
    dispatch paths are now digest-exact). Vectorized nibble decode from the
    raw Arrow buffer; scalar fallback for irregular inputs."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    out = np.zeros(n, dtype=U256_DTYPE)
    if n == 0:
        return out
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    bufs = col.buffers()
    regular = not col.null_count and bufs[1] is not None
    if regular:
        offs = np.frombuffer(bufs[1], dtype=off_dtype)[col.offset : col.offset + n + 1]
        regular = bool((np.diff(offs) == 64).all())
    if not regular:
        for i, h in enumerate(col.to_pylist()):
            v = int(h, 16)
            for qi in range(4):
                out[f"q{qi}"][i] = (v >> (64 * (3 - qi))) & 0xFFFFFFFFFFFFFFFF
        return out
    data = np.frombuffer(bufs[2], dtype=np.uint8)[int(offs[0]) : int(offs[-1])]
    nib = (data & 0x0F) + 9 * (data >> 6)  # ascii hex → nibble
    nib = nib.reshape(n, 4, 16).astype(np.uint64)
    shifts = (np.uint64(4) * np.arange(15, -1, -1, dtype=np.uint64))[None, None, :]
    quads = (nib << shifts).sum(axis=2, dtype=np.uint64)  # (n, 4)
    for qi in range(4):
        out[f"q{qi}"] = quads[:, qi]
    return out


def hex_to_u64_arrow(col) -> np.ndarray:
    """Vectorized :func:`hex_to_u64` straight from an Arrow string column of
    NON-NULL fixed-width (64-char lowercase hex) values: nibble-decode the
    first 16 bytes of each value from the raw data buffer — no Python string
    objects. Falls back to the scalar loop for irregular inputs."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    bufs = col.buffers()
    if col.null_count or bufs[1] is None:
        return hex_to_u64(col.to_pylist())
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[col.offset : col.offset + n + 1]
    if not (np.diff(offs) == 64).all():
        return hex_to_u64(col.to_pylist())
    data = np.frombuffer(bufs[2], dtype=np.uint8)[int(offs[0]) : int(offs[-1])]
    lead = data.reshape(n, 64)[:, :16]
    # ascii hex → nibble: '0'-'9' → c & 0xF; 'a'-'f' → (c & 0xF) + 9
    nib = (lead & 0x0F) + 9 * (lead >> 6)
    shifts = (np.uint64(4) * np.arange(15, -1, -1, dtype=np.uint64))[None, :]
    return (nib.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)


def int64_lexkey_arrow(col):
    """Zero-padded 20-digit decimal whose LEXICOGRAPHIC order equals the
    int64 NUMERIC order: ids biased by +2^63 into uint64 space before
    rendering. A raw lpad of a signed id breaks on negatives twice over —
    '-9…' sorts before '0…' regardless of magnitude, and the '-' makes the
    width 20 without padding, corrupting fixed-width composite-key slices.
    Decode with :func:`int64_from_lexkey`."""
    import pyarrow as pa
    import pyarrow.compute as pc

    v = col.to_numpy().astype(np.int64, copy=False).view(np.uint64) + np.uint64(
        1 << 63
    )
    return pc.utf8_lpad(pc.cast(pa.array(v, pa.uint64()), pa.string()), 20, "0")


def int64_from_lexkey(col):
    """Inverse of :func:`int64_lexkey_arrow` over a 20-digit string column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    u = pc.cast(col, pa.uint64()).to_numpy().astype(np.uint64)
    return pa.array((u + np.uint64(1 << 63)).view(np.int64), pa.int64())


def scrub_empty_blocks(ds, schema):
    """Drop zero-row blocks from a MATERIALIZED dataset.

    Ray 2.49's hash-shuffle join emits its empty partitions as ZERO-COLUMN
    blocks (``pa.table({})`` — no schema), and ``map_batches`` passes them
    through without invoking the UDF, so any join-descended dataset can
    carry schema-less blocks that crash the next join with "no match or
    multiple matches for key field … on right side". Zero-row blocks
    contribute nothing, so we rebuild the dataset from the surviving block
    refs — no data movement, blocks stay where they are in the object
    store. ``schema`` supplies the result when every block is empty.
    """
    import pyarrow as pa  # noqa: F401 (schema.empty_table)
    import ray
    import ray.data

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(block_ref)
    if not refs:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(refs)


def dataset_block_refs(ds) -> list:
    """Block refs of a MATERIALIZED dataset, across Ray API generations.

    Ray 2.47+ exposes ``iter_internal_ref_bundles``; older releases only
    had ``get_internal_block_refs`` (now deprecation-warned). Single home
    for the version dance so the next Ray bump is a one-line change here.
    """
    try:
        return [
            r for bundle in ds.iter_internal_ref_bundles() for r in bundle.block_refs
        ]
    except AttributeError:  # older Ray without ref bundles
        return ds.get_internal_block_refs()


def _attach_row_index(block, offset: int, index_col: str):
    import numpy as _np
    import pyarrow as _pa

    return block.append_column(
        index_col,
        _pa.array(offset + _np.arange(block.num_rows, dtype=_np.int64)),
    )


def add_global_row_index(ds, *, index_col: str = "row_index"):
    """Contiguous global 0-based row index over a MATERIALIZED dataset —
    the distributed ``ROW_NUMBER() OVER (ORDER BY <the sort you just
    did>)`` Ray Data lacks. Blocks never move: per-block row counts come
    from block metadata (one tiny counting task per block only when a
    count is missing), the driver prefix-sums them, and one remote map per
    block appends ``offset + arange`` — O(blocks) driver work, zero
    shuffle, so a 100 TB sorted export enumerates for the cost of reading
    each block once. Row order within and across blocks is preserved
    (``from_arrow_refs`` keeps list order). Typical use: ``ds.sort(...)``
    → ``add_global_row_index`` → sharded training export."""
    import pyarrow as pa
    import ray
    import ray.data

    refs: list = []
    counts: list[int | None] = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
            refs.append(block_ref)
            counts.append(meta.num_rows)
    if not refs:
        base = ds.schema()
        schema = base.base_schema if hasattr(base, "base_schema") else base
        return ray.data.from_arrow(
            schema.empty_table().append_column(index_col, pa.array([], pa.int64()))
        )
    if any(c is None for c in counts):
        count_task = ray.remote(lambda b: b.num_rows)
        missing = [i for i, c in enumerate(counts) if c is None]
        got = ray.get([count_task.remote(refs[i]) for i in missing])
        for i, n in zip(missing, got):
            counts[i] = n
    offsets = [0]
    for c in counts[:-1]:
        offsets.append(offsets[-1] + int(c))
    attach = ray.remote(_attach_row_index)
    out = [attach.remote(r, off, index_col) for r, off in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)
