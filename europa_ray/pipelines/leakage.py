"""Train/test split leakage audit — the dedup-tier complement of
:func:`europa_ray.pipelines.sampling.split_assign`.

``split_assign`` keys the split on the RAW content hash, so byte-exact
duplicates can never straddle a split boundary. Formatting-only variants
(the normalization tier of :mod:`europa_ray.pipelines.normdedup`) CAN: two
copies differing in comments/case/whitespace hash to different u64 keys and
may land in different splits — exactly the near-duplicate leakage that
inflates eval scores (Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better", §6 measures this train/test overlap directly).

This operator counts it: for every ordered split pair (a < b, string
order), the number of NORMALIZED-digest groups with at least one document
in each — i.e. near-dup groups that leak across that boundary.

100-TB shape: one content scan emits in-batch DISTINCT (norm-sha,
split-bit) pairs — content never shuffles, splits are a bitmask (≤ 64
splits). One digest-keyed groupby makes the pairs globally distinct, a
second digest-keyed sum ORs the bits per group (bits are distinct after
the first groupby, so sum ≡ OR), and the mask histogram (≤ 2^n_splits
rows) expands to pair counts on the driver. Size-dispatched: driver
``np.unique`` fast path under ``driver_max_rows`` pairs, the
groupby/groupby fallback above it (equivalence-tested at forced budget 0).

Reference parity: the reference's similarity grouping feeds a final
"which groups span my selection" review step
(``/root/reference/Api/Implementations/SimilarImages/
SimilarImageFinder.cs:340-411``); this is that span check at the
(norm-digest × split) granularity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from europa_ray.pipelines.normdedup import normalize_code_arrow
from europa_ray.pipelines.sampling import _rate_to_threshold, _sha_u64_valid
from europa_ray.util import sha256_hex_arrow

DEFAULT_FRACTIONS = (("train", 0.9), ("val", 0.05), ("test", 0.05))

LEAKAGE_SCHEMA = pa.schema(
    [
        pa.field("split_a", pa.string()),
        pa.field("split_b", pa.string()),
        pa.field("n_groups", pa.int64()),
    ]
)

_PAIRS_SCHEMA = pa.schema(
    [pa.field("norm_sha", pa.string()), pa.field("bit", pa.int64())]
)


def _explode_pairs(
    batch: pa.Table, *, bounds: np.ndarray, text_col: str
) -> pa.Table:
    """Per-batch DISTINCT (norm_sha, split_bit) pairs. Rows with null/empty
    content or content that normalizes to empty are excluded (the
    split_assign + normdedup house predicates)."""
    keep, u = _sha_u64_valid(batch, text_col)
    if not keep.any():
        return _PAIRS_SCHEMA.empty_table()
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.filter(pa.array(keep))
    sidx = np.searchsorted(bounds, u, side="right")

    norm = normalize_code_arrow(col)
    nonempty = pc.greater(pc.utf8_length(norm), 0).to_numpy(zero_copy_only=False)
    if not nonempty.any():
        return _PAIRS_SCHEMA.empty_table()
    shas = np.asarray(
        sha256_hex_arrow(norm.filter(pa.array(nonempty))), dtype="S64"
    )
    scodes_all, scode = np.unique(shas, return_inverse=True)
    key = scode.astype(np.int64) * 64 + sidx[nonempty].astype(np.int64)
    uk = np.unique(key)
    return pa.table(
        {
            "norm_sha": pa.array(
                scodes_all[uk // 64].astype("U64").astype(object), pa.string()
            ),
            "bit": pa.array(np.int64(1) << (uk % 64), pa.int64()),
        }
    )


def _pairs_from_masks(
    masks: np.ndarray, counts: np.ndarray, names: list[str]
) -> pa.Table:
    """Expand a (mask → group count) histogram into per-split-pair group
    counts: every mask contributes its count to every pair of set bits.
    Pair order is STRING order on the split names (the SQL a.split <
    b.split)."""
    agg: dict[tuple[str, str], int] = {}
    for m, c in zip(masks.tolist(), counts.tolist()):
        on = [i for i in range(len(names)) if m >> i & 1]
        for x in range(len(on)):
            for y in range(x + 1, len(on)):
                a, b = sorted((names[on[x]], names[on[y]]))
                agg[(a, b)] = agg.get((a, b), 0) + int(c)
    keys = sorted(agg)
    return pa.table(
        {
            "split_a": pa.array([k[0] for k in keys], pa.string()),
            "split_b": pa.array([k[1] for k in keys], pa.string()),
            "n_groups": pa.array([agg[k] for k in keys], pa.int64()),
        }
    )


def split_leakage(
    files: ray.data.Dataset,
    *,
    fractions: tuple[tuple[str, float], ...] = DEFAULT_FRACTIONS,
    text_col: str = "content",
    driver_max_rows: int = 50_000_000,
):
    """Per ordered split pair (string order): the number of
    normalization-tier digest groups with a member in BOTH splits —
    (split_a, split_b, n_groups), pairs with zero leaks omitted."""
    names = [n for n, _ in fractions]
    fracs = [f for _, f in fractions]
    if len(names) > 63:
        # bit 63 would overflow the signed int64 mask arithmetic
        raise ValueError("split_leakage supports at most 63 splits")
    if any(f < 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must be >= 0 and sum to 1, got {fracs}")
    bounds = np.array(
        [_rate_to_threshold(float(c)) for c in np.cumsum(fracs)[:-1]],
        dtype=np.uint64,
    )
    pairs = files.map_batches(
        _explode_pairs,
        fn_kwargs={"bounds": bounds, "text_col": text_col},
        batch_format="pyarrow",
    )

    # --- driver fast path ---
    sha_p: list[np.ndarray] = []
    bit_p: list[np.ndarray] = []
    total = 0
    for b in pairs.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        total += b.num_rows
        if total > driver_max_rows:
            sha_p = []
            break
        sha_p.append(b["norm_sha"].to_numpy(zero_copy_only=False).astype("S64"))
        bit_p.append(b["bit"].to_numpy())
    else:
        if not sha_p:
            return LEAKAGE_SCHEMA.empty_table()
        shas = np.concatenate(sha_p)
        bits = np.concatenate(bit_p).astype(np.int64)
        scodes_all, scode = np.unique(shas, return_inverse=True)
        # bit is a power of two (< 2^63): float64 log2 is exact there
        bidx = np.log2(bits.astype(np.float64)).astype(np.int64)
        uk = np.unique(scode.astype(np.int64) * 64 + bidx)
        mask_per_sha = np.zeros(scodes_all.shape[0], np.int64)
        np.add.at(mask_per_sha, uk // 64, np.int64(1) << (uk % 64))
        masks, counts = np.unique(mask_per_sha, return_counts=True)
        return _pairs_from_masks(masks, counts, names)

    # --- distributed fallback: distinct pairs → per-sha bit sum (≡ OR) →
    # tiny mask histogram gathered to the driver (≤ 2^n_splits rows) ---
    distinct = pairs.groupby(["norm_sha", "bit"]).count()
    masks_ds = (
        distinct.groupby("norm_sha")
        .sum("bit")
        .rename_columns({"sum(bit)": "mask"})
        .groupby("mask")
        .count()
        .rename_columns({"count()": "n"})
    )
    mt = pa.concat_tables(
        [
            t
            for t in masks_ds.iter_batches(batch_format="pyarrow", batch_size=4096)
            if t.num_rows
        ]
        or [pa.table({"mask": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})],
        promote_options="default",
    )
    return _pairs_from_masks(
        mt["mask"].to_numpy().astype(np.int64),
        mt["n"].to_numpy().astype(np.int64),
        names,
    )
