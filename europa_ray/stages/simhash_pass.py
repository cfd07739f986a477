"""SimHash-64 near-dup pass — the engine's 64-bit fuzzy signature, the analog
of Europa's DCT pHash path (``/root/reference/Api/Implementations/
SimilarImages/ImageHashs/PerceptualHash.cs:63-120``) with the threshold rule
``score ≥ hashSize − degree − 1  ⇔  Hamming ≤ degree``
(``Api/Client/QdrantRepository.cs:192``).

Candidate retrieval: the 64-bit signature is split into 4×16-bit pieces
(pigeonhole: Hamming ≤ 3 ⇒ at least one piece collides), bucketed by a
``groupby(piece_key)`` shuffle, verified in-bucket with exact popcount.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from europa_ray.config import DEFAULT_CONFIG, EngineConfig
from europa_ray.functions.sig import hamming64, simhash_band_keys
from europa_ray.stages.lsh import PAIRS_SCHEMA
from europa_ray.util import default_num_partitions


def explode_simhash_pieces(batch: pa.Table, pieces: int = 4) -> pa.Table:
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "piece_key": pa.array([], pa.int64()),
                "node": pa.array([], pa.int64()),
                "simhash": pa.array([], pa.int64()),
            }
        )
    sim = batch["simhash"].to_numpy().view(np.uint64)
    keys = simhash_band_keys(sim, pieces).view(np.int64)  # (n, pieces)
    node = batch["node"].to_numpy()
    return pa.table(
        {
            "piece_key": pa.array(keys.ravel()),
            "node": pa.array(np.repeat(node, pieces)),
            "simhash": pa.array(np.repeat(sim, pieces).view(np.int64)),
        }
    )


def pair_simhash_group(group: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    nodes = group["node"].to_numpy()
    uniq, first_idx = np.unique(nodes, return_index=True)
    n = uniq.shape[0]
    if n < 2:
        return PAIRS_SCHEMA.empty_table()
    sim = group["simhash"].to_numpy()[first_idx].view(np.uint64)
    if n <= cfg.max_band_size:
        iu, ju = np.triu_indices(n, k=1)
    else:
        w = cfg.pair_window
        iu = np.repeat(np.arange(n), w)
        ju = iu + np.tile(np.arange(1, w + 1), n)
        ok = ju < n
        iu, ju = iu[ok], ju[ok]
    dist = hamming64(sim[iu], sim[ju])
    mask = dist <= cfg.simhash_max_hamming
    iu, ju, dist = iu[mask], ju[mask], dist[mask]
    if iu.shape[0] == 0:
        return PAIRS_SCHEMA.empty_table()
    a, b = uniq[iu], uniq[ju]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table(
        {
            "a": pa.array(lo),
            "b": pa.array(hi),
            "est": pa.array(1.0 - dist / 64.0),
            "source": pa.array(["simhash"] * len(lo), pa.string()),
        }
    )


def simhash_pairs(sig_ds, cfg: EngineConfig = DEFAULT_CONFIG, *, num_partitions: int | None = None):
    """signatures Dataset → verified SimHash pairs (Hamming ≤ degree)."""
    if num_partitions is None:
        num_partitions = default_num_partitions()
    pieces = sig_ds.select_columns(["node", "simhash"]).map_batches(
        explode_simhash_pieces, batch_format="pyarrow"
    )
    from europa_ray.stages.lsh import duplicated_keys, filter_by_key_array, semi_join_keys

    dup_keys = duplicated_keys(pieces.select_columns(["piece_key"]), "piece_key")
    if dup_keys is not None:
        import ray.data

        if dup_keys.shape[0] == 0:
            return ray.data.from_arrow(PAIRS_SCHEMA.empty_table())
        hot = filter_by_key_array(pieces, dup_keys, "piece_key")
    else:
        collisions = (
            pieces.select_columns(["piece_key"])
            .groupby("piece_key")
            .count()
            .rename_columns({"count()": "n"})
            .filter(expr="n > 1")
            .materialize()
        )
        if collisions.count() == 0:
            import ray.data

            return ray.data.from_arrow(PAIRS_SCHEMA.empty_table())
        hot = semi_join_keys(pieces, collisions, "piece_key", num_partitions=num_partitions)
    pairs = hot.groupby("piece_key").map_groups(
        pair_simhash_group, fn_kwargs={"cfg": cfg}, batch_format="pyarrow"
    )
    from europa_ray.stages.lsh import dedupe_pairs

    return dedupe_pairs(pairs, source="simhash")
