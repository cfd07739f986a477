"""Signature-registry tests (§2.10/M6): algorithm swap via config, dHash
analog semantics, unknown-key rejection."""

from __future__ import annotations

import numpy as np
import pytest


def test_registry_contents_and_unknown_key():
    from europa_ray.config import EngineConfig
    from europa_ray.functions.registry import get_signature, registered_signatures

    assert {"simhash", "diffhash"} <= set(registered_signatures())
    with pytest.raises(ValueError, match="unknown"):
        get_signature("nope")
    with pytest.raises(ValueError, match="fuzzy_algo"):
        EngineConfig(fuzzy_algo="nope")


def test_diffhash_properties():
    from europa_ray.functions.registry import diffhash_signatures

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**63, size=500).astype(np.uint64)
    off = np.array([0, 500], dtype=np.int64)
    h1 = diffhash_signatures(vals, off)
    h2 = diffhash_signatures(vals.copy(), off)
    assert h1[0] == h2[0] != 0
    # small perturbation → small Hamming distance
    from europa_ray.functions.sig import hamming64

    vals2 = vals.copy()
    vals2[250] ^= np.uint64(0xFF)
    h3 = diffhash_signatures(vals2, off)
    assert hamming64(h1, h3)[0] <= 4
    # different content → far
    vals4 = rng.integers(0, 2**63, size=500).astype(np.uint64)
    h4 = diffhash_signatures(vals4, off)
    assert hamming64(h1, h4)[0] >= 16
    # short rows hash to 0; batch layout matches per-row layout
    multi = np.concatenate([vals, np.array([1], np.uint64), vals4])
    moff = np.array([0, 500, 500, 501, 1001], dtype=np.int64)
    hm = diffhash_signatures(multi, moff)
    assert hm[0] == h1[0] and hm[3] == h4[0]
    assert hm[1] == 0 and hm[2] == 0


def test_diffhash_through_signature_stage_distinguishes_docs():
    """Regression: SignatureStage must feed ORDER-SENSITIVE algorithms the
    document-order shingle stream, not the sorted-unique set. With sorted
    input, every doc with ≥ 65 unique shingles hashed to all-ones and
    shorter docs hashed by shingle count only — distinct documents became
    Hamming-0 "near-dups" and the 64-bit pass linked the whole corpus."""
    import pyarrow as pa

    from europa_ray.config import EngineConfig
    from europa_ray.functions.sig import hamming64
    from europa_ray.stages.signatures import SignatureStage

    rng = np.random.default_rng(11)
    docs = [
        " ".join(f"w{rng.integers(0, 50_000)}" for _ in range(300)) for _ in range(5)
    ]
    batch = pa.table(
        {
            "repo": pa.array(["r"] * 5),
            "path": pa.array([f"{i}.txt" for i in range(5)]),
            "commit": pa.array(["c" * 40] * 5),
            "content": pa.array(docs),
        }
    )
    stage = SignatureStage(EngineConfig(fuzzy_algo="diffhash"))
    out = stage(batch)
    hashes = out["simhash"].to_numpy().view(np.uint64)
    assert len(set(hashes.tolist())) == 5, "distinct docs must get distinct diffhashes"
    all_ones = np.uint64(0xFFFFFFFFFFFFFFFF)
    assert not (hashes == all_ones).any(), "sorted-stream degenerate all-ones hash"
    for i in range(5):
        for j in range(i + 1, 5):
            d = hamming64(hashes[i : i + 1], hashes[j : j + 1])[0]
            assert d > 10, f"distinct docs {i},{j} too close (Hamming {d})"
    # locality: a single mid-document token substitution stays close
    toks = docs[0].split(" ")
    toks[150] = "wSUBST"
    batch2 = pa.table(
        {
            "repo": pa.array(["r"]),
            "path": pa.array(["m.txt"]),
            "commit": pa.array(["c" * 40]),
            "content": pa.array([" ".join(toks)]),
        }
    )
    h2 = stage(batch2)["simhash"].to_numpy().view(np.uint64)
    assert hamming64(hashes[0:1], h2)[0] <= 8


def test_fuzzy_algo_swap_runs_pass(ray_session, tiny_corpus):
    """The SimHash pass machinery works unchanged under the dHash-analog:
    every emitted pair re-verifies at Hamming ≤ 3 of the diffhash."""
    import ray.data

    from europa_ray.config import EngineConfig
    from europa_ray.functions.sig import hamming64
    from europa_ray.stages.signatures import signatures
    from europa_ray.stages.simhash_pass import simhash_pairs

    cfg = EngineConfig(fuzzy_algo="diffhash")
    ds = ray.data.read_parquet(tiny_corpus)
    sigs = signatures(ds, cfg).materialize()
    pairs = simhash_pairs(sigs, cfg).to_pandas()
    assert len(pairs) > 0, "planted exact/near dups must collide under diffhash"
    sig_df = sigs.select_columns(["node", "simhash"]).to_pandas().drop_duplicates("node")
    sim_map = dict(zip(sig_df.node, sig_df.simhash))
    for a, b in zip(pairs.a, pairs.b):
        d = hamming64(
            np.array([sim_map[a]], dtype=np.int64).view(np.uint64),
            np.array([sim_map[b]], dtype=np.int64).view(np.uint64),
        )[0]
        assert d <= 3
