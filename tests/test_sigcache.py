"""Incremental cross-run cache tests (J1/J2/SO2): a grown corpus computes
only the delta; pairs anti-join against the persisted set; counters prove it."""

from __future__ import annotations

import numpy as np
import pytest


def _sig_key(df):
    cols = [c for c in ("repo", "path", "commit", "node") if c in df.columns]
    return df.sort_values(cols).reset_index(drop=True)


def test_incremental_signatures_delta_only(ray_session, tiny_corpus, tmp_path):
    import pyarrow as pa
    import ray.data

    from europa_ray.state.sigcache import incremental_signatures
    from europa_ray.stages.signatures import signatures

    root = str(tmp_path / "cache")
    files = ray.data.read_parquet(tiny_corpus)

    # run 1: empty cache → everything computed
    sigs1, c1 = incremental_signatures(files, cache_root=root)
    df1 = sigs1.to_pandas()
    assert c1["rows_from_cache"] == 0
    assert c1["sig_nodes_computed"] == df1.node.nunique()

    # parity with the plain signature stage
    direct = signatures(files).materialize().to_pandas()
    a = _sig_key(df1)
    b = _sig_key(direct)
    assert a.node.tolist() == b.node.tolist()
    assert a.sha256.tolist() == b.sha256.tolist()
    assert a.n_tokens.tolist() == b.n_tokens.tolist()
    assert [bytes(x) for x in a.minhash] == [bytes(x) for x in b.minhash]
    assert a.simhash.tolist() == b.simhash.tolist()

    # run 2: same corpus → ZERO recompute, identical output
    sigs2, c2 = incremental_signatures(files, cache_root=root)
    df2 = sigs2.to_pandas()
    assert c2["sig_nodes_computed"] == 0
    assert c2["rows_from_cache"] == len(df2)
    a2 = _sig_key(df2)
    assert a2.node.tolist() == a.node.tolist()
    assert [bytes(x) for x in a2.minhash] == [bytes(x) for x in a.minhash]
    assert a2.simhash.tolist() == a.simhash.tolist()
    assert a2.n_tokens.tolist() == a.n_tokens.tolist()

    # run 3: grown corpus → only the delta is signatured
    extra = pa.table(
        {
            "repo": pa.array(["newrepo"] * 2),
            "path": pa.array(["new/a.py", "new/b.py"]),
            "commit": pa.array(["c1", "c2"]),
            "lang": pa.array(["python", "python"]),
            "content": pa.array(
                ["def brand_new_function():\n    return 42\n" * 20,
                 "class AnotherNewThing:\n    pass\n" * 30]
            ),
        }
    )
    grown = files.union(ray.data.from_arrow(extra))
    sigs3, c3 = incremental_signatures(grown, cache_root=root)
    df3 = sigs3.to_pandas()
    assert c3["sig_nodes_computed"] == 2, c3
    assert len(df3) == len(df1) + 2
    # old rows unchanged
    old = _sig_key(df3[df3.repo != "newrepo"])
    assert old.node.tolist() == a.node.tolist()
    assert [bytes(x) for x in old.minhash] == [bytes(x) for x in a.minhash]


def test_incremental_pairs_anti_join(ray_session, tiny_corpus, tmp_path):
    import ray.data

    from europa_ray.stages.lsh import candidate_pairs
    from europa_ray.state.sigcache import incremental_pairs, incremental_signatures

    root = str(tmp_path / "cache2")
    files = ray.data.read_parquet(tiny_corpus)
    sigs, _ = incremental_signatures(files, cache_root=root)
    sigs = sigs.materialize()

    new_pairs = candidate_pairs(sigs)
    merged1, c1 = incremental_pairs(new_pairs, cache_root=root)
    n1 = merged1.count()
    assert c1["pairs_from_cache"] == 0
    assert c1["pairs_new"] == n1

    # re-run: every pair is already persisted (SO2 MatchExcept → 0 new)
    new_pairs2 = candidate_pairs(sigs)
    merged2, c2 = incremental_pairs(new_pairs2, cache_root=root)
    assert c2["pairs_new"] == 0
    assert c2["pairs_from_cache"] == n1
    assert merged2.count() == n1
    k = lambda df: sorted(zip(df.a, df.b))
    assert k(merged1.to_pandas()) == k(merged2.to_pandas())


def test_cli_checkpoint_counters_and_identical_resume(ray_session, tiny_corpus, tmp_path):
    """CLI --checkpoint records non-empty stage counters (A8) and a re-run
    from the populated cache reproduces byte-identical clusters."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    from europa_ray.cli import main

    ckpt = str(tmp_path / "ckpt")
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    assert main(["neardup", "--input", tiny_corpus, "--output", out1, "--checkpoint", ckpt]) == 0
    man = json.load(open(os.path.join(ckpt, "manifest.json")))
    assert man["signatures"]["counters"]["sig_nodes_computed"] > 0
    assert man["signatures"]["counters"]["rows_from_cache"] == 0
    assert "verified_pairs" in man["pairs"]["counters"]
    assert man["clusters"]["counters"]["clusters_rows"] >= 0
    assert man["clusters"]["partitions"], "per-partition lineage missing"

    assert main(["neardup", "--input", tiny_corpus, "--output", out2, "--checkpoint", ckpt]) == 0
    man2 = json.load(open(os.path.join(ckpt, "manifest.json")))
    # second run reused every signature and discovered no new pairs
    assert man2["signatures"]["counters"]["sig_nodes_computed"] == 0
    assert man2["signatures"]["counters"]["rows_from_cache"] > 0
    assert man2["pairs"]["counters"]["pairs_new"] == 0

    def read_sorted(d):
        files = sorted(glob.glob(os.path.join(d, "clusters", "*.parquet")))
        import pyarrow as pa

        t = pa.concat_tables([pq.read_table(f) for f in files])
        return t.to_pandas().sort_values(["cluster_id", "repo", "path", "commit"]).reset_index(drop=True)

    d1, d2 = read_sorted(out1), read_sorted(out2)
    assert d1.equals(d2), "resumed run must reproduce identical clusters"
