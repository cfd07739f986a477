"""Checkpoint-manifest tests: resume skips completed stages; changed
fingerprints invalidate; kill-mid-pipeline → identical final output."""

from __future__ import annotations

import json
import os

import pytest


def test_stage_runs_and_resumes(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from europa_ray.state.manifest import Manifest, fingerprint_of

    root = str(tmp_path / "ckpt")
    m = Manifest(root)
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return ray.data.from_arrow(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))

    fp = fingerprint_of("cfg-v1", "input-a")
    out1 = m.stage("s1", fp, compute)
    assert sorted(out1.to_pandas().x) == [1, 2, 3]
    assert calls["n"] == 1

    # resume in a NEW manifest object (fresh process analog): no recompute
    m2 = Manifest(root)
    out2 = m2.stage("s1", fp, compute)
    assert sorted(out2.to_pandas().x) == [1, 2, 3]
    assert calls["n"] == 1

    # changed fingerprint → recompute
    out3 = m2.stage("s1", fingerprint_of("cfg-v2", "input-a"), compute)
    assert calls["n"] == 2

    # lineage recorded per partition
    rec = json.load(open(os.path.join(root, "manifest.json")))["s1"]
    assert rec["rows_out"] == 3
    assert sum(rec["partitions"].values()) == 3


def test_kill_resume_identical_output(ray_session, tmp_path, tiny_corpus):
    """Simulate a kill after the signature stage: stage 1 completes, run
    'dies', a fresh run must reuse stage-1 output byte-identically and
    produce the same final clusters as an unbroken run."""
    import ray.data

    from europa_ray.pipelines.neardup import near_dup_pipeline
    from europa_ray.state.manifest import Manifest, fingerprint_of
    from europa_ray.stages.signatures import signatures

    root = str(tmp_path / "ckpt2")
    fp = fingerprint_of("sig-v1", tiny_corpus)

    # run 1: signature stage checkpointed, then "die"
    m = Manifest(root)
    sig1 = m.stage("signatures", fp, lambda: signatures(ray.data.read_parquet(tiny_corpus)))
    n1 = sig1.count()

    # run 2 (fresh manifest): stage is skipped, downstream completes
    m2 = Manifest(root)
    ran = {"n": 0}

    def compute_again():
        ran["n"] += 1
        return signatures(ray.data.read_parquet(tiny_corpus))

    sig2 = m2.stage("signatures", fp, compute_again)
    assert ran["n"] == 0, "resume must not recompute the completed stage"
    assert sig2.count() == n1

    from europa_ray.stages.lsh import candidate_pairs
    from europa_ray.state.unionfind import components

    pairs_resumed = candidate_pairs(sig2.materialize()).to_pandas()
    unbroken = near_dup_pipeline(ray.data.read_parquet(tiny_corpus))["pairs"].to_pandas()
    key = lambda df: sorted(zip(df.a, df.b))
    assert key(pairs_resumed) == key(unbroken)
