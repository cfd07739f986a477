"""CLI entrypoint tests (in-process main(); the CLI reuses the session's
Ray when already initialised)."""

from __future__ import annotations

import glob
import json

import pyarrow.parquet as pq
import pytest


def test_cli_exact_and_neardup_with_resume(ray_session, tiny_corpus, tmp_path, capsys):
    from europa_ray.cli import main

    out1 = str(tmp_path / "exact")
    assert main(["exact", "--input", tiny_corpus, "--output", out1]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["clusters_rows"] > 0
    files = glob.glob(out1 + "/exact_clusters/*.parquet")
    assert files
    tbl = pq.read_table(files)
    assert {"cluster_id", "sha256", "repo", "path", "commit"} <= set(tbl.column_names)

    out2 = str(tmp_path / "nd1")
    ckpt = str(tmp_path / "ckpt")
    assert main(["neardup", "--input", tiny_corpus, "--output", out2, "--checkpoint", ckpt]) == 0
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["clusters_rows"] > 0 and r1["pairs_rows"] > 0

    # resume: same checkpoint, fresh output — byte-identical clusters
    out3 = str(tmp_path / "nd2")
    assert main(["neardup", "--input", tiny_corpus, "--output", out3, "--checkpoint", ckpt]) == 0
    a = pq.read_table(glob.glob(out2 + "/clusters/*.parquet")).to_pandas()
    b = pq.read_table(glob.glob(out3 + "/clusters/*.parquet")).to_pandas()
    key = lambda d: sorted(zip(d.path, d.cluster_id))
    assert key(a) == key(b)

    man = json.load(open(ckpt + "/manifest.json"))
    assert man["signatures"]["rows_out"] > 0
    assert man["pairs"]["rows_out"] == r1["pairs_rows"]


def test_cli_filters_flags(ray_session, tiny_corpus, tmp_path, capsys):
    from europa_ray.cli import main

    out = str(tmp_path / "filtered")
    assert (
        main(
            ["exact", "--input", tiny_corpus, "--output", out, "--include-langs", "python", "--min-size", "10"]
        )
        == 0
    )
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["clusters_rows"] >= 0
