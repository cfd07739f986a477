"""Live progress stream (the SignalR notification analog) tests."""

from __future__ import annotations

import pyarrow as pa


def _corpus(n: int = 400):
    import ray.data

    rows = {
        "repo": [f"r{i % 7}" for i in range(n)],
        "path": [f"p{i}.py" for i in range(n)],
        "commit": ["c" * 40] * n,
        "content": [
            # 50 near-dup pairs (one-token mutation of a 60-token body →
            # distinct nodes, J ≈ 0.92) + uniques: signature, pair AND
            # cluster counters all move
            " ".join(f"base{i % 50}tok{j}" for j in range(60))
            + (" tail" if i >= 50 else "")
            if i < 100
            else f"unique body {i} " + " ".join(f"t{i}x{j}" for j in range(30))
            for i in range(n)
        ],
        "size": pa.array([64] * n, pa.int64()),
        "lang": ["python"] * n,
    }
    return ray.data.from_arrow(pa.table(rows))


def test_progress_counts_stream_during_run(ray_session):
    from europa_ray.pipelines.neardup import near_dup_pipeline
    from europa_ray.state.progress import Progress

    import time

    progress = Progress()
    seen: list[dict[str, int]] = []
    with progress.watch(sink=seen.append, interval=0.05):
        out = near_dup_pipeline(_corpus(), progress=progress)
        n_clusters = out["clusters"].count()
        # let in-flight fire-and-forget incrs drain before the final flush
        last, deadline = None, time.time() + 10
        while time.time() < deadline:
            snap = progress.snapshot()
            if snap == last and len(snap) >= 3:
                break
            last = snap
            time.sleep(0.1)

    snap = progress.snapshot()
    assert snap["signature_rows"] == 400
    assert snap["cluster_rows"] == n_clusters > 0
    assert "verified_pairs" in snap
    # the watcher emitted at least one in-flight line, and the final
    # snapshot was flushed on exit
    assert seen
    assert seen[-1] == snap


def test_progress_passthrough_identity(ray_session):
    """count_stage is a zero-copy pass-through: rows and schema unchanged."""
    import ray.data

    from europa_ray.state.progress import Progress

    progress = Progress()
    ds = ray.data.range(1000)
    wrapped = progress.count_stage(ds, "rows")
    assert wrapped.count() == 1000
    # worker incr.remote messages are fire-and-forget: poll briefly
    import time

    deadline = time.time() + 10
    while progress.snapshot() != {"rows": 1000} and time.time() < deadline:
        time.sleep(0.05)
    assert progress.snapshot() == {"rows": 1000}


def test_cli_progress_flag(ray_session, tmp_path, capfd):
    from europa_ray import cli

    files = _corpus(120)
    inp = tmp_path / "inp"
    files.write_parquet(str(inp))
    rc = cli.main(
        [
            "neardup",
            "--input",
            str(inp),
            "--output",
            str(tmp_path / "out"),
            "--progress",
        ]
    )
    assert rc == 0
    err = capfd.readouterr().err
    assert "progress " in err and "signature_rows=" in err
