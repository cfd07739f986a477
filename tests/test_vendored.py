"""Vendored-directory detection (pipelines/vendored.py): planted truth,
rename-invariance, and driver-vs-distributed equivalence."""

from __future__ import annotations

import pyarrow as pa


def _files(rows: list[tuple[str, str, str]]) -> "ray.data.Dataset":
    import ray.data

    n = len(rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "repo": pa.array([r for r, _, _ in rows], pa.string()),
                "path": pa.array([p for _, p, _ in rows], pa.string()),
                "commit": pa.array(["0" * 40] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "content": pa.array([c for _, _, c in rows], pa.string()),
            }
        )
    )


def _rows() -> list[tuple[str, str, str]]:
    return [
        # repoA vendors libx; repoB has a verbatim copy under a DIFFERENT
        # dir name with RENAMED files (set identity ignores names)
        ("repoA", "vendor/libx/a.py", "lib body one"),
        ("repoA", "vendor/libx/b.py", "lib body two"),
        ("repoB", "third_party/x/renamed1.py", "lib body one"),
        ("repoB", "third_party/x/renamed2.py", "lib body two"),
        # near-miss: repoC has the same dir plus one extra file
        ("repoC", "libx/a.py", "lib body one"),
        ("repoC", "libx/b.py", "lib body two"),
        ("repoC", "libx/c.py", "lib body three"),
        # unrelated top-level files (dir '')
        ("repoA", "main.py", "app a"),
        ("repoB", "main.py", "app b"),
    ]


def test_vendored_groups_planted(ray_session):
    from europa_ray.pipelines.vendored import vendored_dir_groups

    out = vendored_dir_groups(_files(_rows()))
    got = sorted(zip(out["repo"].to_pylist(), out["dir"].to_pylist()))
    assert got == [("repoA", "vendor/libx"), ("repoB", "third_party/x")]
    assert set(out["n_files"].to_pylist()) == {2}
    gh = set(out["group_hash"].to_pylist())
    assert len(gh) == 1  # one group, same key on both members


def test_vendored_groups_distributed_equivalent(ray_session):
    from europa_ray.pipelines.vendored import vendored_dir_groups

    files = _files(_rows())
    a = vendored_dir_groups(files)
    b = vendored_dir_groups(files, driver_max_rows=0)
    assert a.to_pylist() == b.to_pylist()


def test_vendored_duplicate_files_within_dir_collapse(ray_session):
    """The dir identity is the DISTINCT digest set: two copies of the same
    content inside one dir count once, so it still matches a single-copy
    dir elsewhere."""
    from europa_ray.pipelines.vendored import vendored_dir_groups

    rows = [
        ("r1", "v/a.py", "same body"),
        ("r1", "v/a_copy.py", "same body"),
        ("r2", "w/a.py", "same body"),
    ]
    out = vendored_dir_groups(_files(rows))
    got = sorted(zip(out["repo"].to_pylist(), out["dir"].to_pylist()))
    assert got == [("r1", "v"), ("r2", "w")]
    assert out["n_files"].to_pylist() == [1, 1]


def test_vendored_empty_and_no_groups(ray_session):
    from europa_ray.pipelines.vendored import vendored_dir_groups

    out = vendored_dir_groups(_files([("r", "a/x.py", "only one")]))
    assert out.num_rows == 0
    assert out.column_names == ["group_hash", "repo", "dir", "n_files"]
