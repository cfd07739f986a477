"""Repo-level fork detection (pipelines/forks.py): planted truth, the
boilerplate df-cap, and driver-vs-distributed path equivalence."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _files(rows: list[tuple[str, str]]) -> "ray.data.Dataset":
    import ray.data

    n = len(rows)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "repo": pa.array([r for r, _ in rows], pa.string()),
            "path": pa.array([f"{i}.py" for i in range(n)], pa.string()),
            "commit": pa.array(["0" * 40] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "content": pa.array([c for _, c in rows], pa.string()),
        }
    )
    return ray.data.from_arrow(tbl)


def _as_table(result) -> pa.Table:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        tables = list(result.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return result.schema().base_schema.empty_table()
        return pa.concat_tables(tables, promote_options="default")
    return result


def _planted_rows() -> list[tuple[str, str]]:
    """repoA and repoB are forks (4/5 files shared); repoC is unrelated;
    every repo carries the same license file (df=3)."""
    rows = []
    for i in range(5):
        rows.append(("repoA", f"shared file body number {i} alpha beta"))
    for i in range(4):
        rows.append(("repoB", f"shared file body number {i} alpha beta"))
    rows.append(("repoB", "divergent file only in repo b"))
    for i in range(5):
        rows.append(("repoC", f"totally different content {i} gamma delta"))
    for r in ("repoA", "repoB", "repoC"):
        rows.append((r, "identical license boilerplate across all repos"))
    return rows


def test_fork_pairs_planted_truth(ray_session):
    from europa_ray.pipelines.forks import repo_fork_pairs

    out = _as_table(repo_fork_pairs(_files(_planted_rows()), max_repos_per_sha=2))
    # license (df=3 > cap 2) is excluded: sizes are 5/5/5, intersection 4
    assert out.num_rows == 1
    row = {c: out[c][0].as_py() for c in out.column_names}
    assert (row["repo_a"], row["repo_b"]) == ("repoA", "repoB")
    assert row["n_common"] == 4 and row["n_a"] == 5 and row["n_b"] == 5
    assert row["jaccard"] == pytest.approx(4 / 6)


def test_fork_pairs_cap_included_when_under(ray_session):
    """With the cap above the license df, the license joins the universe:
    intersection 5, union 7 → jaccard 5/7; repoC still below threshold
    (1 shared / 11 union ≈ 0.09)."""
    from europa_ray.pipelines.forks import repo_fork_pairs

    out = _as_table(repo_fork_pairs(_files(_planted_rows()), max_repos_per_sha=16))
    assert out.num_rows == 1
    row = {c: out[c][0].as_py() for c in out.column_names}
    assert row["n_common"] == 5 and row["n_a"] == 6 and row["n_b"] == 6
    assert row["jaccard"] == pytest.approx(5 / 7)


def test_fork_pairs_distributed_path_equivalent(ray_session):
    """Forced budget 0 → the all-relational distributed path; results must
    equal the driver gather path row-for-row."""
    from europa_ray.pipelines.forks import repo_fork_pairs

    files = _files(_planted_rows())
    a = _as_table(repo_fork_pairs(files, max_repos_per_sha=2))
    b = _as_table(
        repo_fork_pairs(files, max_repos_per_sha=2, driver_max_rows=0)
    )
    assert a.column_names == b.column_names
    assert a.num_rows == b.num_rows
    for c in a.column_names:
        assert a[c].to_pylist() == b[c].to_pylist(), c


def test_fork_pairs_empty_corpus(ray_session):
    from europa_ray.pipelines.forks import repo_fork_pairs

    out = _as_table(repo_fork_pairs(_files([("r", "")])))
    assert out.num_rows == 0
    assert out.column_names == ["repo_a", "repo_b", "n_common", "n_a", "n_b", "jaccard"]


def test_with_forks_augment_shape(ray_session):
    """with_forks emits originals + per-repo forks + one license row per
    original repo, preserving the files schema."""
    from europa_ray.sources.augment import LICENSE_TEXT, with_forks

    files = _files(
        [("repoA", "file one body"), ("repoA", "file two body"), ("repoB", "other body")]
    )
    out = _as_table(with_forks(files))
    repos = set(out["repo"].to_pylist())
    assert repos == {"repoA", "repoB", "repoA_fork", "repoB_fork"}
    lic = out.filter(pa.compute.equal(out["path"], "LICENSE"))
    assert sorted(lic["repo"].to_pylist()) == ["repoA", "repoB"]
    assert set(lic["content"].to_pylist()) == {LICENSE_TEXT}
    # originals 3 + forks 3 + license 2
    assert out.num_rows == 8
