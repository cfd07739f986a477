"""Cross-repo line duplication (pipelines/crossrepo.py) — hand-computed
truth on both dispatch paths (driver gather + forced-budget-0 distributed
fallback)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data


def _corpus() -> pa.Table:
    # line inventory (nonblank):
    #   shared_a: r1, r2      shared_b: r2, r3
    #   only_r1 / only_r2 / only_r3: unique to their repo
    # repo r1 repeats shared_a across two files (distinct ⇒ counts once);
    # blank / whitespace-only lines never count; doc 7 is empty, 8 null.
    rows = [
        (1, "r1", "shared_a\nonly_r1\n \n"),
        (2, "r1", "shared_a"),
        (3, "r2", "shared_a\nshared_b"),
        (4, "r2", "only_r2\n\t\n"),
        (5, "r3", "shared_b\nonly_r3\nonly_r3"),
        (6, "r3", "\n  \n"),
        (7, "r3", ""),
        (8, "r3", None),
    ]
    d, r, t = zip(*rows)
    return pa.table(
        {
            "doc_id": pa.array(d, pa.int64()),
            "repo": pa.array(r, pa.string()),
            "content": pa.array(t, pa.string()),
        }
    )


EXPECT = {
    "r1": (2, 1),  # {shared_a, only_r1}, shared: shared_a
    "r2": (3, 2),  # {shared_a, shared_b, only_r2}
    "r3": (2, 1),  # {shared_b, only_r3}
}


@pytest.mark.parametrize("budget", [50_000_000, 0])
def test_cross_repo_line_stats(ray_session, budget):
    from europa_ray.pipelines.crossrepo import cross_repo_line_stats

    ds = ray.data.from_arrow(_corpus()).repartition(3)
    got = cross_repo_line_stats(ds, driver_max_rows=budget)
    df = got.to_pandas() if isinstance(got, ray.data.Dataset) else got.to_pandas()
    assert df.repo.tolist() == sorted(EXPECT)  # repo-sorted output
    for _, row in df.iterrows():
        assert (row.n_distinct_lines, row.n_shared_lines) == EXPECT[row.repo]


def test_cross_repo_no_shared_lines(ray_session):
    """Zero-shared short-circuit on the distributed path (empty join side)."""
    from europa_ray.pipelines.crossrepo import cross_repo_line_stats

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "repo": pa.array(["a", "b"], pa.string()),
            "content": pa.array(["one\ntwo", "three"], pa.string()),
        }
    )
    got = cross_repo_line_stats(
        ray.data.from_arrow(t).repartition(2), driver_max_rows=0
    )
    df = got.to_pandas()
    assert df.repo.tolist() == ["a", "b"]
    assert df.n_distinct_lines.tolist() == [2, 1]
    assert df.n_shared_lines.tolist() == [0, 0]


def test_cross_repo_empty_corpus(ray_session):
    from europa_ray.pipelines.crossrepo import cross_repo_line_stats

    t = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "repo": pa.array([], pa.string()),
            "content": pa.array([], pa.string()),
        }
    )
    got = cross_repo_line_stats(ray.data.from_arrow(t))
    df = got.to_pandas() if not isinstance(got, pa.Table) else got.to_pandas()
    assert len(df) == 0


def test_cross_repo_tiny_shared_distributed(ray_session):
    """Tiny corpus WITH a shared line on the forced-distributed path —
    regression for Ray 2.49 zero-column blocks out of groupby outputs."""
    from europa_ray.pipelines.crossrepo import cross_repo_line_stats

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "repo": pa.array(["a", "b"], pa.string()),
            "content": pa.array(["shared line\nonly a", "shared line"], pa.string()),
        }
    )
    got = cross_repo_line_stats(
        ray.data.from_arrow(t).repartition(3), driver_max_rows=0
    )
    df = got.to_pandas()
    assert df.repo.tolist() == ["a", "b"]
    assert df.n_shared_lines.tolist() == [1, 1]
