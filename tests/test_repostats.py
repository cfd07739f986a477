"""Per-repo rollup (pipelines/repostats.py) — hand-computed truth on both
dispatch paths, incl. a cross-repo dup digest and excluded empty rows."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data


def _corpus() -> pa.Table:
    rows = [
        # repo A: two langs, an internal dup pair, one unique file
        (1, "A", "py", "samecontent"),
        (2, "A", "py", "samecontent"),
        (3, "A", "js", "unique a3"),
        # repo B: one file duplicating a repo-A digest (cross-repo dup)
        (4, "B", "py", "samecontent"),
        (5, "B", "py", "only in b"),
        # repo C: empty + null content only → no output row
        (6, "C", "py", ""),
        (7, "C", "py", None),
    ]
    d, r, l, t = zip(*rows)
    return pa.table(
        {
            "doc_id": pa.array(d, pa.int64()),
            "repo": pa.array(r, pa.string()),
            "lang": pa.array(l, pa.string()),
            "content": pa.array(t, pa.string()),
        }
    )


EXPECT = {
    # repo: (n_files, n_chars, n_langs, n_dup_files)
    "A": (3, 11 + 11 + 9, 2, 2),
    "B": (2, 11 + 9, 1, 1),
}


@pytest.mark.parametrize("budget", [50_000_000, 0])
def test_repo_stats(ray_session, budget):
    from europa_ray.pipelines.repostats import repo_stats

    got = repo_stats(
        ray.data.from_arrow(_corpus()).repartition(3), driver_max_rows=budget
    )
    df = got.to_pandas() if isinstance(got, ray.data.Dataset) else got.to_pandas()
    assert df.repo.tolist() == sorted(EXPECT)
    for _, row in df.iterrows():
        assert (
            row.n_files, row.n_chars, row.n_langs, row.n_dup_files
        ) == EXPECT[row.repo], row.repo


def test_repo_stats_empty(ray_session):
    from europa_ray.pipelines.repostats import repo_stats

    t = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "repo": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "content": pa.array([], pa.string()),
        }
    )
    got = repo_stats(ray.data.from_arrow(t))
    assert got.num_rows == 0
    assert got.schema.names == [
        "repo", "n_files", "n_chars", "n_langs", "n_dup_files"
    ]


@pytest.mark.parametrize("texts", [["one small doc"], ["   ", "\t x"]], ids=["single", "tiny"])
def test_repo_stats_tiny_corpus_distributed(ray_session, texts):
    """Single/tiny corpora poison joins with Ray 2.49 zero-column empty
    blocks on the forced-distributed path — regression probe."""
    from europa_ray.pipelines.repostats import repo_stats

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "repo": pa.array(["r"] * len(texts), pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "content": pa.array(texts, pa.string()),
        }
    )
    got = repo_stats(ray.data.from_arrow(t).repartition(2), driver_max_rows=0)
    df = got.to_pandas() if isinstance(got, ray.data.Dataset) else got.to_pandas()
    assert df.repo.tolist() == ["r"]
    assert df.n_files.tolist() == [len(texts)]
