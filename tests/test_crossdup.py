"""Cross-corpus near dedup (pipelines/crossdup.py): planted truth, exact
vs near matches, and broadcast-vs-distributed path equivalence."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _files(rows: list[tuple[int, str]]) -> "ray.data.Dataset":
    import ray.data

    n = len(rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "repo": pa.array(["r"] * n, pa.string()),
                "path": pa.array([f"{i}.py" for i in range(n)], pa.string()),
                "commit": pa.array(["0" * 40] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "content": pa.array([c for _, c in rows], pa.string()),
            }
        )
    )


def _as_table(result) -> pa.Table:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        tables = [
            t
            for t in result.iter_batches(batch_format="pyarrow", batch_size=1 << 16)
            if t.num_rows
        ]
        if not tables:
            return result.schema().base_schema.empty_table()
        return pa.concat_tables(tables, promote_options="default")
    return result


BASE = " ".join(f"tok{i}" for i in range(40))
NEAR = " ".join(f"tok{i}" for i in range(39)) + " tokX"  # jaccard ≈ 0.95
FAR = " ".join(f"zzz{i}" for i in range(40))
OTHER = "completely different words entirely here now indeed truly"


@pytest.fixture()
def corpora(ray_session):
    ref = _files([(1, BASE), (2, FAR)])
    new = _files([(10, BASE), (11, NEAR), (12, OTHER)])
    return new, ref


def test_cross_near_dup_planted(corpora):
    from europa_ray.pipelines.crossdup import cross_corpus_near_dup_stats

    new, ref = corpora
    out = _as_table(cross_corpus_near_dup_stats(new, ref))
    d = {r["doc_id"]: r for r in out.to_pylist()}
    assert set(d) == {10, 11}  # OTHER matches nothing
    assert d[10]["best_jaccard"] == 1.0  # byte-identical to ref doc 1
    assert d[10]["n_ref_matches"] == 1
    assert 0.9 < d[11]["best_jaccard"] < 1.0  # near-dup of ref doc 1
    assert d[11]["n_ref_matches"] == 1


def test_cross_near_dup_distributed_equivalent(corpora):
    from europa_ray.pipelines.crossdup import cross_corpus_near_dup_stats

    new, ref = corpora
    a = _as_table(cross_corpus_near_dup_stats(new, ref))
    b = _as_table(cross_corpus_near_dup_stats(new, ref, driver_max_nodes=0))
    assert a.column_names == b.column_names
    assert a.to_pylist() == b.to_pylist()


def test_cross_near_dup_counts_multiple_refs(ray_session):
    """A new doc near two distinct reference contents counts both."""
    from europa_ray.pipelines.crossdup import cross_corpus_near_dup_stats

    near2 = " ".join(f"tok{i}" for i in range(38)) + " tokY tokZ"
    ref = _files([(1, BASE), (2, NEAR)])
    new = _files([(10, near2)])
    out = _as_table(cross_corpus_near_dup_stats(new, ref))
    assert out.num_rows == 1
    row = out.to_pylist()[0]
    assert row["n_ref_matches"] == 2
    assert row["best_jaccard"] < 1.0


def test_cross_near_dup_no_matches(ray_session):
    from europa_ray.pipelines.crossdup import cross_corpus_near_dup_stats

    ref = _files([(1, FAR)])
    new = _files([(10, OTHER)])
    out = _as_table(cross_corpus_near_dup_stats(new, ref))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "n_ref_matches", "best_jaccard"]


def test_cross_near_dup_pair_budget_dispatch(corpora):
    """Forced driver_max_pairs=0 → the distributed path takes over after
    candidate generation; output unchanged."""
    from europa_ray.pipelines.crossdup import cross_corpus_near_dup_stats

    new, ref = corpora
    a = _as_table(cross_corpus_near_dup_stats(new, ref))
    b = _as_table(cross_corpus_near_dup_stats(new, ref, driver_max_pairs=0))
    assert a.to_pylist() == b.to_pylist()


def test_cross_corpus_join_fallback_tiny(ray_session):
    """Tiny corpora on the forced-JOIN path (broadcast budget 0) —
    regression for zero-column blocks out of the ref-digest shuffle."""
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.exact import cross_corpus_new_docs

    def mk(texts):
        n = len(texts)
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "repo": pa.array(["r"] * n, pa.string()),
                    "path": pa.array([f"{i}.py" for i in range(n)], pa.string()),
                    "commit": pa.array([f"{i:040d}" for i in range(n)], pa.string()),
                    "lang": pa.array(["en"] * n, pa.string()),
                    "content": pa.array(texts, pa.string()),
                }
            )
        ).repartition(3)

    new = mk(["fresh doc one", "seen before"])
    ref = mk(["seen before", "other ref doc"])
    got = cross_corpus_new_docs(new, ref, broadcast_max_digests=0)
    df = got.to_pandas() if isinstance(got, ray.data.Dataset) else got.to_pandas()
    assert df.path.tolist() == ["0.py"]  # only the fresh doc survives
