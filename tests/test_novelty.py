"""Per-doc n-gram novelty (pipelines/novelty.py) — independent regex/set
brute-force truth on both dispatch paths."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa
import pytest
import ray.data

K = 3  # small k so short hand-written docs produce several grams

_TOK = re.compile(r"\w+|[^\w\s]")


def _brute(texts: list[str | None]) -> list[tuple[int, int, int]]:
    """(doc_idx, n_grams, n_dup_grams) per nonempty doc — grams as STRINGS
    (the engine uses 64-bit shingle hashes; collision-free at this size)."""
    sets = {}
    for i, t in enumerate(texts):
        if not t:
            continue
        tk = _TOK.findall(t)
        if len(tk) >= K:
            g = {" ".join(tk[j : j + K]) for j in range(len(tk) - K + 1)}
        elif tk:
            g = {" ".join(tk)}
        else:
            g = set()
        sets[i] = g
    freq = Counter(g for s in sets.values() for g in s)
    return [
        (i, len(s), sum(1 for g in s if freq[g] > 1)) for i, s in sorted(sets.items())
    ]


def _corpus() -> list[str | None]:
    return [
        "the quick brown fox jumps over the lazy dog",
        # shares a 4-token run with doc 0 → two shared 3-grams
        "quick brown fox jumps somewhere else entirely today",
        "completely different words here with no overlap at all",
        "tiny doc",  # < K tokens → one whole-row gram
        "tiny doc",  # exact dup of the short doc → both grams duplicated
        "",
        None,
        # whitespace-only: nonempty but zero tokens — a trailing zero-gram
        # segment must not shorten the previous doc's count (reduceat trap)
        "   ",
    ]


@pytest.mark.parametrize(
    "budget,bmax",
    [(50_000_000, 20_000_000), (0, 20_000_000), (0, 0)],
    ids=["driver", "broadcast", "join"],
)
def test_gram_novelty_matches_brute_force(ray_session, budget, bmax):
    from europa_ray.pipelines.novelty import gram_novelty

    texts = _corpus()
    expect = _brute(texts)
    assert any(d for _, _, d in expect), "fixture must plant duplicate grams"
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "content": pa.array(texts, pa.string()),
        }
    )
    got = gram_novelty(
        ray.data.from_arrow(t).repartition(3),
        k=K,
        driver_max_rows=budget,
        dup_broadcast_max=bmax,
    )
    df = got.to_pandas() if isinstance(got, ray.data.Dataset) else got.to_pandas()
    assert list(zip(df.doc_id, df.n_grams, df.n_dup_grams)) == expect


def test_gram_novelty_no_dups(ray_session):
    """All-unique corpus exercises the zero-dup short-circuit (budget 0)."""
    from europa_ray.pipelines.novelty import gram_novelty

    t = pa.table(
        {
            "doc_id": pa.array([5, 9], pa.int64()),
            "content": pa.array(
                ["alpha beta gamma delta", "epsilon zeta eta theta"], pa.string()
            ),
        }
    )
    got = gram_novelty(ray.data.from_arrow(t), k=K, driver_max_rows=0)
    df = got.to_pandas()
    assert df.doc_id.tolist() == [5, 9]
    assert df.n_grams.tolist() == [2, 2]
    assert df.n_dup_grams.tolist() == [0, 0]


def test_gram_novelty_tiny_dup_join_path(ray_session):
    """Tiny corpus WITH dup grams on the forced-JOIN path (broadcast max
    0) — regression for groupby-emitted zero-column blocks."""
    from europa_ray.pipelines.novelty import gram_novelty

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "content": pa.array(["t1 t2 t3 t4", "t1 t2 t3 t4"], pa.string()),
        }
    )
    got = gram_novelty(
        ray.data.from_arrow(t).repartition(3),
        k=3,
        driver_max_rows=0,
        dup_broadcast_max=0,
    )
    df = got.to_pandas() if isinstance(got, ray.data.Dataset) else got.to_pandas()
    assert df.doc_id.tolist() == [1, 2]
    assert df.n_dup_grams.tolist() == df.n_grams.tolist()  # full dup
