"""Per-doc top-k distinctive terms (pipelines/keywords.py): brute-force
parity on broadcast and join paths, edge semantics."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from europa_ray.pipelines.keywords import doc_top_terms


def _mk_docs(n: int = 120, seed: int = 9):
    rng = np.random.default_rng(seed)
    words = [f"w{i:02d}" for i in range(30)]
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(5, 40))))
        for _ in range(n)
    ]
    texts[0] = ""
    texts[1] = None
    texts[2] = "a  b a"  # consecutive spaces → empty segment filtered
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "content": pa.array(texts, pa.string()),
        }
    )


def _brute(t: pa.Table, k: int) -> set[tuple]:
    tf: dict[int, Counter] = {}
    for d, txt in zip(t["doc_id"].to_pylist(), t["content"].to_pylist()):
        if not txt:
            continue
        tf[d] = Counter(w for w in txt.split(" ") if w)
    df: Counter = Counter()
    for c in tf.values():
        for w in c:
            df[w] += 1
    out = set()
    for d, c in tf.items():
        rows = sorted((-n, df[w], w) for w, n in c.items())
        for r, (nn, dfw, w) in enumerate(rows[:k], 1):
            out.add((d, w, -nn, dfw, r))
    return out


@pytest.mark.parametrize(
    "budget,gather_budget",
    [
        (30_000_000, 50_000_000),  # broadcast path, driver-folded df table
        (30_000_000, 0),  # broadcast path, forced-distributed df groupby
        (0, 50_000_000),  # forced join fallback, driver-folded df table
        (0, 0),  # forced join fallback, forced-distributed df groupby
    ],
)
def test_doc_top_terms_matches_bruteforce(ray_session, budget, gather_budget):
    """Broadcast path and forced join fallback both equal brute force,
    with the df table built either by driver fold or distributed groupby."""
    import ray.data

    t = _mk_docs()
    got = doc_top_terms(
        ray.data.from_arrow(t).repartition(4),
        k=3,
        df_broadcast_max=budget,
        df_gather_max_rows=gather_budget,
    ).to_pandas()
    rows = set(zip(got.doc_id, got.term, got.tf, got.df, got["rank"]))
    assert rows == _brute(t, 3)
    # empty/null docs excluded; the 2-term doc yields 2 rows not 3
    assert 0 not in set(got.doc_id) and 1 not in set(got.doc_id)
    assert (got[got.doc_id == 2]["rank"].max()) == 2
    assert got[got.doc_id == 2].sort_values("rank").term.tolist() == ["a", "b"]


def test_doc_top_terms_validation(ray_session):
    import ray.data

    with pytest.raises(ValueError):
        doc_top_terms(ray.data.from_arrow(_mk_docs(5)), k=0)
