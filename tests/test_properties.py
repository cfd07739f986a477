"""Property-based tests (hypothesis) for the pure kernels, plus unit tests
for the classifier and neighbor-set operators."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from europa_ray.functions.sig import make_perm_seeds, minhash_signatures
from europa_ray.functions.text import TOKEN_RE, shingles, tokenize, unique_per_row

texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=200,
    ),
    min_size=0,
    max_size=8,
)


@settings(max_examples=50, deadline=None)
@given(texts_strategy)
def test_tokenize_counts_match_regex(texts):
    th, off = tokenize(texts)
    assert off[-1] == sum(len(TOKEN_RE.findall(t)) for t in texts)
    assert np.diff(off).tolist() == [len(TOKEN_RE.findall(t)) for t in texts]


@settings(max_examples=50, deadline=None)
@given(texts_strategy)
def test_batch_vs_single_row_shingles_identical(texts):
    """Batching must never change a row's shingle multiset (boundary
    masking)."""
    th, off = tokenize(texts)
    sh, soff = shingles(th, off, 5)
    for i, t in enumerate(texts):
        th1, off1 = tokenize([t])
        sh1, _ = shingles(th1, off1, 5)
        assert sorted(sh1.tolist()) == sorted(sh[soff[i] : soff[i + 1]].tolist())


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=300))
def test_minhash_permutation_invariance(vals):
    """Signature depends only on the shingle SET: order and duplicates
    must not matter."""
    seeds = make_perm_seeds(128, 42)
    arr = np.array(vals, dtype=np.uint64)
    rng = np.random.default_rng(0)
    shuffled = arr.copy()
    rng.shuffle(shuffled)
    dup = np.concatenate([arr, arr[: len(arr) // 2]])
    for variant in (shuffled, dup):
        a, _ = unique_per_row(arr, np.array([0, len(arr)]))
        b, _ = unique_per_row(variant, np.array([0, len(variant)]))
        sig_a = minhash_signatures(a, np.array([0, len(a)]), seeds)
        sig_b = minhash_signatures(b, np.array([0, len(b)]), seeds)
        assert (sig_a == sig_b).all()


def test_identify_kind_chain():
    from europa_ray.stages.classify import identify_kind

    batch = pa.table(
        {
            "lang": pa.array(["python", "en", "nosuch", None]),
            "path": pa.array(["a/b.py", "x/y.rs", "z/w.weird", "n/o.MD"]),
        }
    )
    out = identify_kind(batch)
    # lang wins when known; else extension chain; else unknown
    assert out["kind"].to_pylist() == ["python", "rust", "unknown", "md"]


def test_neighbor_sets(ray_session):
    import ray.data

    from europa_ray.pipelines.neardup import neighbor_sets

    pairs = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 1, 2], pa.int64()),
                "b": pa.array([2, 3, 3], pa.int64()),
            }
        )
    )
    out = neighbor_sets(pairs).to_pandas().sort_values("node").reset_index(drop=True)
    got = {int(r.node): sorted(r.neighbors) for r in out.itertuples()}
    assert got == {1: [2, 3], 2: [1, 3], 3: [1, 2]}
    assert out.n_neighbors.tolist() == [2, 2, 2]


@settings(max_examples=50, deadline=None)
@given(texts_strategy)
def test_token_count_arrow_matches_regex(texts):
    from europa_ray.functions.text import token_count_arrow, token_counts

    arr = pa.array([t for t in texts], pa.string())
    got = token_count_arrow(arr)
    assert got.tolist() == token_counts(texts).tolist()


def test_token_count_arrow_edge_bytes():
    from europa_ray.functions.text import token_count_arrow, token_counts

    texts = ["a\x0bb", "", "x", "\u00e9 caf\u00e9 1+2", "tab\tsep", None, "\v\v"]
    arr = pa.array(texts, pa.string())
    got = token_count_arrow(arr)
    want = token_counts(texts)
    assert got.tolist() == want.tolist()
