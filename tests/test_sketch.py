"""KMV bottom-k vocabulary sketch (pipelines/sketch.py) — independent
hashlib brute force, merge invariance across partitionings, estimator
accuracy sanity."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest
import ray.data

K = 16


def _hashes(texts) -> list[str]:
    words = set()
    for t in texts:
        if t:
            words.update(w for w in t.split(" ") if w)
    return sorted(hashlib.sha256(w.encode()).hexdigest()[:16] for w in words)


def _mk(texts) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "content": pa.array(texts, pa.string()),
            }
        )
    )


@pytest.mark.parametrize("parts", [1, 5])
def test_kmv_sketch_matches_brute_force(ray_session, parts):
    from europa_ray.pipelines.sketch import vocab_kmv_sketch

    texts = [f"w{i} w{i + 1} shared common" for i in range(0, 60, 2)]
    texts += ["", None]
    expect = _hashes(texts)[:K]
    got = vocab_kmv_sketch(_mk(texts).repartition(parts), k=K)
    assert got["h"].to_pylist() == expect
    assert got["rank"].to_pylist() == list(range(1, len(expect) + 1))


def test_kmv_sketch_under_k_is_exact(ray_session):
    from europa_ray.pipelines.sketch import distinct_word_estimate, vocab_kmv_sketch

    texts = ["a b c", "b c d"]  # 4 distinct words < K
    got = vocab_kmv_sketch(_mk(texts), k=K)
    assert got.num_rows == 4
    est = distinct_word_estimate(_mk(texts), k=K)
    assert est["n_hashes"].to_pylist() == [4]
    assert est["estimate"].to_pylist() == [4]


def test_kmv_estimator_formula_and_accuracy(ray_session):
    from europa_ray.pipelines.sketch import distinct_word_estimate

    n_true = 4000
    texts = [
        " ".join(f"tok{j}" for j in range(i, min(i + 100, n_true)))
        for i in range(0, n_true, 100)
    ]
    k = 256
    est = distinct_word_estimate(_mk(texts).repartition(3), k=k)
    hk = int(_hashes(texts)[k - 1], 16)
    assert est["n_hashes"].to_pylist() == [k]
    assert est["estimate"].to_pylist() == [((k - 1) << 64) // hk]
    # KMV standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est["estimate"][0].as_py() - n_true) / n_true < 0.25


def test_vocab_jaccard_kmv_matches_brute_force(ray_session):
    from europa_ray.pipelines.sketch import vocab_jaccard_kmv

    a_texts = [f"common{i} onlya{i}" for i in range(40)]
    b_texts = [f"common{i} onlyb{i}" for i in range(40)]
    ha, hb = set(_hashes(a_texts)), set(_hashes(b_texts))
    union = sorted(ha | hb)[:K]
    expect_common = sum(1 for h in sorted(ha)[:K] if h in hb and h in union
                        and h in set(sorted(hb)[:K]))
    got = vocab_jaccard_kmv(_mk(a_texts), _mk(b_texts).repartition(3), k=K)
    assert got["k_union"].to_pylist() == [len(union)]
    assert got["n_common"].to_pylist() == [expect_common]
    # sanity: the estimate tracks the true Jaccard (1/3) loosely at k=16
    j = got["n_common"][0].as_py() / got["k_union"][0].as_py()
    true_j = len(ha & hb) / len(ha | hb)
    assert abs(j - true_j) < 0.35


def test_vocab_jaccard_kmv_identical_and_disjoint(ray_session):
    from europa_ray.pipelines.sketch import vocab_jaccard_kmv

    texts = [f"tok{i}" for i in range(50)]
    same = vocab_jaccard_kmv(_mk(texts), _mk(texts), k=K)
    assert same["n_common"][0].as_py() == same["k_union"][0].as_py() == K
    other = [f"zzz{i}" for i in range(50)]
    disj = vocab_jaccard_kmv(_mk(texts), _mk(other), k=K)
    assert disj["n_common"].to_pylist() == [0]
    assert disj["k_union"].to_pylist() == [K]


def test_wordcount_cm_sketch_matches_brute_force(ray_session):
    import numpy as np

    from europa_ray.pipelines.sketch import (
        CM_SEEDS,
        wordcount_cm_sketch,
    )
    from europa_ray.util import splitmix64

    texts = ["a b a c", "b b d", "", None, "a"]
    counts = {}
    for t in texts:
        if t:
            for w in t.split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
    width = 32
    mat = np.zeros((len(CM_SEEDS), width), np.int64)
    for w, c in counts.items():
        u = np.uint64(int(hashlib.sha256(w.encode()).hexdigest()[:16], 16))
        for r, s in enumerate(CM_SEEDS):
            mat[r][int(splitmix64(u ^ np.uint64(s)) % np.uint64(width))] += c
    got = wordcount_cm_sketch(_mk(texts).repartition(3), width=width)
    want = [
        (r, b, int(mat[r][b]))
        for r in range(mat.shape[0])
        for b in range(width)
        if mat[r][b]
    ]
    assert list(zip(
        got["cm_row"].to_pylist(), got["bucket"].to_pylist(), got["c"].to_pylist()
    )) == want
    # every row's cell sum is the total token count
    total = sum(counts.values())
    for r in range(mat.shape[0]):
        assert sum(c for rr, _, c in want if rr == r) == total


def test_cm_word_estimates_one_sided(ray_session):
    import numpy as np

    from europa_ray.pipelines.sketch import cm_word_estimates

    texts = [("hot " * 30 + f"w{i} " + f"v{i % 7}").strip() for i in range(40)]
    counts = {}
    for t in texts:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    got = cm_word_estimates(_mk(texts).repartition(3), probe_k=5, width=32)
    assert got.num_rows == 5
    assert got["word"].to_pylist() == sorted(got["word"].to_pylist())
    for w, nt, ne in zip(
        got["word"].to_pylist(), got["n_true"].to_pylist(), got["n_est"].to_pylist()
    ):
        assert nt == counts[w]
        assert ne >= nt  # CM one-sided error
    # the runaway-frequent word is probed and estimated >= its true count
    assert "hot" in got["word"].to_pylist()
