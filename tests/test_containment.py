"""Containment join (pipelines/containment.py): brute-force parity on both
dispatch paths, directional semantics, excerpt fixture truth."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from europa_ray.pipelines.containment import containment_pairs
from europa_ray.pipelines.neardup import shingle_set_payload

TAU = 0.8


def _mk_corpus(n: int = 90, seed: int = 3) -> pa.Table:
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(10, 60))))
        for _ in range(n)
    ]
    # planted: two excerpts (containment 1.0), one exact dup (same node —
    # no pair), one empty, one null
    texts[1] = " ".join(texts[0].split(" ")[5:25])
    texts[3] = " ".join(texts[2].split(" ")[0:15])
    texts[5] = texts[4]
    texts[7] = ""
    texts[8] = None
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "repo": pa.array(["r"] * n),
            "path": pa.array([f"{i}.py" for i in range(n)]),
            "commit": pa.array(["c"] * n),
            "lang": pa.array(["py"] * n),
            "content": pa.array(texts, pa.string()),
        }
    )


def _signed_node(txt: str) -> int:
    u = int(hashlib.sha256(txt.encode()).hexdigest()[:16], 16)
    return u - (1 << 64) if u >= (1 << 63) else u


def _brute(t: pa.Table) -> dict[tuple[int, int], float]:
    sets: dict[int, set] = {}
    for txt in sorted({x for x in t["content"].to_pylist() if x}):
        sa, _ = shingle_set_payload(pa.array([txt]), 5)
        sets[_signed_node(txt)] = set(sa.tolist())
    want = {}
    for na, A in sets.items():
        for nb, B in sets.items():
            if na == nb or not A:
                continue
            c = len(A & B) / len(A)
            if c >= TAU:
                want[(na, nb)] = round(c, 6)
    return want


@pytest.mark.parametrize(
    "explode_budget,pair_work_min",
    [
        (100_000_000, 1 << 62),  # driver path, inline pairing tail
        (100_000_000, 0),  # driver path, FORCED parallel pairing tail
        (0, 1 << 62),  # forced-distributed path
    ],
)
def test_containment_matches_bruteforce(ray_session, explode_budget, pair_work_min):
    """Driver path (inline AND forced-parallel pairing tail) and the
    forced-distributed path all equal brute force."""
    import ray.data

    t = _mk_corpus()
    got = containment_pairs(
        ray.data.from_arrow(t).repartition(3),
        tau=TAU,
        driver_max_explode_rows=explode_budget,
        parallel_pair_work_min=pair_work_min,
    ).to_pandas()
    got_map = {(a, b): c for a, b, c in zip(got.a, got.b, got.containment)}
    want = _brute(t)
    assert got_map == want
    assert len(want) >= 2  # the planted excerpts are found
    # planted excerpts are directional: contained → container only
    for big, small in ((0, 1), (2, 3)):
        texts = t["content"].to_pylist()
        na, nb = _signed_node(texts[small]), _signed_node(texts[big])
        assert got_map[(na, nb)] == 1.0
        assert (nb, na) not in got_map or got_map[(nb, na)] < 1.0


def test_containment_excerpt_fixture(ray_session):
    """with_excerpts plants containment-1.0 truths the operator must find."""
    import ray.data

    from europa_ray.sources.augment import (
        EXCERPT_EVERY,
        EXCERPT_MIN_TOKENS,
        with_excerpts,
    )

    t = _mk_corpus(60, seed=11)
    ds = with_excerpts(ray.data.from_arrow(t))
    got = containment_pairs(ds, tau=TAU).to_pandas()
    got_pairs = set(zip(got.a, got.b))
    texts = t["content"].to_pylist()
    n_expected = 0
    for d, txt in enumerate(texts):
        if not txt or d % EXCERPT_EVERY != 0:
            continue
        toks = txt.split(" ")
        n = len(toks)
        if n < EXCERPT_MIN_TOKENS:
            continue
        s = n // 5
        exc = " ".join(toks[s : s + (3 * n) // 5])
        assert (_signed_node(exc), _signed_node(txt)) in got_pairs
        n_expected += 1
    assert n_expected >= 5


def test_containment_validation(ray_session):
    import ray.data

    with pytest.raises(ValueError):
        containment_pairs(ray.data.from_arrow(_mk_corpus(10)), tau=0.0)


def _brute_kept(t: pa.Table) -> set[tuple[int, int]]:
    sets: dict[int, set] = {}
    for txt in sorted({x for x in t["content"].to_pylist() if x}):
        sa, _ = shingle_set_payload(pa.array([txt]), 5)
        sets[_signed_node(txt)] = set(sa.tolist())
    dropped = set()
    for na, A in sets.items():
        for nb, B in sets.items():
            if na == nb or not A:
                continue
            c = len(A & B) / len(A)
            if c >= TAU and (len(B) > len(A) or (len(B) == len(A) and nb < na)):
                dropped.add(na)
    return {(n, len(s)) for n, s in sets.items() if n not in dropped}


@pytest.mark.parametrize("pair_budget", [5_000_000, 0])
def test_containment_kept_nodes(ray_session, pair_budget):
    """Policy layer: contained docs drop, supersets survive; broadcast and
    forced-join paths agree with brute force."""
    import ray.data

    from europa_ray.pipelines.containment import containment_kept_nodes

    t = _mk_corpus()
    got = containment_kept_nodes(
        ray.data.from_arrow(t).repartition(3),
        tau=TAU,
        pair_gather_max=pair_budget,
    ).to_pandas()
    rows = set(zip(got.node, got.n_grams))
    want = _brute_kept(t)
    assert rows == want
    texts = t["content"].to_pylist()
    kept_nodes = {n for n, _ in rows}
    # planted excerpts are dropped, their sources kept
    for big, small in ((0, 1), (2, 3)):
        assert _signed_node(texts[big]) in kept_nodes
        assert _signed_node(texts[small]) not in kept_nodes


def _mk_two_corpora():
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(50)]
    new_texts = [
        " ".join(rng.choice(words, size=int(rng.integers(20, 70))))
        for _ in range(60)
    ]
    new_texts[5] = ""
    refs = [" ".join(new_texts[i].split(" ")[3:18]) for i in range(4)]
    refs.append(new_texts[10])  # identical content in both corpora
    refs += [" ".join(rng.choice(words, size=25)) for _ in range(3)]

    def tbl(texts, base):
        n = len(texts)
        return pa.table(
            {
                "doc_id": pa.array(np.arange(base, base + n, dtype=np.int64)),
                "repo": pa.array(["r"] * n),
                "path": pa.array([f"{base+i}.py" for i in range(n)]),
                "commit": pa.array(["c"] * n),
                "lang": pa.array(["py"] * n),
                "content": pa.array(texts, pa.string()),
            }
        )

    return tbl(new_texts, 0), tbl(refs, 1000), new_texts, refs


def _brute_cross(new_texts, refs) -> dict[int, tuple[int, float]]:
    rsets = []
    for t in sorted(set(x for x in refs if x)):
        v, _ = shingle_set_payload(pa.array([t]), 5)
        rsets.append(set(v.tolist()))
    out = {}
    for d, t in enumerate(new_texts):
        if not t:
            continue
        v, _ = shingle_set_payload(pa.array([t]), 5)
        S = set(v.tolist())
        hits = [
            len(R & S) / len(R) for R in rsets if R and len(R & S) / len(R) >= TAU
        ]
        if hits:
            out[d] = (len(hits), round(max(hits), 6))
    return out


@pytest.mark.parametrize("ref_budget", [20_000_000, 0])
def test_cross_corpus_containment(ray_session, ref_budget):
    """Broadcast probe-index path and forced union-fallback both equal
    brute force; identity (same content in both corpora) counts at 1.0."""
    import ray.data

    from europa_ray.pipelines.containment import cross_corpus_containment_stats

    new_t, ref_t, new_texts, refs = _mk_two_corpora()
    got = cross_corpus_containment_stats(
        ray.data.from_arrow(new_t).repartition(3),
        ray.data.from_arrow(ref_t).repartition(2),
        tau=TAU,
        ref_gather_max_rows=ref_budget,
    ).to_pandas()
    gm = {
        int(r.doc_id): (int(r.n_ref_contained), round(float(r.best_containment), 6))
        for r in got.itertuples()
    }
    assert gm == _brute_cross(new_texts, refs)
    assert gm[10][1] == 1.0  # the identity match
    for d in range(4):
        assert gm[d][1] == 1.0  # excerpt containers
