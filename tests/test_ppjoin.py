"""Prefix-filter (AllPairs/PPJoin) exact Jaccard self-join tests.

The operator's guarantee is COMPLETENESS: every pair with true shingle-set
Jaccard >= tau is produced — verified here against brute force over random
corpora whose pair similarities straddle the threshold, plus the
forced-distributed equivalence and the short-row fallback edge."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _rand_docs(seed: int, n_base: int = 40, n_tokens: int = 120):
    """Random-token docs plus mutated copies whose true Jaccard lands on
    both sides of tau: 5-gram-set Jaccard decays ~(1-r)^5 with token drop
    rate r, so rates 0.5%..10% sweep J from ~0.97 down to ~0.45."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in rng.choice(100_000, 3_000, replace=False)])
    docs = []
    for i in range(n_base):
        toks = vocab[rng.integers(0, vocab.shape[0], n_tokens)]
        docs.append(" ".join(toks))
        if i % 2 == 0:
            rate = 0.002 + 0.07 * (i / n_base)
            keep = rng.random(n_tokens) > rate
            if keep.sum() >= 1:
                docs.append(" ".join(toks[keep]))
    return docs


def _brute_pairs(docs: list[str], tau: float):
    """Brute-force true pairs using the ENGINE's shingle semantics (same
    tokenizer/shingle/unique kernels), node-keyed, canonical int64 order."""
    from europa_ray.functions.text import shingles, tokenize_arrow, unique_per_row
    from europa_ray.util import hex_to_u64, sha256_hex_arrow

    col = pa.array(docs, pa.string())
    th, off = tokenize_arrow(col)
    sh, soff = shingles(th, off, 5)
    ush, uoff = unique_per_row(sh, soff)
    sets = {}
    nodes = hex_to_u64(sha256_hex_arrow(col)).view(np.int64)
    for i in range(len(docs)):
        sets[int(nodes[i])] = ush[uoff[i] : uoff[i + 1]]
    out = {}
    uniq = sorted(sets)
    for x in range(len(uniq)):
        for y in range(x + 1, len(uniq)):
            sa, sb = sets[uniq[x]], sets[uniq[y]]
            if sa.shape[0] == 0 or sb.shape[0] == 0:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).shape[0]
            if not inter:
                continue
            j = inter / (sa.shape[0] + sb.shape[0] - inter)
            if j >= tau:
                out[(uniq[x], uniq[y])] = round(j, 6)
    return out


def _files_ds(docs: list[str]):
    import ray.data

    n = len(docs)
    return ray.data.from_arrow(
        pa.table(
            {
                "repo": pa.array(["r"] * n),
                "path": pa.array([f"f{i}.txt" for i in range(n)]),
                "commit": pa.array(["c" * 40] * n),
                "size": pa.array([len(d) for d in docs], pa.int64()),
                "lang": pa.array(["txt"] * n),
                "content": pa.array(docs, pa.string()),
            }
        )
    )


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_exact_jaccard_equals_brute_force(ray_session, seed):
    """End-to-end: exact_jaccard_pairs == brute force EXACTLY (not just
    superset/threshold) — the completeness guarantee LSH banding lacks."""
    from europa_ray.pipelines.neardup import exact_jaccard_pairs

    docs = _rand_docs(seed)
    truth = _brute_pairs(docs, 0.72)
    got = exact_jaccard_pairs(_files_ds(docs)).to_pandas()
    got_d = {(int(r.a), int(r.b)): round(float(r.jaccard), 6) for r in got.itertuples()}
    assert got_d == truth
    assert len(truth) >= 5, "fixture must exercise pairs above tau"


def test_prefix_candidates_superset_of_truth(ray_session):
    """Candidates alone (pre-verification) cover every true pair."""
    from europa_ray.stages.ppjoin import prefix_candidate_pairs

    docs = _rand_docs(99)
    truth = _brute_pairs(docs, 0.72)
    cand = prefix_candidate_pairs(_files_ds(docs)).to_pandas()
    cset = {(int(r.a), int(r.b)) for r in cand.itertuples()}
    missing = set(truth) - cset
    assert not missing


def test_prefix_distributed_path_equivalent(ray_session):
    """Forced budget-0 explode gather → fully distributed groupby(gram)
    pairing produces the identical candidate set."""
    from europa_ray.stages.ppjoin import prefix_candidate_pairs

    docs = _rand_docs(5, n_base=24)
    driver = prefix_candidate_pairs(_files_ds(docs)).to_pandas()
    dist = prefix_candidate_pairs(
        _files_ds(docs), driver_max_explode_rows=0
    ).to_pandas()
    key = ["a", "b"]
    d1 = driver.sort_values(key).reset_index(drop=True)
    d2 = dist[key].sort_values(key).reset_index(drop=True)
    assert d1[key].equals(d2)


def _corpus_split(docs: list[str]):
    """Alternating left/right corpus split by doc index → sorted distinct
    node arrays (mutants follow their base in _rand_docs, so true near-dup
    pairs straddle the split)."""
    from europa_ray.util import hex_to_u64, sha256_hex_arrow

    nodes = hex_to_u64(sha256_hex_arrow(pa.array(docs, pa.string()))).view(
        np.int64
    )
    return np.unique(nodes[0::2]), np.unique(nodes[1::2])


def test_prefix_candidates_cross_sides(ray_session):
    """cross_sides mode == the cross-oriented subset of the self-join
    candidates (exact equality on a no-large-group corpus), and covers
    every TRUE cross pair (completeness)."""
    from europa_ray.stages.ppjoin import _cross_pair_keep, prefix_candidate_pairs

    docs = _rand_docs(11)
    left, right = _corpus_split(docs)
    full = prefix_candidate_pairs(_files_ds(docs)).to_pandas()
    cross = prefix_candidate_pairs(
        _files_ds(docs), cross_sides=(left, right)
    ).to_pandas()
    keep = _cross_pair_keep(
        full["a"].to_numpy(), full["b"].to_numpy(), left, right
    )
    expect = {
        (int(a), int(b))
        for a, b in zip(full["a"].to_numpy()[keep], full["b"].to_numpy()[keep])
    }
    got = {(int(r.a), int(r.b)) for r in cross.itertuples()}
    assert got == expect
    truth = _brute_pairs(docs, 0.72)
    t_a = np.array([a for a, _ in truth], np.int64)
    t_b = np.array([b for _, b in truth], np.int64)
    t_keep = _cross_pair_keep(t_a, t_b, left, right)
    cross_truth = {(int(a), int(b)) for a, b in zip(t_a[t_keep], t_b[t_keep])}
    assert cross_truth, "fixture must exercise true cross pairs"
    assert cross_truth <= got


def test_prefix_candidates_cross_sides_distributed_equivalent(ray_session):
    """cross_sides on the forced budget-0 distributed path == driver path."""
    from europa_ray.stages.ppjoin import prefix_candidate_pairs

    docs = _rand_docs(11, n_base=24)
    left, right = _corpus_split(docs)
    driver = prefix_candidate_pairs(
        _files_ds(docs), cross_sides=(left, right)
    ).to_pandas()
    dist = prefix_candidate_pairs(
        _files_ds(docs), cross_sides=(left, right), driver_max_explode_rows=0
    ).to_pandas()
    key = ["a", "b"]
    d1 = driver.sort_values(key).reset_index(drop=True)
    d2 = dist[key].sort_values(key).reset_index(drop=True)
    assert d1[key].equals(d2)


def test_prefix_lengths_sound():
    """Exact-rational check: the float prefix length is never SMALLER than
    the true n - ceil(tau*n) + 1 (a smaller prefix could miss pairs)."""
    from fractions import Fraction

    from europa_ray.stages.ppjoin import prefix_lengths

    for tau in (0.5, 0.7, 0.72, 0.8, 0.9, 0.95):
        n = np.arange(1, 500, dtype=np.int64)
        p = prefix_lengths(n, tau)
        ft = Fraction(tau).limit_denominator(10**9)
        for ni, pi in zip(n.tolist(), p.tolist()):
            true_p = ni - (-(-(ft.numerator * ni) // ft.denominator)) + 1
            assert pi >= min(max(true_p, 1), ni)
            assert 1 <= pi <= ni


def test_short_row_whole_gram_fallback(ray_session):
    """Docs with <5 tokens pair through the whole-row shingle: same token
    sequence under different raw content (different nodes) → J = 1.0."""
    from europa_ray.pipelines.neardup import exact_jaccard_pairs

    docs = ["alpha beta gamma", "alpha  beta gamma", "delta epsilon zeta"]
    got = exact_jaccard_pairs(_files_ds(docs)).to_pandas()
    assert len(got) == 1
    assert got.jaccard.iloc[0] == 1.0


def test_exact_duplicates_collapse_to_one_node(ray_session):
    """Identical contents share a node: no self-pairs, and a third
    near-duplicate pairs each distinct node once."""
    from europa_ray.pipelines.neardup import exact_jaccard_pairs

    base = " ".join(f"tok{i}" for i in range(100))
    near = " ".join(f"tok{i}" for i in range(99))
    got = exact_jaccard_pairs(_files_ds([base, base, near])).to_pandas()
    assert len(got) == 1  # (base-node, near-node); never (base, base)
    assert (got.a != got.b).all()


def _all_pairs_reference(gid, nd, sz, tau):
    """Per-group all-pairs with the length filter, as plain sets."""
    from europa_ray.stages.ppjoin import _length_filter

    out = set()
    for g in np.unique(gid):
        seg = np.nonzero(gid == g)[0]
        n = nd[seg]
        s = sz[seg]
        iu, ju = np.triu_indices(n.shape[0], k=1)
        a, b = _length_filter(n[iu], n[ju], s[iu], s[ju], tau)
        out |= {(min(int(x), int(y)), max(int(x), int(y))) for x, y in zip(a, b)}
    return out


def _mk_groups(rng, n_groups, size, overlap_base=None):
    """(gid, nd, sz) arrays: n_groups groups of `size` node-sorted members."""
    gids, nds = [], []
    for g in range(n_groups):
        if overlap_base is not None:
            # heavy overlap with the base set (merge-path trigger)
            take = rng.choice(overlap_base, size - 2, replace=False)
            extra = rng.integers(1 << 40, 1 << 60, 2)
            members = np.unique(np.concatenate([take, extra]))
        else:
            members = np.unique(rng.integers(1 << 40, 1 << 60, size))
        gids.append(np.full(members.shape[0], g, dtype=np.int64))
        nds.append(np.sort(members))
    gid = np.concatenate(gids)
    nd = np.concatenate(nds)
    sz = np.full(nd.shape[0], 100, dtype=np.int64)
    return gid, nd, sz


def test_grouped_all_pairs_merge_path_superset():
    """Large overlapping groups (the boilerplate-clique regime) go through
    the union-merge path: the result must be a SUPERSET of per-group
    all-pairs (completeness — extras are discarded by exact verify)."""
    from europa_ray.stages.ppjoin import _grouped_all_pairs

    rng = np.random.default_rng(3)
    base = np.unique(rng.integers(1 << 40, 1 << 60, 40))
    gid, nd, sz = _mk_groups(rng, 6, 32, overlap_base=base)
    truth = _all_pairs_reference(gid, nd, sz, 0.72)
    a, b = _grouped_all_pairs(gid, nd, sz, 0.72, large_group=8)
    got = {(min(int(x), int(y)), max(int(x), int(y))) for x, y in zip(a, b)}
    assert truth <= got
    assert len(truth) > 100


def test_grouped_all_pairs_degenerate_many_large_groups():
    """>64 distinct large groups: the O(L^2) overlap scan is skipped and
    each group pairs directly — result must EQUAL per-group all-pairs."""
    from europa_ray.stages.ppjoin import _grouped_all_pairs

    rng = np.random.default_rng(4)
    gid, nd, sz = _mk_groups(rng, 70, 12)  # 70 disjoint groups >= large_group
    truth = _all_pairs_reference(gid, nd, sz, 0.72)
    a, b = _grouped_all_pairs(gid, nd, sz, 0.72, large_group=8)
    got = {(min(int(x), int(y)), max(int(x), int(y))) for x, y in zip(a, b)}
    assert got == truth


def test_clique_corpus_end_to_end_exact(ray_session):
    """Boilerplate clique end-to-end with the merge path FORCED
    (large_group=8): candidates stay complete and exact verification
    yields exactly the brute-force pairs."""
    from europa_ray.pipelines.neardup import exact_jaccard_pairs
    from europa_ray.stages.ppjoin import prefix_candidate_pairs

    rng = np.random.default_rng(11)
    header = " ".join(f"h{i}" for i in range(400))
    docs = [header + " " + " ".join(f"u{j}_{i}" for i in range(12)) for j in range(30)]
    docs += [" ".join(f"x{j}_{i}" for i in range(60)) for j in range(5)]
    truth = _brute_pairs(docs, 0.72)
    assert len(truth) >= 400  # the clique is above tau

    cand = prefix_candidate_pairs(_files_ds(docs), large_group=8).to_pandas()
    cset = {(int(r.a), int(r.b)) for r in cand.itertuples()}
    assert set(truth) <= cset

    got = exact_jaccard_pairs(_files_ds(docs)).to_pandas()
    got_d = {(int(r.a), int(r.b)): round(float(r.jaccard), 6) for r in got.itertuples()}
    assert got_d == truth


@pytest.mark.parametrize("seed", [3, 17])
def test_df_order_identical_pairs(ray_session, seed):
    """df-ascending ordering is a pure performance knob: the verified pair
    set (values included) is IDENTICAL to hash order — completeness holds
    under any fixed total order."""
    from dataclasses import replace

    from europa_ray.config import DEFAULT_CONFIG
    from europa_ray.pipelines.neardup import exact_jaccard_pairs

    docs = _rand_docs(seed)
    truth = _brute_pairs(docs, 0.72)
    got = exact_jaccard_pairs(
        _files_ds(docs), replace(DEFAULT_CONFIG, ppjoin_order="df")
    ).to_pandas()
    got_d = {(int(r.a), int(r.b)): round(float(r.jaccard), 6) for r in got.itertuples()}
    assert got_d == truth


def test_df_order_distributed_path_equivalent(ray_session):
    """df ordering composes with the forced-distributed dispatch."""
    from dataclasses import replace

    from europa_ray.config import DEFAULT_CONFIG
    from europa_ray.stages.ppjoin import prefix_candidate_pairs

    cfg = replace(DEFAULT_CONFIG, ppjoin_order="df")
    docs = _rand_docs(11, n_base=24)
    driver = prefix_candidate_pairs(_files_ds(docs), cfg).to_pandas()
    dist = prefix_candidate_pairs(
        _files_ds(docs), cfg, driver_max_explode_rows=0
    ).to_pandas()
    key = ["a", "b"]
    d1 = driver.sort_values(key).reset_index(drop=True)
    d2 = dist[key].sort_values(key).reset_index(drop=True)
    assert d1[key].equals(d2)


def _partial_share_docs(n: int = 400, header_toks: int = 60, body_toks: int = 120):
    """PARTIAL-share skew: every doc opens with the same hot boilerplate
    header (well below tau of any pair's union) followed by a distinct
    body — hash-order prefixes keep header grams (corpus-sized buckets);
    df order demotes them (buckets collapse to ~df_min)."""
    header = " ".join(f"hdr{i}" for i in range(header_toks))
    return [
        header + " " + " ".join(f"b{d}x{i}" for i in range(body_toks))
        for d in range(n)
    ]


def test_df_order_collapses_partial_share_buckets(ray_session):
    """The case df-ascending exists for: hot partially-shared grams leave
    every prefix, so the max gram bucket collapses from ~corpus-sized to
    df_min-bounded, and the bucket quadratic work drops by orders of
    magnitude. Pair output (empty here — headers are below tau) matches."""
    from dataclasses import replace

    import ray

    from europa_ray.config import DEFAULT_CONFIG
    from europa_ray.stages.ppjoin import (
        explode_prefix,
        gram_df_table,
        prefix_candidate_pairs,
    )

    docs = _partial_share_docs()
    ds = _files_ds(docs)

    def max_bucket(cfg):
        df_ref = None
        if cfg.ppjoin_order == "df":
            t = gram_df_table(ds, cfg)
            assert t is not None
            df_ref = ray.put(t)
        kn = ds.map_batches(
            explode_prefix,
            fn_kwargs={"cfg": cfg, "content_col": "content", "df_table": df_ref},
            batch_format="pyarrow",
        )
        import numpy as np

        gs = [b["gram"].to_numpy() for b in kn.iter_batches(batch_format="pyarrow")]
        g = np.concatenate(gs)
        _, cnt = np.unique(g, return_counts=True)
        return int(cnt.max()), float((cnt * (cnt - 1) // 2).sum())

    hash_max, hash_quad = max_bucket(DEFAULT_CONFIG)
    df_max, df_quad = max_bucket(replace(DEFAULT_CONFIG, ppjoin_order="df"))
    assert hash_max >= 100  # hash order: header grams bucket ~corpus-sized
    assert df_max <= 8      # df order: hot grams demoted out of prefixes
    assert df_quad < hash_quad / 100

    # and the verified output is identical under both orders
    truth = _brute_pairs(docs, 0.72)
    for mode in ("hash", "df"):
        cand = prefix_candidate_pairs(
            ds, replace(DEFAULT_CONFIG, ppjoin_order=mode)
        ).to_pandas()
        cset = {(int(r.a), int(r.b)) for r in cand.itertuples()}
        assert set(truth) <= cset


def test_distributed_clique_dedup_equivalent(ray_session):
    """The distributed path's distinct-group dedup (one representative gram
    per node set) must not change the candidate set on a boilerplate clique
    — the regime it exists for (a k-doc clique sharing g prefix grams would
    otherwise regenerate the same k²/2 pairs g times)."""
    from europa_ray.stages.ppjoin import prefix_candidate_pairs

    docs = [
        " ".join(f"cl{j}" for j in range(200)) + f" u{i}a u{i}b"
        for i in range(40)
    ]
    ds = _files_ds(docs)
    key = ["a", "b"]
    drv = prefix_candidate_pairs(ds).to_pandas().sort_values(key).reset_index(drop=True)
    dist = (
        prefix_candidate_pairs(ds, driver_max_explode_rows=0)
        .to_pandas()[key]
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(drv) >= 40 * 39 // 2  # full clique present
    assert drv[key].equals(dist)
