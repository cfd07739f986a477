"""Tiered dedup (exact → norm → near over survivors) — planted-truth,
path-equivalence and invariant tests for :mod:`europa_ray.pipelines.tiers`."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from europa_ray.config import EngineConfig

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _corpus():
    return pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7, 8, 9],
            "lang": ["py"] * 9,
            "content": [
                BASE,  # 1: canonical rep of the whole family
                BASE,  # 2: byte-exact dup of 1
                "# header\n" + BASE.upper() + "  \n",  # 3: norm dup of 1
                BASE + " extra",  # 4: near dup of 1 (J = 6/8 ≥ 0.5)
                "totally different content with its own unique words",  # 5
                "",  # 6: empty → kept, never dedups
                None,  # 7: null → kept
                "# only a comment",  # 8: normalizes to empty → keeps raw id
                "# another comment",  # 9: also norm-empty → must NOT merge w/ 8
            ],
        }
    )


def _cfg():
    # oracle config: complete candidates + TRUE-Jaccard verify; τ=0.5 so
    # the planted one-token-appended mutant is a near dup
    return EngineConfig(candidates="all", verify_mode="exact", jaccard_threshold=0.5)


EXPECT = {
    1: ("kept", 1),
    2: ("exact", 1),
    3: ("norm", 1),
    4: ("near", 1),
    5: ("kept", 5),
    6: ("kept", 6),
    7: ("kept", 7),
    8: ("kept", 8),
    9: ("kept", 9),
}


def _run(files, **kw) -> pd.DataFrame:
    from europa_ray.pipelines.tiers import tiered_dedup

    return tiered_dedup(files, _cfg(), id_col="doc_id", **kw).to_pandas()


def test_planted_truth_driver_path(ray_session):
    import ray.data

    out = _run(ray.data.from_arrow(_corpus()))
    got = {int(r.doc_id): (r.tier, int(r.dup_of)) for r in out.itertuples()}
    assert got == EXPECT


def test_distributed_path_equivalence(ray_session):
    """Forcing the driver budget to 0 exercises the groupby/join path;
    output must be identical."""
    import ray.data

    a = _run(ray.data.from_arrow(_corpus()))
    b = _run(ray.data.from_arrow(_corpus()), driver_max_keys=0)
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_invariants(ray_session):
    """Structural invariants: one row per input doc; dup_of of every drop
    is a kept doc (the mapping is total and idempotent); kept rows map to
    themselves; tiers partition the corpus."""
    import ray.data

    out = _run(ray.data.from_arrow(_corpus()))
    assert sorted(out.doc_id) == list(range(1, 10))
    kept = set(out[out.tier == "kept"].doc_id)
    assert (out[out.tier == "kept"].dup_of == out[out.tier == "kept"].doc_id).all()
    dropped = out[out.tier != "kept"]
    assert set(dropped.dup_of).issubset(kept)
    assert set(out.tier).issubset({"kept", "exact", "norm", "near"})


def test_norm_empty_docs_never_merge(ray_session):
    """Docs that normalize to empty keep their RAW digest identity: two
    different all-comment files must both be kept (the tier never merges
    contentless docs), but two byte-identical all-comment files are still
    exact dups."""
    import ray.data

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "lang": ["py"] * 3,
            "content": ["# aaa", "# bbb", "# aaa"],
        }
    )
    out = _run(ray.data.from_arrow(t))
    got = {int(r.doc_id): (r.tier, int(r.dup_of)) for r in out.itertuples()}
    assert got == {1: ("kept", 1), 2: ("kept", 2), 3: ("exact", 1)}


def test_tier_precedence(ray_session):
    """A doc that is BOTH byte-exact to one doc and near-dup to another is
    attributed to the CHEAPEST tier that catches it (exact)."""
    import ray.data

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "lang": ["py"] * 3,
            "content": [BASE, BASE, BASE + " extra"],
        }
    )
    out = _run(ray.data.from_arrow(t))
    got = {int(r.doc_id): (r.tier, int(r.dup_of)) for r in out.itertuples()}
    assert got == {1: ("kept", 1), 2: ("exact", 1), 3: ("near", 1)}


def test_all_empty_corpus(ray_session):
    import ray.data

    t = pa.table(
        {"doc_id": [1, 2], "lang": ["py", "py"], "content": ["", None]}
    )
    out = _run(ray.data.from_arrow(t))
    assert list(out.tier) == ["kept", "kept"]
    assert list(out.dup_of) == [1, 2]


@pytest.mark.parametrize("budget", [None, 0])
def test_near_tier_chain_through_survivors(ray_session, budget):
    """The near tier must see ONLY the exact/norm survivors: a near-dup
    mutant of a dropped exact copy still clusters with the family's single
    survivor (transitivity through tiers)."""
    import ray.data

    t = pa.table(
        {
            "doc_id": [10, 11, 12],
            "lang": ["py"] * 3,
            "content": [BASE, BASE, BASE + " tail"],
        }
    )
    kw = {} if budget is None else {"driver_max_keys": budget}
    out = _run(ray.data.from_arrow(t), **kw)
    got = {int(r.doc_id): (r.tier, int(r.dup_of)) for r in out.itertuples()}
    assert got == {10: ("kept", 10), 11: ("exact", 10), 12: ("near", 10)}


LONG = BASE + " lambda mu nu xi omicron pi rho sigma tau upsilon"


@pytest.mark.parametrize("budget", [None, 0])
def test_rep_rule_longest(ray_session, budget):
    """keep-longest: the norm and near tiers keep the member with the most
    content bytes (ties → min id); the exact tier still keeps min id
    (byte-identical members have equal length)."""
    import ray.data

    from europa_ray.pipelines.tiers import tiered_dedup

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "lang": ["py"] * 6,
            "content": [
                BASE,                      # 1: near dup of 2, SHORTER
                BASE + " extra",           # 2: longest of the near family
                "# h\n" + LONG.upper(),    # 3: norm dup of 4, LONGER raw bytes
                LONG,                      # 4: norm family (norm-identical to 3)
                "xyz " * 30,               # 5: exact family
                "xyz " * 30,               # 6: exact dup of 5 (same length → min id)
            ],
        }
    )
    kw = {} if budget is None else {"driver_max_keys": budget}
    out = tiered_dedup(
        ray.data.from_arrow(t), _cfg(), id_col="doc_id", rep_rule="longest", **kw
    ).to_pandas()
    got = {int(r.doc_id): (r.tier, int(r.dup_of)) for r in out.itertuples()}
    assert got == {
        1: ("near", 2),   # 2 is longer → 2 survives, 1 dropped
        2: ("kept", 2),
        3: ("kept", 3),   # 3 has more raw bytes than 4 → 3 survives
        4: ("norm", 3),
        5: ("kept", 5),   # equal lengths → min id
        6: ("exact", 5),
    }


def test_rep_rule_validation(ray_session):
    import ray.data

    from europa_ray.pipelines.tiers import tiered_dedup

    t = pa.table({"doc_id": [1], "lang": ["py"], "content": ["x"]})
    with pytest.raises(ValueError, match="rep_rule"):
        tiered_dedup(ray.data.from_arrow(t), _cfg(), rep_rule="best")


def test_idempotence(ray_session):
    """Running tiered dedup over the KEPT subset yields all-kept: at the
    complete-candidates config the kept set has no byte/norm/near
    duplicate pair left (any surviving pair with J ≥ τ would have been an
    edge of the same component, contradicting one-rep-per-cluster)."""
    import ray.data

    t = _corpus()
    out = _run(ray.data.from_arrow(t))
    kept_ids = set(out[out.tier == "kept"].doc_id)
    mask = pa.array([int(i) in kept_ids for i in t["doc_id"].to_pylist()])
    out2 = _run(ray.data.from_arrow(t.filter(mask)))
    assert (out2.tier == "kept").all()
    assert (out2.dup_of == out2.doc_id).all()


def test_tier_savings(ray_session):
    """The rollup partitions the corpus: per-tier doc counts match the
    attribution table and byte totals match a pandas recount."""
    import ray.data

    from europa_ray.pipelines.tiers import tier_savings

    t = _corpus()
    out = _run(ray.data.from_arrow(t))
    sav = tier_savings(ray.data.from_arrow(t), _cfg(), id_col="doc_id").to_pandas()
    assert sav.n_docs.sum() == len(out)
    want_counts = out.tier.value_counts().to_dict()
    got_counts = dict(zip(sav.tier, sav.n_docs))
    assert got_counts == want_counts
    lens = {
        int(d): len(c.encode()) if c else 0
        for d, c in zip(t["doc_id"].to_pylist(), t["content"].to_pylist())
    }
    by_tier = {}
    for r in out.itertuples():
        by_tier[r.tier] = by_tier.get(r.tier, 0) + lens[int(r.doc_id)]
    assert dict(zip(sav.tier, sav.total_bytes)) == by_tier


@pytest.mark.parametrize("rule", ["min_id", "longest"])
@pytest.mark.parametrize("budget", [None, 0])
def test_negative_ids(ray_session, rule, budget):
    """Regression: hash-derived row_ids are NEGATIVE int64 half the time;
    the composite repkeys must stay order-preserving (a raw signed lpad
    broke both ordering and the fixed-width id slice)."""
    import ray.data

    from europa_ray.pipelines.tiers import tiered_dedup

    t = pa.table(
        {
            "doc_id": [-9_000_000_000_000_000_000, -5, 7],
            "lang": ["py"] * 3,
            "content": [BASE, BASE + " extra", BASE],
        }
    )
    kw = {} if budget is None else {"driver_max_keys": budget}
    out = tiered_dedup(
        ray.data.from_arrow(t), _cfg(), id_col="doc_id", rep_rule=rule, **kw
    ).to_pandas()
    got = {int(r.doc_id): (r.tier, int(r.dup_of)) for r in out.itertuples()}
    big_neg = -9_000_000_000_000_000_000
    if rule == "min_id":
        # exact family {big_neg, 7}: rep = big_neg; -5 is near-dup of it
        assert got == {
            big_neg: ("kept", big_neg),
            -5: ("near", big_neg),
            7: ("exact", big_neg),
        }
    else:
        # longest: -5's content is longer → it survives the near tier
        assert got == {
            big_neg: ("near", -5),
            -5: ("kept", -5),
            7: ("exact", big_neg),
        }


def test_permutation_invariance(ray_session):
    """Tier attribution is a function of (content, id), not input order."""
    import ray.data

    t = _corpus()
    idx = pa.array([4, 8, 0, 6, 2, 7, 1, 5, 3])
    perm = pa.table({c: t[c].take(idx) for c in t.column_names})
    a = _run(ray.data.from_arrow(t)).sort_values("doc_id").reset_index(drop=True)
    b = _run(ray.data.from_arrow(perm)).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------- Type-2 tier

def _t2_corpus():
    """Planted four-tier family + rename-clone pairs the near tier CANNOT
    catch (zero shared tokens → Jaccard 0), only the parameterized
    canonical form can — plus guard probes: all-distinct-token docs and
    short docs whose canon pattern matches must NOT merge under the
    default eligibility guard (min 5 tokens + a repeated token)."""
    return pa.table(
        {
            "doc_id": list(range(1, 12)),
            "lang": ["py"] * 11,
            "content": [
                "alpha beta alpha gamma beta",        # 1: canon t0 t1 t0 t2 t1
                "zip zap zip zop zap",                # 2: t2 clone of 1
                "alpha beta alpha gamma beta",        # 3: exact dup of 1
                "# c\nALPHA  BETA ALPHA GAMMA BETA",  # 4: norm dup of 1
                "one two three one two",              # 5: canon t0 t1 t2 t0 t1
                "uno dos tres uno dos",               # 6: t2 clone of 5
                "alpha beta alpha gamma beta extra",  # 7: near dup of 1
                "pure distinct tokens only here",     # 8: all-distinct → kept
                "fully unique words appear once",     # 9: same count class as 8
                "aa bb aa",                           # 10: repeat but < 5 tokens
                "cc dd cc",                           # 11: same pattern as 10
            ],
        }
    )


T2_EXPECT = {
    1: ("kept", 1),
    2: ("t2", 1),
    3: ("exact", 1),
    4: ("norm", 1),
    5: ("kept", 5),
    6: ("t2", 5),
    7: ("near", 1),
    8: ("kept", 8),
    9: ("kept", 9),
    10: ("kept", 10),
    11: ("kept", 11),
}


@pytest.mark.parametrize("budget", [None, 0])
def test_type2_tier_planted(ray_session, budget):
    """with_type2=True inserts the consistent-rename tier between norm and
    near; each doc lands in the cheapest tier that catches it."""
    import ray.data

    kw = {} if budget is None else {"driver_max_keys": budget}
    out = _run(ray.data.from_arrow(_t2_corpus()), with_type2=True, **kw)
    got = {int(r.doc_id): (r.tier, int(r.dup_of)) for r in out.itertuples()}
    assert got == T2_EXPECT


def test_type2_off_keeps_rename_clones(ray_session):
    """Contrast: with the tier off, the rename clones survive (they share
    no tokens, so near dedup can't see them)."""
    import ray.data

    out = _run(ray.data.from_arrow(_t2_corpus()))
    got = {int(r.doc_id): (r.tier, int(r.dup_of)) for r in out.itertuples()}
    assert got[2] == ("kept", 2)
    assert got[6] == ("kept", 6)
    for d in (1, 3, 4, 5, 7):
        assert got[d] == T2_EXPECT[d]


@pytest.mark.parametrize("budget", [None, 0])
def test_type2_guard_disabled(ray_session, budget):
    """t2_min_tokens=0 removes the eligibility guard: the all-distinct and
    short-pattern probe pairs now merge (the documented aggressive mode)."""
    import ray.data

    kw = {} if budget is None else {"driver_max_keys": budget}
    out = _run(
        ray.data.from_arrow(_t2_corpus()), with_type2=True, t2_min_tokens=0, **kw
    )
    got = {int(r.doc_id): (r.tier, int(r.dup_of)) for r in out.itertuples()}
    assert got[9] == ("t2", 8)
    assert got[11] == ("t2", 10)
    for d in (1, 2, 3, 4, 5, 6, 7):
        assert got[d] == T2_EXPECT[d]


@pytest.mark.parametrize("budget", [None, 0])
def test_type2_rep_rule_longest(ray_session, budget):
    """keep-longest at the t2 level: the canon group keeps the member with
    the most content bytes; dup_of chains stay transitively safe."""
    import ray.data

    from europa_ray.pipelines.tiers import tiered_dedup

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "lang": ["py"] * 3,
            "content": [
                "aa bb aa cc aa",         # canon t0 t1 t0 t2 t0, 14 bytes
                "qqq www qqq eee qqq",    # same canon, 19 bytes → survives
                "unrelated words here now yes",
            ],
        }
    )
    kw = {} if budget is None else {"driver_max_keys": budget}
    out = tiered_dedup(
        ray.data.from_arrow(t),
        _cfg(),
        id_col="doc_id",
        rep_rule="longest",
        with_type2=True,
        **kw,
    ).to_pandas()
    got = {int(r.doc_id): (r.tier, int(r.dup_of)) for r in out.itertuples()}
    assert got == {1: ("t2", 2), 2: ("kept", 2), 3: ("kept", 3)}


def test_type2_idempotence(ray_session):
    """Re-running over the kept subset is all-kept (no canon pair left)."""
    import ray.data

    t = _t2_corpus()
    out = _run(ray.data.from_arrow(t), with_type2=True)
    kept_ids = set(out[out.tier == "kept"].doc_id)
    mask = pa.array([int(i) in kept_ids for i in t["doc_id"].to_pylist()])
    out2 = _run(ray.data.from_arrow(t.filter(mask)), with_type2=True)
    assert (out2.tier == "kept").all()


def test_type2_norm_empty_docs_never_merge(ray_session):
    """Docs whose canonical form is empty keep their NORM identity: two
    different all-comment files must both be kept under with_type2."""
    import ray.data

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "lang": ["py"] * 3,
            "content": ["# aaa", "# bbb", "# aaa"],
        }
    )
    out = _run(ray.data.from_arrow(t), with_type2=True)
    got = {int(r.doc_id): (r.tier, int(r.dup_of)) for r in out.itertuples()}
    assert got == {1: ("kept", 1), 2: ("kept", 2), 3: ("exact", 1)}
