"""Unigram-LM document scoring (pipelines/lm.py) vs a brute-force oracle."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _mk(n: int = 120, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = {
        "en": ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"],
        "de": ["der", "schnelle", "fuchs", "springt", "ueber", "den", "hund"],
        "fr": ["le", "renard", "rapide", "saute", "par", "dessus", "chien"],
    }
    langs, texts = [], []
    for i in range(n):
        lang = ["en", "de", "fr"][i % 3]
        if i % 17 == 0:
            texts.append("")  # excluded
        elif i % 23 == 0:
            texts.append("   ")  # whitespace-only → zero tokens, excluded
        else:
            k = int(rng.integers(3, 12))
            ws = rng.choice(vocab[lang], size=k).tolist()
            sep = "  " if i % 5 == 0 else " "  # double spaces → empty tokens
            texts.append(sep.join(ws))
        langs.append(lang)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(texts, pa.string()),
        }
    )


def _brute(t: pa.Table, lm_t: pa.Table | None = None, unseen: float = 0.5):
    src = lm_t if lm_t is not None else t
    cnt: Counter = Counter()
    for txt in src["content"].to_pylist():
        if txt:
            cnt.update(w for w in txt.split(" ") if w)
    total = sum(cnt.values())
    out = {}
    for d, lang, txt in zip(
        t["doc_id"].to_pylist(), t["lang"].to_pylist(), t["content"].to_pylist()
    ):
        if not txt:
            continue
        ws = [w for w in txt.split(" ") if w]
        if not ws:
            continue
        s = sum(
            math.log10(cnt[w]) if w in cnt else math.log10(unseen) for w in ws
        )
        out[int(d)] = (lang, len(ws), math.log10(total) - s / len(ws))
    return out


def _as_dict(df):
    return {
        int(r.doc_id): (r.lang, int(r.n_tokens), float(r.lm_score))
        for r in df.itertuples()
    }


def test_lm_scores_match_bruteforce(ray_session):
    import ray.data

    from europa_ray.pipelines.lm import unigram_lm_scores

    t = _mk()
    got = _as_dict(unigram_lm_scores(ray.data.from_arrow(t)).to_pandas())
    want = _brute(t)
    assert got.keys() == want.keys()
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == want[d][1]
        assert got[d][2] == pytest.approx(want[d][2], abs=1e-9)


def test_lm_scores_join_fallback_equivalent(ray_session):
    import ray.data

    from europa_ray.pipelines.lm import unigram_lm_scores

    t = _mk(seed=11)
    a = _as_dict(unigram_lm_scores(ray.data.from_arrow(t)).to_pandas())
    b = _as_dict(
        unigram_lm_scores(
            ray.data.from_arrow(t), vocab_broadcast_max=0
        ).to_pandas()
    )
    assert a.keys() == b.keys()
    for d in a:
        assert a[d][0] == b[d][0] and a[d][1] == b[d][1]
        assert a[d][2] == pytest.approx(b[d][2], abs=1e-9)


@pytest.mark.parametrize("gather", [30_000_000, 0])
def test_lm_cross_corpus_unseen_words(ray_session, gather):
    import ray.data

    from europa_ray.pipelines.lm import unigram_lm_scores

    train = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "lang": pa.array(["en", "en"], pa.string()),
            "content": pa.array(["a a b", "a c"], pa.string()),
        }
    )
    score = pa.table(
        {
            "doc_id": pa.array([10, 11], pa.int64()),
            "lang": pa.array(["en", "en"], pa.string()),
            "content": pa.array(["a zzz", "b c"], pa.string()),
        }
    )
    got = _as_dict(
        unigram_lm_scores(
            ray.data.from_arrow(score),
            lm_files=ray.data.from_arrow(train),
            vocab_broadcast_max=gather,
        ).to_pandas()
    )
    want = _brute(score, lm_t=train)
    assert got.keys() == want.keys()
    for d in want:
        assert got[d][2] == pytest.approx(want[d][2], abs=1e-9)
    # doc 10 contains zzz (unseen): its score must use the 0.5 pseudo-count
    t_total = 5  # a a b / a c
    exp = math.log10(t_total) - (math.log10(3) + math.log10(0.5)) / 2
    assert got[10][2] == pytest.approx(exp, abs=1e-12)


def test_lm_buckets_match_bruteforce(ray_session):
    import ray.data

    from europa_ray.pipelines.lm import lm_quality_buckets

    t = _mk(150, seed=3)
    got = lm_quality_buckets(ray.data.from_arrow(t)).to_pandas()
    # brute labels: negated micro score, per-lang exact tercile rule
    brute = _brute(t)
    micro = {d: -int(math.floor(v[2] * 1e6 + 0.5)) for d, v in brute.items()}
    want = {}
    for lang in {v[0] for v in brute.values()}:
        scores = sorted(micro[d] for d in brute if brute[d][0] == lang)
        n = len(scores)
        c1 = scores[(n + 2) // 3 - 1]
        c2 = scores[(2 * n + 2) // 3 - 1]
        for d in brute:
            if brute[d][0] != lang:
                continue
            s = micro[d]
            want[d] = "tail" if s <= c1 else ("middle" if s <= c2 else "head")
    assert {int(r.doc_id): r.bucket for r in got.itertuples()} == want
    # low surprisal (common words) must land in head: per lang, the doc
    # with the minimum raw score is labeled head
    for lang in {v[0] for v in brute.values()}:
        dmin = min(
            (d for d in brute if brute[d][0] == lang), key=lambda d: brute[d][2]
        )
        assert want[dmin] == "head"


def test_lm_empty_and_validation(ray_session):
    import ray.data

    from europa_ray.pipelines.lm import LM_SCHEMA, unigram_lm_scores

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "content": pa.array([], pa.string()),
        }
    )
    out = unigram_lm_scores(ray.data.from_arrow(empty))
    assert out.count() == 0
    assert out.schema().names == LM_SCHEMA.names
    with pytest.raises(ValueError):
        unigram_lm_scores(ray.data.from_arrow(empty), unseen_count=0.0)
