"""PII detection/redaction and corpus-wide word-count top-k."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data


def _collect(ds):
    tables = [t for t in ds.iter_batches(batch_format="pyarrow") if t.num_rows]
    if not tables:
        return ds.schema().base_schema.empty_table()
    return pa.concat_tables(tables)


def test_pii_stats_hand_computed(ray_session):
    from europa_ray.pipelines.pii import pii_stats_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "content": pa.array(
                [
                    "mail a@b.co and c.d+x@e-f.org now",
                    "go to https://x.y/z?a=1 and http://q.r",
                    "ping 10.0.0.1 then 192.168.1.255",
                    "clean text with no pii at all",
                    None,
                ],
                pa.string(),
            ),
        }
    )
    out = pii_stats_batch(t)
    assert out["doc_id"].to_pylist() == [1, 2, 3, 4]
    assert out["n_emails"].to_pylist() == [2, 0, 0, 0]
    assert out["n_urls"].to_pylist() == [0, 2, 0, 0]
    assert out["n_ips"].to_pylist() == [0, 0, 2, 0]
    assert out["n_pii"].to_pylist() == [2, 2, 2, 0]


def test_pii_redact_order_and_sha(ray_session):
    from europa_ray.pipelines.pii import pii_redact_batch

    text = "write a@b.co or visit https://a.b/c from 1.2.3.4"
    want = "write <EMAIL> or visit <URL> from <IP>"
    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "content": pa.array([text], pa.string()),
        }
    )
    out = pii_redact_batch(t)
    assert out["redacted_sha"].to_pylist() == [
        hashlib.sha256(want.encode()).hexdigest()
    ]


def test_vocab_top_words_hand_computed(ray_session):
    from europa_ray.pipelines.vocab import vocab_top_words

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "content": pa.array(
                    ["b a a", "b c  a", None], pa.string()
                ),  # a×3 b×2 c×1; double space → empty word filtered
            }
        )
    )
    out = _collect(vocab_top_words(ds, k=2))
    assert out["word"].to_pylist() == ["a", "b"]
    assert out["n"].to_pylist() == [3, 2]


def test_vocab_tie_break_is_word_asc(ray_session):
    from europa_ray.pipelines.vocab import vocab_top_words

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "content": pa.array(["z y x z y x"], pa.string()),
            }
        )
    )
    out = _collect(vocab_top_words(ds, k=2))
    # all tied at 2 → word-ASC cut keeps x, y
    assert out["word"].to_pylist() == ["x", "y"]


# ---------------------------------------------------------------------------
# stopwords_per_lang
# ---------------------------------------------------------------------------


import pytest


@pytest.mark.parametrize("df_budget", [50_000_000, 0])
def test_stopwords_per_lang_matches_bruteforce(ray_session, df_budget):
    """Driver fast path (arrow group_by) and forced-distributed groupby
    (df_budget=0) both equal brute force."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.vocab import stopwords_per_lang

    rng = np.random.default_rng(13)
    words = [f"s{i}" for i in range(12)]
    langs = np.array(["en", "de"])[rng.integers(0, 2, 150)]
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(3, 25))))
        for _ in range(150)
    ]
    texts[0] = ""
    texts[1] = None
    texts[2] = "dup dup dup"  # repeated word counts once per doc
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(150, dtype=np.int64)),
            "lang": pa.array(langs.tolist(), pa.string()),
            "content": pa.array(texts, pa.string()),
        }
    )
    K = 4
    got = stopwords_per_lang(
        ray.data.from_arrow(t).repartition(5), k=K, df_gather_max_rows=df_budget
    ).to_pandas()
    # brute force
    from collections import Counter

    df: Counter = Counter()
    for lang, txt in zip(langs, texts):
        if not txt:
            continue
        for w in set(x for x in txt.split(" ") if x):
            df[(lang, w)] += 1
    want = set()
    for lang in ("en", "de"):
        rows = sorted(
            ((-c, w) for (l, w), c in df.items() if l == lang)
        )[:K]
        for r, (nc, w) in enumerate(rows, 1):
            want.add((lang, r, w, -nc))
    assert set(zip(got.lang, got["rank"], got.word, got.df)) == want
    # presence semantics: the 'dup' doc added exactly 1 to its df
    lang2 = langs[2]
    assert df[(lang2, "dup")] >= 1


def test_stopwords_per_lang_validation(ray_session):
    import pyarrow as pa
    import ray.data

    from europa_ray.pipelines.vocab import stopwords_per_lang

    t = pa.table({"doc_id": [1], "lang": ["en"], "content": ["x"]})
    import pytest

    with pytest.raises(ValueError):
        stopwords_per_lang(ray.data.from_arrow(t), k=0)
