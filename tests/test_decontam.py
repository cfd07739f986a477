"""Decontamination: rolling-hash window scan vs brute-force substring
truth, multi-byte snippets, and the planted-contamination pipeline (SQL
parity lives in tests/test_entry.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from europa_ray.functions.text import arrow_string_bytes
from europa_ray.stages.decontam import (
    _scan_batch,
    _snippet_index,
    benchmark_snippets,
    decontam_stats,
)


def _bruteforce_hits(texts: list[str | None], snippets: list[str]) -> dict[int, int]:
    out: dict[int, int] = {}
    for r, t in enumerate(texts):
        if not t:
            continue
        n = sum(1 for s in set(snippets) if s in t)
        if n:
            out[r] = n
    return out


def _scan(texts: list[str | None], snippets: list[str]) -> dict[int, int]:
    col = pa.array(texts, pa.string())
    idx = _snippet_index(pa.table({"snippet": pa.array(sorted(set(snippets)))}))
    data, offs = arrow_string_bytes(col)
    rows, snips = _scan_batch(data, offs, idx)
    if rows.shape[0] == 0:
        return {}
    uniq = np.unique(np.stack([rows, snips], axis=1), axis=0)
    hit_rows, counts = np.unique(uniq[:, 0], return_counts=True)
    return dict(zip(hit_rows.tolist(), counts.tolist()))


def test_scan_matches_bruteforce_random():
    rng = np.random.default_rng(11)
    alphabet = list("abcdef gh")
    texts = [
        "".join(rng.choice(alphabet, int(rng.integers(20, 200)))) for _ in range(80)
    ]
    texts[5] = None
    texts[6] = ""
    # snippets: some drawn from the texts (guaranteed hits, varied lengths),
    # some random (mostly misses)
    snippets = []
    for i in (0, 3, 9, 9, 40):
        t = texts[i]
        lo = int(rng.integers(0, max(len(t) - 12, 1)))
        snippets.append(t[lo : lo + int(rng.integers(4, 12))])
    snippets += ["".join(rng.choice(alphabet, 8)) for _ in range(5)]
    snippets = [s for s in snippets if s]
    assert _scan(texts, snippets) == _bruteforce_hits(texts, snippets)


def test_scan_multibyte_and_boundaries():
    """UTF-8 snippets (different byte lengths per length group), matches at
    row start/end, repeated within-row matches counted once, and no match
    across row boundaries."""
    texts = [
        "début café crème fin",
        "xxcafé crèmeyy café crème",  # two occurrences → one distinct hit
        "caf",  # prefix only — no hit
        "é crème rest",  # concatenated with row 2 forms the full snippet
        #   across the row boundary — must NOT hit
        "tail ends with café crème",
        "café crème leads",
    ]
    snippets = ["café crème", "début", "leads"]
    got = _scan(texts, snippets)
    assert got == _bruteforce_hits(texts, snippets)
    # row-boundary safety: concatenated buffer contains snippet bytes across
    # rows 2|3 ("caf" + "é cr...") — must NOT report a hit there
    assert 2 not in got and 3 not in got


def test_hash_prefilter_exactness_on_adversarial_repeats():
    texts = ["ab" * 200, "ba" * 200, "abab", "baba"]
    snippets = ["abab", "baba", "bb"]
    assert _scan(texts, snippets) == _bruteforce_hits(texts, snippets)


def test_benchmark_snippets_and_pipeline(ray_session):
    import ray.data

    from europa_ray.sources.augment import CONTAM_EVERY, with_contaminated_docs
    from europa_ray.stages.decontam import SNIPPET_EVERY, SNIPPET_MIN_CHARS

    n = 300
    rng = np.random.default_rng(5)
    words = np.array(["kilo", "lima", "mike", "nov", "oscar", "papa"])
    texts = [
        " ".join(words[rng.integers(0, len(words), 60)]) for _ in range(n)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(["en"] * n),
            "content": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    snips = benchmark_snippets(ds)
    n_sources = sum(
        1
        for d, txt in enumerate(texts)
        if d % SNIPPET_EVERY == 0 and len(txt) >= SNIPPET_MIN_CHARS
    )
    assert 0 < snips.num_rows <= n_sources  # ≤: identical snippets dedup
    got = decontam_stats(with_contaminated_docs(ds), snips).to_pandas()
    flagged = set(got.doc_id)
    # every snippet source is flagged (contains its own snippet)
    assert set(snips["src"].to_pylist()) <= flagged
    # every contaminated doc whose source contributed a snippet is flagged
    snip_srcs = set(snips["src"].to_pylist())
    for d in range(n):
        if d % CONTAM_EVERY == 0 and (d - d % SNIPPET_EVERY) in snip_srcs:
            assert d in flagged
    assert (got.n_hits >= 1).all()


from hypothesis import given, settings
from hypothesis import strategies as st

_txt = st.text(
    alphabet=st.characters(codec="utf-8", max_codepoint=0x2FF), max_size=60
)


@settings(max_examples=60, deadline=None)
@given(
    texts=st.lists(st.one_of(st.none(), _txt), min_size=1, max_size=12),
    snippets=st.lists(_txt.filter(bool), min_size=1, max_size=6),
)
def test_scan_property_equals_python_substring(texts, snippets):
    """For ANY unicode corpus and snippet set, the rolling-hash window scan
    reports exactly Python's substring-membership truth (per-row count of
    distinct contained snippets)."""
    assert _scan(texts, snippets) == _bruteforce_hits(texts, snippets)
