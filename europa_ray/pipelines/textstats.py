"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All are stateless vectorized ``map_batches`` stages over the ``documents``
(or ``files``) table. Quality/token-count semantics are chosen to be exactly
SQL-expressible so the driver's DuckDB oracle can verify them value-for-value
(ASCII regex classes to match RE2 semantics).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from europa_ray.functions.text import TOKEN_RE, token_counts
from europa_ray.util import mix64, splitmix64, hash_strings

_ALPHA_RE = re.compile(r"[A-Za-z]")
_DIGIT_RE = re.compile(r"[0-9]")
_WS_RE = re.compile(r"\s", re.ASCII)  # [ \t\n\r\f\v] — matches the SQL oracle class

# tiny per-language stopword/keyword profiles for the n-gram/lexicon
# language-ID heuristic (public common-word lists)
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "in", "is", "for", "with", "on", "a"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "para", "que", "una", "en"},
    "it": {"il", "la", "che", "e", "non", "per", "una", "sono", "di", "con"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    out = batch.select([c for c in batch.column_names if c != text_col])
    n = token_counts(batch[text_col].to_pylist())
    return out.append_column("n_tokens", pa.array(n))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length + character-class ratios (rounded to 6 dp, SQL-parity)."""
    texts = batch[text_col].to_pylist()
    n_chars = np.array([len(t) if t else 0 for t in texts], dtype=np.int64)
    alpha = np.array([len(_ALPHA_RE.findall(t)) if t else 0 for t in texts], dtype=np.int64)
    digit = np.array([len(_DIGIT_RE.findall(t)) if t else 0 for t in texts], dtype=np.int64)
    ws = np.array([len(_WS_RE.findall(t)) if t else 0 for t in texts], dtype=np.int64)
    denom = np.maximum(n_chars, 1).astype(np.float64)
    out = batch.select([c for c in batch.column_names if c != text_col])
    out = out.append_column("n_chars_calc", pa.array(n_chars))
    out = out.append_column("alpha_ratio", pa.array(np.round(alpha / denom, 6)))
    out = out.append_column("digit_ratio", pa.array(np.round(digit / denom, 6)))
    out = out.append_column("ws_ratio", pa.array(np.round(ws / denom, 6)))
    return out


def quality_ppm_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality ratios as integer parts-per-million (floor division) — exact
    integer arithmetic on both the engine and the DuckDB-oracle side, so the
    driver's value-hash comparison is immune to float rounding-mode skew."""
    texts = batch[text_col].to_pylist()
    n_chars = np.array([len(t) if t else 0 for t in texts], dtype=np.int64)
    alpha = np.array([len(_ALPHA_RE.findall(t)) if t else 0 for t in texts], dtype=np.int64)
    digit = np.array([len(_DIGIT_RE.findall(t)) if t else 0 for t in texts], dtype=np.int64)
    ws = np.array([len(_WS_RE.findall(t)) if t else 0 for t in texts], dtype=np.int64)
    denom = np.maximum(n_chars, 1)
    ours = {"n_chars", "alpha_ppm", "digit_ppm", "ws_ppm"}
    out = batch.select([c for c in batch.column_names if c != text_col and c not in ours])
    out = out.append_column("n_chars", pa.array(n_chars))
    out = out.append_column("alpha_ppm", pa.array(alpha * 1_000_000 // denom))
    out = out.append_column("digit_ppm", pa.array(digit * 1_000_000 // denom))
    out = out.append_column("ws_ppm", pa.array(ws * 1_000_000 // denom))
    return out


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Lexicon-overlap language ID: argmax over per-language stopword hit
    rates; 'und' (undetermined) when no profile scores > 0."""
    texts = batch[text_col].to_pylist()
    langs = []
    scores = []
    for t in texts:
        toks = [w.lower() for w in TOKEN_RE.findall(t)] if t else []
        if not toks:
            langs.append("und")
            scores.append(0.0)
            continue
        ts = toks if len(toks) <= 400 else toks[:400]
        best, best_s = "und", 0.0
        for lang, prof in _LANG_PROFILES.items():
            s = sum(1 for w in ts if w in prof) / len(ts)
            if s > best_s:
                best, best_s = lang, s
        langs.append(best)
        scores.append(round(best_s, 6))
    out = batch.select([c for c in batch.column_names if c != text_col])
    out = out.append_column("lang_pred", pa.array(langs, pa.string()))
    out = out.append_column("lang_score", pa.array(scores, pa.float64()))
    return out


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit order-sensitive document fingerprint: splitmix-mixed sum of
    (token hash ⊕ mixed position) — a rolling-hash-style identity that is
    order-sensitive yet fully vectorized (no Python token loop)."""
    texts = batch[text_col].to_pylist()
    from europa_ray.functions.text import tokenize

    th, off = tokenize(texts)
    n = len(texts)
    fp = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(n):
            seg = th[off[i] : off[i + 1]]
            if seg.shape[0] == 0:
                continue
            pos = np.arange(seg.shape[0], dtype=np.uint64)
            fp[i] = mix64(seg ^ splitmix64(pos)).sum(dtype=np.uint64)
    fp = splitmix64(fp)
    out = batch.select([c for c in batch.column_names if c != text_col])
    return out.append_column("fingerprint", pa.array(fp.view(np.int64)))
