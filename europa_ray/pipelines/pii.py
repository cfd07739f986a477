"""PII detection and redaction — the pre-training scrub pass (C4 removed
pages by bad-word lists; production LLM pipelines count and mask emails /
URLs / IP addresses before training).

Both operators are single ``map_batches`` stages over Arrow's RE2 regex
kernels (``count_substring_regex`` / ``replace_substring_regex``) — the
SAME regex engine DuckDB uses, so match semantics (leftmost,
non-overlapping) agree with the ``regexp_extract_all`` /
``regexp_replace(…, 'g')`` oracle by construction, not by luck. No Python
touches row content.

Redaction order is email → URL → IP on both sides (order matters: an
unredacted email's domain could otherwise feed the URL/IP patterns).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible, DuckDB-compatible (no lookaround, no backrefs)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

PATTERNS = (("email", EMAIL_RE), ("url", URL_RE), ("ip", IPV4_RE))


def pii_stats_batch(
    batch: pa.Table,
    *,
    text_col: str = "content",
    patterns: tuple = PATTERNS,
    total_col: str = "n_pii",
) -> pa.Table:
    """Per-doc PII match counts: (…, n_emails, n_urls, n_ips, n_pii).
    Null/empty-content rows are excluded (oracle ``WHERE text IS NOT NULL
    AND length(text) > 0``). ``patterns``/``total_col`` make the kernel
    reusable by other scrub passes (e.g. the secret scanner in
    :mod:`europa_ray.pipelines.code`): each ``(name, regex)`` pair emits an
    ``n_{name}s`` count column."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
    col = col.filter(valid)
    out = batch.select([c for c in batch.column_names if c != text_col]).filter(valid)
    total = None
    for name, pat in patterns:
        n = pc.count_substring_regex(col, pat).cast(pa.int64())
        out = out.append_column(f"n_{name}s", n)
        total = n if total is None else pc.add(total, n)
    return out.append_column(total_col, total)


def pii_redact_batch(
    batch: pa.Table,
    *,
    text_col: str = "content",
    patterns: tuple = PATTERNS,
) -> pa.Table:
    """Redact in place: email → ``<EMAIL>``, URL → ``<URL>``, IP → ``<IP>``,
    applied in that order (each ``(name, regex)`` replaced by
    ``<{NAME}>``; order matters: an unredacted email's domain could
    otherwise feed the URL/IP patterns). Emits the redacted text's sha256
    (not the text) so the result is compact AND value-checkable against the
    SQL ``sha256(regexp_replace(...))`` chain."""
    from europa_ray.util import sha256_hex_arrow

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = pc.and_(pc.is_valid(col), pc.greater(pc.utf8_length(col), 0))
    col = col.filter(valid)
    out = batch.select([c for c in batch.column_names if c != text_col]).filter(valid)
    for name, pat in patterns:
        col = pc.replace_substring_regex(col, pat, f"<{name.upper()}>")
    return out.append_column(
        "redacted_sha", pa.array(sha256_hex_arrow(col), pa.string())
    )
