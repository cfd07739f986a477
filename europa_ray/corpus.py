"""Deterministic synthetic source-code corpus with planted duplicate classes.

Implements FIXTURES.md §1: a ``files(repo,path,commit,lang,content)`` table
with planted (1) exact duplicates, (2) tiered near-duplicate mutants,
(3) a boilerplate/license skew cluster, (4) long-shared-substring pairs,
(5) uniques, (6) edge rows — plus a ``truth`` table (row_id, truth_cluster,
klass, tier) written separately and never read by the engine.

Everything is seeded (default 42) and local — no external data.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "rust", "go", "java", "js", "c", "md", "txt"]
_KEYWORDS = {
    "python": ["def", "return", "if", "else", "for", "in", "import", "class", "None", "self"],
    "rust": ["fn", "let", "mut", "impl", "pub", "match", "use", "struct", "enum", "mod"],
    "go": ["func", "var", "range", "package", "import", "type", "struct", "defer", "go", "chan"],
    "java": ["public", "static", "void", "class", "final", "new", "return", "int", "import", "this"],
    "js": ["function", "const", "let", "var", "return", "if", "else", "async", "await", "export"],
    "c": ["int", "char", "void", "static", "struct", "return", "if", "else", "for", "while"],
    "md": ["the", "a", "of", "and", "to", "in", "is", "for", "with", "on"],
    "txt": ["the", "a", "of", "and", "to", "in", "is", "for", "with", "on"],
}
_PUNCT = ["(", ")", "{", "}", "[", "]", ";", ",", "=", "+", "-", "*", ".", ":", "<", ">"]


def _ident_pool(rng: np.random.Generator, n: int) -> list[str]:
    syll = ["foo", "bar", "baz", "qux", "num", "idx", "val", "tmp", "acc", "buf",
            "ptr", "len", "cnt", "pos", "key", "map", "arr", "obj", "ctx", "cfg"]
    return [
        syll[rng.integers(len(syll))] + syll[rng.integers(len(syll))] + str(rng.integers(100))
        for _ in range(n)
    ]


def _random_tokens(rng: np.random.Generator, n: int, lang: str, pool: list[str]) -> list[str]:
    kws = _KEYWORDS[lang]
    toks: list[str] = []
    while len(toks) < n:
        r = rng.random()
        if r < 0.25:
            toks.append(kws[rng.integers(len(kws))])
        elif r < 0.70:
            toks.append(pool[rng.integers(len(pool))])
        elif r < 0.85:
            toks.append(_PUNCT[rng.integers(len(_PUNCT))])
        else:
            toks.append(str(rng.integers(10000)))
    return toks[:n]


def _render(toks: list[str]) -> str:
    lines = []
    for i in range(0, len(toks), 9):
        lines.append(" ".join(toks[i : i + 9]))
    return "\n".join(lines)


def _mutate(rng: np.random.Generator, toks: list[str], rename_frac: float, edit_frac: float,
            pool: list[str]) -> list[str]:
    """Identifier renames + small insert/delete blocks (FIXTURES §1.2)."""
    out = list(toks)
    distinct = sorted({t for t in out if t and t[0].isalpha()})
    n_ren = int(len(distinct) * rename_frac)
    if n_ren:
        victims = rng.choice(len(distinct), size=n_ren, replace=False)
        mapping = {distinct[v]: pool[rng.integers(len(pool))] + "_r" + str(rng.integers(1000)) for v in victims}
        out = [mapping.get(t, t) for t in out]
    n_edit = int(len(out) * edit_frac)
    if n_edit:
        # delete a block
        start = int(rng.integers(0, max(1, len(out) - n_edit)))
        del out[start : start + n_edit // 2]
        # insert a block
        ins = _random_tokens(rng, n_edit - n_edit // 2, "python", pool)
        at = int(rng.integers(0, len(out) + 1))
        out[at:at] = ins
    return out


def _identity(rng: np.random.Generator, i: int) -> tuple[str, str, str]:
    repo = f"org{int(rng.integers(10))}/proj{int(rng.integers(5))}"
    path = f"src/m{int(rng.integers(50))}/f{i}.py"
    commit = hashlib.sha256(f"commit-{i}-{int(rng.integers(1 << 30))}".encode()).hexdigest()[:40]
    return repo, path, commit


def generate_corpus(n_rows: int = 1000, seed: int = 42) -> dict[str, pa.Table]:
    rng = np.random.default_rng(seed)
    pool = _ident_pool(rng, 400)

    rows: list[tuple[str, str, str, str, str]] = []  # repo,path,commit,lang,content
    truth: list[tuple[int, str, str]] = []  # truth_cluster, klass, tier
    cluster_counter = [0]

    def new_cluster() -> int:
        cluster_counter[0] += 1
        return cluster_counter[0]

    def add(content: str, lang: str, cluster: int, klass: str, tier: str = "") -> None:
        i = len(rows)
        repo, path, commit = _identity(rng, i)
        rows.append((repo, path, commit, lang, content))
        truth.append((cluster, klass, tier))

    n_exact = max(2, n_rows // 10)
    n_near = max(2, n_rows * 15 // 100)
    n_boiler = max(3, n_rows // 20)
    n_substr = max(2, n_rows // 20)
    n_edge = 8 if n_rows >= 200 else 4

    # 1. exact duplicate groups (2-4 members)
    made = 0
    while made < n_exact:
        lang = LANGS[int(rng.integers(len(LANGS)))]
        toks = _random_tokens(rng, int(rng.integers(40, 400)), lang, pool)
        content = _render(toks)
        c = new_cluster()
        k = min(int(rng.integers(2, 5)), n_exact - made) or 2
        for _ in range(max(2, k)):
            add(content, lang, c, "exact")
            made += 1

    # 2. near-duplicate groups: seed + 1-5 mutants, tiered mutation rates
    tiers = [("close", 0.02, 0.01), ("mid", 0.06, 0.03), ("edge", 0.12, 0.06), ("far", 0.5, 0.3)]
    made = 0
    while made < n_near:
        lang = LANGS[int(rng.integers(len(LANGS)))]
        toks = _random_tokens(rng, int(rng.integers(80, 500)), lang, pool)
        c = new_cluster()
        add(_render(toks), lang, c, "near", "seed")
        made += 1
        for _ in range(int(rng.integers(1, 6))):
            if made >= n_near:
                break
            tname, rf, ef = tiers[int(rng.integers(len(tiers)))]
            add(_render(_mutate(rng, toks, rf, ef, pool)), lang, c, "near", tname)
            made += 1

    # 3. boilerplate/license skew cluster: one big header + tiny unique tails
    header = _random_tokens(rng, 300, "txt", pool)
    c_boiler = new_cluster()
    for _ in range(n_boiler):
        tail = _random_tokens(rng, int(rng.integers(5, 25)), "txt", pool)
        add(_render(header + tail), "txt", c_boiler, "boiler")

    # 4. long-shared-substring pairs: ≥256-token verbatim block inside
    #    otherwise-different files (low overall Jaccard)
    for _ in range(n_substr // 2):
        block = _random_tokens(rng, 300, "python", pool)
        c = new_cluster()
        for _ in range(2):
            body = _random_tokens(rng, int(rng.integers(400, 700)), "python", pool)
            at = int(rng.integers(0, len(body)))
            add(_render(body[:at] + block + body[at:]), "python", c, "substr")

    # 6. edge rows
    add("", "txt", new_cluster(), "edge", "empty")
    add("x", "python", new_cluster(), "edge", "one-token")
    add("héllo wörld ünicode 漢字 →", "txt", new_cluster(), "edge", "non-ascii")
    if n_edge >= 4:
        big = _render(_random_tokens(rng, 200_000, "c", pool))
        add(big, "c", new_cluster(), "edge", "wide-row")

    # 5. uniques: independent random programs
    while len(rows) < n_rows:
        lang = LANGS[int(rng.integers(len(LANGS)))]
        toks = _random_tokens(rng, int(rng.integers(30, 500)), lang, pool)
        add(_render(toks), lang, new_cluster(), "unique")

    repo, path, commit, lang, content = zip(*rows)
    files = pa.table(
        {
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "commit": pa.array(commit, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "content": pa.array(content, pa.string()),
        }
    )
    tc, klass, tier = zip(*truth)
    truth_t = pa.table(
        {
            "row_id": pa.array(range(len(rows)), pa.int64()),
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "commit": pa.array(commit, pa.string()),
            "truth_cluster": pa.array(tc, pa.int64()),
            "klass": pa.array(klass, pa.string()),
            "tier": pa.array(tier, pa.string()),
        }
    )
    return {"files": files, "truth": truth_t}


def write_corpus(out_dir: str, tables: dict[str, pa.Table], shards: int = 4) -> str:
    """Write files.parquet as ``shards`` row-group-aligned files (partitioned
    output → parallel read), truth.parquet alongside."""
    os.makedirs(out_dir, exist_ok=True)
    files = tables["files"]
    n = files.num_rows
    per = -(-n // shards)
    fdir = os.path.join(out_dir, "files")
    os.makedirs(fdir, exist_ok=True)
    for s in range(shards):
        part = files.slice(s * per, per)
        if part.num_rows:
            pq.write_table(part, os.path.join(fdir, f"part-{s:05d}.parquet"))
    pq.write_table(tables["truth"], os.path.join(out_dir, "truth.parquet"))
    return fdir
