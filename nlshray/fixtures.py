"""Deterministic synthetic `pages` fixture + exact dup oracle.

Implements FIXTURES.md: a seeded Common-Crawl-style pages table with
planted duplicate structure, plus the exact-Jaccard oracle tables
(`true_pairs`, `true_clusters`) the recall gate compares against — the
engine's analog of the reference's precomputed ground-truth kNN
(``/root/reference/precompute.py:57-99``: exact all-pairs distances ->
`neighbors` array; here: exact shingle Jaccard -> is_dup pairs).

Everything derives from one integer seed; no external data. The driver
and this module must produce identical tables given the same spec, so
generation uses only numpy Generator streams in a fixed call order.
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from nlshray.config import DedupConfig
from nlshray.functions.shingles import doc_shingle_hashes, exact_jaccard
from nlshray.hashing import doc_ids_from_urls
from nlshray.state.unionfind import UnionFind

SIZES = {"tiny": 500, "small": 5000, "bench": 50_000}

_LETTERS = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def make_vocab(n_words: int, seed: int) -> list[str]:
    rng = np.random.default_rng(seed ^ 0x5EED_0001)
    lens = rng.integers(3, 10, size=n_words)
    out, seen = [], set()
    for ln in lens:
        while True:
            w = "".join(rng.choice(_LETTERS, size=int(ln)))
            if w not in seen:
                seen.add(w)
                out.append(w)
                break
    return out


def _format_text(token_words: list[str], rng: np.random.Generator) -> str:
    """Tokens -> sentences -> paragraphs. Token stream is preserved
    under ``tokenize(text)`` (lowercase ``[0-9a-z_]+``), so Jaccard semantics are
    independent of formatting."""
    sents = []
    i = 0
    n = len(token_words)
    while i < n:
        ln = int(rng.integers(6, 15))
        chunk = token_words[i : i + ln]
        i += ln
        sents.append(chunk[0].capitalize() + " " + " ".join(chunk[1:]) + "."
                     if len(chunk) > 1 else chunk[0].capitalize() + ".")
    paras = []
    j = 0
    while j < len(sents):
        k = int(rng.integers(2, 6))
        paras.append(" ".join(sents[j : j + k]))
        j += k
    return "\n\n".join(paras)


def _edit_tokens(
    ids: np.ndarray, rate: float, vocab_n: int, rng: np.random.Generator
) -> np.ndarray:
    """Token-level substitute/insert/delete at the given rate."""
    out = []
    for t in ids:
        r = rng.random()
        if r < rate:
            op = rng.integers(0, 3)
            if op == 0:       # substitute
                out.append(int(rng.integers(0, vocab_n)))
            elif op == 1:     # insert (keep original too)
                out.append(int(rng.integers(0, vocab_n)))
                out.append(int(t))
            # op == 2: delete -> skip
        else:
            out.append(int(t))
    if not out:
        out = [int(rng.integers(0, vocab_n))]
    return np.array(out, dtype=np.int64)


@dataclass
class _DocSpec:
    token_ids: np.ndarray | None   # None => reuse exact text from `copy_of`
    copy_of: int = -1              # spec index whose formatted text is reused


def _build_specs(n: int, vocab_n: int, rng: np.random.Generator) -> list[_DocSpec]:
    """Role plan per FIXTURES.md: 5% boilerplate, 20% clustered dups,
    10% hard-negative pairs, rest fresh."""
    specs: list[_DocSpec] = []

    def fresh_tokens() -> np.ndarray:
        m = int(rng.integers(50, 401))
        return rng.integers(0, vocab_n, size=m).astype(np.int64)

    n_boiler = max(2, int(n * 0.05))
    n_clustered = int(n * 0.20)
    n_hardneg = int(n * 0.10) // 2 * 2

    # skew probe: one boilerplate text repeated on 5% of docs
    specs.append(_DocSpec(fresh_tokens()))
    boiler_idx = 0
    for _ in range(n_boiler - 1):
        specs.append(_DocSpec(None, copy_of=boiler_idx))

    # planted dup clusters, size 2-8
    made = 0
    while made < n_clustered:
        size = int(rng.integers(2, 9))
        size = min(size, n_clustered - made) or 2
        base = fresh_tokens()
        base_idx = len(specs)
        specs.append(_DocSpec(base))
        for _ in range(size - 1):
            if rng.random() < 0.5:
                specs.append(_DocSpec(None, copy_of=base_idx))
            else:
                rate = float(rng.uniform(0.01, 0.05))
                specs.append(_DocSpec(_edit_tokens(base, rate, vocab_n, rng)))
        made += size

    # hard negatives: 30-60% token overlap, must NOT pair
    for _ in range(n_hardneg // 2):
        a = fresh_tokens()
        q = float(rng.uniform(0.3, 0.6))
        cut = max(1, int(q * len(a)))
        b = np.concatenate([a[:cut], rng.integers(0, vocab_n, size=len(a) - cut)])
        specs.append(_DocSpec(a))
        specs.append(_DocSpec(b.astype(np.int64)))

    while len(specs) < n:
        specs.append(_DocSpec(fresh_tokens()))
    return specs[:n]


def text_to_html(text: str, title: str) -> bytes:
    """The fixture's html wrapper — exactly invertible by
    ``nlshray.stages.extract.extract_text``."""
    paras = text.split("\n\n")
    body = "".join(f"<p>{_html.escape(p)}</p>" for p in paras)
    doc = (
        f"<html><head><title>{_html.escape(title)}</title></head>"
        f"<body>{body}</body></html>"
    )
    return doc.encode("utf-8")


def generate_pages(n: int, seed: int = 42, pos_offset: int = 0) -> pa.Table:
    """The synthetic pages table: (url, warc_ts, html, text, lang).

    ``pos_offset`` shifts urls/timestamps so independently-generated
    shards (``generate_pages_sharded``) never collide."""
    vocab = make_vocab(5000, seed)
    rng = np.random.default_rng(seed)
    specs = _build_specs(n, len(vocab), rng)

    # shuffle roles across positions so dup clusters aren't adjacent
    order = rng.permutation(n)

    fmt_rng = np.random.default_rng(seed ^ 0x5EED_0002)
    texts_by_spec: list[str | None] = [None] * n
    for si, spec in enumerate(specs):
        if spec.token_ids is not None:
            words = [vocab[t] for t in spec.token_ids]
            texts_by_spec[si] = _format_text(words, fmt_rng)
    for si, spec in enumerate(specs):
        if spec.token_ids is None:
            texts_by_spec[si] = texts_by_spec[spec.copy_of]

    lang_rng = np.random.default_rng(seed ^ 0x5EED_0003)
    lang_draw = lang_rng.random(n)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    base_ts = np.datetime64("2026-01-01T00:00:00", "us")
    for i in range(n):
        pos = pos_offset + i
        spec_idx = int(order[i])
        text = texts_by_spec[spec_idx]
        url = f"https://site{pos % 1000}.example/p/{pos}"
        urls.append(url)
        tss.append(base_ts + np.timedelta64(pos, "s"))
        htmls.append(text_to_html(text, f"t{pos}"))
        texts.append(text)
        d = lang_draw[i]
        langs.append("en" if d < 0.9 else ("de" if d < 0.95 else "fr"))

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


# --------------------------------------------------------------------------
# Exact oracle (driver-side, fixture scale only — this is what LSH avoids
# at engine scale, exactly as the reference's exact-kNN precompute is the
# thing its LSH index avoids at query time)
# --------------------------------------------------------------------------

_POSTING_CAP = 64  # shingles occurring in more distinct texts than this are
                   # skipped for candidate discovery; legitimate near-dup
                   # pairs always also share many rare shingles.


def compute_true_pairs(
    pages: pa.Table, cfg: DedupConfig, min_jaccard: float = 0.1
) -> pa.Table:
    """Exact-Jaccard oracle pairs over the fixture.

    Exact-duplicate texts are grouped first (J=1 within a group), then
    candidate cross-group pairs are discovered via an inverted shingle
    index and verified with exact set Jaccard.
    """
    urls = pages["url"].to_pylist()
    texts = pages["text"].to_pylist()
    ids = doc_ids_from_urls(urls)

    groups: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        groups.setdefault(t, []).append(i)
    reps = list(groups.values())
    rep_texts = [texts[m[0]] for m in reps]

    shingle_sets = [
        doc_shingle_hashes(t, cfg.shingle_k, unique=True) for t in rep_texts
    ]

    posting: dict[int, list[int]] = {}
    for gi, ss in enumerate(shingle_sets):
        for h in ss.tolist():
            lst = posting.get(h)
            if lst is None:
                posting[h] = [gi]
            elif len(lst) <= _POSTING_CAP:
                lst.append(gi)

    cand: set[tuple[int, int]] = set()
    for lst in posting.values():
        if 1 < len(lst) <= _POSTING_CAP:
            for x in range(len(lst)):
                for y in range(x + 1, len(lst)):
                    cand.add((lst[x], lst[y]))

    left, right, jac = [], [], []

    def emit(ia: int, ib: int, j: float) -> None:
        a, b = int(ids[ia]), int(ids[ib])
        if a > b:
            a, b = b, a
        left.append(a)
        right.append(b)
        jac.append(j)

    for members in reps:
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                emit(members[x], members[y], 1.0)

    for ga, gb in cand:
        j = exact_jaccard(shingle_sets[ga], shingle_sets[gb])
        if j >= min_jaccard:
            for ia in reps[ga]:
                for ib in reps[gb]:
                    emit(ia, ib, j)

    jarr = np.array(jac, dtype=np.float64)
    return pa.table(
        {
            "left_id": pa.array(left, pa.int64()),
            "right_id": pa.array(right, pa.int64()),
            "jaccard": pa.array(jarr),
            "is_dup": pa.array(jarr >= cfg.threshold),
        }
    )


def compute_true_clusters(pages: pa.Table, true_pairs: pa.Table) -> pa.Table:
    """Connected components over is_dup pairs; cluster id = min doc_id."""
    ids = doc_ids_from_urls(pages["url"].to_pylist())
    uf = UnionFind()
    mask = true_pairs["is_dup"].to_numpy(zero_copy_only=False)
    lefts = true_pairs["left_id"].to_numpy()[mask]
    rights = true_pairs["right_id"].to_numpy()[mask]
    for a, b in zip(lefts.tolist(), rights.tolist()):
        uf.union(a, b)
    labels = uf.labels(ids.tolist())
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array(labels, pa.int64()),
        }
    )


def generate_embeddings(
    n: int, dim: int = 64, n_clusters: int = 0, seed: int = 42
) -> "np.ndarray":
    """Deterministic clustered embedding fixture (bench-scale head
    evaluation): ``n_clusters`` Gaussian centroids on the unit sphere,
    points = centroid + noise. Clustered geometry is what learned hash
    heads exploit (the sf testdata embeddings are near-random, which
    floors every head's recall identically — FIXTURES.md)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n_clusters = n_clusters or max(8, n // 64)
    cents = rng.standard_normal((n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    asg = rng.integers(0, n_clusters, n)
    X = cents[asg] + 0.25 * rng.standard_normal((n, dim))
    return X.astype(np.float64)


def generate_pages_sharded(
    n: int, seed: int = 42, shard_size: int = 50_000, out_path: str | None = None
):
    """Bench-scale fixture generation as parallel Ray tasks.

    Each shard is an independent ``generate_pages`` call with a
    per-shard seed and position offset (distinct urls/timestamps), so
    the result is deterministic for (n, seed, shard_size). Dup clusters
    are planted within shards; each shard carries its own boilerplate
    skew probe. Writes one parquet file per shard when ``out_path`` is a
    directory; otherwise returns one concatenated table.
    """
    import ray

    plan = []
    off = 0
    i = 0
    while off < n:
        rows = min(shard_size, n - off)
        plan.append((i, rows))
        off += rows
        i += 1

    if out_path is None:

        @ray.remote
        def _shard(i: int, rows: int) -> pa.Table:
            return generate_pages(
                rows, seed=seed + i * 1009, pos_offset=i * shard_size
            )

        return pa.concat_tables(ray.get([_shard.remote(i, r) for i, r in plan]))

    # directory mode: each task writes its own parquet shard — no driver
    # gather (a 12.8M-page corpus gathered to the driver is ~36 GB of
    # object store + spill), parallel writes, resumable per shard
    import os

    os.makedirs(out_path, exist_ok=True)

    @ray.remote
    def _write_shard(i: int, rows: int) -> str:
        import pyarrow.parquet as pq

        t = generate_pages(rows, seed=seed + i * 1009, pos_offset=i * shard_size)
        dest = os.path.join(out_path, f"shard_{i:04d}.parquet")
        pq.write_table(t, dest + ".tmp", row_group_size=8192)
        os.rename(dest + ".tmp", dest)
        return dest

    ray.get(
        [
            _write_shard.remote(i, r)
            for i, r in plan
            if not os.path.exists(os.path.join(out_path, f"shard_{i:04d}.parquet"))
        ]
    )
    return out_path


def write_fixture(out_dir: str, n: int, seed: int = 42,
                  cfg: DedupConfig | None = None) -> dict[str, str]:
    """Write pages + oracle tables as parquet; returns paths."""
    import os

    import pyarrow.parquet as pq

    cfg = cfg or DedupConfig(seed=seed)
    os.makedirs(out_dir, exist_ok=True)
    pages = generate_pages(n, seed=seed)
    tp = compute_true_pairs(pages, cfg)
    tc = compute_true_clusters(pages, tp)
    paths = {}
    for name, tbl in [("pages", pages), ("true_pairs", tp), ("true_clusters", tc)]:
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths
