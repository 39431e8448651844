"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1).

Generates pages ``(url, warc_ts, html, text, lang)`` with planted near-dup
clusters and a ground-truth sidecar ``(url, true_cluster, channel)``, all from
a seeded ``numpy.random.Generator(PCG64(seed))`` — no external data, bitwise
reproducible.  Mirrors the reference's workspace evaluation setup where
cluster output is scored against known labels
(/root/reference/workspace/troyWspc.Rmd:143-189), with mutation "channels"
standing in for viral clades.

Channels:
  seed      — the cluster's seed document
  exact     — byte-identical copy of the seed text (Jaccard 1.0)
  near      — token substitution/insert/delete at a controlled rate
              (target word-5-shingle Jaccard ~0.7-0.95)
  substring — mostly-distinct doc embedding a >=200-byte run copied from the
              seed (below the MinHash tau; exercises the suffix-array
              substring-dedup stage only)
  boiler    — member of the one giant boilerplate cluster (~5% of rows;
              exercises the salted hot-bucket path)
  singleton — unrelated document
"""

from __future__ import annotations

import html as _htmlmod
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_BASE_TS_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds
_TS_STEP_US = 37_000_000  # deterministic function of row index

_SYLLABLES = (
    "ba be bi bo bu da de di do du ka ke ki ko ku la le li lo lu ma me mi mo "
    "mu na ne ni no nu ra re ri ro ru sa se si so su ta te ti to tu va ve vi "
    "vo vu za ze zi zo zu cha sho thi pla gru spo cra"
).split()

_LANGS = np.array(["en", "en", "en", "en", "en", "en", "de", "es", "fr", "zh"])


def _make_vocab(rng: np.random.Generator, size: int = 2400) -> list[str]:
    vocab = set()
    while len(vocab) < size:
        n = rng.integers(2, 5)
        vocab.add("".join(rng.choice(_SYLLABLES) for _ in range(n)))
    return sorted(vocab)


def _make_doc(rng: np.random.Generator, vocab: list[str]) -> list[list[str]]:
    """A document = list of paragraphs, each a list of word tokens."""
    n_par = int(rng.integers(2, 6))
    return [
        [vocab[i] for i in rng.integers(0, len(vocab), size=int(rng.integers(30, 120)))]
        for _ in range(n_par)
    ]


def _mutate(
    rng: np.random.Generator, paragraphs: list[list[str]], vocab: list[str], rate: float
) -> list[list[str]]:
    """Token-level substitution/insertion/deletion at ~``rate`` per token."""
    out = []
    for par in paragraphs:
        new: list[str] = []
        for tok in par:
            r = rng.random()
            if r < rate * 0.5:  # substitute
                new.append(vocab[int(rng.integers(0, len(vocab)))])
            elif r < rate * 0.75:  # delete
                continue
            elif r < rate:  # insert
                new.append(tok)
                new.append(vocab[int(rng.integers(0, len(vocab)))])
            else:
                new.append(tok)
        if new:
            out.append(new)
    return out or [["x"]]


def _render_text(paragraphs: list[list[str]]) -> str:
    return "\n".join(" ".join(par) for par in paragraphs)


def build_html(text: str, site_id: int) -> bytes:
    """Render a page whose canonical extraction is byte-identical to ``text``.

    Site chrome (nav/footer, shared within a site) lives OUTSIDE <main>; body
    paragraphs are entity-escaped inside <p> within <main>.
    """
    paragraphs = text.split("\n")
    body = "".join(f"<p>{_htmlmod.escape(p)}</p>" for p in paragraphs)
    page = (
        "<!DOCTYPE html><html><head>"
        f"<title>site{site_id}</title>"
        "<style>body{margin:0}</style>"
        "<script>var t=1;</script>"
        "</head><body>"
        f"<nav><a href='/'>site{site_id} home</a> | <a href='/about'>about</a>"
        f" | <a href='/contact'>contact</a></nav>"
        "<!-- rendered page -->"
        f"<main>{body}</main>"
        f"<footer>© site{site_id} — all rights reserved. privacy | terms</footer>"
        "</body></html>"
    )
    return page.encode("utf-8")


def generate_pages(
    n_docs: int, seed: int = 42, boiler_frac: float = 0.05
) -> tuple[pa.Table, pa.Table]:
    """Build the F1 corpus. Returns (pages, truth) Arrow tables.

    Row budget: ~5% giant boilerplate cluster, ~25% members of small planted
    clusters (sizes 2-20 incl. the seed), rest singletons.
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = _make_vocab(rng)

    rows: list[tuple[str, str, str, int, str]] = []  # (text, channel, lang, cluster, url_path)
    cluster_id = 0

    # --- giant boilerplate cluster (hot LSH buckets)
    n_boiler = max(0, int(n_docs * boiler_frac))
    if n_boiler:
        seed_doc = _make_doc(rng, vocab)
        for i in range(n_boiler):
            if i == 0 or rng.random() < 0.5:
                text = _render_text(seed_doc)
            else:
                text = _render_text(_mutate(rng, seed_doc, vocab, 0.01))
            rows.append((text, "boiler", "en", cluster_id, f"boiler/{i}"))
        cluster_id += 1

    # --- small planted clusters
    n_clustered = int(n_docs * 0.25)
    made = 0
    while made < n_clustered:
        size = int(rng.integers(2, 21))
        size = min(size, n_clustered - made)
        if size < 2:
            break
        seed_doc = _make_doc(rng, vocab)
        lang = str(rng.choice(_LANGS))
        rows.append((_render_text(seed_doc), "seed", lang, cluster_id, f"c{cluster_id}/0"))
        for j in range(1, size):
            r = rng.random()
            if r < 0.25:
                text, channel = _render_text(seed_doc), "exact"
            elif r < 0.9:
                rate = float(rng.uniform(0.005, 0.03))
                text, channel = _render_text(_mutate(rng, seed_doc, vocab, rate)), "near"
            else:
                # distinct doc + a long copied run (>=200 bytes) from the seed
                other = _make_doc(rng, vocab)
                flat = [t for par in seed_doc for t in par]
                # 60 tokens * >=4 chars + 59 spaces >= 299 bytes: safely above
                # the 200-byte substring-dedup detection guarantee
                run_len = 60
                if len(flat) > run_len:
                    start = int(rng.integers(0, len(flat) - run_len))
                    other[len(other) // 2] = flat[start : start + run_len]
                text, channel = _render_text(other), "substring"
            rows.append((text, channel, lang, cluster_id, f"c{cluster_id}/{j}"))
        made += size
        cluster_id += 1

    # --- singletons
    while len(rows) < n_docs:
        lang = str(rng.choice(_LANGS))
        rows.append(
            (_render_text(_make_doc(rng, vocab)), "singleton", lang, cluster_id, f"s/{len(rows)}")
        )
        cluster_id += 1
    rows = rows[:n_docs]

    # deterministic interleave so cluster members are scattered across blocks
    order = rng.permutation(len(rows))
    urls, tss, htmls, texts, langs = [], [], [], [], []
    t_urls, t_clusters, t_channels = [], [], []
    for out_i, idx in enumerate(order):
        text, channel, lang, cid, path = rows[idx]
        site = cid % 97
        url = f"https://site{site}.example/{path}"
        urls.append(url)
        tss.append(_BASE_TS_US + out_i * _TS_STEP_US)
        htmls.append(build_html(text, site))
        texts.append(text)
        langs.append(lang)
        t_urls.append(url)
        t_clusters.append(cid)
        t_channels.append(channel)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    truth = pa.table(
        {
            "doc_url": pa.array(t_urls, pa.string()),
            "true_cluster": pa.array(t_clusters, pa.int64()),
            "channel": pa.array(t_channels, pa.string()),
        }
    )
    return pages, truth


def write_pages_dir(
    out_dir: str, n_docs: int, seed: int = 42, num_shards: int = 8
) -> tuple[str, str]:
    """Write the corpus as sharded Parquet: ``{out_dir}/pages/part-*.parquet``
    plus ``{out_dir}/truth.parquet``.  Returns (pages_dir, truth_path).
    Idempotent: skips generation when a matching _FIXTURE_META exists."""
    import json

    pages_dir = os.path.join(out_dir, "pages")
    truth_path = os.path.join(out_dir, "truth.parquet")
    meta_path = os.path.join(out_dir, "_FIXTURE_META.json")
    meta = {"n_docs": n_docs, "seed": seed, "num_shards": num_shards, "v": 1}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f) == meta:
                return pages_dir, truth_path
    pages, truth = generate_pages(n_docs, seed=seed)
    os.makedirs(pages_dir, exist_ok=True)
    shard_size = (pages.num_rows + num_shards - 1) // num_shards
    for s in range(num_shards):
        chunk = pages.slice(s * shard_size, shard_size)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(pages_dir, f"part-{s:05d}.parquet"))
    pq.write_table(truth, truth_path)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return pages_dir, truth_path
