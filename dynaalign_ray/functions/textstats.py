"""Text-analysis operators for training-data curation (engine additions per
the build brief: language-ID, quality scoring, token counting, document
fingerprinting).  All kernels are vectorized ``map_batches`` bodies —
pyarrow.compute regex counts (RE2, C++) per batch, no Python row loops.

Token definition (shared with the DuckDB oracles): a token is a maximal run
of non-whitespace, i.e. matches of ``\\S+``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# small built-in stopword lists for the n-gram/stopword langid heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "es": ["el", "la", "los", "las", "que", "de", "y", "en", "por", "una"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
}

_STOPWORDS_EN = set(_LANG_MARKERS["en"]) | {"a", "an", "it", "on", "as", "are", "be"}


def token_count_batch(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """docs -> (doc_id, n_tokens): count of \\S+ runs."""
    n = pc.count_substring_regex(batch.column(col), r"\S+")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": n.cast(pa.int64()),
        }
    )


# GPT-2-style pre-tokenizer pattern, RE2-compatible (the original's
# trailing-space lookahead dropped — RE2 has no lookahead; both Arrow and
# the DuckDB oracle compile this exact string through RE2, so counts agree)
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """docs -> (doc_id, n_pieces): BPE-ish pre-tokenizer piece count — the
    standard LLM-cost proxy (whitespace token counts undercount code/punct
    heavy text)."""
    n = pc.count_substring_regex(batch.column(col), BPE_PATTERN)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_pieces": n.cast(pa.int64()),
        }
    )


def quality_score_batch(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """docs -> per-doc quality features + a composite score in [0, 1].

    Features (all ratios over character or token counts):
      n_chars, n_tokens, mean_token_len, punct_ratio, digit_ratio,
      upper_ratio, stopword_ratio (English stopword hits / tokens).
    The composite mirrors common web-text quality heuristics: long enough,
    few digits/punct, some stopwords.
    """
    text = batch.column(col)
    n_chars = pc.utf8_length(text).cast(pa.float64())
    n_tokens = pc.count_substring_regex(text, r"\S+").cast(pa.float64())
    n_punct = pc.count_substring_regex(text, r"[!-/:-@\[-`{-~]").cast(pa.float64())
    n_digit = pc.count_substring_regex(text, r"[0-9]").cast(pa.float64())
    n_upper = pc.count_substring_regex(text, r"[A-Z]").cast(pa.float64())
    stop_pat = r"(?i)\b(" + "|".join(sorted(_STOPWORDS_EN)) + r")\b"
    n_stop = pc.count_substring_regex(text, stop_pat).cast(pa.float64())

    chars = np.maximum(np.asarray(n_chars), 1.0)
    toks = np.maximum(np.asarray(n_tokens), 1.0)
    punct_ratio = np.asarray(n_punct) / chars
    digit_ratio = np.asarray(n_digit) / chars
    upper_ratio = np.asarray(n_upper) / chars
    stop_ratio = np.asarray(n_stop) / toks
    mean_tok_len = (chars - (toks - 1)) / toks  # approx: chars minus separators

    length_term = np.clip(np.asarray(n_tokens) / 50.0, 0.0, 1.0)
    clean_term = np.clip(1.0 - 2.0 * (punct_ratio + digit_ratio), 0.0, 1.0)
    stop_term = np.clip(stop_ratio * 4.0, 0.0, 1.0)
    score = 0.4 * length_term + 0.4 * clean_term + 0.2 * stop_term

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
            "n_tokens": pc.count_substring_regex(text, r"\S+").cast(pa.int64()),
            "mean_token_len": pa.array(mean_tok_len, type=pa.float64()),
            "punct_ratio": pa.array(punct_ratio, type=pa.float64()),
            "digit_ratio": pa.array(digit_ratio, type=pa.float64()),
            "upper_ratio": pa.array(upper_ratio, type=pa.float64()),
            "stopword_ratio": pa.array(stop_ratio, type=pa.float64()),
            "quality_score": pa.array(score, type=pa.float64()),
        }
    )


class LangIdActor:
    """Heuristic language ID: per-language stopword-marker hit counts
    (word-boundary regexes, compiled/cached once per actor in __init__ —
    the stateful actor-pool pattern) + CJK codepoint ratio for zh."""

    def __init__(self):
        self.patterns = {
            lang: r"(?i)\b(" + "|".join(words) + r")\b"
            for lang, words in _LANG_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        toks = np.maximum(
            np.asarray(pc.count_substring_regex(text, r"\S+")).astype(np.float64), 1.0
        )
        scores = []
        langs = list(self.patterns)
        for lang in langs:
            hits = np.asarray(pc.count_substring_regex(text, self.patterns[lang]))
            scores.append(hits.astype(np.float64) / toks)
        score_mat = np.stack(scores, axis=1)  # (n, n_langs)
        chars = np.maximum(
            np.asarray(pc.utf8_length(text)).astype(np.float64), 1.0
        )
        cjk = np.asarray(pc.count_substring_regex(text, r"[\x{4e00}-\x{9fff}]"))
        cjk_ratio = cjk.astype(np.float64) / chars

        best = np.argmax(score_mat, axis=1)
        best_score = score_mat[np.arange(len(best)), best]
        pred = np.array([langs[i] for i in best], dtype=object)
        pred[cjk_ratio > 0.2] = "zh"
        pred[(best_score < 0.01) & (cjk_ratio <= 0.2)] = "unknown"
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(pred, type=pa.string()),
                "lang_confidence": pa.array(
                    np.where(cjk_ratio > 0.2, cjk_ratio, best_score), type=pa.float64()
                ),
            }
        )


def fingerprint_batch(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """docs -> (doc_id, fingerprint): order-sensitive rolling-hash document
    fingerprint (min winnowing gram hash; equal for byte-identical docs,
    robust to where the doc sits in the batch)."""
    from dynaalign_ray.hashing import content_hash, to_id63
    from dynaalign_ray.stages.substring import _gram_hashes_batch

    col_arr = batch.column(col)
    n = len(col_arr)
    hashes, counts = _gram_hashes_batch(col_arr, 16)
    fps = np.empty(n, dtype=np.int64)
    has_grams = counts > 0
    if has_grams.any():
        ends = np.cumsum(counts)
        mins = np.minimum.reduceat(hashes, (ends - counts)[has_grams])
        fps[has_grams] = to_id63(mins)
    if not has_grams.all():
        # short docs (< kgram bytes) fall back to the content hash
        short_idx = np.flatnonzero(~has_grams)
        short = col_arr.take(pa.array(short_idx, type=pa.int64()))
        fps[short_idx] = content_hash(short.to_pylist())
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(fps, type=pa.int64()),
        }
    )


def compress_ratio_batch(batch: pa.Table, *, col: str = "text", level: int = 6) -> pa.Table:
    """docs -> (doc_id, raw_bytes, gz_bytes, compress_ratio): zlib
    compressed size over raw UTF-8 size — the classic
    low-entropy/boilerplate detector (highly repetitive text compresses
    far below normal prose; near-random bytes sit near or above 1.0).
    Deterministic for a fixed zlib level; inherently per-payload C calls
    (like the HTML extract kernel), so the loop is per row by necessity.
    Not SQL-reproducible (no zlib in the oracle) — rows-only query;
    semantics pytest-gated."""
    import zlib

    texts = batch.column(col).to_pylist()
    raw = np.zeros(len(texts), dtype=np.int64)
    gz = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")
        raw[i] = len(b)
        gz[i] = len(zlib.compress(b, level))
    ratio = np.divide(
        gz.astype(np.float64),
        raw.astype(np.float64),
        out=np.zeros(len(texts), dtype=np.float64),
        where=raw > 0,
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "raw_bytes": pa.array(raw, type=pa.int64()),
            "gz_bytes": pa.array(gz, type=pa.int64()),
            "compress_ratio": pa.array(ratio, type=pa.float64()),
        }
    )
