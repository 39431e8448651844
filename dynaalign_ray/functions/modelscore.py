"""Batched model-inference stage: a linear quality/domain classifier applied
to every document by a stateful actor pool.

This is the engine's model-scoring plumbing (quality classifiers, fastText-
style domain filters, reward-model gates all share this shape):

- the weight matrix lives in the object store (ONE ``ray.put`` via
  :func:`dynaalign_ray.exec.broadcast_put`), never re-shipped per batch;
- each actor fetches it once in ``__init__`` (zero-copy plasma read) — the
  stateful actor-pool pattern (SURVEY.md §4), same as
  ``stages/minhash.MinHashActor``;
- per batch, feature extraction is pure Arrow/RE2 + numpy (no Python row
  loop), and scoring is vectorized arithmetic over the feature columns.

The bundled model is deliberately a *deterministic* hand-set linear model
over exact integer text features so the whole stage has a bit-exact DuckDB
oracle (`doc_model_scores`): every feature is an RE2 match count (Arrow and
DuckDB both compile RE2, so counts agree — the `doc_quality` oracle proved
this), and each class score is accumulated in a FIXED left-associative
order, matching SQL's left-assoc ``+`` over IEEE doubles op-for-op.  No
transcendentals (a sigmoid/softmax would tie the oracle to libm ULPs); the
decision surface of argmax / thresholding is identical with or without the
monotone link anyway.

A real learned model drops in by replacing ``QUALITY_MODEL`` — the plumbing
(broadcast, actor pool, vectorized batches) is what this module tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dynaalign_ray.functions.textstats import _STOPWORDS_EN

# ---------------------------------------------------------------------------
# Model definition.  Features are exact int64 counts; weights are float64
# literals.  Class scores: s_c = b_c + w0*f0 + w1*f1 + ... (left-assoc).
# Feature order is part of the model contract (the oracle mirrors it).

FEATURE_REGEXES: list[tuple[str, str]] = [
    ("n_tokens", r"\S+"),
    ("n_punct", r"[!-/:-@\[-`{-~]"),
    ("n_digit", r"[0-9]"),
    ("n_upper", r"[A-Z]"),
    ("n_stop", r"(?i)\b(" + "|".join(sorted(_STOPWORDS_EN)) + r")\b"),
]
# n_chars (utf8_length) is prepended as feature 0 at scoring time.
FEATURE_NAMES: list[str] = ["n_chars"] + [n for n, _ in FEATURE_REGEXES]

# (classes, bias, weight rows) — a 3-class "keep tier" head: hi / mid / low.
QUALITY_MODEL: dict = {
    "classes": ["hi", "mid", "low"],
    "bias": [-2.0, 1.0, 2.5],
    # rows align with FEATURE_NAMES: n_chars n_tokens n_punct n_digit n_upper n_stop
    "weights": [
        [0.0125, 0.05, -0.25, -0.5, -0.125, 0.75],
        [0.005, 0.02, -0.0625, -0.125, -0.03125, 0.25],
        [-0.0025, 0.0, 0.125, 0.25, 0.0625, -0.5],
    ],
}


def extract_features(text: pa.ChunkedArray | pa.Array) -> list[np.ndarray]:
    """text column -> list of int64 feature arrays in FEATURE_NAMES order.
    All RE2 count kernels (C++), vectorized over the batch."""
    feats = [np.asarray(pc.utf8_length(text).cast(pa.int64()))]
    for _, pat in FEATURE_REGEXES:
        feats.append(np.asarray(pc.count_substring_regex(text, pat).cast(pa.int64())))
    return feats


def score_fixed_order(
    feats: list[np.ndarray], bias: float, weights: list[float]
) -> np.ndarray:
    """One class score with a FIXED left-associative accumulation order —
    bit-equal to SQL ``b + w0*f0 + w1*f1 + ...`` over doubles.  Vectorized
    elementwise over the batch (the fixed order costs nothing: it is the
    same n_features fused passes numpy would do anyway)."""
    s = np.full(len(feats[0]), bias, dtype=np.float64)
    for w, f in zip(weights, feats):
        s = s + w * f.astype(np.float64)
    return s


class LinearModelScorer:
    """Actor-pool inference stage: ``map_batches(LinearModelScorer,
    fn_constructor_kwargs={"model_ref": ref}, concurrency=...)``.

    ``model_ref`` may be an ObjectRef (fetched once per actor here — the
    broadcast pattern) or a plain dict (unit tests)."""

    def __init__(self, model_ref):
        import ray

        model = (
            ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        )
        self.classes: list[str] = list(model["classes"])
        self.bias: list[float] = [float(b) for b in model["bias"]]
        self.weights: list[list[float]] = [
            [float(w) for w in row] for row in model["weights"]
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = extract_features(batch.column("text"))
        scores = [
            score_fixed_order(feats, b, row)
            for b, row in zip(self.bias, self.weights)
        ]
        mat = np.stack(scores, axis=1)  # (n, n_classes)
        # argmax, first-max wins on ties (np.argmax rule; the oracle's CASE
        # chain `WHEN s0 >= s1 AND s0 >= s2 ... WHEN s1 >= s2 ...` matches)
        best = np.argmax(mat, axis=1)
        pred = np.asarray(self.classes, dtype=object)[best]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "model_class": pa.array(pred, type=pa.string()),
                "score_hi": pa.array(scores[0], type=pa.float64()),
                "keep": pa.array(best != len(self.classes) - 1, type=pa.bool_()),
            }
        )


def model_score_sql(table: str = "documents") -> str:
    """The DuckDB oracle for :class:`LinearModelScorer` over ``table``,
    generated FROM the same model constants so weights cannot drift.
    Regex patterns are embedded verbatim (DuckDB single-quoted strings take
    backslashes literally — same convention as every textstats oracle);
    float weights are embedded via repr (round-trip-exact for doubles)."""
    feat_sql = {"n_chars": "CAST(length(text) AS DOUBLE)"}
    for name, pat in FEATURE_REGEXES:
        feat_sql[name] = (
            "CAST(len(regexp_extract_all(text, '"
            + pat.replace("'", "''")
            + "')) AS DOUBLE)"
        )

    def class_expr(ci: int) -> str:
        terms = [repr(QUALITY_MODEL["bias"][ci])]
        for w, fname in zip(QUALITY_MODEL["weights"][ci], FEATURE_NAMES):
            terms.append(f"{w!r} * {fname}")
        return " + ".join(terms)

    classes = QUALITY_MODEL["classes"]
    feat_cols = ",\n                       ".join(
        f"{sql} AS {name}" for name, sql in feat_sql.items()
    )
    # keep = argmax(first-max) is not the last class: class0 wins iff
    # s0>=s1 AND s0>=s2; else class1 wins iff s1>=s2 — so keep is the OR.
    return f"""
            WITH f AS (
                SELECT doc_id,
                       {feat_cols}
                FROM {table}
            ), sc AS (
                SELECT doc_id,
                       {class_expr(0)} AS s0,
                       {class_expr(1)} AS s1,
                       {class_expr(2)} AS s2
                FROM f
            )
            SELECT doc_id,
                   CASE WHEN s0 >= s1 AND s0 >= s2 THEN '{classes[0]}'
                        WHEN s1 >= s2 THEN '{classes[1]}'
                        ELSE '{classes[2]}' END AS model_class,
                   s0 AS score_hi,
                   ((s0 >= s1 AND s0 >= s2) OR s1 >= s2) AS keep
            FROM sc
        """
