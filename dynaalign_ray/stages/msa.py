"""Progressive multiple sequence alignment (per-cluster reduce).

The reference builds per-cluster consensus with DECIPHER's progressive
aligner (``AlignSeqs`` -> ``ConsensusSequence``, R/clusterbreak.R:313-318).
The engine's default stayed the center-star approximation
(stages/consensus.make_center_star_consensus) because it is O(m L^2) —
but center-star cannot represent insertions relative to its center, so
ragged clusters lose columns.  This module closes that gap with a REAL
progressive MSA, all deterministic:

1. guide tree: UPGMA over pairwise NW distances (1 - nw_similarity),
   deterministic tie-break on the smallest (i, j) pair;
2. progressive profile-profile alignment up the tree with the same
   affine-gap three-matrix DP the pairwise kernel uses
   (stages/nw._dp_from_scores) — column scores are expected
   substitution scores between profile columns (sum-of-pairs over
   frequencies), existing-gap-vs-char pairs scored as one extension;
3. consensus: per-column majority over all aligned rows (ties -> the
   lexicographically smallest symbol, so '-' wins ties and the column is
   dropped — the same rule the center-star reduce uses).

Scale: runs INSIDE one ``map_groups`` task per cluster; cluster sizes are
bounded by the pipeline's size controller (pipelines/clusterbreak.py), so
the O(m^2 L^2) pairwise stage and O(m L^2) merge stage stay small.  Inputs
past ``_MAX_MSA_MEMBERS`` raise with the named fallback (center-star),
the repo's honest-size-gate convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from dynaalign_ray.stages.nw import (
    _dp_from_scores,
    _encode,
    _NEG_INF,
    get_substitution_matrix,
    nw_similarity,
)

_MAX_MSA_MEMBERS = 256


def upgma_merge_order(dist: np.ndarray) -> list[tuple[int, int]]:
    """UPGMA agglomeration over a symmetric distance matrix.  Returns the
    merge sequence as (i, j) pairs of cluster slots, where the merged
    cluster reuses slot i (i < j always; ties -> smallest (d, i, j))."""
    n = len(dist)
    d = dist.astype(np.float64).copy()
    np.fill_diagonal(d, np.inf)
    sizes = np.ones(n)
    alive = np.ones(n, dtype=bool)
    merges: list[tuple[int, int]] = []
    for _ in range(n - 1):
        masked = np.where(np.triu(np.outer(alive, alive), k=1), d, np.inf)
        # argmin in row-major order = smallest (d, i, j) deterministically
        i, j = np.unravel_index(int(np.argmin(masked)), masked.shape)
        merges.append((int(i), int(j)))
        si, sj = sizes[i], sizes[j]
        merged_row = (si * d[i] + sj * d[j]) / (si + sj)
        d[i, :] = merged_row
        d[:, i] = merged_row
        d[i, i] = np.inf
        sizes[i] = si + sj
        alive[j] = False
    return merges


def _profile(rows: list[str], index: dict[str, int], n_sym: int) -> np.ndarray:
    """(L, n_sym+1) count matrix: substitution-alphabet counts per column
    plus a trailing gap-count lane."""
    L = len(rows[0])
    counts = np.zeros((L, n_sym + 1), dtype=np.float64)
    for r in rows:
        enc = np.fromiter(
            (n_sym if c == "-" else index[c] for c in r), dtype=np.int64, count=L
        )
        counts[np.arange(L), enc] += 1.0
    return counts


def _profile_scores(
    pa_: np.ndarray, pb: np.ndarray, sub: np.ndarray, gap_ext: float
) -> np.ndarray:
    """Expected sum-of-pairs column score: substitution score over char
    frequencies; char-vs-existing-gap pairs cost one gap extension;
    gap-vs-gap is neutral."""
    na, nb = pa_.sum(axis=1)[0], pb.sum(axis=1)[0]
    fa, fb = pa_ / na, pb / nb
    ca, cb = fa[:, :-1], fb[:, :-1]  # char frequency lanes
    ga, gb = fa[:, -1], fb[:, -1]  # gap frequency lane
    s = ca @ sub.astype(np.float64) @ cb.T
    s -= gap_ext * (np.outer(ga, cb.sum(axis=1)) + np.outer(ca.sum(axis=1), gb))
    return s


def _profile_traceback(M, Ix, Iy, gap_open, gap_ext) -> list[str]:
    """Ops from (n, m) profile DP: 'M' diagonal, 'X' column of A vs gap,
    'Y' column of B vs gap (mirrors stages/nw._traceback state logic)."""
    n, m = M.shape[0] - 1, M.shape[1] - 1
    i, j = n, m
    state = int(np.argmax([M[n, m], Ix[n, m], Iy[n, m]]))
    ops: list[str] = []
    while i > 0 or j > 0:
        if state == 0 and i > 0 and j > 0:
            ops.append("M")
            state = int(np.argmax([M[i - 1, j - 1], Ix[i - 1, j - 1], Iy[i - 1, j - 1]]))
            i, j = i - 1, j - 1
        elif state == 1 and i > 0:
            ops.append("X")
            state = 0 if M[i - 1, j] - gap_open >= Ix[i - 1, j] - gap_ext else 1
            i -= 1
        elif state == 2 and j > 0:
            ops.append("Y")
            state = 0 if M[i, j - 1] - gap_open >= Iy[i, j - 1] - gap_ext else 2
            j -= 1
        else:
            state = 1 if i > 0 else 2
    ops.reverse()
    return ops


def _merge_alignments(
    rows_a: list[str],
    rows_b: list[str],
    index: dict[str, int],
    n_sym: int,
    sub: np.ndarray,
    gap_open: float,
    gap_ext: float,
) -> list[str]:
    pa_ = _profile(rows_a, index, n_sym)
    pb = _profile(rows_b, index, n_sym)
    if pa_.shape[0] == 0 or pb.shape[0] == 0:
        # degenerate empty-sequence cluster: pad to the other side's length
        la, lb = pa_.shape[0], pb.shape[0]
        return [r + "-" * max(0, lb - la) for r in rows_a] + [
            r + "-" * max(0, la - lb) for r in rows_b
        ]
    scores = _profile_scores(pa_, pb, sub, gap_ext)
    M, Ix, Iy = _dp_from_scores(scores, float(gap_open), float(gap_ext))
    ops = _profile_traceback(M, Ix, Iy, float(gap_open), float(gap_ext))
    out_a = ["" for _ in rows_a]
    out_b = ["" for _ in rows_b]
    ai = bi = 0
    for op in ops:
        if op in ("M", "X"):
            for r in range(len(rows_a)):
                out_a[r] += rows_a[r][ai]
            ai += 1
        else:
            for r in range(len(rows_a)):
                out_a[r] += "-"
        if op in ("M", "Y"):
            for r in range(len(rows_b)):
                out_b[r] += rows_b[r][bi]
            bi += 1
        else:
            for r in range(len(rows_b)):
                out_b[r] += "-"
    return out_a + out_b


def progressive_msa(
    seqs: list[str],
    matrix_name: str = "BLOSUM62",
    gap_open: int = 10,
    gap_ext: int = 4,
    custom: tuple[str, np.ndarray] | None = None,
) -> list[str]:
    """Align ``seqs`` progressively; returns gapped rows, all equal length,
    in the input order."""
    m = len(seqs)
    if m == 0:
        return []
    if m == 1:
        return list(seqs)
    if m > _MAX_MSA_MEMBERS:
        raise ValueError(
            f"progressive_msa capped at {_MAX_MSA_MEMBERS} members (got {m}); "
            "run the size controller (pipelines/clusterbreak.py) first, or "
            "use make_center_star_consensus for oversized clusters"
        )
    alphabet, sub = custom if custom is not None else get_substitution_matrix(matrix_name)
    index = {c: i for i, c in enumerate(alphabet)}
    for s in seqs:
        _encode(s, index)  # same invalid-character guard as the NW kernel
    kw = dict(matrix_name=matrix_name, gap_open=gap_open, gap_ext=gap_ext, custom=custom)
    dist = np.zeros((m, m))
    for i in range(m):
        for j in range(i + 1, m):
            dist[i, j] = dist[j, i] = 1.0 - nw_similarity(seqs[i], seqs[j], **kw)
    clusters: dict[int, tuple[list[int], list[str]]] = {
        i: ([i], [seqs[i]]) for i in range(m)
    }
    for i, j in upgma_merge_order(dist):
        ids_a, rows_a = clusters.pop(i)
        ids_b, rows_b = clusters.pop(j)
        merged = _merge_alignments(rows_a, rows_b, index, len(alphabet), sub, gap_open, gap_ext)
        clusters[i] = (ids_a + ids_b, merged)
    ids, rows = next(iter(clusters.values()))
    out = [""] * m
    for sid, row in zip(ids, rows):
        out[sid] = row
    return out


def consensus_from_alignment(aligned: list[str]) -> str:
    """Per-column majority; ties -> smallest symbol ('-' < letters, so gap
    wins ties and the column is dropped) — the engine-wide tie rule."""
    from collections import Counter

    out = []
    for chars in zip(*aligned):
        c = Counter(chars)
        best_n = max(c.values())
        ch = min(k for k, v in c.items() if v == best_n)
        if ch != "-":
            out.append(ch)
    return "".join(out)


def make_progressive_msa_consensus(
    matrix_name: str = "IDENTITY", gap_open: int = 10, gap_ext: int = 4
):
    """MSA-grade consensus_fn for stages/consensus.cluster_consensus — the
    full analog of the reference's AlignSeqs -> ConsensusSequence
    (R/clusterbreak.R:313-318), replacing the center-star approximation
    (insertions relative to any member ARE representable here)."""

    def consensus_msa(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        texts = g["text"].tolist()
        aligned = progressive_msa(
            texts, matrix_name=matrix_name, gap_open=gap_open, gap_ext=gap_ext
        )
        cons = consensus_from_alignment(aligned)
        top_row = g.iloc[0]
        return pd.DataFrame(
            {
                "cluster_id": [top_row["cluster_id"]],
                "consensus": [cons],
                "representative_doc": [int(top_row["doc_id"])],
                "n_members": [len(texts)],
            }
        )

    return consensus_msa
