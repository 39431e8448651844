"""Deterministic SVG re-expressions of the reference's plot outputs.

The reference renders two figures to an R graphics device:

- ``plot_similarity_matrix`` (R/plotting.R:14-29): ``stats::heatmap`` of a
  similarity matrix with optional hclust row/column reordering.
- ``consensusplot`` (R/clusterbreak.R:379-399): minhash similarity of
  consensus sequences -> quantile threshold -> igraph Louvain communities
  -> Fruchterman-Reingold layout -> colored network plot.

This container has no plotting libraries, but SVG is plain XML — so both
figures are re-expressed as pure-stdlib/numpy SVG writers that return a
string (and can be written next to a run report).  Everything is
deterministic: the agglomerative leaf order, the Louvain backend
(stages/louvain.py, no randomized itr repeats — the engine-wide
convention), and the FR layout (fixed seed + iteration count), so the
same input always yields byte-identical SVG — testable without an image
diff.

Plots are driver-side by nature (a figure is a SMALL artifact): inputs
are capped at _MAX_PLOT_ITEMS items with a remediation message, matching
the repo's honest-size-gate convention.  Plot the consensus table or a
sampled similarity matrix, never a corpus.
"""

from __future__ import annotations

import numpy as np

_MAX_PLOT_ITEMS = 1024


# ------------------------------------------------------------ color helpers


def _heat_color(t: float) -> str:
    """0..1 -> dark blue -> light yellow ramp (monotone luminance)."""
    t = min(1.0, max(0.0, t))
    r = int(round(30 + 225 * t))
    g = int(round(40 + 200 * t))
    b = int(round(90 + 60 * (1 - t) - 40 * t))
    return f"#{r:02x}{g:02x}{b:02x}"


# 12 categorical community colors (ColorBrewer Set3-like, spaced hues)
_PALETTE = (
    "#4477aa", "#ee6677", "#228833", "#ccbb44", "#66ccee", "#aa3377",
    "#bbbbbb", "#994f00", "#6699cc", "#997700", "#ee99aa", "#225555",
)


# ------------------------------------------------- hierarchical leaf order


def _hclust_leaf_order(x: np.ndarray) -> np.ndarray:
    """Average-linkage agglomerative clustering leaf order over euclidean
    row distances — the reorder ``stats::heatmap`` applies via
    ``as.dendrogram(hclust(dist(X)))``.  Naive O(n^3): plot-scale n only."""
    n = len(x)
    if n <= 2:
        return np.arange(n)
    d = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2))
    np.fill_diagonal(d, np.inf)
    active = {i: [i] for i in range(n)}
    sizes = {i: 1 for i in range(n)}
    dist = {}
    for i in range(n):
        for j in range(i + 1, n):
            dist[(i, j)] = d[i, j]
    nxt = n
    while len(active) > 1:
        (i, j), _ = min(
            ((p, v) for p, v in dist.items() if p[0] in active and p[1] in active),
            key=lambda kv: (kv[1], kv[0]),
        )
        members = active.pop(i) + active.pop(j)
        si, sj = sizes.pop(i), sizes.pop(j)
        for k in list(active):
            a = dist.pop((min(i, k), max(i, k)))
            b = dist.pop((min(j, k), max(j, k)))
            dist[(min(nxt, k), max(nxt, k))] = (si * a + sj * b) / (si + sj)
        active[nxt] = members
        sizes[nxt] = si + sj
        nxt += 1
    return np.array(next(iter(active.values())), dtype=np.int64)


# --------------------------------------------------------- heatmap figure


def similarity_heatmap_svg(
    matrix: np.ndarray,
    labels: list[str] | None = None,
    cluster: bool = True,
    cell: int = 14,
    title: str = "Similarity Matrix Heatmap",
) -> str:
    """n x n similarity matrix -> SVG heatmap string.

    ``cluster=True`` reorders rows and columns by the average-linkage
    dendrogram leaf order (the ``Rowv``/``Colv`` behavior of the
    reference's ``stats::heatmap`` call, R/plotting.R:23-25);
    non-symmetric input gets the same "may be unexpected" treatment — a
    comment node in the SVG rather than a console warning.
    """
    x = np.asarray(matrix, dtype=np.float64)
    if x.ndim != 2 or x.shape[0] != x.shape[1]:
        raise ValueError("similarity_heatmap_svg expects a square matrix")
    n = x.shape[0]
    if n > _MAX_PLOT_ITEMS:
        raise ValueError(
            f"heatmap capped at {_MAX_PLOT_ITEMS} items (got {n}); a figure "
            "is a driver-side artifact — sample or aggregate the matrix "
            "(e.g. one row per cluster) before plotting"
        )
    symmetric = bool(np.allclose(x, x.T))
    order = _hclust_leaf_order(x) if (cluster and n > 1) else np.arange(n)
    xr = x[np.ix_(order, order)]
    if labels is not None:
        labels = [str(labels[i]) for i in order]

    vmin, vmax = float(xr.min()), float(xr.max())
    span = (vmax - vmin) or 1.0
    margin = 90 if labels is not None else 30
    top = 34
    width = margin + n * cell + 20
    height = top + n * cell + 20
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">',
    ]
    if not symmetric:
        parts.append("<!-- input matrix is not symmetric; results may be unexpected -->")
    parts.append(
        f'<text x="{margin}" y="20" font-family="sans-serif" font-size="14">{title}</text>'
    )
    for yi in range(n):
        for xi in range(n):
            c = _heat_color((xr[yi, xi] - vmin) / span)
            parts.append(
                f'<rect x="{margin + xi * cell}" y="{top + yi * cell}" '
                f'width="{cell}" height="{cell}" fill="{c}"/>'
            )
    if labels is not None:
        for yi, lab in enumerate(labels):
            parts.append(
                f'<text x="{margin - 4}" y="{top + yi * cell + cell - 3}" '
                f'font-family="sans-serif" font-size="{max(6, cell - 4)}" '
                f'text-anchor="end">{_esc(lab)}</text>'
            )
    parts.append("</svg>")
    return "\n".join(parts)


# ------------------------------------------------------------- FR layout


def _fr_layout(
    n: int, a: np.ndarray, b: np.ndarray, w: np.ndarray, seed: int = 42, iters: int = 60
) -> np.ndarray:
    """Weighted Fruchterman-Reingold on the unit square, deterministic
    (fixed seed + iteration schedule) — the layout_with_fr analog."""
    rng = np.random.Generator(np.random.PCG64(seed))
    pos = rng.random((n, 2))
    if n == 1:
        return pos
    k = 1.0 / np.sqrt(n)
    t = 0.1
    for it in range(iters):
        delta = pos[:, None, :] - pos[None, :, :]
        d = np.sqrt((delta**2).sum(axis=2)) + 1e-9
        rep = (k * k / d)[:, :, None] * delta / d[:, :, None]
        disp = rep.sum(axis=1)
        if len(a):
            dvec = pos[a] - pos[b]
            dd = np.sqrt((dvec**2).sum(axis=1)) + 1e-9
            att = (dd / k * w)[:, None] * dvec / dd[:, None]
            np.add.at(disp, a, -att)
            np.add.at(disp, b, att)
        norm = np.sqrt((disp**2).sum(axis=1)) + 1e-9
        step = np.minimum(norm, t)
        pos += disp / norm[:, None] * step[:, None]
        pos = np.clip(pos, 0.0, 1.0)
        t *= 0.95
    return pos


# ------------------------------------------------------ consensus network


def consensus_graph_svg(
    names: list[str],
    sequences: list[str],
    k_size: int = 2,
    hash_size: int = 50,
    threshold_p: float = 0.8,
    sens: float = 1.05,
    seed: int = 42,
    size: int = 480,
) -> str:
    """Consensus-sequence network figure (the consensusplot analog,
    R/clusterbreak.R:379-399): minhash similarity over ``sequences``
    (same kernels as compat.similarity_mh_compat), edges kept at or above
    the ``threshold_p`` quantile of the off-diagonal similarities, Louvain
    communities at resolution ``sens`` (stages/louvain.py), weighted FR
    layout, nodes colored by community and labeled by ``names``."""
    if len(names) != len(sequences):
        raise ValueError("names and sequences must align")
    n = len(sequences)
    if n == 0:
        raise ValueError("sequences must be non-empty")
    if n > _MAX_PLOT_ITEMS:
        raise ValueError(
            f"network plot capped at {_MAX_PLOT_ITEMS} nodes (got {n}); plot "
            "the per-cluster consensus table, not a document corpus"
        )
    from dynaalign_ray.compat import similarity_mh_compat
    from dynaalign_ray.stages.louvain import louvain_communities

    sim = similarity_mh_compat(list(sequences), k=k_size, n_hash=hash_size, seed=seed)
    iu = np.triu_indices(n, k=1)
    if len(iu[0]):
        threshold = float(np.quantile(sim[iu], threshold_p))
        keep = sim[iu] >= threshold
        a, b, w = iu[0][keep], iu[1][keep], sim[iu][keep]
    else:
        a = b = np.empty(0, np.int64)
        w = np.empty(0, np.float64)
    comm = (
        louvain_communities(a, b, w, resolution=sens)
        if len(a)
        else np.arange(n, dtype=np.int64)
    )
    if len(comm) < n:  # isolated high-id nodes get singleton communities
        comm = np.concatenate([comm, np.arange(len(comm), n)])
    pos = _fr_layout(n, a, b, w, seed=seed)

    pad, r = 30, 9
    scale = size - 2 * pad
    xy = pad + pos * scale
    comm_ids = {c: i for i, c in enumerate(sorted(set(comm.tolist())))}
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" height="{size}">',
        '<text x="12" y="20" font-family="sans-serif" font-size="14">'
        "Consensus similarity network</text>",
    ]
    wmin = float(w.min()) if len(w) else 0.0
    wspan = (float(w.max()) - wmin) or 1.0 if len(w) else 1.0
    for ai, bi, wi in zip(a, b, w):
        sw = 0.8 + 2.2 * (float(wi) - wmin) / wspan
        parts.append(
            f'<line x1="{xy[ai,0]:.1f}" y1="{xy[ai,1]:.1f}" '
            f'x2="{xy[bi,0]:.1f}" y2="{xy[bi,1]:.1f}" '
            f'stroke="#888888" stroke-width="{sw:.2f}"/>'
        )
    for i in range(n):
        color = _PALETTE[comm_ids[int(comm[i])] % len(_PALETTE)]
        parts.append(
            f'<circle cx="{xy[i,0]:.1f}" cy="{xy[i,1]:.1f}" r="{r}" '
            f'fill="{color}" stroke="#333333"/>'
        )
        parts.append(
            f'<text x="{xy[i,0]:.1f}" y="{xy[i,1] - r - 3:.1f}" '
            f'font-family="sans-serif" font-size="10" '
            f'text-anchor="middle">{_esc(str(names[i]))}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
