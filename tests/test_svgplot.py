"""SVG figure writers (functions/svgplot.py) — the reference's two plot
outputs (R/plotting.R:14-29, R/clusterbreak.R:379-399) re-expressed as
deterministic XML so they can be asserted without an image diff."""

import xml.etree.ElementTree as ET

import numpy as np
import pytest

from dynaalign_ray.functions.svgplot import (
    _hclust_leaf_order,
    consensus_graph_svg,
    similarity_heatmap_svg,
)

SVG = "{http://www.w3.org/2000/svg}"


def _counts(svg: str) -> dict:
    root = ET.fromstring(svg)
    return {
        "rect": len(root.findall(f"{SVG}rect")),
        "line": len(root.findall(f"{SVG}line")),
        "circle": len(root.findall(f"{SVG}circle")),
        "text": len(root.findall(f"{SVG}text")),
    }


class TestHeatmap:
    def test_structure_and_determinism(self):
        rng = np.random.default_rng(1)
        x = rng.random((6, 6))
        x = (x + x.T) / 2
        np.fill_diagonal(x, 1.0)
        svg = similarity_heatmap_svg(x, labels=[f"s{i}" for i in range(6)])
        assert _counts(svg)["rect"] == 36
        assert svg == similarity_heatmap_svg(x, labels=[f"s{i}" for i in range(6)])

    def test_cluster_reorders_identical_rows_adjacent(self):
        # two identical blocks far apart in input order must end adjacent
        base = np.eye(6)
        base[0, 5] = base[5, 0] = 0.99  # rows 0 and 5 nearly identical
        order = _hclust_leaf_order(base)
        where = {int(v): i for i, v in enumerate(order)}
        assert abs(where[0] - where[5]) == 1

    def test_nonsymmetric_gets_comment(self):
        x = np.array([[1.0, 0.2], [0.8, 1.0]])
        assert "not symmetric" in similarity_heatmap_svg(x)

    def test_rejects_nonsquare_and_oversize(self):
        with pytest.raises(ValueError, match="square"):
            similarity_heatmap_svg(np.zeros((2, 3)))
        with pytest.raises(ValueError, match="capped"):
            similarity_heatmap_svg(np.zeros((2000, 2000)))


class TestConsensusGraph:
    def _corpus(self):
        # two obvious families + one outlier, like a consensus table
        seqs = [
            "ACDEFGHIKLMNPQRS",
            "ACDEFGHIKLMNPQRT",
            "ACDEFGHIKLMNPQRV",
            "WYWYWYWYWYWYWYWY",
            "WYWYWYWYWYWYWYWW",
            "GGGGCCCCGGGGCCCC",
        ]
        return [f"c{i}" for i in range(len(seqs))], seqs

    def test_structure_and_determinism(self):
        names, seqs = self._corpus()
        svg = consensus_graph_svg(names, seqs, threshold_p=0.7)
        c = _counts(svg)
        assert c["circle"] == 6
        assert c["text"] == 7  # title + one label per node
        assert svg == consensus_graph_svg(names, seqs, threshold_p=0.7)

    def test_threshold_drops_edges(self):
        names, seqs = self._corpus()
        lo = _counts(consensus_graph_svg(names, seqs, threshold_p=0.2))["line"]
        hi = _counts(consensus_graph_svg(names, seqs, threshold_p=0.95))["line"]
        assert hi < lo

    def test_same_family_same_color(self):
        names, seqs = self._corpus()
        svg = consensus_graph_svg(names, seqs, threshold_p=0.8)
        root = ET.fromstring(svg)
        fills = [c.get("fill") for c in root.findall(f"{SVG}circle")]
        assert fills[0] == fills[1] == fills[2]  # the ACDEF... family
        assert fills[0] != fills[5]  # the GGGG outlier is another community

    def test_validation(self):
        with pytest.raises(ValueError, match="non-empty"):
            consensus_graph_svg([], [])
        with pytest.raises(ValueError, match="align"):
            consensus_graph_svg(["a"], ["x", "y"])
