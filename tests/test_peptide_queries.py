"""queries() entries for the peptide-payload operators (VERDICT r3 #3/#8):
every SURVEY §2 sequence operator now has a driver-checkable entry, and
clusterbreak recovers planted clades at reference-grade ARI."""

import numpy as np
import pytest

from dynaalign_ray.pipelines import peptide as pep


def _ari(labels_a: list, labels_b: list) -> float:
    """Adjusted Rand Index, direct from the pair-counting contingency
    formula (no sklearn in the container)."""
    from collections import Counter

    n = len(labels_a)
    assert n == len(labels_b)
    ab = Counter(zip(labels_a, labels_b))
    a_ct = Counter(labels_a)
    b_ct = Counter(labels_b)
    comb = lambda x: x * (x - 1) // 2
    sum_ab = sum(comb(c) for c in ab.values())
    sum_a = sum(comb(c) for c in a_ct.values())
    sum_b = sum(comb(c) for c in b_ct.values())
    total = comb(n)
    expected = sum_a * sum_b / total if total else 0.0
    max_idx = (sum_a + sum_b) / 2.0
    if max_idx == expected:
        return 1.0
    return (sum_ab - expected) / (max_idx - expected)


@pytest.mark.usefixtures("ray_session")
class TestPeptideQueries:
    def test_nw_rescore_rows(self):
        t = pep.peptide_nw_rescore("unused").to_pandas()
        assert len(t) > 0
        assert set(t.columns) == {"a", "b", "nw_similarity"}
        assert ((t.nw_similarity >= 0.0) & (t.nw_similarity <= 1.0)).all()
        assert (t.a < t.b).all()
        # same-clade candidates align well under BLOSUM62 NW
        assert t.nw_similarity.max() > 0.8
        # deterministic: second run is row-identical
        t2 = pep.peptide_nw_rescore("unused").to_pandas()
        pa_sort = lambda d: d.sort_values(["a", "b"]).reset_index(drop=True)
        assert pa_sort(t).equals(pa_sort(t2))

    def test_clusterbreak_labels_and_coverage(self):
        t = pep.peptide_clusterbreak("unused").to_pandas()
        # every isolate appears exactly once (emitted or filtered)
        assert sorted(t.doc_id) == list(range(1, pep._N_ISOLATES + 1))
        emitted = t[t.cluster_label != "filtered"]
        assert len(emitted) > 0
        # reference label shape "<round>.<cid>" (R/clusterbreak.R:234)
        assert emitted.cluster_label.str.match(r"^\d+\.\d+$").all()
        # size controller honored: every emitted cluster within bounds
        sizes = emitted.groupby("cluster_id").size()
        assert (sizes >= 2).all() and (sizes <= 40).all()

    def test_clusterbreak_ari_vs_planted_clades(self):
        # the workspace evaluation shape (troyWspc.Rmd:160-189): cluster
        # assignment vs known clade labels, ARI >= 0.9
        from dynaalign_ray.fixtures_peptide import generate_isolates

        iso = generate_isolates(
            n=pep._N_ISOLATES,
            n_clades=pep._N_CLADES,
            seq_len=pep._SEQ_LEN,
            seed=pep._SEED,
        )
        clades = iso.column("clade").to_pylist()
        t = pep.peptide_clusterbreak("unused").to_pandas()
        by_doc = dict(zip(t.doc_id, t.cluster_label))
        got = [by_doc[i + 1] for i in range(len(clades))]
        score = _ari(got, clades)
        assert score >= 0.9, score

    def test_consensus_rows(self):
        t = pep.peptide_consensus("unused").to_pandas()
        assert len(t) > 0
        assert set(t.columns) == {
            "cluster_id",
            "consensus",
            "representative_doc",
            "n_members",
        }
        assert (t.n_members >= 2).all()
        # consensus strings stay on the 20-letter AA alphabet
        from dynaalign_ray.fixtures_peptide import AA20

        assert all(set(c) <= set(AA20) for c in t.consensus)
        # consensus of a mutation family should be close to founder length
        assert (t.consensus.str.len() >= pep._SEQ_LEN * 0.9).all()

    def test_louvain_rows(self):
        t = pep.peptide_louvain("unused").to_pandas()
        assert sorted(t.doc_id) == list(range(1, pep._N_ISOLATES + 1))
        # labels are permutation-invariant min-ids: every cluster_id is a
        # member of its own cluster
        for cid, grp in t.groupby("cluster_id"):
            assert cid == grp.doc_id.min()

    def test_entries_registered(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as e

        qs = e.queries()
        for name in (
            "peptide_nw_rescore",
            "peptide_clusterbreak",
            "peptide_consensus",
            "peptide_louvain",
        ):
            assert name in qs
