"""Progressive MSA (stages/msa.py) — the full AlignSeqs->ConsensusSequence
analog (R/clusterbreak.R:313-318) that replaces the center-star
approximation for ragged clusters."""

import numpy as np
import pandas as pd
import pytest

from dynaalign_ray.stages.msa import (
    consensus_from_alignment,
    make_progressive_msa_consensus,
    progressive_msa,
    upgma_merge_order,
)


def _group(texts):
    return pd.DataFrame(
        {
            "doc_id": np.arange(1, len(texts) + 1, dtype=np.int64),
            "cluster_id": np.ones(len(texts), dtype=np.int64),
            "text": texts,
            "n_chars": [len(t) for t in texts],
        }
    )


class TestProgressiveMsa:
    def test_alignment_invariants(self):
        seqs = ["ACDEFGHIK", "ACDFGHIK", "ACDEFGHIR", "CDEFGHIK"]
        aligned = progressive_msa(seqs, matrix_name="IDENTITY")
        lens = {len(a) for a in aligned}
        assert len(lens) == 1  # all rows equal length
        for raw, row in zip(seqs, aligned):
            assert row.replace("-", "") == raw  # gaps only, order preserved

    def test_identical_sequences_no_gaps(self):
        aligned = progressive_msa(["ACDEF"] * 4, matrix_name="IDENTITY")
        assert aligned == ["ACDEF"] * 4

    def test_majority_insertion_representable(self):
        # 2 of 3 members carry an insertion the third lacks: full MSA keeps
        # it in the consensus — the exact case center-star cannot represent
        # when the center lacks the insertion
        seqs = ["AAAATTTT", "AAAACCGGTTTT", "AAAACCGGTTTT"]
        aligned = progressive_msa(seqs, matrix_name="IDENTITY")
        assert consensus_from_alignment(aligned) == "AAAACCGGTTTT"

    def test_majority_deletion_wins(self):
        seqs = ["ACDEFGHIK", "ACDFGHIK", "ACDFGHIK"]
        aligned = progressive_msa(seqs, matrix_name="IDENTITY")
        assert consensus_from_alignment(aligned) == "ACDFGHIK"

    def test_restores_undamaged_sequence(self):
        # one deletion + one substitution damage: majority restores original
        seqs = ["ACDEFGHIK", "ACDFGHIK", "ACDEFGHIR"]
        aligned = progressive_msa(seqs, matrix_name="IDENTITY")
        assert consensus_from_alignment(aligned) == "ACDEFGHIK"

    def test_deterministic(self):
        seqs = ["ACDEFGHIK", "ACDFGHIK", "ACDEFGHIR", "CDEFGHIK"]
        a = progressive_msa(seqs, matrix_name="BLOSUM62")
        b = progressive_msa(seqs, matrix_name="BLOSUM62")
        assert a == b

    def test_validation(self):
        with pytest.raises(ValueError, match="capped"):
            progressive_msa(["AA"] * 300)
        with pytest.raises(ValueError, match="invalid character"):
            progressive_msa(["ACD", "AC!"])
        assert progressive_msa([]) == []
        assert progressive_msa(["ACDEF"]) == ["ACDEF"]


class TestUpgma:
    def test_merges_closest_first(self):
        d = np.array(
            [
                [0.0, 0.1, 0.9, 0.9],
                [0.1, 0.0, 0.9, 0.9],
                [0.9, 0.9, 0.0, 0.2],
                [0.9, 0.9, 0.2, 0.0],
            ]
        )
        merges = upgma_merge_order(d)
        assert merges[0] == (0, 1)
        assert merges[1] == (2, 3)
        assert len(merges) == 3


class TestConsensusFn:
    def test_in_cluster_consensus(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from dynaalign_ray.stages.consensus import cluster_consensus

        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": pa.array(
                        ["AAAATTTT", "AAAACCGGTTTT", "AAAACCGGTTTT", "WWWWW"]
                    ),
                }
            )
        )
        clusters = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "cluster_id": pa.array([1, 1, 1, 4], pa.int64()),
                }
            )
        )
        out = cluster_consensus(
            clusters, docs, 2, consensus_fn=make_progressive_msa_consensus()
        ).take_all()
        rows = {r["cluster_id"]: r["consensus"] for r in out}
        assert rows == {1: "AAAACCGGTTTT"}  # insertion kept; singleton skipped
