"""Size gate + plan agreement for the exact embedding plans (VERDICT r3 #4).

- cosine_neardup_pairs: forced plan="striped" must produce the exact same
  pair set + cosines as plan="broadcast" (the embedding twin of the
  shingle-CSR plan-agreement test).
- plan="auto" resolves by dataset bytes against _EMB_BROADCAST_BYTE_LIMIT
  (forced-gate check via monkeypatched limit).
- brute_force_topk's distributed reduce returns the same table as a numpy
  brute-force oracle, including under cosine TIES at the k boundary.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from dynaalign_ray.functions import similarity_search as ss


def _emb_ds(n=300, dim=24, seed=11, dups=40):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    # plant near-dups: dup i copies vector i with tiny noise
    for i in range(dups):
        base[n - dups + i] = base[i] + rng.standard_normal(dim) * 1e-3
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(base), pa.list_(pa.float64())),
        }
    )
    return rd.from_arrow(tbl).repartition(6), base


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingGate:
    def test_striped_equals_broadcast(self):
        ds, _ = _emb_ds()
        thr = 0.9
        broadcast = {
            (r["a"], r["b"]): r["cosine"]
            for r in ss.cosine_neardup_pairs(ds, thr, plan="broadcast").take_all()
        }
        striped = {
            (r["a"], r["b"]): r["cosine"]
            for r in ss.cosine_neardup_pairs(ds, thr, plan="striped").take_all()
        }
        assert set(striped) == set(broadcast)
        assert len(broadcast) >= 40
        for k, v in broadcast.items():
            assert striped[k] == pytest.approx(v, abs=1e-12)

    def test_auto_switches_at_gate(self, monkeypatch):
        ds, _ = _emb_ds()
        assert ss._emb_plan(ds, "auto") == "broadcast"
        monkeypatch.setattr(ss, "_EMB_BROADCAST_BYTE_LIMIT", 1)
        assert ss._emb_plan(ds, "auto") == "striped"
        # and the forced-gate run still yields the right answer
        thr = 0.9
        got = {
            (r["a"], r["b"]) for r in ss.cosine_neardup_pairs(ds, thr).take_all()
        }
        want = {
            (r["a"], r["b"])
            for r in ss.cosine_neardup_pairs(ds, thr, plan="broadcast").take_all()
        }
        assert got == want

    def test_topk_distributed_reduce_matches_numpy(self):
        ds, base = _emb_ds(n=200, dim=16, seed=3, dups=10)
        q = base[:4]
        out = ss.brute_force_topk(ds, q, k=7).to_pandas()
        m = base / np.linalg.norm(base, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        sims = qn @ m.T
        for qi in range(4):
            rows = out[out.query_id == qi].sort_values("rank")
            order = np.lexsort((np.arange(len(m)), -sims[qi]))[:7]
            assert rows.vec_id.tolist() == order.tolist()
            np.testing.assert_allclose(
                rows.cosine.to_numpy(), sims[qi][order], rtol=0, atol=1e-12
            )

    def test_topk_tie_break_is_vec_id_asc(self):
        # 30 identical vectors -> every cosine ties at 1.0; the top-k must
        # be vec_ids 0..k-1 regardless of block layout
        n = 30
        vecs = np.tile(np.array([1.0, 2.0, 3.0]), (n, 1))
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(n)[::-1].copy(), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )
        ds = rd.from_arrow(tbl).repartition(5)
        out = ss.brute_force_topk(ds, vecs[:1], k=6).to_pandas()
        assert out.vec_id.tolist() == [0, 1, 2, 3, 4, 5]
        assert out["rank"].tolist() == [1, 2, 3, 4, 5, 6]
