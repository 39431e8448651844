"""Feature-hashed trigram embeddings (functions/ngramlm.py:
hash_embedding_block)."""

import numpy as np
import pyarrow as pa

from dynaalign_ray.functions.ngramlm import hash_embedding_block


def _brute(texts, ids, dims):
    out = {}
    for d, t in zip(ids, texts):
        acc = {}
        for i in range(len(t) - 2):
            g = t[i : i + 3]
            pack = (ord(g[0]) << 42) | (ord(g[1]) << 21) | ord(g[2])
            dim = pack % dims
            sign = 1 if (pack // dims) % 2 == 0 else -1
            acc[dim] = acc.get(dim, 0) + sign
        for dim, v in acc.items():
            if v != 0:
                out[(d, dim)] = v
    return out


class TestHashEmbedding:
    def test_matches_brute_force(self):
        texts = ["the cat sat", "zzz", "", "ab", "ünïcødé ⚡ text"]
        ids = list(range(len(texts)))
        t = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        got = {}
        out = hash_embedding_block(t, dims=16).to_pydict()
        for d, dim, v in zip(out["doc_id"], out["dim"], out["val"]):
            got[(d, dim)] = v
        assert got == _brute(texts, ids, 16)

    def test_sign_cancellation_rows_dropped(self):
        # two trigrams landing on the same dim with opposite signs at
        # dims=1: dim = pack % 1 = 0 for all; signs from pack parity
        texts = ["abcd"]  # trigrams abc, bcd — parities may differ
        t = pa.table(
            {"doc_id": pa.array([7], pa.int64()), "text": pa.array(texts)}
        )
        out = hash_embedding_block(t, dims=1).to_pydict()
        want = _brute(texts, [7], 1)
        got = {
            (d, dim): v
            for d, dim, v in zip(out["doc_id"], out["dim"], out["val"])
        }
        assert got == want  # exact including full-cancellation drops

    def test_batch_split_invariant(self):
        rng = np.random.default_rng(9)
        texts = [
            "".join(chr(int(c)) for c in rng.integers(97, 123, 40))
            for _ in range(31)
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(31), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        whole = hash_embedding_block(t, dims=64).to_pydict()
        w = {
            (d, dim): v
            for d, dim, v in zip(whole["doc_id"], whole["dim"], whole["val"])
        }
        parts = {}
        for lo in range(0, 31, 8):
            p = hash_embedding_block(t.slice(lo, 8), dims=64).to_pydict()
            for d, dim, v in zip(p["doc_id"], p["dim"], p["val"]):
                parts[(d, dim)] = v
        assert parts == w
