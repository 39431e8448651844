"""Peptide-style fixtures (FIXTURES.md F2) — the reference's own domain.

Mirrors the shapes of the bundled datasets (h3n2sample's
``(isolate_name, clade, sequence)``, allunique's ``(peptides)``;
/root/reference/README.md:51-57, workspace/troyWspc.Rmd:31-39) with clades
planted as mutation families over the 20-letter amino-acid alphabet, so
clusterbreak-equivalent pipelines have known labels (the ARI-vs-clade
evaluation setup, troyWspc.Rmd:160-189).  Deterministic, no external data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

AA20 = "ARNDCQEGHILKMFPSTWYV"


def generate_isolates(
    n: int = 300, n_clades: int = 6, seq_len: int = 300, seed: int = 42,
    mutation_rate: float = 0.02,
) -> pa.Table:
    """(isolate_name, clade, sequence): each clade is a founder sequence plus
    per-isolate point mutations at ``mutation_rate``."""
    rng = np.random.Generator(np.random.PCG64(seed))
    founders = [
        rng.integers(0, 20, size=seq_len) for _ in range(n_clades)
    ]
    names, clades, seqs = [], [], []
    for i in range(n):
        c = int(rng.integers(0, n_clades))
        seq = founders[c].copy()
        n_mut = rng.binomial(seq_len, mutation_rate)
        pos = rng.choice(seq_len, size=n_mut, replace=False)
        seq[pos] = rng.integers(0, 20, size=n_mut)
        names.append(f"isolate_{i:05d}")
        clades.append(f"clade_{c}")
        seqs.append("".join(AA20[j] for j in seq))
    return pa.table(
        {
            "isolate_name": pa.array(names, pa.string()),
            "clade": pa.array(clades, pa.string()),
            "sequence": pa.array(seqs, pa.string()),
        }
    )


def generate_peptides(n: int = 2000, length: int = 12, seed: int = 7) -> pa.Table:
    """(peptides): distinct fixed-length peptides, allunique-shaped."""
    rng = np.random.Generator(np.random.PCG64(seed))
    seen: set[str] = set()
    while len(seen) < n:
        seq = "".join(AA20[j] for j in rng.integers(0, 20, size=length))
        seen.add(seq)
    return pa.table({"peptides": pa.array(sorted(seen), pa.string())})
