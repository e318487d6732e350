"""RP-LSH recall-vs-candidate-rate curve (BASELINE.md evidence, r6).

The engine's random-hyperplane LSH (operators/ann.py) fixes 24 md5-seeded
+-1 planes banded 6x4. This sweep measures, on the real testdata
embeddings, how recall@10 and candidate rate move across BAND LAYOUTS of
the same 24-plane family (and optional hamming-1 multiprobe) — the knob a
deployment turns at scale. Computation is exact driver-side numpy over the
collected embedding matrix (5k x 64 at sf0.1 — this is a measurement tool,
not the serving path; the serving path is the banded broadcast probe).

Usage: python tools/rp_recall_sweep.py  -> markdown rows on stdout.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_PLANES, DIM, SCALE = 24, 64, 1_000_000
QUERIES = list(range(8))
K = 10

# (n_bands, bits_per_band) layouts of the same 24 planes, + multiprobe flag
LAYOUTS = [
    (3, 8, False),
    (4, 6, False),
    (6, 4, False),   # the shipped default
    (8, 3, False),
    (12, 2, False),
    (6, 4, True),    # default + hamming-1 multiprobe
    (4, 6, True),
]


def main() -> None:
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e"
        f" FROM read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    n = len(ids)

    signs = np.array(
        [
            [
                1
                if int(hashlib.md5(f"rp|{p}|{i}".encode()).hexdigest()[:15], 16) % 2
                == 0
                else -1
                for i in range(1, DIM + 1)
            ]
            for p in range(N_PLANES)
        ],
        dtype=np.int64,
    )
    q = np.floor(mat * SCALE + 0.5).astype(np.int64)
    bits = (q @ signs.T >= 0).astype(np.int64)  # n x 24

    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T

    print("| layout | multiprobe | candidate rate | recall@10 |")
    print("|---|---|---|---|")
    for n_bands, n_bits, multi in LAYOUTS:
        weights = 1 << np.arange(n_bits, dtype=np.int64)
        keys = bits[:, : n_bands * n_bits].reshape(n, n_bands, n_bits) @ weights
        rates, recalls = [], []
        for qi in QUERIES:
            probe = [set(keys[qi][b : b + 1]) for b in range(n_bands)]
            if multi:
                for b in range(n_bands):
                    for fl in range(n_bits):
                        probe[b].add(int(keys[qi][b]) ^ (1 << fl))
            cand = np.zeros(n, dtype=bool)
            for b in range(n_bands):
                cand |= np.isin(keys[:, b], list(probe[b]))
            cand[qi] = False
            rates.append(cand.sum() / (n - 1))
            s = sims[qi].copy()
            s[qi] = -np.inf
            exact = set(ids[np.argsort(-s, kind="stable")[:K]].tolist())
            cs = np.where(cand, s, -np.inf)
            got = set(ids[np.argsort(-cs, kind="stable")[:K]][cs[np.argsort(-cs, kind="stable")[:K]] > -np.inf].tolist())
            recalls.append(len(exact & got) / K)
        tag = f"{n_bands}x{n_bits}b"
        print(
            f"| {tag} | {'h1' if multi else '—'} |"
            f" {np.mean(rates):.3f} | {np.mean(recalls):.2f} |"
        )


if __name__ == "__main__":
    main()
