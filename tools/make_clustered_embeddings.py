"""Seeded mixture-of-Gaussians embeddings fixture (VERDICT r9 next #4).

Every recall figure in BASELINE.md was measured on the driver's
synthetic testdata, whose embeddings are effectively ISOTROPIC — the
documented worst case for any locality structure (IVF cells, PQ
codebooks, RP bands all see near-uniform angular spread, so recall ~
candidate rate). Real text/image embeddings are CLUSTERED (they live
near a low-dimensional union of cones), which is the regime the ANN
design targets. This tool materializes that regime deterministically:

    k_centers unit-ish Gaussian centers, points = center + sigma*noise

written as ``embeddings.parquet`` with the exact testdata schema
(vec_id bigint, embedding float[], label int = the true center id), so
every existing sweep (tools/recall_sweep.py, tools/rp_recall_sweep.py)
runs on it unchanged via its sf_dir argument / SPARK_GRAFT_SF_DIR.

Usage: python tools/make_clustered_embeddings.py [out_dir] [n] [k] [sigma]
       defaults: /tmp/clustered_emb 2000 20 0.25
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64


def make(out_dir: str, n: int = 2000, k_centers: int = 20, sigma: float = 0.25) -> str:
    rng = np.random.RandomState(42)  # seeded: same fixture every run
    centers = rng.randn(k_centers, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n) % k_centers  # balanced assignment, deterministic
    pts = centers[labels] + sigma * rng.randn(n, DIM)

    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32) for row in pts],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    path = os.path.join(out_dir, "embeddings.parquet")
    pq.write_table(tbl, path)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clustered_emb"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    sigma = float(sys.argv[4]) if len(sys.argv) > 4 else 0.25
    print(make(out, n, k, sigma))
