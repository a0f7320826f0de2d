"""Deterministic CLUSTERED embedding fixture (VERDICT r5 #4).

The shipped recall numbers in RECALL.md are measured on the
near-uniform sf fixture — ANN's worst case (no cluster structure for
IVF cells / PQ codebooks / LSH buckets to exploit). RECALL.md argues
clustered production embeddings land far higher; this module makes
that claim MEASURABLE instead of asserted: a mixture-of-centroids
corpus with the same schema/row-count/dimensionality as
sf0.01/embeddings.parquet, generated from md5 bytes only (no RNG
state, no library-version dependence), so every run and every engine
sees bit-identical vectors.

Geometry: K centroids with iid Uniform[-1,1] coordinates are
near-orthogonal in 64-dim, members = centroid + NOISE_SCALE·noise.
With NOISE_SCALE=0.35 the expected in-cluster cosine is ~0.89 and
cross-cluster ~0.0 — separable clusters whose members are still
mutually distinguishable (realistic for sentence-embedding corpora),
not planted exact duplicates.
"""

from __future__ import annotations

import hashlib
import os
import struct

N_VECS = 500
N_CLUSTERS = 10
DIM = 64
NOISE_SCALE = 0.35


def _u(tag: str) -> float:
    """md5(tag) -> Uniform[-1, 1), 6 dp (engine-exact literal)."""
    h = hashlib.md5(tag.encode()).digest()
    (x,) = struct.unpack(">I", h[:4])
    return round(x / 2**31 - 1.0, 6)


def clustered_vectors() -> list[tuple[int, list[float], int]]:
    """(vec_id, embedding, label) rows; label = cluster id."""
    cents = [
        [_u(f"cent:{c}:{d}") for d in range(DIM)]
        for c in range(N_CLUSTERS)
    ]
    rows = []
    for i in range(N_VECS):
        c = i % N_CLUSTERS
        vec = [
            round(
                cents[c][d] + NOISE_SCALE * _u(f"noise:{i}:{d}"), 6
            )
            for d in range(DIM)
        ]
        rows.append((i, vec, c))
    return rows


def write_clustered(sf_dir: str) -> str:
    """Write embeddings.parquet (schema-identical to the testdata
    fixture: vec_id BIGINT, embedding FLOAT[], label INT) under
    ``sf_dir``; idempotent. Returns sf_dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(sf_dir, exist_ok=True)
    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(path):
        return sf_dir
    rows = clustered_vectors()
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return sf_dir


def write_clustered_10x(
    sf_dir: str, plant: int = 200, n_clusters: int = 100
) -> tuple[str, list[tuple[int, int]]]:
    """10× clustered corpus (VERDICT r6 #7): 10·N_VECS mixture
    vectors plus ``plant`` PLANTED near-dup twins — twin ``10·N+p``
    copies base ``p·(10·N//plant)`` with 0.01-scale noise (cosine
    ≈ 0.999, far above COSINE_NEAR_DUP), so dedup recall at scale is
    measured against known-true pairs instead of an O(N²) brute
    force. The mode count grows with the corpus (100 clusters vs the
    1× fixture's 10 — a 10× real corpus has more topics, not 10×
    fatter ones), which keeps the genuinely-near-dup pair fraction
    ~1%: a fixture where 10%+ of ALL pairs are true near-dups can't
    meaningfully bound candidate volume. Returns
    (sf_dir, planted_pairs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 10 * N_VECS
    cents = [
        [_u(f"cent:{c}:{d}") for d in range(DIM)]
        for c in range(n_clusters)
    ]
    rows = []
    for i in range(n):
        c = i % n_clusters
        vec = [
            round(cents[c][d] + NOISE_SCALE * _u(f"n10:{i}:{d}"), 6)
            for d in range(DIM)
        ]
        rows.append((i, vec, c))
    planted = []
    stride = n // plant
    for p in range(plant):
        base = p * stride
        bvec = rows[base][1]
        tvec = [
            round(bvec[d] + 0.01 * _u(f"tw:{p}:{d}"), 6)
            for d in range(DIM)
        ]
        rows.append((n + p, tvec, rows[base][2]))
        planted.append((base, n + p))

    os.makedirs(sf_dir, exist_ok=True)
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        table = pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        )
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    return sf_dir, planted
