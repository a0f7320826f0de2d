"""Embedding dimension diagnostics: brute cross-checks with the
same fixed-point-quantize → exact-integer-moment → one-double
contract, over the collected fixture corpus."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.operators.similarity import (
    DIM_CORR_TOP_K,
    DIM_Q_SCALE,
    embedding_dim_corr_topk,
    embedding_dim_stats,
)


def _quantized(spark, sf_dir):
    """[[q per dim] per vector] with round-half-up like the engines
    (java.lang.Math / DuckDB round away from zero on doubles)."""
    rows = load_table(spark, sf_dir, "embeddings").collect()
    out = []
    for r in rows:
        out.append(
            [
                int(
                    Decimal(float(x) * DIM_Q_SCALE).quantize(
                        0, rounding=ROUND_HALF_UP
                    )
                )
                for x in r.embedding
            ]
        )
    return out


def test_dim_stats_match_brute(spark, sf_dir):
    vecs = _quantized(spark, sf_dir)
    n = len(vecs)
    d = len(vecs[0])
    got = {r.dim: r for r in embedding_dim_stats(spark, sf_dir).collect()}
    assert sorted(got) == list(range(d))
    for dim in range(d):
        col = [v[dim] for v in vecs]
        sq, sqq = sum(col), sum(c * c for c in col)
        r = got[dim]
        assert r.n == n
        assert r.mean == round(sq / n / DIM_Q_SCALE, 6)
        assert r.std == round(
            math.sqrt((n * float(sqq) - float(sq) * float(sq)) / (n * n))
            / DIM_Q_SCALE,
            6,
        )
        assert r.min_val == round(min(col) / DIM_Q_SCALE, 6)
        assert r.max_val == round(max(col) / DIM_Q_SCALE, 6)
        assert r.zero_frac == round(sum(c == 0 for c in col) / n, 6)


def test_dim_corr_topk_matches_brute(spark, sf_dir):
    vecs = _quantized(spark, sf_dir)
    n = len(vecs)
    d = len(vecs[0])
    scored = []
    for i in range(d):
        for j in range(i + 1, d):
            xs = [v[i] for v in vecs]
            ys = [v[j] for v in vecs]
            sx, sy = sum(xs), sum(ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            sxx = sum(a * a for a in xs)
            syy = sum(b * b for b in ys)
            den = math.sqrt(
                (n * float(sxx) - float(sx) * float(sx))
                * (n * float(syy) - float(sy) * float(sy))
            )
            c = (
                (n * float(sxy) - float(sx) * float(sy)) / den
                if den > 0
                else None
            )
            scored.append((i, j, c))
    want = sorted(
        (
            (round(abs(c), 6), i, j, round(c, 6))
            for i, j, c in scored
            if c is not None
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:DIM_CORR_TOP_K]
    got = embedding_dim_corr_topk(spark, sf_dir).collect()
    assert [
        (r.abs_corr, r.dim_a, r.dim_b, r.dim_corr) for r in got
    ] == want
    assert all(r.n_vectors == n for r in got)


def test_pca_topvar_matches_numpy_and_trace(spark, sf_dir):
    """Independent eigensolver cross-check: rebuild the exact
    covariance from the same quantized coordinates with numpy,
    eigvalsh it (LAPACK — a different algorithm than the operator's
    fixed-sweep Jacobi), and compare the leading spectrum; plus the
    exact trace identity tr(C) = Σ per-dim variances."""
    import math

    import numpy as np

    from dbt_eamples_spark.catalog import load_table
    from dbt_eamples_spark.operators.similarity import (
        DIM_Q_SCALE,
        PCA_TOP_K,
        embedding_pca_topvar,
    )

    emb = load_table(spark, sf_dir, "embeddings").collect()
    q = np.array(
        [
            [math.floor(float(x) * DIM_Q_SCALE + 0.5) for x in r.embedding]
            for r in emb
        ],
        dtype=np.float64,
    )
    n, d = q.shape
    s = q.sum(axis=0)
    spq = q.T @ q
    cov = (n * spq - np.outer(s, s)) / (n * n * DIM_Q_SCALE**2)
    want = np.sort(np.linalg.eigvalsh(cov))[::-1]
    got = embedding_pca_topvar(spark, sf_dir).collect()
    assert len(got) == PCA_TOP_K
    for r in got:
        assert r.n_vectors == n
        assert abs(r.eigenvalue - want[r.component - 1]) < 1e-9
    # trace identity against the operator's own full spectrum basis
    assert abs(want.sum() - np.trace(cov)) < 1e-9
    # ratios are a prefix of a nondecreasing cumulative in (0, 1]
    cums = [r.cumulative_ratio for r in got]
    assert all(b >= a for a, b in zip(cums, cums[1:]))
    assert 0 < cums[-1] <= 1.0 + 1e-9
