"""PCA over the distributed covariance matrix.

The covariance computation is the distributed part (``q_embedding_covariance``:
map-side outer products → a dim²-wide partial agg — corpus-size-independent
shuffle). The eigendecomposition runs driver-side on the d×d result, which
is the correct split at any scale: for d = 64 the matrix is 32 KB; even
d = 4096 is 128 MB — never worth a distributed eigensolver for covariance
matrices of embedding columns. (The reference archiver has no numeric
surface; this extends SURVEY.md §2.8's embedding-analytics inventory.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def covariance_to_matrix(cov_df: DataFrame) -> np.ndarray:
    """Collect an upper-triangular (i, j, cov) frame (1-based dims) into
    the full symmetric d×d numpy matrix. The collect is d(d+1)/2 rows —
    bounded by dimensionality, not data size."""
    rows = cov_df.select("i", "j", "cov").collect()
    d = max(r.j for r in rows)
    m = np.zeros((d, d))
    for r in rows:
        m[r.i - 1, r.j - 1] = r.cov
        m[r.j - 1, r.i - 1] = r.cov
    return m


def pca_from_covariance(cov_df: DataFrame, k: int | None = None):
    """Principal components from the covariance frame: returns
    (eigenvalues desc, eigenvectors column-wise, explained_variance_ratio),
    truncated to the top ``k`` components. Deterministic sign convention:
    each eigenvector's largest-magnitude coordinate is made positive
    (numpy eigh sign is otherwise arbitrary, which would break
    reproducible whitening across runs)."""
    m = covariance_to_matrix(cov_df)
    vals, vecs = np.linalg.eigh(m)  # ascending
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    for c in range(vecs.shape[1]):
        pivot = np.argmax(np.abs(vecs[:, c]))
        if vecs[pivot, c] < 0:
            vecs[:, c] = -vecs[:, c]
    if k is not None:
        vals, vecs = vals[:k], vecs[:, :k]
    total = float(np.trace(m))
    ratio = vals / total if total else np.zeros_like(vals)
    return vals, vecs, ratio
