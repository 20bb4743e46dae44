"""PCA dimensionality reduction for embedding columns.

No reference analog (the reference stores vectors as-is); in a 100 TB
training-data pipeline PCA is the standard pre-indexing step — project
768-d embeddings to 64-128 dims before IVF/PQ build and the whole index
(and every scan over it) shrinks proportionally.

Scale shape: training needs exactly ONE distributed pass. Each partition
accumulates (count, component sums, Gram matrix X^T X) across its Arrow
batches and emits a single O(d^2) row — map-side combine at its most
extreme: the shuffle is O(partitions * d^2) regardless of corpus size.
The driver folds the partials into the covariance (O(d^2) memory, fine to
d of several thousand) and runs the eigendecomposition there — an O(d^3)
dense problem that no cluster helps with. Projection is a distributed
mapInArrow matmul.

Determinism: eigenvectors are sign-ambiguous, so each component is flipped
to make its largest-|.|-magnitude coordinate positive (first occurrence on
ties) — models trained twice on the same data are bit-identical.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moment_scanner(vec_col: str):
    """Per-PARTITION accumulation of (n, sum, Gram): one emitted row per
    partition, not per batch — the d^2 payload amortizes across the whole
    partition's rows."""

    def scan(batches):
        from ..functions import arrowkit as AK

        n = 0
        s = None
        G = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            V = AK.list_matrix(rb, vec_col)
            n += V.shape[0]
            if s is None:
                s = V.sum(axis=0)
                G = V.T @ V
            else:
                s += V.sum(axis=0)
                G += V.T @ V
        if n:
            yield AK.batch(n=[n], s=[s.tolist()], g=[G.reshape(-1).tolist()])

    return scan


def moments(df: DataFrame, vec_col: str = "vector") -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum_vector (d,), gram_matrix (d, d)) from one distributed pass."""
    rows = (
        df.select(vec_col)
        .mapInArrow(
            _moment_scanner(vec_col), schema="n long, s array<double>, g array<double>"
        )
        .collect()
    )
    if not rows:
        raise ValueError("cannot compute moments of an empty corpus")
    n = sum(r["n"] for r in rows)
    s = np.sum([r["s"] for r in rows], axis=0)
    d = len(s)
    G = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    return n, s, G


def covariance(df: DataFrame, vec_col: str = "vector") -> tuple[np.ndarray, np.ndarray, int]:
    """(mean (d,), sample covariance (d, d), n). The arithmetic order
    (G_ij - n * (mean_i * mean_j)) / (n - 1) is the contract the SQL oracle
    replicates — keep them in lockstep."""
    n, s, G = moments(df, vec_col)
    if n < 2:
        raise ValueError(f"covariance needs >= 2 rows, got {n}")
    mean = s / n
    C = (G - n * np.outer(mean, mean)) / (n - 1)
    return mean, C, n


@dataclass
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d), orthonormal rows, variance-descending
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    n_samples: int

    def project_matrix(self, V: np.ndarray) -> np.ndarray:
        return (np.asarray(V, dtype=np.float64) - self.mean) @ self.components.T


def train_pca(
    df: DataFrame, n_components: int, vec_col: str = "vector"
) -> PCAModel:
    """Fit PCA: distributed moments -> driver covariance + eigh -> top
    ``n_components`` by eigenvalue, deterministically signed."""
    mean, C, n = covariance(df, vec_col)
    d = C.shape[0]
    if not 1 <= n_components <= d:
        raise ValueError(f"n_components must be in [1, {d}], got {n_components}")
    w, v = np.linalg.eigh(C)  # ascending eigenvalues, orthonormal columns
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T  # (k, d)
    # sign convention: largest-|.| coordinate positive (argmax = first max)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=np.ascontiguousarray(comps),
        explained_variance=w[order].copy(),
        n_samples=n,
    )


def transform(
    df: DataFrame,
    model: PCAModel,
    id_col: str = "id",
    vec_col: str = "vector",
    out_col: str = "pca",
) -> DataFrame:
    """Distributed projection: {id, vector} -> {id, pca array<double>} via
    one centered matmul per Arrow batch."""
    mean = np.ascontiguousarray(model.mean)
    W = np.ascontiguousarray(model.components)
    k = W.shape[0]

    def proj(batches):
        import pyarrow as pa

        from ..functions import arrowkit as AK

        for rb in batches:
            if rb.num_rows == 0:
                continue
            V = AK.list_matrix(rb, vec_col)
            P = (V - mean) @ W.T
            offsets = np.arange(len(P) + 1, dtype=np.int32) * k
            yield AK.batch(
                **{
                    id_col: pa.array(AK.column(rb, id_col, np.int64), pa.int64()),
                    out_col: pa.ListArray.from_arrays(
                        pa.array(offsets), pa.array(P.reshape(-1))
                    ),
                }
            )

    return df.select(id_col, vec_col).mapInArrow(
        proj, schema=f"{id_col} long, {out_col} array<double>"
    )
