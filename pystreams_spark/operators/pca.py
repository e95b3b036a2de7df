"""Distributed PCA / whitening over an embedding column — the standard
preprocessing step in front of ANN indexing and semantic dedup (e.g.
OPQ/PCA rotation before product quantization, Jégou et al.; whitening
before cosine retrieval).

Scale shape: the only corpus-wide work is accumulating the second-moment
(Gram) matrix — a NARROW one-pass kernel that reduces each partition to
a single (count, sum, d×d Gram) row. For d=64 that is ~33 KB per
partition; the driver sums the |partitions| rows and runs a d×d
``eigh`` (microseconds — the eigenproblem is dimension-sized, not
corpus-sized). Projection back onto the corpus is one broadcast matmul
kernel, no shuffle anywhere. This is exact PCA (not sampled): the Gram
accumulation is associative, so the result is partitioning-independent
up to float summation order.

Determinism: eigenvector SIGN is fixed by convention (largest-|coord|
component made positive) so repeated fits — and the numpy reference in
the differential test — agree exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PCAModel", "fit_pca", "pca_project"]


@dataclass
class PCAModel:
    mean: "object"            # (d,) float64
    components: "object"      # (k, d) float64, rows = principal axes
    eigenvalues: "object"     # (k,) float64, descending
    total_variance: float     # trace of the covariance (all d eigenvalues)
    n_rows: int


def _moments(df: DataFrame, vec_col: str):
    """One narrow pass: per-partition (n, Σx, ΣxxT) rows, summed on the
    driver (|partitions| rows × ~d² doubles; at 10k partitions and d=64
    that is ~330 MB of *driver arithmetic*, still fine — for d ≥ 512
    insert a coalesce(√P) tree level first)."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        n, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += len(m)
            s = m.sum(axis=0) if s is None else s + m.sum(axis=0)
            gg = m.T @ m
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    rows = df.select(F.col(vec_col).alias(vec_col)).mapInPandas(
        kernel, "n long, s array<double>, g array<double>"
    ).collect()
    if not rows:
        raise ValueError("fit_pca: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
    d = len(s)
    return n, s, g.reshape(d, d)


def fit_pca(df: DataFrame, k: int, vec_col: str = "embedding") -> PCAModel:
    """Exact distributed PCA: top-k principal axes of the covariance of
    ``vec_col``. One narrow corpus pass (see module docstring)."""
    import numpy as np

    n, s, g = _moments(df, vec_col)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    evals = np.maximum(evals[order], 0.0)       # clamp fp-negative tail
    comps = evecs[:, order].T                   # (k, d)
    # sign convention: largest-|coord| of each axis is positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=comps,
        eigenvalues=evals,
        total_variance=float(np.trace(cov)),
        n_rows=int(n),
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Project ``vec_col`` onto the model's axes (optionally whitened:
    unit variance per component). Broadcast matmul kernel — narrow, no
    shuffle; output replaces nothing (adds ``out_col``)."""
    import numpy as np
    import pandas as pd

    if out_col in df.columns:
        raise ValueError(
            f"pca_project: output column {out_col!r} already exists on the "
            "input — drop or rename it first (the op adds, never replaces)"
        )
    comps = model.components
    scale = 1.0 / np.sqrt(model.eigenvalues + eps) if whiten else None
    bc = df.sparkSession.sparkContext.broadcast((model.mean, comps, scale))
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def kernel(batches):
        mean, c, sc = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            p = (m - mean) @ c.T
            if sc is not None:
                p = p * sc
            out = pdf.copy()
            out[out_col] = list(p)
            yield out

    return df.mapInPandas(kernel, f"{fields}, `{out_col}` array<double>")
