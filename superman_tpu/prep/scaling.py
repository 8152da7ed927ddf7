"""Sinkhorn scaling as an exact-preserving preconditioner.

Parity: scalesk + scaleMatrix (reference revised_perman/util.h:1445-1593)
and the result-correction step of scale_and_calculate
(revised_perman/main.cpp:1143-1150): the matrix is scaled as
B = diag(r) A diag(c); per(B) = per(A) * prod(r) * prod(c), so the driver
divides the computed permanent by prod(r)*prod(c).

The update rule matches the reference: each sweep recomputes c_j as
threshold / (sum_i a_ij * c_j * r_i) and then r_i likewise, iterating until
the mean scaled row/col sums are within 10 of the threshold (the
reference's hard-coded tolerance, revised_perman/util.h:1482).
"""

from __future__ import annotations

import dataclasses
import warnings

import numpy as np

from ..core.matrix import DenseMatrix


@dataclasses.dataclass
class ScaleCompanion:
    """Parity: ScaleCompanion{r_v, c_v} (revised_perman/flags.h:8-26)."""
    r_v: np.ndarray
    c_v: np.ndarray

    def log2_product(self) -> float:
        """log2 |prod(r) * prod(c)|; signs are tracked separately
        (Sinkhorn on a SIGNED matrix yields negative factors — the
        per(B) = per(A) prod(r) prod(c) identity still holds, but
        log2 of a negative factor is NaN; found by fuzzing)."""
        return float(np.sum(np.log2(np.abs(self.r_v)))
                     + np.sum(np.log2(np.abs(self.c_v))))

    def sign_product(self) -> float:
        neg = int((self.r_v < 0).sum()) + int((self.c_v < 0).sum())
        return -1.0 if neg % 2 else 1.0


def scalesk(a: np.ndarray, scaling_threshold: float,
            max_iters: int = 10000) -> ScaleCompanion:
    a = np.asarray(a, dtype=np.float64)
    n = a.shape[0]
    rv = np.ones(n)
    cv = np.ones(n)
    thr = float(scaling_threshold)
    has_col = (a != 0).any(axis=0)
    has_row = (a != 0).any(axis=1)
    for _ in range(max_iters):
        colsum = (a * rv[:, None]).sum(axis=0) * cv
        cv = np.where(has_col, thr / np.where(colsum != 0, colsum, 1.0), cv)
        rowsum = (a * cv[None, :]).sum(axis=1) * rv
        rv = np.where(has_row, thr / np.where(rowsum != 0, rowsum, 1.0), rv)
        scaled = a * rv[:, None] * cv[None, :]
        err = max(abs(thr - scaled.sum() / n), abs(thr - scaled.sum() / n))
        if err <= 10.0:
            return ScaleCompanion(rv, cv)
    warnings.warn("scalesk did not converge; using last iterate")
    return ScaleCompanion(rv, cv)


def scale_matrix(dense: DenseMatrix, sc: ScaleCompanion) -> DenseMatrix:
    a = dense.mat.astype(np.float64) * sc.r_v[:, None] * sc.c_v[None, :]
    return DenseMatrix(a, "double")


def unscale_permanent(permanent: float, sc: ScaleCompanion) -> float:
    """per(A) = per(diag(r) A diag(c)) / (prod r * prod c).

    Computed in log2 space: the direct product of 2n scale factors
    under/overflows double for large-magnitude matrices (found by
    fuzzing), zeroing the divisor.  The exponent is applied exactly with
    ldexp; only the fractional factor (in [1, 2)) is divided normally."""
    lp = float(sc.log2_product())
    e = int(np.floor(lp))
    frac = np.exp2(np.float64(lp - e))          # in [1, 2)
    with np.errstate(over="ignore"):
        return float(np.ldexp(np.float64(permanent)
                              * sc.sign_product() / frac, -e))
