"""Recursive exact-compression driver.

Parity: compress_and_calculate_recursive + compress_singleton_and_then_
recurse (reference revised_perman/main.cpp:994-1094): strip degree-1/2
lines to a fixed point, then while the minimum degree is < 5 and the matrix
is larger than the compression floor, apply d1/d2 (recurse on one matrix)
or d34 (recurse on TWO matrices and sum).  At the floor, dispatch to the
scaling driver or the engine.
"""

from __future__ import annotations

import numpy as np

from ..core.matrix import DenseMatrix
from ..core.result import Result
from ..prep import compression as C

# the reference stops compressing below 31 rows (main.cpp:1007)
COMPRESSION_FLOOR = 30


def _as_dm(a: np.ndarray, type_name: str) -> DenseMatrix:
    return DenseMatrix(a, type_name)


def compress_and_calculate_recursive(dense: DenseMatrix, flags) -> Result:
    a = dense.mat
    min_deg = C.min_degree(a) if a.size else 0
    if min_deg < 5 and a.shape[0] > COMPRESSION_FLOOR:
        if min_deg == 0:
            return Result(0.0, 0.0, algo_name="compressed_zero")
        if min_deg == 1:
            out = C.d1compress(a)
            return compress_and_calculate_recursive(
                _as_dm(out, dense.type), flags)
        if min_deg == 2:
            out = C.d2compress(a)
            return compress_and_calculate_recursive(
                _as_dm(out, dense.type), flags)
        pair = C.d34compress(a, min_deg)
        if pair is not None:
            m1, m2 = pair
            return (compress_and_calculate_recursive(_as_dm(m1, dense.type),
                                                     flags) +
                    compress_and_calculate_recursive(_as_dm(m2, dense.type),
                                                     flags))

    if flags.scaling_threshold != -1.0:
        from .scale_driver import scale_and_calculate
        return scale_and_calculate(dense, flags, compressing=True)
    if _magnitude_imbalanced(dense.mat) and (dense.mat >= 0).all() \
            and flags.resolved_calc() not in ("f32", "f32k"):
        # (nonneg only: Sinkhorn preconditioning cannot fix signed
        # cancellation, and its sums may hit zero/negative mid-iteration.
        # double-class calcs only: scaling to unit row/col sums makes
        # per(B) astronomically small for huge-entry matrices, below the
        # f32-class tiers' resolution — the exact unscale then amplifies
        # pure noise, up to +-inf; found by fuzzing)
        # d2 merges concentrate magnitude; the resulting within-line
        # spread makes the Ryser sum cancellation-bound beyond ANY
        # double-class arithmetic (found by fuzzing: exact 2.8e-194
        # evaluated as 1.5e-179 by every f64 walk).  Sinkhorn
        # preconditioning restores conditioning exactly — the reference's
        # -o without -u silently returns garbage on such inputs.
        import dataclasses
        from .scale_driver import scale_and_calculate
        from ..utils import trace
        # adaptive threshold: per(B(t)) = t^n * per(B(1)) exactly (the
        # Sinkhorn point is unique up to the scalar), so pick t to land
        # the scaled permanent near 2^-12 — threshold 1.0 can push it to
        # e.g. 2^-392 for huge-entry matrices, beyond ANY walk tier's
        # cancellation resolution (found by fuzzing: +-inf after the
        # exact unscale amplified pure noise)
        thr = _auto_threshold(dense.mat)
        trace.log("compressed matrix is magnitude-imbalanced; "
                  f"auto-applying Sinkhorn (threshold {thr:.3g})", level=1)
        return scale_and_calculate(
            dense, dataclasses.replace(flags, scaling_threshold=thr),
            compressing=True)
    from .runner import run_algo
    return run_algo(dense, flags)


def _magnitude_imbalanced(a: np.ndarray, ratio: float = 1e8) -> bool:
    """True when some row or column spans more than `ratio` in magnitude
    across its nonzeros (Ryser conditioning proxy)."""
    ab = np.abs(np.asarray(a, dtype=np.float64))
    for m in (ab, ab.T):
        for row in m:
            nz = row[row != 0]
            if len(nz) and nz.max() > ratio * nz.min():
                return True
    return False


def compress_singleton_and_then_recurse(dense: DenseMatrix, flags) -> Result:
    """d1/d2 to a fixed point first (cheap, always wins), then recurse."""
    a = dense.mat
    changed = True
    folds = 0
    while changed and a.shape[0] > 1:
        changed = False
        out = C.d1compress(a)
        if out is None:
            out = C.d2compress(a)
        if out is not None:
            a = out
            changed = True
            folds += 1
            if a.size and C.has_empty_line(a):
                return Result(0.0, 0.0, algo_name="rank_deficient_zero")
    res = compress_and_calculate_recursive(_as_dm(a, dense.type), flags)
    # Honest labeling: a calc="auto" err_est inside this pipeline covers
    # the FOLDED-CORE WALK only — the d2/d34 merges above round entries
    # in f64, an input perturbation the walk bound cannot see (measured:
    # will57 raw config, walk est 2.5e-15 vs pipeline 1.75e-6 against
    # the certified exact value; the suite tolerance 1e-5 is the
    # pipeline contract, the certify-or-replace net in
    # runner._compression_sanity is the catastrophic backstop).
    if folds and res.meta.get("auto") is not None:
        res.meta["auto"]["bound_scope"] = "folded_core_walk_only"
        res.meta["auto"]["folds"] = folds
    return res


def _auto_threshold(a: np.ndarray) -> float:
    """Sinkhorn threshold that centers the scaled permanent near 2^-12.

    log2 per(B(1)) ~ est(log2 per(A)) + log2 prod(r)prod(c) at threshold
    1; per(B(t)) = t^n per(B(1)), so t = 2^((target - that)/n).  The
    probe is crude (a few greedy trials) — a miss costs only the
    engine's underflow-retry, as before.
    """
    from ..ops.ryser import _log2_perm_estimate
    from ..prep.scaling import scalesk

    n = a.shape[0]
    est = _log2_perm_estimate(a)
    if est is None or not np.isfinite(est):
        return 1.0
    lp1 = scalesk(np.asarray(a, dtype=np.float64), 1.0).log2_product()
    if not np.isfinite(lp1):
        return 1.0
    shift = (-12.0 - (est + lp1)) / max(1, n)
    return float(2.0 ** np.clip(shift, -40.0, 40.0))
