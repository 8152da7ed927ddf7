"""Chunk-level dead-range pruning — the TPU-native SkipPer.

The reference's SkipPer jumps over subset indices where some x-row is
pinned at zero (algo.h:856-874), which diverges per GPU thread.  On TPU we
prune at CHUNK granularity before launching anything:

A row z is *constant* within every aligned chunk of 2**r indices iff it has
no nonzero among columns 0..r-1 (only those columns toggle inside a chunk).
A chunk is *dead* — every one of its 2**r terms is exactly zero — iff some
constant row has x_z(base) == 0.  x-values are half-integers (or exact
dyadics) so the zero test in float64 is exact.

Pruned chunks are simply dropped from the work list; the surviving chunks
all cost the same, so the static mesh split stays balanced (no dynamic
scheduler needed — contrast gpu_exact_dense.cu:862-888).
"""

from __future__ import annotations

import numpy as np

from ..core.matrix import DenseMatrix
from . import gray


def live_chunks(dense: DenseMatrix, flags, plan: "gray.RyserPlan" = None,
                max_chunks_log2: int = 21,
                sample: int = 1) -> np.ndarray:
    """Return the live chunk-id list for the (ordered) matrix.

    sample > 1: evaluate liveness on a 1/sample strided subset of chunk
    ids only — a cheap estimator of the live fraction used to decide
    whether the full prune is worth computing at all."""
    a = np.asarray(dense.mat, dtype=np.float64)
    n = a.shape[0]
    if n < 19:
        return None
    plan = plan or gray.make_plan(n, flags.lanes, flags.chunk_log2,
                                  sparse=True)
    r = plan.r
    C = plan.num_chunks

    nz = a != 0
    const_rows = np.nonzero(~nz[:, :r].any(axis=1))[0]
    if len(const_rows) == 0:
        return np.arange(C, dtype=np.int64)

    # x(base) for the constant rows, all chunks at once (exact in f64)
    ids = np.arange(0, C, sample, dtype=np.uint64)
    gray_l = ids ^ (ids >> np.uint64(1))
    x0 = gray.x0_f64(a)[const_rows]
    cols = a[const_rows, : n - 1]              # (nc, n-1)
    X = np.broadcast_to(x0, (len(ids), len(const_rows))).copy()
    for b in range(r - 1, n - 1):
        if not cols[:, b].any():
            continue
        if b == r - 1:
            bit = (ids & np.uint64(1)).astype(np.float64)
        else:
            bit = ((gray_l >> np.uint64(b - r)) & np.uint64(1)).astype(
                np.float64)
        X += bit[:, None] * cols[:, b]
    live = ~(X == 0).any(axis=1)
    return (np.nonzero(live)[0] * sample).astype(np.int64)
