"""Matrix orderings that accelerate the sparse exact walk.

Parity: matrix2compressed_sortOrder / _skipOrder (reference
util.h:553-684).  Row/column permutations leave the permanent unchanged;
they reshape WHERE zeros fall along the Gray walk, which is what both the
reference's SkipPer skip-ahead and our chunk-level pruning (ops/pruning.py)
exploit.

Note on orientation: the reference's orderings place low-degree columns at
LOW indices (toggled most often, so x-updates are cheap in SpaRyser, and
zero rows skip far).  For chunk pruning the same orientation is right: a
chunk is prunable via rows with no support in the low column range.
"""

from __future__ import annotations

import numpy as np

from ..core.matrix import DenseMatrix


def sort_order(a: np.ndarray) -> np.ndarray:
    """Column permutation: ascending column degree (stable).
    Reference util.h:553-570 (qsort by nnz)."""
    degs = (a != 0).sum(axis=0)
    return np.argsort(degs, kind="stable")


def skip_order(a: np.ndarray):
    """Greedy min-degree column order with first-seen row order.

    Reference util.h:621-668: repeatedly pick the unpicked column of minimum
    *residual* degree (degree among rows not yet seen); rows are ordered by
    first appearance in the chosen columns' supports.
    """
    n = a.shape[0]
    nz = a != 0
    degs = nz.sum(axis=0).astype(np.int64)
    INF = 1 << 30
    col_perm = np.empty(n, dtype=np.int64)
    row_perm = []
    row_seen = np.zeros(n, dtype=bool)
    for j in range(n):
        c = int(np.argmin(degs))
        degs[c] = INF
        col_perm[j] = c
        for r in np.nonzero(nz[:, c])[0]:
            if not row_seen[r]:
                row_seen[r] = True
                row_perm.append(r)
                mask = nz[r] & (degs != INF)
                degs[mask] -= 1
    for r in range(n):           # rows never touched (all-zero rows)
        if not row_seen[r]:
            row_perm.append(r)
    return np.asarray(row_perm, dtype=np.int64), col_perm


def apply_preprocessing(dense: DenseMatrix, preprocessing: int) -> DenseMatrix:
    """0: none; 1: SortOrder; 2: SkipOrder (the -r flag)."""
    if preprocessing == 0:
        return dense
    a = dense.mat
    if preprocessing == 1:
        cp = sort_order(a)
        return DenseMatrix(np.ascontiguousarray(a[:, cp]), dense.type)
    if preprocessing == 2:
        rp, cp = skip_order(a)
        return DenseMatrix(np.ascontiguousarray(a[rp][:, cp]), dense.type)
    raise ValueError(f"unknown preprocessing {preprocessing}")
