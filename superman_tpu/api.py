"""Top-level Python API.

``permanent(matrix_or_path, **flag_overrides)`` is the single entry point:
it mirrors the reference's L4 orchestration (RunAlgo + scaling/compression
drivers, revised_perman/main.cpp:98-1264) behind one call.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import numpy as np

from .core.flags import Flags
from .core.result import Result
from .core.matrix import DenseMatrix


def _as_dense(m, flags: Flags) -> DenseMatrix:
    if m is None:
        if not flags.grid_graph:
            raise ValueError("matrix is required unless grid_graph=True")
        from .prep.gridgraph import grid_graph_matrix
        dm = grid_graph_matrix(flags.gridm, flags.gridn)
        flags.type = dm.type
        return dm
    from .core.matrix import SparseMatrix
    if isinstance(m, SparseMatrix):
        # keep the storage class (same dtype rules as the ndarray path
        # below): densifying as "double" would silently disable the
        # exact-f32/tf96 tiers for integer-valued sparse inputs
        vals = np.asarray(m.cvals)
        if np.issubdtype(vals.dtype, np.integer):
            tname = "int"
        elif vals.dtype == np.float32:
            tname = "float"
        else:
            tname = "double"
        m = m.to_dense(tname)
    if isinstance(m, DenseMatrix):
        dm = m
    elif isinstance(m, str):
        from .io.matrixmarket import read_any
        dm = read_any(m, flags.binary_graph, flags.storage_half_precision,
                      flags.storage_quad_precision)
        flags.filename = m
    else:
        a = np.asarray(m)
        if a.ndim != 2 or a.shape[0] != a.shape[1]:
            raise ValueError("matrix must be square")
        if np.issubdtype(a.dtype, np.integer):
            tname = "int"
        elif a.dtype == np.float32:
            tname = "float"
        else:
            tname = "double"
        dm = DenseMatrix(a, tname)
    if flags.binary_graph:
        dm = dm.binarized()
    flags.type = dm.type
    return dm


def permanent(matrix: Union[np.ndarray, DenseMatrix, str, None] = None,
              **overrides) -> Result:
    """Compute the permanent of a square matrix.

    matrix: array-like, DenseMatrix, a path (triplet / MatrixMarket), or
    None with grid_graph=True (count perfect matchings of a
    gridm x gridn grid, reference RunPermanForGridGraphs).
    overrides: any `Flags` field, e.g. sparse=True, approximation=True,
    calc="f32", preprocessing=2, compression=True, scaling_threshold=1.0.
    """
    flag_fields = {f.name for f in dataclasses.fields(Flags)}
    unknown = set(overrides) - flag_fields
    if unknown:
        raise TypeError(f"unknown flags: {sorted(unknown)}")
    flags = Flags(**overrides)
    dm = _as_dense(matrix, flags)
    from .drivers.runner import run
    from .utils import trace
    with trace.profile("superman_tpu.permanent"):
        with trace.timer(f"permanent[{flags.algo_name or flags.perman_algo}]",
                         level=2):
            res = run(dm, flags)
    spans = trace.drain_spans()
    if spans:
        res.meta.setdefault("spans", spans)
    return res


def permanent_batch(mats, **overrides):
    """Exact permanents of many matrices; same-order small matrices are
    vmapped into one device program (see ops/batch.py)."""
    from .ops.batch import permanent_batch as _pb
    return _pb(mats, **overrides)


def grid_permanent(m: int, n: int, **overrides) -> Result:
    """Number of perfect matchings of an m x n grid graph (reference -i)."""
    overrides.setdefault("grid_graph", True)
    overrides.setdefault("gridm", m)
    overrides.setdefault("gridn", n)
    return permanent(None, **overrides)
