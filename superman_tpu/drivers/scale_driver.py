"""Sinkhorn preconditioning driver.

Parity: scale_and_calculate (reference revised_perman/main.cpp:1097-1264):
swap int storage to double (or float with -w), Sinkhorn-scale the matrix,
run (or hand off to the compression driver), then divide the result by
prod(r_v) * prod(c_v).
"""

from __future__ import annotations


from ..core.matrix import DenseMatrix
from ..core.result import Result
from ..prep.scaling import scalesk, scale_matrix, unscale_permanent


def scale_and_calculate(dense: DenseMatrix, flags,
                        compressing: bool = False) -> Result:
    if dense.type == "int":
        dense = dense.astype("float" if flags.storage_half_precision
                             else "double")
        flags.type = dense.type
    sc = scalesk(dense.mat, flags.scaling_threshold)
    scaled = scale_matrix(dense, sc)

    if flags.compression and not compressing:
        from .compress_driver import compress_singleton_and_then_recurse
        res = compress_singleton_and_then_recurse(scaled, flags)
    else:
        from .runner import run_algo
        res = run_algo(scaled, flags)
    res.permanent = unscale_permanent(res.permanent, sc)
    res.meta["scaled"] = True
    return res
