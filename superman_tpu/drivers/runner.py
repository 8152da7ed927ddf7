"""L4 orchestration: dispatch a (matrix, flags) pair to an engine.

Parity: RunAlgo (reference revised_perman/main.cpp:98-762) plus the
scaling / compression drivers (main.cpp:994-1264).  The reference's
algorithm-id zoo collapses: all dense/sparse exact variants are one engine
(ops/ryser.py) with preprocessing + pruning options; approximation ids map
to the estimator engine (ops/approx.py).
"""

from __future__ import annotations

import numpy as np

from ..core.flags import Flags
from ..core.matrix import DenseMatrix
from ..core.result import Result


def run(dense: DenseMatrix, flags: Flags) -> Result:
    # transform drivers wrap the core run (order matches the reference:
    # scaling may invoke compression which recurses back here)
    if flags.scaling_threshold != -1.0:
        from .scale_driver import scale_and_calculate
        return scale_and_calculate(dense, flags)
    if flags.compression:
        from .compress_driver import compress_singleton_and_then_recurse
        return compress_singleton_and_then_recurse(dense, flags)
    return run_algo(dense, flags)


def run_algo(dense: DenseMatrix, flags: Flags) -> Result:
    if flags.approximation:
        from ..ops.approx import approximate
        return approximate(dense, flags)

    if flags.cpu and not flags.gpu:
        from ..bindings.native import native_available, perman_native
        from ..prep.orderings import apply_preprocessing
        if native_available() and flags.resolved_calc() != "quad":
            dm = apply_preprocessing(dense, flags.preprocessing) \
                if flags.sparse else dense
            return perman_native(dm, flags)
        # no compiler (or quad parity requested): host longdouble/XLA path

    # exact accelerator path
    from ..prep.orderings import apply_preprocessing
    from ..parallel.mesh import mesh_for_flags
    if flags.dm_prune:
        from ..prep.dulmage_mendelsohn import dm_prune
        pruned = dm_prune(np.asarray(dense.mat))
        if pruned is None:
            return Result(0.0, 0.0, algo_name="dm_structural_zero")
        dense = DenseMatrix(pruned, dense.type)
    dm = apply_preprocessing(dense, flags.preprocessing) \
        if flags.sparse else dense
    mesh = mesh_for_flags(flags)

    if str(flags.perman_algo) == "glynn":
        # independent second exact engine (cross-algorithm oracle)
        from ..ops.glynn import glynn_exact
        res = glynn_exact(dm if flags.sparse else dense, flags, mesh=mesh)
        flags.algo_name = res.algo_name
        return res

    # dead-chunk pruning (TPU SkipPer) happens inside ryser_exact, which
    # owns the chunk plan
    from ..ops.ryser import ryser_exact
    import contextlib
    import jax
    devs = jax.devices()
    ctx = (jax.default_device(devs[flags.device_id])
           if mesh is None and 0 < flags.device_id < len(devs)
           else contextlib.nullcontext())   # -l device select (flags.h -l)
    with ctx:
        res = ryser_exact(dm, flags, mesh=mesh)
    if flags.sparse:
        res.algo_name = res.algo_name.replace("ryser", "sparyser")
    flags.algo_name = res.algo_name
    return res
