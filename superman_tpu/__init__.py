"""superman_tpu — TPU-native matrix permanent engine.

A ground-up JAX/XLA/Pallas re-design of the capability set of
kamerkaya/SUPerman (CUDA/C++): exact permanents via the Nijenhuis–Wilf
Gray-code Ryser formula, sparse SpaRyser/SkipPer variants, Monte-Carlo
estimators (Rasmussen, Sinkhorn-scaling-guided), matrix orderings,
exact-preserving compressions, Sinkhorn preconditioning, grid-graph
perfect-matching counting, CLI + Python/C APIs — executed on TPU via
Pallas kernels sharded over a `jax.sharding.Mesh`, with a native C++
OpenMP engine for the host CPU path.
"""

import jax as _jax

# float64 is load-bearing for exactness guarantees (host-side reductions,
# the f64 XLA walk, longdouble quad parity); all device arrays in this
# package carry explicit dtypes so enabling x64 does not change kernel types.
_jax.config.update("jax_enable_x64", True)

# persistent XLA compilation cache: the engine's kernel shapes repeat
# across runs, so paying the ~30 s TPU compile once per machine (not per
# process) matters for CLI workflows.  Opt out with SUPERMAN_NO_CC=1.
import os as _os

if not _os.environ.get("SUPERMAN_NO_CC"):
    _cc = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          _os.path.expanduser("~/.cache/superman_tpu/xla"))
    try:
        _os.makedirs(_cc, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cc)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        pass

# float-anomaly tracing (the reference only has commented-out
# nvcc-fpchecker targets, revised_perman/Makefile:59-76): set
# SUPERMAN_DEBUG_NANS=1 to fail fast on NaN/Inf in any device computation.
if _os.environ.get("SUPERMAN_DEBUG_NANS"):
    _jax.config.update("jax_debug_nans", True)

from .core.flags import Flags
from .core.result import Result
from .core.matrix import DenseMatrix, SparseMatrix, matrix2compressed
from .io.triplet import read_triplet, write_triplet
from .io.matrixmarket import read_matrix_market, read_any
from .api import permanent, permanent_batch, grid_permanent

__version__ = "0.1.0"

__all__ = [
    "Flags", "Result", "DenseMatrix", "SparseMatrix", "matrix2compressed",
    "read_triplet", "write_triplet", "read_matrix_market", "read_any",
    "permanent", "permanent_batch", "grid_permanent",
]
