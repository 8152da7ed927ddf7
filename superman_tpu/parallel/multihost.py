"""Multi-host work partitioning: deterministic interleaved chunk ownership.

TPU-native replacement for the reference's (single-node-only) work
distribution, per SURVEY.md §2.5: there is no cross-host shared counter,
so the OpenMP-critical chunk scheduler becomes a DETERMINISTIC interleaved
assignment — host p owns block rows p, p+P, p+2P, ... of the (B, L) chunk
id array.  Interleaving (not contiguous split) balances the irregular
density of live chunks left by pruning.  Each host runs the normal
single-host engine (optionally its own local mesh + hybrid CPU pool) on
its slice; the only cross-host traffic is ONE float64 partial total per
host, allgathered over DCN and summed in a deterministic order — so the
multi-host result is bitwise identical to the single-host result for
every case where block-sum reassociation is exact (all int suites), and
within df64 tolerance otherwise.

Usage on each host:
    jax.distributed.initialize()   # or JAX_COORDINATOR_ADDRESS env
    sp.permanent(path)             # engine detects process_count() > 1
"""

from __future__ import annotations

import numpy as np


def host_slice(ids_blocks: np.ndarray, process_index: int,
               process_count: int) -> np.ndarray:
    """Block rows owned by this host (round-robin interleave)."""
    return ids_blocks[process_index::process_count]


def combine_host_totals(local_total: float) -> float:
    """Allgather each host's f64 partial total and sum deterministically
    (ascending process index).  Single-process: identity."""
    import jax
    if jax.process_count() == 1:
        return float(local_total)
    from jax.experimental import multihost_utils
    totals = multihost_utils.process_allgather(
        np.asarray([local_total], dtype=np.float64))
    return float(np.asarray(totals, dtype=np.float64).ravel().sum())
