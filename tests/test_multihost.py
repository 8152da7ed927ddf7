"""Multi-host partitioning: coverage, disjointness, and sum equivalence
(single-process simulation; real multi-host runs exercise the same code
via jax.process_index/count)."""

import numpy as np

import superman_tpu as sp
from superman_tpu.parallel.multihost import combine_host_totals, host_slice
from superman_tpu.parallel.sharding import pad_ids
from tests.conftest import random_int_matrix


def test_host_slices_partition_blocks():
    ids = pad_ids(np.arange(1000, dtype=np.int32), lanes=64, num_shards=1)
    P = 4
    slices = [host_slice(ids, p, P) for p in range(P)]
    rows = np.concatenate([s for s in slices])
    assert rows.shape[0] == ids.shape[0]
    # disjoint and complete (compare as sets of row indices)
    seen = np.sort(rows.ravel())
    assert np.array_equal(seen, np.sort(ids.ravel()))


def test_simulated_multihost_sum_matches(rng):
    """Summing per-host engine totals over simulated host slices equals
    the single-host run to f64 reassociation tolerance (bitwise holds
    only for identical grouping; slice sums regroup the f64 adds)."""
    from superman_tpu.core.flags import Flags
    from superman_tpu.ops.ryser import ryser_exact
    from superman_tpu.core.matrix import DenseMatrix

    a = random_int_matrix(rng, 21, 0.5, vmax=2)
    dm = DenseMatrix(a, "int")
    flags = Flags(calc="df64", chunk_log2=6, lanes=256)
    single = ryser_exact(dm, flags)

    # simulate 3 hosts by running the engine on explicit chunk slices
    import superman_tpu.ops.gray as gray
    plan = gray.make_plan(21, 256, 6)
    all_ids = np.arange(plan.num_chunks, dtype=np.int64)
    blocks = pad_ids(all_ids.astype(np.int32), plan.lanes, 1)
    total = 0.0
    n = 21
    for p in range(3):
        mine = host_slice(blocks, p, 3).ravel()
        mine = mine[mine >= 0].astype(np.int64)
        res = ryser_exact(dm, flags, chunk_ids=mine)
        # ryser_exact returns the signed, unscaled permanent of the slice
        total += res.permanent
    import pytest
    assert total == pytest.approx(single.permanent, rel=1e-12)


def test_combine_host_totals_single_process():
    assert combine_host_totals(3.25) == 3.25
