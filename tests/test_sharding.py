"""Range sharding over the virtual 8-device CPU mesh.

The exactness invariant (SURVEY.md §4): a range-sharded exact permanent
must equal the unsharded result bitwise — partial sums are reduced on host
in f64, so grouping cannot change the value.
"""

import numpy as np
import pytest

import superman_tpu as sp
from superman_tpu.parallel.mesh import make_mesh
from tests.conftest import random_int_matrix


def test_mesh_has_8_devices():
    import jax
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_equals_single(rng, n_dev):
    a = random_int_matrix(rng, 21, 0.5, vmax=2)
    single = sp.permanent(a, calc="df64", chunk_log2=6, lanes=256)
    sharded = sp.permanent(a, calc="df64", chunk_log2=6, lanes=256,
                           mesh_shape=(n_dev,))
    assert sharded.permanent == single.permanent   # bitwise
    assert sharded.meta["mesh"] == n_dev


def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(4)


def test_entry_compiles():
    import __graft_entry__ as g
    import jax
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


def test_sentinel_lanes_contribute_zero_when_npad_equals_n(rng):
    """Sentinel (-1) padded lanes are NOT self-zeroing when n_pad == n
    (no all-zero pad row: the walk re-adds columns to every row), so
    compute_partials must mask unweighted per-lane partials and keep the
    device reduce off.  Regression: a sentinel-padded id list at n=16
    summed 8% wrong, silently — in exactly the shapes the hybrid
    scheduler's fixed-size unit padding and no-factor sparse plans emit."""
    from superman_tpu.ops import gray
    from superman_tpu.ops.ryser import colst_pack
    from superman_tpu.parallel.sharding import pad_ids, compute_partials

    n = 16
    assert gray.pad_n(n) == n                    # the failing geometry
    a = rng.random((n, n))
    plan = gray.RyserPlan(n=n, n_pad=n, r=4, lanes=64, num_chunks=1 << 11)
    x0_pair, cols_pair = gray.pack_matrix(a, plan.n_pad)
    cth, ctl = colst_pack(a, plan.n_pad)
    ids = np.arange(1 << 11, dtype=np.int64).astype(np.int32)
    clean = pad_ids(ids, 64, 1, block_multiple=1)       # exact, 32 blocks
    dirty = pad_ids(ids, 63, 1, block_multiple=32)      # 1984 sentinels
    assert (dirty < 0).any()
    ref = None
    for blocks, reduce_ok in ((clean, True), (dirty, False), (dirty, True)):
        out = compute_partials(blocks, x0_pair, cols_pair, cth, ctl, plan,
                               df=True, exact_storage=False,
                               interpret=True, reduce_ok=reduce_ok)
        tot = float(out.sum(dtype=np.float64))
        if ref is None:
            ref = tot
        else:       # cross-grouping: 1e-12-class, never the 8%-off garbage
            assert abs(tot - ref) <= 1e-9 * abs(ref)
