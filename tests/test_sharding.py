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
