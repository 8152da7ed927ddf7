"""Glynn-formula engine: independent cross-algorithm agreement with the
Ryser/Nijenhuis-Wilf paths (the reference's primary oracle mechanism)."""

import numpy as np
import pytest

import superman_tpu as sp
from superman_tpu.ops.oracle import perman64, perman_brute, perman_glynn
from tests.conftest import random_int_matrix, random_float_matrix


@pytest.mark.parametrize("n", [4, 8, 12])
def test_glynn_host_matches_brute(rng, n):
    a = random_int_matrix(rng, n, 0.6, vmax=3)
    assert perman_glynn(a) == pytest.approx(perman_brute(a), rel=1e-10)


def test_glynn_host_float(rng):
    a = random_float_matrix(rng, 14, 0.5)
    assert perman_glynn(a) == pytest.approx(perman64(a), rel=1e-10)


def test_glynn_kernel_matches_ryser(rng):
    a = random_int_matrix(rng, 21, 0.5, vmax=2)
    ry = sp.permanent(a, calc="df64", chunk_log2=6, lanes=256)
    gl = sp.permanent(a, calc="df64", chunk_log2=6, lanes=256,
                      perman_algo="glynn")
    assert gl.algo_name.startswith("glynn_pallas")
    assert gl.permanent == pytest.approx(ry.permanent, rel=1e-8)


def test_glynn_small_n_host_path(rng):
    a = random_int_matrix(rng, 10, 0.6, vmax=2)
    gl = sp.permanent(a, perman_algo="glynn")
    assert gl.permanent == pytest.approx(perman_brute(a), rel=1e-10)


def test_glynn_empty_row_early_out(rng):
    """A zero row must return 0 without walking (previously 3 full
    2^(n-1) walks via the scale-retry loop at n >= 19)."""
    import time as _time
    a = random_int_matrix(rng, 21, 0.5, vmax=3).astype(np.float64)
    a[7] = 0.0
    t0 = _time.perf_counter()
    r = sp.permanent(a, perman_algo="glynn")
    assert r.permanent == 0.0
    assert r.iterations == 0
    assert _time.perf_counter() - t0 < 5.0


def test_glynn_host_quad_walks_longdouble(rng, monkeypatch):
    """The host Glynn rung must pass dtype=longdouble for quad/tf96
    (previously walked f64 silently, violating the quad contract; the
    fix mirrors ryser_exact's host rung)."""
    from superman_tpu.core.flags import Flags
    from superman_tpu.core.matrix import DenseMatrix
    from superman_tpu.ops import glynn as G
    seen = {}
    real = __import__("superman_tpu.ops.oracle",
                      fromlist=["perman_glynn"]).perman_glynn

    def spy(a, dtype=np.float64, **kw):
        seen["dtype"] = dtype
        return real(a, dtype=dtype, **kw)

    monkeypatch.setattr("superman_tpu.ops.oracle.perman_glynn", spy)
    a = random_int_matrix(rng, 8, 0.8, vmax=4).astype(np.longdouble)
    r = G.glynn_exact(DenseMatrix(a, "double"), Flags(calc="quad"))
    assert r.algo_name == "glynn_host"
    assert seen["dtype"] is np.longdouble
    G.glynn_exact(DenseMatrix(a.astype(np.float64), "double"),
                  Flags(calc="f64"))
    assert seen["dtype"] is np.float64
