"""Batched exact permanents: many matrices in one device program.

A production-serving addition with no reference equivalent (the reference
CLI processes one matrix per invocation): for a batch of same-order
matrices the whole Ryser walk is vmapped over the batch axis, so B
permanents cost one XLA program and one device round-trip.  Intended for
the many-small-matrices regime (n <= ~26); larger orders fall back to the
sequential engine, which is already compile-cached per order.
"""

from __future__ import annotations

import time
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.result import Result
from .oracle import gray_init_lanes
from .ryser_xla import _walk


def _batched_walk(Xs, sign_mid, colss, *, n, r, dtype):
    f = jax.vmap(lambda X, c: _walk(X, sign_mid, c, n=n, r=r, dtype=dtype),
                 in_axes=(0, 0))
    return f(Xs, colss)


def permanent_batch_same_n(mats: np.ndarray, dtype=jnp.float64,
                           max_lanes: int = 1 << 11) -> np.ndarray:
    """Exact permanents of a (B, n, n) stack (one vmapped walk)."""
    mats = np.asarray(mats, dtype=np.float64)
    B, n, _ = mats.shape
    if n <= 2:
        from .oracle import perman_brute
        return np.array([perman_brute(m) for m in mats])
    total = 1 << (n - 1)
    C = min(total >> 1, max_lanes)
    r = (total // C).bit_length() - 1
    ids = np.arange(C, dtype=np.int64)
    Xs = np.empty((B, C, n), dtype=np.float64)
    for b in range(B):
        Xs[b], sign_mid = gray_init_lanes(mats[b], ids, r,
                                          dtype=np.float64)
    colss = mats[:, :, : n - 1].transpose(0, 2, 1)   # (B, n-1, n)

    args = (jnp.asarray(Xs, dtype=dtype),
            jnp.asarray(sign_mid, dtype=dtype),
            jnp.asarray(colss, dtype=dtype))
    if dtype == jnp.float64 and jax.default_backend() != "cpu":
        with jax.default_device(jax.devices("cpu")[0]):
            acc = _batched_walk(*args, n=n, r=r, dtype=dtype)
    else:
        acc = _batched_walk(*args, n=n, r=r, dtype=dtype)
    sums = np.asarray(acc, dtype=np.float64).sum(axis=1)
    return (4 * (n & 1) - 2) * sums


def permanent_batch(mats: Sequence[np.ndarray], **overrides) -> List[Result]:
    """Exact permanents of a sequence of square matrices.

    Same-order matrices with n <= 26 are grouped and vmapped; everything
    else routes through the normal engine one by one (which reuses its
    compiled kernels per order)."""
    from ..api import permanent

    mats = [np.asarray(m) for m in mats]
    t0 = time.perf_counter()
    results: List[Result] = [None] * len(mats)
    groups: dict = {}
    for i, m in enumerate(mats):
        if m.ndim != 2 or m.shape[0] != m.shape[1]:
            raise ValueError(f"matrix {i} is not square")
        n = m.shape[0]
        if 2 < n <= 26 and not overrides:
            groups.setdefault(n, []).append(i)
        else:
            results[i] = permanent(m, **overrides)
    for n, idxs in groups.items():
        stack = np.stack([mats[i].astype(np.float64) for i in idxs])
        vals = permanent_batch_same_n(stack)
        dt = time.perf_counter() - t0
        for i, v in zip(idxs, vals):
            results[i] = Result(float(v), dt, algo_name="ryser_xla_batch",
                                iterations=1 << (n - 1))
    return results
