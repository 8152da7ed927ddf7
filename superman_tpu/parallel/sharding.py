"""Gray-code range sharding over the device mesh.

TPU-native equivalent of the reference's L3 work distribution
(SURVEY.md §2.4): chunks are distributed over a 1-D mesh with `shard_map`;
per-device partial sums come back sharded and the final (exactness-critical)
reduction happens on host in float64.  Because every chunk costs exactly
2**r Gray steps — dead ranges are pruned *before* distribution rather than
skipped *during* the walk (contrast the reference's SkipPer divergence,
algo.h:885-1023) — a static equal split is load-balanced by construction,
replacing the reference's OpenMP-critical-section chunk counter
(gpu_exact_dense.cu:862-888) with something that also works across hosts.

The chunk length r is a runtime argument end to end, so the sharded
executable (cached per mesh + shapes below) serves every chunk size.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import gray
from ..ops.ryser_pallas import _partials_jit
from .mesh import RANGE_AXIS


def pad_ids(ids: np.ndarray, lanes: int, num_shards: int,
            block_multiple: int = 1):
    """Pad a 1-D chunk-id list with -1 sentinels (dead lanes) so it reshapes
    to (B, lanes) with B divisible by num_shards.

    block_multiple > 1 additionally rounds the PER-SHARD block count up
    to that multiple once a shard holds that many, so the
    32-blocks-per-program kernel and the on-device reduction engage on
    every group (sentinel lanes contribute 0).  The rounding is
    per-shard, not global: at high shard counts each shard holds far
    fewer than 32 blocks, the reduce path is gated off anyway
    (compute_partials), and a global lcm(num_shards, 32) quantization
    measured 48% padding waste at 64 shards (SCALING_MEASURED
    sparse_layout, round-4 verdict weak #3)."""
    per_block = lanes
    blocks = -(-len(ids) // per_block)
    blocks = -(-blocks // num_shards) * num_shards
    if block_multiple > 1:
        per_shard = blocks // num_shards
        if per_shard >= block_multiple:
            per_shard = -(-per_shard // block_multiple) * block_multiple
            blocks = per_shard * num_shards
    padded = np.full(blocks * per_block, -1, dtype=np.int32)
    padded[: len(ids)] = ids
    return padded.reshape(blocks, per_block)


def sparse_lanes(live: int, num_shards: int, lanes_cap: int) -> int:
    """Lane width for a sharded pruned walk.

    Every shard must hold >= 1 whole (L-lane) block, so at high shard
    counts a fixed L=512 forces num_shards * 512 lane-walks regardless
    of how few live chunks exist (measured: useful_frac 0.4821 at 64
    shards on the n=36 d=0.10 plan — round-4 verdict weak #3).  Shrink
    L (powers of two, floor 128) until the mandatory num_shards * L
    floor keeps useful lanes >= ~75%.  Single-device callers keep the
    tuned cap (the block layout, not the floor, governs their padding).
    """
    L = int(lanes_cap)
    if num_shards <= 1:
        return L
    while L > 128 and num_shards * L * 3 > live * 4:
        L //= 2
    return L


@functools.lru_cache(maxsize=None)
def _sharded_fn(mesh: Mesh, n: int, n_pad: int, df: bool,
                exact_storage: bool, use_u16: bool, kahan: bool,
                tf: bool, u: int, interpret: bool,
                weighted: bool = False, nf_pad: int = 8,
                reduce: bool = False, allow_multi: bool = True):
    """jitted shard_map executable, cached per (mesh, statics) so repeated
    calls (and different r values) reuse one compile.  weighted/reduce
    mirror the single-device factored-sparse path: each shard derives
    its chunk weights on device from its own id slice."""
    init_df = df and not exact_storage

    def local(r_arr, ids_blk, x0p, colsp, cth, ctl, fx0, fcols):
        xhi, xlo, smid = gray.chunk_init(ids_blk, x0p, colsp, n=n,
                                         n_pad=n_pad, r=r_arr[0],
                                         df=init_df)
        w_pair = None
        if weighted:
            whi, wlo = gray.factor_weights(ids_blk, fx0, fcols, n=n,
                                           nf_pad=nf_pad, r=r_arr[0])
            w_pair = jnp.stack([whi, wlo], axis=1)
        return _partials_jit(r_arr, xhi, xlo, smid, cth, ctl, w_pair,
                             use_u16=use_u16, df=df,
                             exact_storage=exact_storage, kahan=kahan,
                             tf=tf, u=u, interpret=interpret,
                             weighted=weighted, reduce=reduce,
                             allow_multi=allow_multi)

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(RANGE_AXIS), P(), P(), P(), P(), P(), P()),
        out_specs=P(RANGE_AXIS),
        check_vma=False)
    return jax.jit(f)


def compute_partials(ids_blocks: np.ndarray, x0_pair, cols_pair,
                     colst_hi, colst_lo, plan: gray.RyserPlan, *,
                     df: bool, exact_storage: bool,
                     mesh: Optional[Mesh] = None, kahan: bool = False,
                     tf: bool = False, interpret: bool = False,
                     factors=None, reduce_ok: bool = False,
                     amp: bool = False) -> np.ndarray:
    """Run init + kernel over (B, L) chunk ids, optionally sharded.

    factors: optional (fx0_pair, fcols_pair, nf_pad, host_fn) describing
    the sparse path's factored-out constant rows.  On the reduced
    single-device path the per-chunk weights are computed ON DEVICE from
    the chunk ids (gray.factor_weights) and applied before reduction;
    elsewhere host_fn(ids_blocks) supplies them (f64, or longdouble for
    tf96) and they multiply the returned per-lane partials on host.

    Returns host float64 partial sums whose .sum() is the (weighted)
    total: per-lane (B, L) on the legacy path, or per-group (G, L)
    when the on-device reduction kicked in (B a multiple of 32,
    single-device, unrolled kernel) — the reduction shrinks the
    device->host transfer, which is the measured per-chunk bottleneck
    on a remote-tunnel TPU (~0.9 us/chunk).
    """
    n, n_pad, r = plan.n, plan.n_pad, plan.r
    if amp:          # diagnostic walk: single-device, unweighted only
        assert mesh is None and not df and not tf and factors is None
    B = ids_blocks.shape[0]
    nsh = 1 if mesh is None else int(np.prod(mesh.devices.shape))
    # The axon stack kills any single device execution running longer
    # than ~40-60 s (measured: n=38 dense, 37 s, survives; n=39, 61 s,
    # CRASHES the TPU worker).  Cap each execution at ~20 s of walk and
    # split longer launches into power-of-two block groups (compile
    # shapes stay reused); results concatenate transparently.
    # amp mode walks pair-x + two product trees + a reciprocal: ~df64
    # cost, NOT the f32 rate — sizing its launches at 2.1e10 produced a
    # single ~90 s execution at n=39 that tripped the axon watchdog and
    # CRASHED the worker (round-5 suite run; the stack kills any device
    # execution over ~40-60 s)
    rate = 2.5e9 if amp else (1.6e9 if tf else (4.5e9 if df else 2.1e10))
    cap_iters = int(20.0 * rate)
    per_block = ids_blocks.shape[1] << r
    if not interpret and B > nsh and B * per_block > cap_iters:
        g = max(1, cap_iters // per_block, nsh)
        if nsh & (nsh - 1) == 0:
            g = 1 << (int(g).bit_length() - 1)      # pow2 floor
        else:                      # non-pow2 mesh: keep shard-divisible
            g = max(nsh, (int(g) // nsh) * nsh)
        parts = [compute_partials(
            ids_blocks[i:i + g], x0_pair, cols_pair, colst_hi,
            colst_lo, plan, df=df, exact_storage=exact_storage,
            mesh=mesh, kahan=kahan, tf=tf, interpret=interpret,
            factors=factors, reduce_ok=reduce_ok, amp=amp)
            for i in range(0, B, g)]
        return np.concatenate(parts, axis=1 if amp else 0)
    # amp mode walks x as a df64 pair (near-zero crossings resolved to
    # the conditioned-amplitude clamp, ryser_pallas._AMP_EPS)
    init_df = (df or amp) and not exact_storage
    # Sentinel (-1) lanes are NOT self-zeroing when n_pad == n: chunk_init
    # zeroes their x, but the walk re-adds column values to every row, and
    # without an all-zero pad row the products come back nonzero (measured
    # 8% error at n=16).  Factor weights (device or host) zero dead lanes;
    # on every unweighted path the per-lane partials are masked below —
    # which requires per-lane output, so the device reduce is gated off.
    has_dead = bool((ids_blocks < 0).any())
    use_u16 = bool(r >= 5 and not interpret)
    full_df = df and not exact_storage
    # full-df and tf bodies are the largest (pair/triple-product trees);
    # cap their unroll to keep Mosaic compile time reasonable (must match
    # the single-device formula in ryser_pallas.ryser_partials)
    u = min(4 if (full_df or tf) else (5 if df else 7), r - 1) \
        if use_u16 else 4
    single = mesh is None or np.prod(mesh.devices.shape) == 1
    # reduce_ok comes from the pruned-sparse caller only: its pad_ids
    # block_multiple=32 guarantees shard boundaries align with the
    # 32-block reduction groups, so mesh and single runs regroup sums
    # IDENTICALLY (bitwise) — the dense paths keep per-lane partials and
    # their exact bitwise mesh-vs-single contract.  tf96 partials weight
    # by the df64 factor as a zero-extended triple (~1e-13, within the
    # tier's suite contract).
    reduce = bool(reduce_ok and single and B % 32 == 0 and B >= 32)
    host_weights = None

    args = (jnp.asarray(ids_blocks), jnp.asarray(x0_pair),
            jnp.asarray(cols_pair), jnp.asarray(colst_hi),
            jnp.asarray(colst_lo))
    if single:
        from ..ops.ryser_pallas import ryser_partials
        w_pair = None
        if factors is not None:
            if reduce:
                fx0, fcols, nf_pad, _ = factors
                whi, wlo = gray.factor_weights(
                    args[0], jnp.asarray(fx0), jnp.asarray(fcols),
                    n=n, nf_pad=nf_pad, r=r)
                w_pair = jnp.stack([whi, wlo], axis=1)    # (B, 2, L)
            else:
                host_weights = factors[3](ids_blocks)
        elif reduce and has_dead:
            # no factor weights, but sentinel lanes must be zeroed BEFORE
            # the on-device 32-block reduce (see the has_dead comment):
            # a synthetic (alive, 0) weight pair masks them while keeping
            # the reduced (G, 8, L) transfer — the per-lane fallback
            # would re-expose the measured D2H bottleneck.  Derived on
            # device from the already-shipped ids (never send a weight
            # array over the ~35 MB/s tunnel)
            alive = (args[0] >= 0).astype(jnp.float32)
            w_pair = jnp.stack([alive, jnp.zeros_like(alive)], axis=1)
        xhi, xlo, smid = gray.chunk_init(args[0], args[1], args[2],
                                         n=n, n_pad=n_pad, r=r, df=init_df)
        out = ryser_partials(xhi, xlo, smid, args[3], args[4], r=r, df=df,
                             exact_storage=exact_storage, kahan=kahan,
                             tf=tf, interpret=interpret, w_pair=w_pair,
                             reduce=reduce, amp=amp)
    else:
        num_shards = int(np.prod(mesh.devices.shape))
        b_shard = B // num_shards
        reduce = bool(reduce_ok and b_shard % 32 == 0 and b_shard >= 32
                      and (factors is not None or not has_dead))
        # device weighting rides the reduction path; without it
        # (small shards) the factors fall back to host_fn
        weighted = factors is not None and reduce
        if weighted:
            fx0, fcols, nf_pad, _ = factors
        else:
            # dummy replicated operands keep one arg signature
            fx0 = np.zeros((2, 8), np.float32)
            fcols = np.zeros((2, n - 1, 8), np.float32)
            nf_pad = 8
        allow_multi = (r + int(np.log2(max(ids_blocks.shape[1], 1)))
                       + 5) <= 33
        fn = _sharded_fn(mesh, n, n_pad, df, exact_storage, use_u16,
                         kahan, tf, u, interpret, weighted=weighted,
                         nf_pad=int(nf_pad), reduce=reduce,
                         allow_multi=allow_multi)
        out = fn(jnp.asarray([r], dtype=jnp.int32), *args,
                 jnp.asarray(fx0), jnp.asarray(fcols))
        if factors is not None and not weighted:
            host_weights = factors[3](ids_blocks)
    if amp:
        # amp walk: rows 0/1 = amplitude (hi, kahan-lo), rows 2/3 = the
        # within-line conditioned amplitude — returned as (2, B, L)
        out = np.asarray(out[:, :4, :], dtype=np.float64)
        p = np.stack([out[:, 0] + out[:, 1], out[:, 2] + out[:, 3]])
        if has_dead:
            p = p * (ids_blocks >= 0).astype(p.dtype)[None]
        return p
    rows = 3 if tf else 2
    out = out[:, :rows, :]                  # device slice: small D2H
    if tf:
        # triple words summed in long double: the per-lane partial holds
        # ~72 mantissa bits, beyond f64
        out = np.asarray(out, dtype=np.longdouble)
        p = out[:, 0, :] + out[:, 1, :] + out[:, 2, :]
    else:
        out = np.asarray(out, dtype=np.float64)
        p = out[:, 0, :] + out[:, 1, :]     # hi + lo, exact in f64
    if host_weights is not None:
        p = p * np.asarray(host_weights).astype(p.dtype)
    elif has_dead and not reduce:
        # unweighted per-lane partials: zero the sentinel lanes (see the
        # has_dead comment above; weighted paths already carry 0 weights)
        p = p * (ids_blocks >= 0).astype(p.dtype)
    return p
