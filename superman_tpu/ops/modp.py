"""Z_p modular Ryser walk on TPU — exact permanents past the CPU frontier.

The exact CRT engine (ops/exact.py) runs the Nijenhuis–Wilf walk in Z_p
on the host CPU (native Montgomery kernel) — practical to core n ~ 33.
The reference corpus's hardest files fold to cores far beyond that
(chesapeake n=39, cage5_c2 n=37, will57 n=49-core at <1% live), where
ONLY an exact engine can state the answer: their cancellation amplitude
(up to 2^280 over |per|) defeats every float tier including the
reference's ``__float128`` (revised main.cpp:141-167).

This module runs the SAME Z_p walk as a TPU Pallas kernel, reusing the
engine's whole planning stack (aligned gray chunks `ops/gray.py`, pruned
live-chunk plans `ops/pruning.py`):

* primes p <= 2039 with a LAZY residue representation in [0, 2p): all
  values and their pairwise products stay integers < 4p^2 < 2^24, every
  one EXACTLY representable in f32 — the walk is ordinary VPU f32
  arithmetic with a floor-multiply Barrett-style reduction whose
  reciprocal is rounded DOWN (invp' = (1 - 2^-22)/p in f32, provably
  < 1/p), so q = floor(v * invp') never overestimates and
  r = v - q*p lands in [0, 2p) with NO conditional correction at all.
  The round-3 kernel used strict [0, p) residues at p <= 4093: its
  reduce needed two compare/select corrections (10 ops vs 4), making
  the whole step ~1.65x more expensive for only 12/11 more bits per
  prime — the lazy walk nets ~1.5x more CRT bits per second (round-4
  verdict #8, measured ledger in tools/modp_rate.py).
* x updates, the product tree (aligned 8-row groups first — sublane
  alignment is load-bearing, see ops/df64.py), and the accumulator all
  reduce each step; a lane's partial sum stays lazy in [0, 2p), so
  per-block sums are EXACT plain f32 adds (KB*2p < 2^17) and the host
  total is an exact float64 sum (< 2^53) reduced mod p once.
* p and 1/p ride in VMEM rows beside the mid-step sign (aux[3, L]), and
  r stays a runtime SMEM scalar — compile keys are shape-only, so ONE
  Mosaic compile serves every prime and every chunk size (the axon
  remote compiler cannot persist executables across processes).
* no grid (axon rejects gridded kernels): single-program calls
  sequenced with lax.map, KB=32 blocks per program amortizing launch
  overhead, power-of-two block grouping reusing compiled shapes, and
  per-launch iteration caps below the device watchdog.

No reference counterpart at any precision.
"""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import gray

_I32 = jnp.int32

#: largest usable prime: lazy residues live in [0, 2p), so (2p)^2 must
#: stay an exact f32 integer (< 2^24) -> p < 2^11
PRIME_CEIL = 2039


def _invp_down(p) -> np.float32:
    """f32 reciprocal provably BELOW 1/p: q = floor(v * invp_down) then
    never overestimates floor(v/p), so v - q*p >= 0 without correction
    and < 2p because the relative shortfall (~2^-21) times the largest
    v/p (= 4p < 2^13) stays far under 1."""
    return np.float32((1.0 - 2.0 ** -22) * np.float32(1.0 / np.float32(p)))

#: measured-on-hardware lane-iteration rate placeholder for cost
#: estimates (per prime); refined by tools once measured
MOD_GITERS = 10.0e9

#: per-launch gray-iteration cap: the axon stack kills device programs
#: past ~40-60 s (see parallel/sharding.py) — stay well under even if
#: the realized rate lands below the MOD_GITERS placeholder
_CAP_ITERS = int(6.0 * MOD_GITERS)

#: realized device rate (iters/s), measured from the first WARM launch
#: (round-3 advisor: the placeholder-derived cap could exceed the
#: watchdog if the realized rate lands low); None until measured
_RATE_ITERS_S = None
#: per-launch wall budget once the rate is known (sharding.py uses ~20 s)
_WALL_TARGET_S = 20.0
#: compile keys already launched this process (their walls are walk-only)
_WARM_KEYS: set = set()


def _cap_iters() -> int:
    """Iteration cap per launch: measured-rate * 20 s once a warm launch
    has been timed; the conservative placeholder cap before that."""
    if _RATE_ITERS_S is None:
        return _CAP_ITERS
    return max(int(_RATE_ITERS_S * _WALL_TARGET_S), 1 << 24)

#: deepest plannable r: one block (512 lanes x 2^r steps) is the walk's
#: indivisible launch unit, so it must fit under _CAP_ITERS on its own
_R_CAP = int(math.floor(math.log2(_CAP_ITERS / 512)))


def primes_mod(count: int) -> list:
    """`count` distinct odd primes descending from PRIME_CEIL."""
    from .exact import _is_prime_u64
    out, c = [], PRIME_CEIL
    while len(out) < count:
        if _is_prime_u64(c):
            out.append(c)
        c -= 2
        if c < 3:
            raise ValueError("prime pool below 3 exhausted")
    return out


# --------------------------------------------------------- host packing

def reduce_core_mod(core, p: int):
    """Residue matrix of a bigint core mod p, as (n, n) int64 ndarray."""
    return np.asarray([[int(v) % p for v in row] for row in core],
                      dtype=np.int64)


def pack_mod(am: np.ndarray, p: int, n_pad: int):
    """Host pack of a residue matrix: (x0v, cols, colst) f32 arrays.

    x0v:   (n_pad,) walk init x0 = a[:,n-1] - rowsum/2 in Z_p (inv2 =
           (p+1)/2), pad rows 1 (multiplicative identity);
    cols:  (n-1, n_pad) residue columns for the device chunk init;
    colst: (n_pad, nb_pad) transposed column table for the kernel.
    """
    n = am.shape[0]
    inv2 = (p + 1) // 2
    rs = am.sum(axis=1) % p
    x0 = (am[:, n - 1] + (p - rs) * inv2) % p
    x0v = np.ones(n_pad, dtype=np.float32)
    x0v[:n] = x0.astype(np.float32)
    cols = np.zeros((n - 1, n_pad), dtype=np.float32)
    cols[:, :n] = am[:, : n - 1].T.astype(np.float32)
    nb_pad = -(-(n - 1) // 128) * 128
    colst = np.zeros((n_pad, nb_pad), dtype=np.float32)
    colst[:n, : n - 1] = am[:, : n - 1].astype(np.float32)
    return x0v, cols, colst


def pack_glynn_mod(am: np.ndarray, p: int, n_pad: int):
    """Host pack for the GLYNN identity on the UNCHANGED walk kernel.

    The NW walk body computes x += s*c with s = +1 when the gray bit
    flips to 1.  Glynn's recursion over delta vectors (delta_0 = +1
    fixed, bit k set meaning delta_{k+1} = -1) is y_j -= 2 a_{k+1,j}
    at a 0->1 flip — i.e. the SAME body applied to init y0 = all-(+1)
    column sums and column tables carrying the NEGATED doubled rows
    c_k = (-2 a_{k+1,:}) mod p.  One compiled Mosaic program therefore
    serves both identities; only this packing and the final 2^(1-n)
    scale differ (the native twin sup_perman_glynn_mod does the same).
    """
    n = am.shape[0]
    y0 = am.sum(axis=0) % p
    y0v = np.ones(n_pad, dtype=np.float32)
    y0v[:n] = y0.astype(np.float32)
    neg2 = (p - (2 * am[1:, :]) % p) % p         # (n-1, n) in [0, p)
    cols = np.zeros((n - 1, n_pad), dtype=np.float32)
    cols[:, :n] = neg2.astype(np.float32)
    nb_pad = -(-(n - 1) // 128) * 128
    colst = np.zeros((n_pad, nb_pad), dtype=np.float32)
    colst[:n, : n - 1] = neg2.T.astype(np.float32)
    return y0v, cols, colst


# ----------------------------------------------------- device chunk init

@functools.partial(jax.jit, static_argnames=("n", "n_pad"))
def chunk_init_mod(chunk_ids, x0v, cols, p, invp, n: int, n_pad: int, r):
    """Per-lane Z_p x init from chunk ids (mirrors gray.chunk_init).

    The bit-weighted column sum stays < n_pad * p < 2^17 — exact in f32 —
    and reduces once at the end into the LAZY range [0, 2p) (invp is the
    downward reciprocal, see _invp_down: the quotient never
    overestimates, so no corrections are needed).  Dead (sentinel) lanes
    get x = 0: every product term is then 0, contributing nothing in
    any Z_p.  Returns (x, aux) with aux = [sign_mid; p; invp] rows,
    (B, 3, L)."""
    dead = (chunk_ids < 0)
    ids = jnp.where(dead, 0, chunk_ids)
    bits_f = gray.chunk_gray_bits(ids, n, r).astype(jnp.float32)
    x = jnp.broadcast_to(x0v[None, :, None],
                         ids.shape[:1] + (n_pad, ids.shape[1]))
    for k in range(n - 1):
        x = x + cols[k][None, :, None] * bits_f[:, :, k][:, None, :]
    q = jnp.floor(x * invp)
    x = x - q * p
    alive = jnp.where(dead, 0.0, 1.0).astype(jnp.float32)[:, None, :]
    x = x * alive
    smid = (1 - 2 * (ids & 1)).astype(jnp.float32)[:, None, :]
    pf = jnp.full_like(smid, p)
    pinv = jnp.full_like(smid, invp)
    return x, jnp.concatenate([smid, pf, pinv], axis=1)


# ------------------------------------------------------------- the walk

def _mod_reduce(v, p_row, invp_row):
    """v (exact f32 integer in [0, 4p^2)) -> v mod p, LAZY in [0, 2p).

    invp_row is the downward reciprocal (_invp_down): q never
    overestimates floor(v/p), so the remainder is already nonnegative
    and < 2p — zero corrections (4 flops vs the strict form's 10)."""
    q = jnp.floor(v * invp_row)
    return v - q * p_row


def _tree_prod_mod(x, p_row, invp_row):
    """Product over axis 0 of (s, L) LAZY residues (in [0, 2p)), reduced
    at every level (products of two lazy residues are exact f32 ints
    < 4p^2 < 2^24; three are not).  Same aligned 8-row-group fold order
    as df64.tree_prod_f32."""
    s = x.shape[0]
    if s & (s - 1) != 0:
        assert s % 8 == 0, f"pad axis 0 to a multiple of 8, got {s}"
        prod = _mod_reduce(x[0:8] * x[8:16], p_row, invp_row)
        for b in range(2, s // 8):
            prod = _mod_reduce(prod * x[8 * b:8 * b + 8], p_row, invp_row)
        x, s = prod, 8
    while s > 1:
        s //= 2
        x = _mod_reduce(x[:s] * x[s:], p_row, invp_row)
    return x


def _x_add(x, c, p2_row):
    """x + c for lazy x in [0, 2p) and c in [0, p]: one conditional -2p
    (subtracting 2p keeps the value's class mod p)."""
    v = x + c
    return jnp.where(v >= p2_row, v - p2_row, v)


def _x_sub(x, c, p2_row):
    """x - c via the precomputed complement is preferred (see callers);
    this direct form keeps lazy range with one conditional +2p."""
    v = x - c
    return jnp.where(v < jnp.float32(0), v + p2_row, v)


def _x_add_signed(x, c, s_row, p2_row):
    """x + s*c for a (1, L) sign row of +-1, lazy x in [0, 2p),
    c in [0, p]: v in (-p, 3p), two corrections by 2p."""
    v = x + c * s_row
    v = jnp.where(v < jnp.float32(0), v + p2_row, v)
    return jnp.where(v >= p2_row, v - p2_row, v)


def _acc_add_mod(acc, prod, pos, p2_row):
    """acc (+/-)= prod in Z_p, both lazy in [0, 2p); `pos` may be a
    python bool or a (1, L) +-1 f32 row (the dynamic-step sign).
    -prod is represented as 2p - prod (== -prod mod p, in (0, 2p])."""
    if pos is True:
        t = prod
    elif pos is False:
        t = p2_row - prod
    else:
        t = jnp.where(pos > jnp.float32(0), prod, p2_row - prod)
    v = acc + t
    return jnp.where(v >= p2_row, v - p2_row, v)


def _walk_mod_scalar(r, x0, aux, colst):
    """Per-step-ctz Z_p walk over one (n_pad, L) lane block; returns the
    (8, L) output (row 0 = per-lane sum mod p).  Bitwise-identical op
    sequence to the unrolled walk; interpret mode uses this body."""
    from .ryser_pallas import _ctz
    n_pad, L = x0.shape
    nb_pad = colst.shape[1]
    smid = aux[0:1]
    p_row = aux[1:2]
    invp_row = aux[2:3]
    p2_row = p_row + p_row           # lazy-range bound, once per program
    lane_k = lax.broadcasted_iota(jnp.int32, (n_pad, nb_pad), 1)

    acc = _tree_prod_mod(x0, p_row, invp_row)      # m = 0 term, sign +1

    def body(m, carry):
        x, acc = carry
        k = _ctz(m)
        s_scalar = jnp.where(((m >> (k + _I32(1))) & _I32(1)) == _I32(0),
                             jnp.float32(1), jnp.float32(-1))
        s_row = jnp.where(k == r - _I32(1), smid, s_scalar)
        sel = (lane_k == k).astype(jnp.float32)
        ck = jnp.sum(colst * sel, axis=1, keepdims=True)
        x = _x_add_signed(x, ck, s_row, p2_row)
        prod = _tree_prod_mod(x, p_row, invp_row)
        sign_m = jnp.where((m & _I32(1)) == _I32(0),
                           jnp.float32(1), jnp.float32(-1))
        acc = _acc_add_mod(acc, prod, sign_m, p2_row)
        return x, acc

    _, acc = lax.fori_loop(_I32(1), _I32(1) << r, body, (x0, acc))
    pad = jnp.zeros((7, L), dtype=jnp.float32)
    return jnp.concatenate([acc, pad], axis=0)


def _walk_mod_u16(r, x0, aux, colst, *, u: int = 4):
    """Unrolled Z_p walk (static-table structure of ryser_pallas's
    _walk_u16: within an aligned 2**u block every flipped column and
    sign is compile-time static except the half-block parity and the
    one dynamic end-of-block select)."""
    from .ryser_pallas import _ctz, _static_table
    n_pad, L = x0.shape
    nb_pad = colst.shape[1]
    smid = aux[0:1]
    p_row = aux[1:2]
    invp_row = aux[2:3]
    p2_row = p_row + p_row           # lazy-range bound, once per program
    lane_k = lax.broadcasted_iota(jnp.int32, (n_pad, nb_pad), 1)
    ck_static = [colst[:, k:k + 1] for k in range(u)]

    def static_steps(carry, b_parity_pos):
        x, acc = carry
        for j, k, sgn in _static_table(u):
            if sgn == 0:          # j == 2**(u-1): sign is the block parity
                x = _x_add_signed(x, ck_static[u - 1], b_parity_pos, p2_row)
            elif sgn > 0:
                x = _x_add(x, ck_static[k], p2_row)
            else:
                x = _x_sub(x, ck_static[k], p2_row)
            prod = _tree_prod_mod(x, p_row, invp_row)
            acc = _acc_add_mod(acc, prod, (j & 1) == 0, p2_row)
        return x, acc

    acc0 = _tree_prod_mod(x0, p_row, invp_row)     # m = 0 term
    nb = _I32(1) << (r - _I32(u))

    def block(b, carry):
        s8 = jnp.where((b & _I32(1)) == _I32(0),
                       jnp.float32(1), jnp.float32(-1))
        x, acc = static_steps(carry, s8)
        # j = 2**u: column k = u + ctz(b+1), the only dynamic select
        q = b + _I32(1)
        c = _ctz(q)
        k16 = c + _I32(u)
        s16 = jnp.where(((q >> (c + _I32(1))) & _I32(1)) == _I32(0),
                        jnp.float32(1), jnp.float32(-1))
        s_row = jnp.where(k16 == r - _I32(1), smid, s16)
        sel = (lane_k == k16).astype(jnp.float32)
        ck = jnp.sum(colst * sel, axis=1, keepdims=True)
        x = _x_add_signed(x, ck, s_row, p2_row)
        prod = _tree_prod_mod(x, p_row, invp_row)
        acc = _acc_add_mod(acc, prod, True, p2_row)
        return x, acc

    carry = lax.fori_loop(_I32(0), nb - _I32(1), block, (x0, acc0))
    s8_last = jnp.where(((nb - _I32(1)) & _I32(1)) == _I32(0),
                        jnp.float32(1), jnp.float32(-1))
    _, acc = static_steps(carry, s8_last)
    pad = jnp.zeros((7, L), dtype=jnp.float32)
    return jnp.concatenate([acc, pad], axis=0)


def _mod_kernel(r_ref, x_ref, aux_ref, colst_ref, out_ref):
    out_ref[:] = _walk_mod_scalar(r_ref[0], x_ref[:], aux_ref[:],
                                  colst_ref[:])


def _mod_kernel_u16(r_ref, x_ref, aux_ref, colst_ref, out_ref, *, u: int):
    out_ref[:] = _walk_mod_u16(r_ref[0], x_ref[:], aux_ref[:],
                               colst_ref[:], u=u)


def _mod_kernel_u16_multi(r_ref, x_ref, aux_ref, colst_ref, out_ref, *,
                          u: int):
    """KB lane blocks per program (internal fori_loop) — amortizes the
    ~0.5 ms per-program launch overhead exactly like the df64 engine's
    multi-block kernel."""
    KB = x_ref.shape[0]
    colst = colst_ref[:]

    def body(b, carry):
        out_ref[b] = _walk_mod_u16(r_ref[0], x_ref[b], aux_ref[b],
                                   colst, u=u)
        return carry

    lax.fori_loop(_I32(0), _I32(KB), body, _I32(0))


@functools.partial(
    jax.jit,
    static_argnames=("use_u16", "u", "interpret", "allow_multi"))
def _mod_partials_jit(r_arr, x, aux, colst, alive, *, use_u16: bool,
                      u: int, interpret: bool, allow_multi: bool = True):
    """(B, n_pad, L) lane inits -> (G or B, 8, L) partial sums.

    Per-lane sums are lazy in [0, 2p); the KB=32 group reduce is a PLAIN
    f32 sum (32 * 2p < 2^17, exact) — the caller host-sums in f64 (exact
    to 2^53)
    and reduces mod p once.

    alive: (B, L) f32 1/0 mask of live lanes.  Sentinel lanes are NOT
    self-zeroing when n_pad == n (no all-zero pad row: the walk re-adds
    column residues to every row, so a dead lane's products come back
    nonzero — measured wrong totals on any padded id list at n % 8 == 0);
    the mask is applied per lane BEFORE the KB group reduce.
    """
    B, n_pad, L = x.shape
    KB = 32 if (allow_multi and use_u16 and B % 32 == 0 and B >= 32) else 1
    if KB > 1:
        kern = functools.partial(_mod_kernel_u16_multi, u=u)
    elif use_u16:
        kern = functools.partial(_mod_kernel_u16, u=u)
    else:
        kern = _mod_kernel
    out_sh = (KB, 8, L) if KB > 1 else (8, L)
    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_sh, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=KB * L * (1 << 16) * 8 * n_pad,
            bytes_accessed=KB * int(n_pad) * L * 4 * 2, transcendentals=0),
        interpret=interpret,
    )
    if KB > 1:
        G = B // KB

        def one_group(args):
            bx, baux, bal = args
            out = call(r_arr, bx, baux, colst)
            out = out * bal[:, None, :]          # mask, then exact sum
            return jnp.sum(out, axis=0)          # exact: KB * 2p < 2^17

        return lax.map(one_group, (x.reshape(G, KB, n_pad, L),
                                   aux.reshape(G, KB, 3, L),
                                   alive.reshape(G, KB, L)))

    def one_block(args):
        bx, baux, bal = args
        return call(r_arr, bx, baux, colst) * bal[None, :]

    return lax.map(one_block, (x, aux, alive))


def mod_partials(ids_blocks: np.ndarray, x0v, cols, colst, p: int, *,
                 n: int, n_pad: int, r: int, interpret: bool) -> float:
    """Walk the (B, L) chunk-id blocks mod p; returns sum of per-lane
    partials as an exact float64 (caller reduces mod p).

    Splits long launches into power-of-two block groups under the device
    watchdog cap, reusing compiled shapes (same discipline as
    parallel/sharding.compute_partials).
    """
    B, L = ids_blocks.shape
    per_block = L << r
    if not interpret and per_block > _CAP_ITERS:
        # a single block cannot be split (the walk is sequential within a
        # chunk); the planner caps r (core_plan/_R_CAP) so this is a bug
        raise ValueError(
            f"mod_partials: one block of {per_block:.3g} iters (L={L}, "
            f"r={r}) exceeds the device watchdog cap {_CAP_ITERS:.3g}; "
            f"plan with r <= {_R_CAP}")
    if not interpret and B > 1 and B * per_block > _cap_iters():
        # split into power-of-two groups under the launch cap; time each
        # WARM group (a group whose compile key already launched — cold
        # walls are compile-dominated and would wreck the rate) and feed
        # the realized rate back into the cap.  g is re-derived at most
        # once per call so a mid-run correction costs one extra compile
        # shape, not one per group.
        global _RATE_ITERS_S
        total, i = 0.0, 0
        g = max(1, _cap_iters() // per_block)
        g = 1 << (int(g).bit_length() - 1)
        g_adjusted = False
        while i < B:
            gb = ids_blocks[i:i + g]
            key = (gb.shape[0], n_pad, gb.shape[1], r)
            t0 = time.perf_counter()
            total += mod_partials(gb, x0v, cols, colst, p, n=n,
                                  n_pad=n_pad, r=r, interpret=interpret)
            wall = time.perf_counter() - t0
            # the key was registered by the DIRECT branch below iff this
            # shape actually launched (a shrinking cap can make the
            # recursive call re-split, in which case no shape-(g,...)
            # program ran and its wall is compile-dominated — treating
            # it as warm would poison the measured rate; round-4 review
            # finding #3)
            if key in _WARM_KEYS and wall > 0.25:
                _RATE_ITERS_S = gb.shape[0] * per_block / wall
                if not g_adjusted:
                    g2 = max(1, _cap_iters() // per_block)
                    g2 = 1 << (int(g2).bit_length() - 1)
                    if g2 != g:
                        g, g_adjusted = g2, True
            i += gb.shape[0]
        return float(total)
    use_u16 = bool(r >= 5 and not interpret)
    u = min(5, r - 1) if use_u16 else 4
    allow_multi = (r + int(np.log2(max(L, 1))) + 5) <= 33
    invp = _invp_down(p)
    idsj = jnp.asarray(ids_blocks, jnp.int32)
    x, aux = chunk_init_mod(idsj, jnp.asarray(x0v), jnp.asarray(cols),
                            jnp.float32(p), invp, n=n, n_pad=n_pad,
                            r=jnp.int32(r))
    # alive mask derived on device from the already-shipped ids (never
    # send a weight array over the ~35 MB/s tunnel)
    alive = (idsj >= 0).astype(jnp.float32)
    out = _mod_partials_jit(jnp.asarray([r], jnp.int32), x, aux,
                            jnp.asarray(colst), alive, use_u16=use_u16,
                            u=u, interpret=interpret,
                            allow_multi=allow_multi)
    total = float(np.asarray(out[:, 0, :], dtype=np.float64).sum())
    # this shape has now genuinely launched: the block-group splitter
    # above may time the NEXT same-shaped group as warm
    _WARM_KEYS.add((B, n_pad, L, r))
    return total


# ------------------------------------------------------------ the driver

def perman_core_mod(core, p: int, *, ids=None, r=None, lanes: int = 512,
                    interpret=None) -> int:
    """per(core) mod p for a bigint core matrix, walked on the TPU.

    ids/r: optional pruned live-chunk plan (ids in [0, 2^(n-1-r))); the
    dense walk covers the full index space.  Matches ops/exact.py's
    _perman_mod_host / the native sup_perman_mod bit for bit in Z_p.
    """
    n = len(core)
    if p > PRIME_CEIL or p < 3:
        # the lazy [0, 2p) walk is EXACT only while (2p)^2 < 2^24; a
        # larger modulus would round products silently — and the CRT
        # held-out verifier could NOT catch it (the same wrong f32
        # arithmetic runs for every prime), so this must be a hard error
        raise ValueError(
            f"perman_core_mod: p={p} outside [3, {PRIME_CEIL}] — lazy "
            f"residue products must stay exact f32 integers")
    if n == 0:
        return 1 % p
    if n == 1:
        return int(core[0][0]) % p
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    am = reduce_core_mod(core, p)
    n_pad = gray.pad_n(n)
    x0v, cols, colst = pack_mod(am, p, n_pad)
    if r is None:
        plan = gray.make_plan(n, lanes=lanes, df=True)
        r = min(plan.r, _R_CAP)      # one block must fit the watchdog cap
        lanes = plan.lanes
    if ids is None:
        ids = np.arange(1 << max(0, n - 1 - r), dtype=np.int64)
    elif len(ids) == 0:
        return 0          # every chunk carries a zero row: per == 0
    from ..parallel.sharding import pad_ids
    # lane width must come from a SMALL closed set: each distinct L is a
    # fresh Mosaic compile (~60 s) and non-128-multiple lane dims risk
    # relayout/rejection on the axon compiler — round a sub-`lanes` live
    # set up to the next power of two (floor 128 on a real TPU) instead
    # of using the raw live count (round-3 advisor finding)
    L = min(lanes, max(1, 1 << (len(ids) - 1).bit_length()))
    if not interpret:
        L = min(lanes, max(L, 128))
    ids_blocks = pad_ids(np.asarray(ids, dtype=np.int64).astype(np.int32),
                         L, 1,
                         block_multiple=32 if len(ids) >= 32 else 1)
    total = mod_partials(ids_blocks, x0v, cols, colst, p,
                         n=n, n_pad=n_pad, r=int(r), interpret=interpret)
    acc = int(round(total)) % p
    acc = (2 * acc) % p
    if not (n & 1):
        acc = (-acc) % p
    return acc


def perman_core_glynn_mod(core, p: int, *, lanes: int = 512,
                          interpret=None) -> int:
    """per(core) mod p via the GLYNN identity — the TPU algo2 engine.

    Same compiled kernel, same compile shapes as perman_core_mod (see
    pack_glynn_mod): only the host packing and the final 2^(1-n) scale
    differ.  Glynn has no zero-structure pruning (y_j vanishes only by
    cancellation), so the walk is always dense — use it as the
    second-algorithm CHECK at one fresh prime of an NW-CRT-certified
    integer (tools/exact_known.py --reverify does this on the host;
    this is the TPU tier for cores past the CPU Glynn frontier, e.g.
    will57's n=49 core at 2^48 iters).
    """
    n = len(core)
    if p > PRIME_CEIL or p < 3:
        raise ValueError(
            f"perman_core_glynn_mod: p={p} outside [3, {PRIME_CEIL}] — "
            f"lazy residue products must stay exact f32 integers")
    if n == 0:
        return 1 % p
    if n == 1:
        return int(core[0][0]) % p
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    am = reduce_core_mod(core, p)
    n_pad = gray.pad_n(n)
    y0v, cols, colst = pack_glynn_mod(am, p, n_pad)
    plan = gray.make_plan(n, lanes=lanes, df=True)
    r = min(plan.r, _R_CAP)
    lanes = plan.lanes
    ids = np.arange(1 << max(0, n - 1 - r), dtype=np.int64)
    from ..parallel.sharding import pad_ids
    L = min(lanes, max(1, 1 << (len(ids) - 1).bit_length()))
    if not interpret:
        L = min(lanes, max(L, 128))
    ids_blocks = pad_ids(ids.astype(np.int32), L, 1,
                         block_multiple=32 if len(ids) >= 32 else 1)
    total = mod_partials(ids_blocks, y0v, cols, colst, p,
                         n=n, n_pad=n_pad, r=int(r), interpret=interpret)
    acc = int(round(total)) % p
    return acc * pow((p + 1) // 2, n - 1, p) % p


def _doubled_object(core) -> np.ndarray:
    """(n, n) object ndarray of 2*entry — doubled so the half-integer
    walk values x = a[:,n-1] - rowsum/2 become exact bigints."""
    n = len(core)
    a2 = np.empty((n, n), dtype=object)
    for i, row in enumerate(core):
        for j, v in enumerate(row):
            a2[i, j] = 2 * int(v)
    return a2


def _live_exact(a2: np.ndarray, r: int):
    """Exact-bigint twin of pruning._live_for: live chunk ids at chunk
    length 2**r, with every x_z(base) == 0 test in integer arithmetic.

    pruning.py's f64 zero test is exact for half-integer walks whose
    sums fit the 53-bit mantissa; d2-folded or dyadic-lifted cores can
    exceed that (cage5_c2 lifts to 57-bit entries), where a rounded
    zero test would silently drop NONZERO terms — fatal for an exact
    engine.  Scoring may approximate; THIS mask may not.
    """
    from .pruning import const_rows, inverse_gray
    n = a2.shape[0]
    m = n - 1 - r
    if m < 1:
        return None
    support = np.vectorize(bool)(a2)
    cr = const_rows(support, r)
    if len(cr) == 0:
        return None
    from .pruning import _PAT_SUPPORT_CAP
    dead = None
    for z in cr:
        cols = np.nonzero(support[z, : n - 1])[0]
        if len(cols) > _PAT_SUPPORT_CAP:
            continue     # 2^support bigint pattern: skip = under-prune
        x0_2 = a2[z, n - 1] - sum(a2[z]) // 2       # doubled x0, exact
        pat = [x0_2]
        for j in cols:
            v = a2[z, j]
            pat = pat + [pv + v for pv in pat]
        zpat = np.array([pv == 0 for pv in pat], dtype=bool)
        if not zpat.any():
            continue
        if dead is None:
            dead = np.zeros((2,) * m, dtype=bool)
        bits = cols - r
        shape = [1] * m
        for j in bits:
            shape[m - 1 - j] = 2
        dead |= zpat.reshape(shape)
    if dead is None:
        return None
    g_live = np.nonzero(~dead.ravel())[0].astype(np.uint64)
    ids = inverse_gray(g_live, m).astype(np.int64)
    ids.sort()
    return ids


def _score_float(core) -> np.ndarray:
    """Magnitude-clipped f64 image of a bigint core — for ORDERING and
    cost scoring only (zero pattern preserved; values approximate)."""
    def f(v):
        try:
            x = float(v)
        except OverflowError:
            x = math.inf if v > 0 else -math.inf
        if not np.isfinite(x):
            x = math.copysign(1e300, x)
        return x
    return np.asarray([[f(v) for v in row] for row in core],
                      dtype=np.float64)


def core_fingerprint(core) -> str:
    """Content hash of a bigint core: keys the plan cache and stamps CRT
    checkpoint rows (a stale checkpoint from ANOTHER matrix would pass
    the held-out verifier — its residues are self-consistent — so the
    rows must be bound to the exact core they were walked for)."""
    import hashlib
    h = hashlib.sha256()
    h.update(str(len(core)).encode())
    for row in core:
        for v in row:
            h.update(b"," + str(int(v)).encode())
        h.update(b";")
    return h.hexdigest()[:16]


#: fingerprint -> core_plan result; planning a big core costs seconds to
#: minutes of host bigint work (_live_exact over up to 2^26-entry gray
#: masks), and cost ESTIMATES need the same plan the real run uses —
#: the cache makes estimate + run plan exactly once
_PLAN_CACHE: dict = {}


def core_plan(core, *, lanes: int = 512):
    """Pruned live-chunk plan for a bigint core.

    Plan CHOICE (column order, r) comes from the engine's measured-cost
    planner on a float image; the live-id mask is then recomputed in
    exact bigint arithmetic (_live_exact).  r is capped at _R_CAP so one
    block (the indivisible launch unit) stays under the device watchdog.
    Returns (col_perm, ids, r, live_frac) or None (use the dense index
    space).  Results are cached by core fingerprint.
    """
    from .pruning import plan_sparse
    key = (core_fingerprint(core), lanes)
    if key in _PLAN_CACHE:
        return _PLAN_CACHE[key]
    sp = plan_sparse(_score_float(core), chunk_log2=None, df=True,
                     allow_factor=False, giters=MOD_GITERS / 1e9,
                     max_r=_R_CAP)
    out = None
    if sp is not None:
        a2 = _doubled_object(core)[:, sp.col_perm]
        ids = _live_exact(a2, sp.r)
        if ids is not None:
            n = len(core)
            live_frac = len(ids) / (1 << (n - 1 - sp.r))
            out = (sp.col_perm, ids, sp.r, live_frac)
    if len(_PLAN_CACHE) >= 16:
        _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    _PLAN_CACHE[key] = out
    return out


def tpu_cost_estimate(core, bound_bits: float) -> float:
    """Rough seconds for the full CRT run of this core on one chip."""
    n = len(core)
    nprimes = max(1, math.ceil(bound_bits / math.log2(PRIME_CEIL))) + 1
    pl_ = core_plan(core)
    live = (1 << max(0, n - 1)) if pl_ is None else (len(pl_[1]) << pl_[2])
    return nprimes * live / MOD_GITERS


def crt_perman_core(core, *, lanes: int = 512, interpret=None,
                    log=None, checkpoint_path=None, backend: str = "tpu",
                    threads: int = 0):
    """EXACT ``per(core)`` of a bigint core, CRT over TPU Z_p walks.

    backend="native" runs the SAME plan/CRT/verifier/checkpoint pipeline
    with the native CPU engine's 61-bit Montgomery walks
    (sup_perman_mod_pruned) instead of the 11-bit TPU lazy-residue
    kernel: ~5.5x fewer walks per bound bit, no Mosaic compiles — the
    exactness path when no TPU is attached (chesapeake-class cores are
    ~2 h on one host core with the pruned plan vs ~2 CPU-days dense).

    The integer twin of ops/exact.perman_exact_fraction's native_mod
    backend, for cores past the single-core CPU frontier (n ~ 33):
    residues come from `perman_core_mod` (<=11-bit primes, lazy-residue
    f32 VPU walks),
    the live-chunk plan is computed ONCE in exact bigint arithmetic and
    shared by every prime, and a held-out verification prime certifies
    the reconstruction end to end — a kernel or CRT bug cannot return
    silently.  Returns ``(per, meta)``.

    checkpoint_path: optional JSONL of ``{"p": .., "res": .., "fp": ..}``
    rows — per-prime residues survive an axon worker crash mid-run
    (will57's core walks for hours; the worker dies on bad days,
    CLAUDE.md), and a restarted run recomputes only the missing primes.
    Every row is stamped with the core's fingerprint and rows for a
    DIFFERENT core are ignored on load: a stale checkpoint would
    otherwise pass the held-out verifier (its residues are mutually
    consistent with the OLD core) and return the wrong matrix's
    permanent as certified-exact.
    """
    import json
    import os
    from .exact import _is_prime_u64, _log2_bound, _PRIME_CEIL
    t0 = time.perf_counter()
    n = len(core)
    fp = core_fingerprint(core)
    bits = _log2_bound(core) + 3
    if backend == "tpu":
        ceil_p = PRIME_CEIL
    else:
        # IFMA hosts take <2^50 primes so every walk dispatches onto the
        # 8-lane AVX-512 lazy-residue path (bindings.native.cpu_ifma):
        # ~20% more primes per CRT bit for ~10x walk throughput
        from ..bindings.native import cpu_ifma
        ceil_p = ((1 << 50) - 1) if cpu_ifma() else _PRIME_CEIL
    need_primes, cov, c = [], 0.0, ceil_p
    while cov < bits or not need_primes:
        while not _is_prime_u64(c):
            c -= 2
        need_primes.append(c)
        cov += math.log2(c)
        c -= 2
    while not _is_prime_u64(c):
        c -= 2
    verifier = c
    known = {}
    if checkpoint_path and os.path.exists(checkpoint_path):
        stale = 0
        for line in open(checkpoint_path):
            row = json.loads(line)
            if row.get("fp") == fp:
                known[int(row["p"])] = int(row["res"])
            else:
                stale += 1
        if stale and log:
            log(f"tpu_mod: ignoring {stale} checkpoint rows from a "
                f"different core (fingerprint mismatch)")
    plan = core_plan(core, lanes=lanes)
    if plan is not None:
        col_perm, ids, r, live_frac = plan
        work = [[core[i][j] for j in col_perm] for i in range(n)]
    else:
        work, ids, r, live_frac = core, None, None, 1.0
    if backend != "tpu":
        from ..bindings.native import perman_mod_batch, perman_mod_pruned

        def _residue(p):
            am = np.asarray([[int(v) % p for v in row] for row in work],
                            dtype=np.uint64)
            if ids is None:
                if n >= 10:
                    # dense index space as 64 synthetic chunks: the
                    # chunked walk dispatches onto the IFMA lanes (and
                    # spreads over host threads), the one-shot batch
                    # walk does neither
                    r_d = n - 1 - 6
                    dense_ids = np.arange(64, dtype=np.int64)
                    return perman_mod_pruned(am, p, dense_ids, r_d,
                                             threads)
                return int(perman_mod_batch(
                    am[None], np.asarray([p], np.uint64), threads)[0])
            return perman_mod_pruned(am, p, ids, r, threads)
    else:
        def _residue(p):
            return perman_core_mod(work, p, ids=ids, r=r,
                                   lanes=lanes, interpret=interpret)
    residues = []
    for i, p in enumerate(need_primes + [verifier]):
        if p in known:
            residues.append(known[p])
            continue
        residues.append(_residue(p))
        if checkpoint_path:
            with open(checkpoint_path, "a") as f:
                f.write(json.dumps({"p": p, "res": residues[-1],
                                    "fp": fp}) + "\n")
        if log:
            log(f"{'tpu' if backend == 'tpu' else 'native'}_mod: prime "
                f"{i + 1}/{len(need_primes) + 1} "
                f"(p={p}) done at {time.perf_counter() - t0:.1f}s")
    X, P = 0, 1
    for rr, p in zip(residues[:-1], need_primes):
        t = (rr - X) * pow(P, -1, p) % p
        X += P * t
        P *= p
    if X > P // 2:
        X -= P
    if X % verifier != residues[-1]:
        raise AssertionError(
            f"{backend} CRT verification prime mismatch — modular walk "
            f"or reconstruction is broken")
    meta = {"engine": "tpu_mod" if backend == "tpu" else "native_mod_crt",
            "nprimes": len(need_primes),
            "bound_bits": round(bits, 1), "live_frac": live_frac,
            "r": r, "wall_s": time.perf_counter() - t0}
    return X, meta
