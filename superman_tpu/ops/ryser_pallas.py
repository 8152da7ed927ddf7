"""TPU Pallas kernel for the exact Gray-code Ryser permanent.

Design (TPU-first, not a CUDA translation): the reference tunes one CUDA
kernel across five memory placements (gpu_exact_dense.cu kernels
xglobal/xlocal/xshared/...); on TPU there is one placement that matters —
matrix columns and per-lane x-vectors live in VMEM/vregs, and the Gray walk
is vectorized across 8x128 VPU lanes.  Each lane owns one aligned chunk of
2**r subset indices; chunk alignment makes the flipped column k = ctz(m)
identical across lanes at every inner step m (see ops/gray.py), so the hot
loop is pure vector arithmetic:

    x (+)= s * col_k          # (n_pad, L) fused update
    prod = tree_prod(x)       # log-depth product over the n axis
    acc (+)= (-1)^m * prod

Calc modes:
  f32  — raw f32 (reference's calculation_half_precision, flags.h -h)
  df64 — compensated f32-pair product/accumulator over an f32 x-vector;
         matches the reference default (double accumulation over a float
         x-vector, algo.h:664-746) to ~2^-48 relative.
An `exact_storage` flag marks matrices whose values and half-integer x are
exact in f32 (int suites): their x-updates stay plain f32 (exact), which is
the common fast case.

Measured negative result (do not re-try without new evidence): a sparse
"split-product" variant — caching the tail half's product Q per 16-step
block when columns 0..3 only touch head rows, so each static step re-does
only the head tree — is SLOWER (0.76 s vs 0.48 s, n=32 df64).  The df64
tree cost is dominated by its ~log2(n_pad) df_mul LEVELS (each ~1
vreg-op regardless of row count), not by rows, and the extra Q-multiply
lengthens the per-step dependency chain, which is the actual limiter
(dependent-chain probe: single-chain f32 FMA runs at ~0.1 Tflop/s vs
~0.65 Tflop/s with 16 independent chains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64
from . import tf96 as tfm
from .df64 import tree_prod_f32, tree_prod_df64


_I32 = jnp.int32

#: amp-walk within-line clamp: |x| below 2^-45 (at the unit row scale)
#: reads as 2^-45, so per-line condition saturates at 2^45.  The amp
#: walk maintains x as a df64 PAIR (resolution ~2^-48 * row amplitude)
#: exactly so crossings are resolved this far; conditions beyond 2^45
#: put every float tier's bound at >= 2^-3 relative — "no correct
#: digits" is already the honest report there, saturated or not.
_AMP_EPS = 2.0 ** -45


def _amp_terms(xhi):
    """(|prod x|, conditioned term) for one step of the amp walk.

    The conditioned term sum_i prod_{j!=i} |x_j| (clamped) is the
    per-term weight of the walk's WITHIN-LINE rounding error: an x_i
    that passes near zero mid-walk divides its carried absolute error
    (~row-amplitude * 2^-mantissa) by |x_i|, which the plain amplitude
    sum_m |prod| cannot see (measured: pores_1_r, round-4 real suite —
    the amp model under-predicted the df64 walk's true error by ~2^27).
    Computed as prod(max(|x|, eps)) * sum(1/max(|x|, eps)) so a line AT
    zero still contributes its prod_{j!=i} term (the error term that
    remains when the true term vanishes).  Identity padding rows
    (x == 1) overcount the sum by (n_pad - rows) — conservative, <= 2x.
    xhi is the hi word of the pair-x walk (lo <= ulp(hi), irrelevant at
    the ~2-bit accuracy an amplitude needs).
    """
    ax = jnp.abs(xhi)
    axc = jnp.maximum(ax, jnp.float32(_AMP_EPS))
    phi = tree_prod_f32(ax)
    phic = tree_prod_f32(axc)
    sinv = jnp.sum(jnp.float32(1.0) / axc, axis=0, keepdims=True)
    return phi, phic * sinv


def _ctz(m):
    """Count trailing zeros of a positive int32 scalar (< 2**31) via mask
    tests on the isolated lowest bit.  Every constant is an explicit int32:
    weak-typed scalars inside Mosaic kernels trigger an infinite promotion
    recursion at lowering time (observed with jax 0.9.0)."""
    t = m & (-m)
    k = jnp.where((t & _I32(0x2AAAAAAA)) != _I32(0), _I32(1), _I32(0))
    k = k + jnp.where((t & _I32(0x4CCCCCCC)) != _I32(0), _I32(2), _I32(0))
    k = k + jnp.where((t & _I32(0x70F0F0F0)) != _I32(0), _I32(4), _I32(0))
    k = k + jnp.where((t & _I32(0x7F00FF00)) != _I32(0), _I32(8), _I32(0))
    k = k + jnp.where((t & _I32(0x7FFF0000)) != _I32(0), _I32(16), _I32(0))
    return k


def _walk_scalar(r, xhi0, xlo0, smid, colst_hi, colst_lo, *, df: bool,
                 exact_storage: bool, kahan: bool = False,
                 tf: bool = False, amp: bool = False):
    """Scalar (per-step ctz) walk over one (n_pad, L) lane block;
    returns the (8, L) f32 output rows.  Bitwise-identical op sequence
    to the unrolled walk; interpret mode uses this body.

    amp: accumulate |prod| with every term sign dropped — the EXACT
    Ryser cancellation amplitude sum_m |prod_i x_i(m)| — plus the
    within-line conditioned amplitude (_amp_terms) in output rows 2/3.
    The sampled probe (drivers/runner._amp_probe_log2) underestimates
    heavy-tailed term distributions by 50+ bits (measured: pores_1_r,
    SUITE_REPORT_REAL round 4); this walk measures both statistics
    exactly, so calc="auto"'s self-reported error bounds stay honest.
    x rides as a df64 pair (to resolve near-zero crossings to the
    clamp, see _AMP_EPS); products/accumulators stay f32+Kahan — an
    amplitude needs ~2 correct bits, not 48."""
    if amp:
        assert not df and not tf, "amp walk is f32/f32k only"
    n_pad, L = xhi0.shape
    nb_pad = colst_hi.shape[1]
    lane_k = lax.broadcasted_iota(jnp.int32, (n_pad, nb_pad), 1)

    def prod_term(xhi, xlo):
        if tf:
            return tfm.tree_prod_tf96(xhi)
        if not df:
            return tree_prod_f32(xhi), None
        if exact_storage:
            return tree_prod_df64(xhi)
        return df64.tree_prod_full_df(xhi, xlo)

    # m = 0 term: base index is even -> sign +1
    if tf:
        acc = prod_term(xhi0, xlo0)          # 3-word triple
    elif amp:
        phi, cond = _amp_terms(xhi0)
        acc = (phi, jnp.zeros_like(phi), cond, jnp.zeros_like(cond))
    else:
        phi, plo = prod_term(xhi0, xlo0)
        acc = (phi, plo if df else jnp.zeros_like(phi))

    def body(m, carry):
        xhi, xlo, *acc = carry
        k = _ctz(m)
        s_scalar = jnp.where(((m >> (k + _I32(1))) & _I32(1)) == _I32(0),
                             jnp.float32(1), jnp.float32(-1))
        # sign diverges per lane only at the mid step (k == r-1, where
        # s_scalar is always +1 and the true sign is the chunk parity)
        s_row = jnp.where(k == r - _I32(1), smid, s_scalar)   # (1, L)
        sel = (lane_k == k).astype(jnp.float32)
        ck_hi = jnp.sum(colst_hi * sel, axis=1, keepdims=True)  # (n_pad, 1)
        if (df or amp) and not exact_storage:
            ck_lo = jnp.sum(colst_lo * sel, axis=1, keepdims=True)
            xhi, xlo = df64.df_add(xhi, xlo, ck_hi * s_row, ck_lo * s_row)
        else:
            xhi = xhi + ck_hi * s_row
        sign_m = jnp.where((m & _I32(1)) == _I32(0),
                           jnp.float32(1), jnp.float32(-1))
        if tf:
            t0, t1, t2 = prod_term(xhi, xlo)
            acc = tfm.tf_add(*acc, t0 * sign_m, t1 * sign_m, t2 * sign_m)
        elif amp:
            phi, cond = _amp_terms(xhi)
            ahi, e = df64.two_sum(acc[0], phi)
            chi, e2 = df64.two_sum(acc[2], cond)
            acc = (ahi, acc[1] + e, chi, acc[3] + e2)
        else:
            phi, plo = prod_term(xhi, xlo)
            acc_hi, acc_lo = acc
            if df:
                acc_hi, acc_lo = df64.df_add(acc_hi, acc_lo,
                                             phi * sign_m, plo * sign_m)
            elif kahan:
                acc_hi, e = df64.two_sum(acc_hi, phi * sign_m)
                acc_lo = acc_lo + e
            else:
                acc_hi = acc_hi + phi * sign_m
            acc = (acc_hi, acc_lo)
        return (xhi, xlo, *acc)

    # int32 loop bounds: Mosaic has no int64, and x64 mode would otherwise
    # make the induction variable 64-bit
    out = lax.fori_loop(
        _I32(1), _I32(1) << r, body, (xhi0, xlo0, *acc))
    acc = out[2:]

    pad = jnp.zeros((8 - len(acc), L), dtype=jnp.float32)
    return jnp.concatenate([*acc, pad], axis=0)


def _ryser_kernel(r_ref, xhi_ref, xlo_ref, smid_ref, colsthi_ref,
                  colstlo_ref, out_ref, *, df: bool, exact_storage: bool,
                  kahan: bool = False, tf: bool = False,
                  amp: bool = False):
    """tf: triple-float (tf96) products + accumulation; requires
    exact_storage (f32-exact x updates)."""
    full_df = (df or amp) and not exact_storage
    xhi0 = xhi_ref[:]
    xlo0 = xlo_ref[:] if full_df else jnp.zeros_like(xhi0)
    out_ref[:] = _walk_scalar(
        r_ref[0], xhi0, xlo0, smid_ref[:], colsthi_ref[:],
        colstlo_ref[:] if full_df else None,
        df=df, exact_storage=exact_storage, kahan=kahan, tf=tf, amp=amp)


# Unrolled inner blocks: within an aligned block of U = 2**u steps
# m = U*b + j, the flipped column k = ctz(m) and both signs are
# compile-time constants for every j except j = U/2 (sign = parity of b,
# a scalar) and j = U (column k = u + ctz(b+1), the only dynamically
# selected column).  The per-step ctz chain, column select, and loop
# overhead of the scalar kernel all collapse to once per U steps.
# Static table entries (j, k, x-sign); x-sign(j,k) = +1 iff
# bit_{k+1}(j) == 0 (sign 0 marks the dynamic-parity step); the term
# sign is (-1)^j.


@functools.lru_cache(maxsize=None)
def _static_table(u: int):
    steps = []
    for j in range(1, 1 << u):
        k = (j & -j).bit_length() - 1
        if k == u - 1:
            steps.append((j, k, 0))          # sign = parity of b
        else:
            steps.append((j, k,
                          +1 if ((j >> (k + 1)) & 1) == 0 else -1))
    return tuple(steps)


def _walk_u16(r, xhi0, xlo0, smid, colst_hi, colst_lo, *, df: bool,
              exact_storage: bool, kahan: bool = False,
              tf: bool = False, u: int = 4, amp: bool = False):
    """Unrolled walk over one (n_pad, L) lane block; u = log2 of the
    unroll factor (requires the runtime r >= u+1 so the mid step lands
    on a j = 2**u boundary).  Returns the (8, L) f32 output rows.
    r is a RUNTIME scalar: the axon remote Mosaic compiler cannot persist
    executables across processes, so one compiled kernel must serve every
    chunk size (the compile key is (n_pad, L, B, df, exact_storage,
    kahan, u, amp)).  amp: |prod| accumulation — see _walk_scalar."""
    if amp:
        assert not df and not tf, "amp walk is f32/f32k only"
    n_pad, L = xhi0.shape
    nb_pad = colst_hi.shape[1]
    full_df = (df or amp) and not exact_storage
    lane_k = lax.broadcasted_iota(jnp.int32, (n_pad, nb_pad), 1)

    # static columns k = 0..u-1 as (n_pad, 1) slices
    chi = [colst_hi[:, k:k + 1] for k in range(u)]
    clo = [colst_lo[:, k:k + 1] if full_df else None for k in range(u)]

    def prod_term(xhi, xlo):
        if tf:
            return tfm.tree_prod_tf96(xhi)
        if amp:
            return _amp_terms(xhi)
        if not df:
            return tree_prod_f32(xhi), None
        if exact_storage:
            return tree_prod_df64(xhi)
        return df64.tree_prod_full_df(xhi, xlo)

    def upd_static(xhi, xlo, k, pos):
        if full_df:
            return df64.df_add(xhi, xlo,
                               chi[k] if pos else -chi[k],
                               clo[k] if pos else -clo[k])
        return (xhi + chi[k]) if pos else (xhi - chi[k]), xlo

    def upd_dyn(xhi, xlo, ck_hi, ck_lo, s):
        if full_df:
            return df64.df_add(xhi, xlo, ck_hi * s, ck_lo * s)
        return xhi + ck_hi * s, xlo

    def acc_add(acc, term, pos):
        if tf:
            t0, t1, t2 = term
            if not pos:
                t0, t1, t2 = -t0, -t1, -t2
            return tfm.tf_add(*acc, t0, t1, t2)
        if amp:
            phi, cond = term
            ahi, e = df64.two_sum(acc[0], phi)
            chi, e2 = df64.two_sum(acc[2], cond)
            return (ahi, acc[1] + e, chi, acc[3] + e2)
        phi, plo = term
        acc_hi, acc_lo = acc
        if df:
            return df64.df_add(acc_hi, acc_lo,
                               phi if pos else -phi,
                               plo if pos else -plo)
        if kahan:
            hi, e = df64.two_sum(acc_hi, phi if pos else -phi)
            return hi, acc_lo + e
        return acc_hi + (phi if pos else -phi), acc_lo

    # K rotating accumulators (K=1 -> the classic single chain).
    # Negative result (measured, do not re-try blindly): K=4 left df64
    # UNCHANGED (the tree's dependent levels, not the acc chain, are the
    # critical path), gained only ~5-8% on f32/f32k, and degraded df64
    # end accuracy 17x (1.4e-10 -> 2.5e-9) by regrouping the compensated
    # sums — a bad trade, so K stays 1.
    K = 1

    def static_steps(carry, b_parity_pos):
        """The 2**u - 1 static steps of a block; b_parity_pos is the
        (possibly traced) +/-1 sign of the j = 2**(u-1) update."""
        xhi, xlo, accs = carry
        accs = list(accs)
        for idx, (j, k, sgn) in enumerate(_static_table(u)):
            if sgn == 0:     # j == 2**(u-1): sign is the block parity
                ck = chi[u - 1] * b_parity_pos
                cl = clo[u - 1] * b_parity_pos if full_df else None
                xhi, xlo = upd_dyn(xhi, xlo, ck, cl, jnp.float32(1))
            else:
                xhi, xlo = upd_static(xhi, xlo, k, sgn > 0)
            slot = idx % K
            accs[slot] = acc_add(accs[slot], prod_term(xhi, xlo),
                                 (j & 1) == 0)
        return xhi, xlo, tuple(accs)

    # m = 0 term: base index is even -> sign +1
    if tf:
        acc0 = prod_term(xhi0, xlo0)
    elif amp:
        phi, cond = prod_term(xhi0, xlo0)
        acc0 = (phi, jnp.zeros_like(phi), cond, jnp.zeros_like(cond))
    else:
        phi, plo = prod_term(xhi0, xlo0)
        acc0 = (phi, plo if df else jnp.zeros_like(phi))
    zero_acc = tuple(jnp.zeros_like(a) for a in acc0)
    accs0 = (acc0,) + (zero_acc,) * (K - 1)

    nb = _I32(1) << (r - _I32(u))            # 2**u-step blocks per chunk

    def block(b, carry):
        s8 = jnp.where((b & _I32(1)) == _I32(0),
                       jnp.float32(1), jnp.float32(-1))
        xhi, xlo, accs = static_steps(carry, s8)
        # j = 2**u: column k = u + ctz(b+1), the only dynamic select
        q = b + _I32(1)
        c = _ctz(q)
        k16 = c + _I32(u)
        s16 = jnp.where(((q >> (c + _I32(1))) & _I32(1)) == _I32(0),
                        jnp.float32(1), jnp.float32(-1))
        s_row = jnp.where(k16 == r - _I32(1), smid, s16)     # (1, L)
        sel = (lane_k == k16).astype(jnp.float32)
        ck_hi = jnp.sum(colst_hi * sel, axis=1, keepdims=True)
        ck_lo = (jnp.sum(colst_lo * sel, axis=1, keepdims=True)
                 if full_df else None)
        xhi, xlo = upd_dyn(xhi, xlo,
                           ck_hi * s_row,
                           ck_lo * s_row if full_df else None,
                           jnp.float32(1))
        accs = list(accs)
        slot = ((1 << u) - 1) % K
        accs[slot] = acc_add(accs[slot], prod_term(xhi, xlo), True)
        return xhi, xlo, tuple(accs)

    carry = lax.fori_loop(_I32(0), nb - _I32(1), block,
                          (xhi0, xlo0, accs0))
    # final block: static steps only (m = 2**r belongs to the next
    # chunk); its mid-step parity is the parity of nb-1
    s8_last = jnp.where(((nb - _I32(1)) & _I32(1)) == _I32(0),
                        jnp.float32(1), jnp.float32(-1))
    _, _, accs = static_steps(carry, s8_last)

    # merge the K accumulators (log-depth, compensated)
    accs = list(accs)
    while len(accs) > 1:
        merged = []
        for i in range(0, len(accs) - 1, 2):
            a, b = accs[i], accs[i + 1]
            if tf:
                merged.append(tfm.tf_add(*a, *b))
            elif df:
                merged.append(df64.df_add(a[0], a[1], b[0], b[1]))
            elif kahan:
                hi, e = df64.two_sum(a[0], b[0])
                merged.append((hi, a[1] + b[1] + e))
            else:
                merged.append((a[0] + b[0], a[1]))
        if len(accs) % 2:
            merged.append(accs[-1])
        accs = merged
    acc = accs[0]

    pad = jnp.zeros((8 - len(acc), L), dtype=jnp.float32)
    return jnp.concatenate([*acc, pad], axis=0)


def _ryser_kernel_u16(r_ref, xhi_ref, xlo_ref, smid_ref, colsthi_ref,
                      colstlo_ref, out_ref, *, df: bool,
                      exact_storage: bool, kahan: bool = False,
                      tf: bool = False, u: int = 4, amp: bool = False):
    """Single-block unrolled kernel: one (n_pad, L) walk per program."""
    full_df = (df or amp) and not exact_storage
    xhi0 = xhi_ref[:]
    xlo0 = xlo_ref[:] if full_df else jnp.zeros_like(xhi0)
    out_ref[:] = _walk_u16(
        r_ref[0], xhi0, xlo0, smid_ref[:], colsthi_ref[:],
        colstlo_ref[:] if full_df else None,
        df=df, exact_storage=exact_storage, kahan=kahan, tf=tf, u=u,
        amp=amp)


def _ryser_kernel_u16_multi(r_ref, xhi_ref, xlo_ref, smid_ref,
                            colsthi_ref, colstlo_ref, out_ref, *,
                            df: bool, exact_storage: bool,
                            kahan: bool = False, tf: bool = False,
                            u: int = 4, amp: bool = False):
    """Multi-block kernel: KB lane blocks walked by ONE program via an
    internal fori_loop.  Per-program launch overhead is ~0.5 ms at
    L=512 (measured: n=32 r=16 B=64 costs 33 ms over B=1), which
    dominates short-chunk (pruned sparse) launches; KB=32 amortizes it
    ~32x.  VMEM holds all KB blocks (~5 MB at KB=32, n_pad=40, L=512)."""
    KB = xhi_ref.shape[0]
    full_df = (df or amp) and not exact_storage
    colst_hi = colsthi_ref[:]
    colst_lo = colstlo_ref[:] if full_df else None

    def body(b, carry):
        xhi0 = xhi_ref[b]
        xlo0 = xlo_ref[b] if full_df else jnp.zeros_like(xhi0)
        out_ref[b] = _walk_u16(
            r_ref[0], xhi0, xlo0, smid_ref[b], colst_hi, colst_lo,
            df=df, exact_storage=exact_storage, kahan=kahan, tf=tf, u=u,
            amp=amp)
        return carry

    lax.fori_loop(_I32(0), _I32(KB), body, _I32(0))


def _ryser_kernel_batch(r_ref, xhi_ref, xlo_ref, smid_ref, cth_ref,
                        ctl_ref, out_ref, *, df: bool, exact_storage: bool,
                        kahan: bool = False, tf: bool = False, u: int = 4,
                        use_u16: bool = True):
    """Serving-batch kernel: KB different MATRICES per program, each with
    its own column tables (cth_ref is (KB, n_pad, nb_pad)) and its own
    L lanes covering its whole index space.  The reference has no batch
    mode at all (one CLI process per matrix)."""
    KB = xhi_ref.shape[0]
    full_df = df and not exact_storage

    def body(b, carry):
        xhi0 = xhi_ref[b]
        xlo0 = xlo_ref[b] if full_df else jnp.zeros_like(xhi0)
        cth = cth_ref[b]
        ctl = ctl_ref[b] if full_df else None
        if use_u16:
            out_ref[b] = _walk_u16(r_ref[0], xhi0, xlo0, smid_ref[b],
                                   cth, ctl, df=df,
                                   exact_storage=exact_storage,
                                   kahan=kahan, tf=tf, u=u)
        else:
            out_ref[b] = _walk_scalar(r_ref[0], xhi0, xlo0, smid_ref[b],
                                      cth, ctl, df=df,
                                      exact_storage=exact_storage,
                                      kahan=kahan, tf=tf)
        return carry

    lax.fori_loop(_I32(0), _I32(KB), body, _I32(0))


def _merge_out8(a8, b8, *, df, kahan, tf):
    """Merge two (..., 8, L) kernel outputs lane-wise with the tier's
    compensated addition (same ops as the kernel's accumulator merge)."""
    if tf:
        s = tfm.tf_add(a8[..., 0, :], a8[..., 1, :], a8[..., 2, :],
                       b8[..., 0, :], b8[..., 1, :], b8[..., 2, :])
    elif df:
        s = df64.df_add(a8[..., 0, :], a8[..., 1, :],
                        b8[..., 0, :], b8[..., 1, :])
    elif kahan:
        hi, e = df64.two_sum(a8[..., 0, :], b8[..., 0, :])
        s = (hi, a8[..., 1, :] + b8[..., 1, :] + e)
    else:
        s = (a8[..., 0, :] + b8[..., 0, :],)
    rows = jnp.stack(s, axis=-2)
    pad = jnp.zeros(a8.shape[:-2] + (8 - rows.shape[-2],) + a8.shape[-1:],
                    dtype=a8.dtype)
    return jnp.concatenate([rows, pad], axis=-2)


def _weight_out8(o8, w_hi, w_lo, *, df, kahan, tf=False):
    """Multiply per-lane partial sums by per-lane df64 weights (the
    factored-out constant-row products of the sparse path).  tf96
    partials multiply by the df64 weight as a zero-extended triple —
    the weight's own 2^-48 error (nf chained df_muls) bounds the tier
    at ~1e-13, within its ~1e-12 suite contract."""
    if tf:
        t = tfm.tf_mul(o8[..., 0, :], o8[..., 1, :], o8[..., 2, :],
                       w_hi, w_lo, jnp.zeros_like(w_hi))
        rows = jnp.stack(t, axis=-2)
    elif df or kahan:
        hi, lo = df64.df_mul(o8[..., 0, :], o8[..., 1, :], w_hi, w_lo)
        rows = jnp.stack([hi, lo], axis=-2)
    else:
        rows = (o8[..., 0:1, :] * w_hi[..., None, :])
    pad = jnp.zeros(o8.shape[:-2] + (8 - rows.shape[-2],) + o8.shape[-1:],
                    dtype=o8.dtype)
    return jnp.concatenate([rows, pad], axis=-2)


@functools.partial(
    jax.jit,
    static_argnames=("use_u16", "df", "exact_storage", "kahan", "tf", "u",
                     "interpret", "weighted", "reduce", "allow_multi",
                     "amp"))
def _partials_jit(r_arr, xhi, xlo, smid, colst_hi, colst_lo, w_pair=None, *,
                  use_u16: bool, df: bool, exact_storage: bool,
                  kahan: bool, tf: bool, u: int, interpret: bool,
                  weighted: bool = False, reduce: bool = False,
                  allow_multi: bool = True, amp: bool = False):
    B, n_pad, L = xhi.shape
    flops_per = 2 * n_pad * (10 if df else 1)
    # Multi-block path: KB=32 blocks per program (internal fori_loop)
    # whenever the block count divides; the per-program launch overhead
    # (~0.5 ms at L=512, measured) would otherwise dominate short-chunk
    # pruned-sparse launches.  KB is part of the kernel, so only one
    # extra Mosaic compile exists beyond the single-block variant.
    KB = 32 if (allow_multi and use_u16 and B % 32 == 0
                and B >= 32) else 1
    if KB > 1:
        kern = functools.partial(_ryser_kernel_u16_multi, df=df,
                                 exact_storage=exact_storage,
                                 kahan=kahan, tf=tf, u=u, amp=amp)
    elif use_u16:
        kern = functools.partial(_ryser_kernel_u16, df=df,
                                 exact_storage=exact_storage,
                                 kahan=kahan, tf=tf, u=u, amp=amp)
    else:
        kern = functools.partial(_ryser_kernel, df=df,
                                 exact_storage=exact_storage, kahan=kahan,
                                 tf=tf, amp=amp)
    # One pallas program per (super-)block, sequenced with lax.map rather
    # than a pallas grid (the axon remote Mosaic compiler rejects gridded
    # kernels).  r rides in SMEM so the compile key is shape-only (the
    # cost estimate uses a nominal 2^16).
    out_sh = (KB, 8, L) if KB > 1 else (8, L)
    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_sh, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=KB * L * (1 << 16) * flops_per,
            bytes_accessed=KB * int(n_pad) * L * 4 * 3, transcendentals=0),
        interpret=interpret,
    )

    if KB > 1:
        G = B // KB

        def one_group(args):
            bxhi, bxlo, bsmid, bw = args
            out = call(r_arr, bxhi, bxlo, bsmid, colst_hi, colst_lo)
            if not reduce:
                return out
            # On-device post-processing (plain XLA ops, same compensated
            # arithmetic as the kernel): weight each lane's partial by its
            # chunk factor, then tree-reduce the KB blocks lane-wise.
            # This shrinks the device->host transfer from 32 B/chunk to
            # 32 B/(KB*L) chunks — the D2H link is the measured per-chunk
            # bottleneck (~0.9 us/chunk through the remote tunnel).
            if weighted:
                out = _weight_out8(out, bw[:, 0], bw[:, 1], df=df,
                                   kahan=kahan, tf=tf)
            k = KB
            while k > 1:
                k //= 2
                out = _merge_out8(out[:k], out[k:], df=df, kahan=kahan,
                                  tf=tf)
            return out[0]

        if weighted:
            w = w_pair.reshape(G, KB, 2, L)
        else:
            w = jnp.zeros((G, KB, 0, L), jnp.float32)   # unused
        out = lax.map(one_group, (xhi.reshape(G, KB, n_pad, L),
                                  xlo.reshape(G, KB, n_pad, L),
                                  smid.reshape(G, KB, 1, L), w))
        return out if reduce else out.reshape(B, 8, L)

    def one_block(args):
        bxhi, bxlo, bsmid = args
        return call(r_arr, bxhi, bxlo, bsmid, colst_hi, colst_lo)

    out = lax.map(one_block, (xhi, xlo, smid))
    if not reduce:
        return out
    # KB=1 (scalar-kernel / interpret) variant of the weighted reduce:
    # grouped 32 blocks at a time with the same halving tree as the
    # multi-block path, so CPU (interpret) and TPU runs regroup their
    # sums IDENTICALLY (reduce requires B % 32 == 0)
    if weighted:
        out = _weight_out8(out, w_pair[:, 0], w_pair[:, 1], df=df,
                           kahan=kahan, tf=tf)
    grp = out.reshape(B // 32, 32, 8, L)
    k = 32
    while k > 1:
        k //= 2
        grp = _merge_out8(grp[:, :k], grp[:, k:2 * k], df=df,
                          kahan=kahan, tf=tf)
    return grp[:, 0]


def ryser_partials(xhi, xlo, smid, colst_hi, colst_lo, *, r: int, df: bool,
                   exact_storage: bool, kahan: bool = False,
                   tf: bool = False, interpret: bool = False,
                   w_pair=None, reduce: bool = False, amp: bool = False):
    """Run the kernel over a block of chunks.

    xhi/xlo: (B, n_pad, L) initialized lane x-vectors (hi/lo pair)
    smid:    (B, 1, L) mid-step signs
    colst_*: (n_pad, nb_pad) matrix columns, transposed (lane k = column k)
    r:       log2 chunk length — a RUNTIME kernel argument; the compiled
             kernel is reused across all r (axon cannot persist Mosaic
             executables across processes, so shape-only compile keys
             matter a lot).
    w_pair:  optional (B, 2, L) f32 per-lane df64 chunk factors (the
             sparse path's factored-out constant-row products)
    reduce:  weight and tree-reduce on device, returning (G, 8, L) with
             one lane-row set per KB-block group (needs B % 32 == 0)
    returns  (B, 8, L) f32 — rows 0/1 the hi/lo partial-sum pair — or
             the reduced (G, 8, L).

    u16 and the scalar kernel execute the IDENTICAL op sequence per Gray
    term (add/sub vs mult-by-±1 are exact), so results are bitwise equal;
    interpret mode sticks to the scalar kernel because XLA:CPU compile
    time explodes on the unrolled body.
    """
    use_u16 = bool(r >= 5 and not interpret)
    # the 32-block kernel multiplies per-PROGRAM runtime by 32; a single
    # pallas program running >~2^33 Gray iters (~2 s df64) trips the
    # device watchdog and CRASHES the TPU worker (observed at n=40
    # r=22: 2^36 iters/program), so long chunks stay per-block
    L = xhi.shape[2]
    allow_multi = (r + int(np.log2(max(L, 1))) + 5) <= 33
    # unroll factor: biggest 2**u with u <= r-1 (mid-step constraint).
    # Measured on n=32: f32/f32k keep gaining up to 128-step blocks
    # (19.6 -> 27.4 G iters/s); df64 is compute-bound and flat, so it
    # keeps the small body (faster Mosaic compiles).
    full_df = (df or amp) and not exact_storage
    # full-df and tf bodies are the largest (pair/triple-product trees);
    # cap their unroll to keep Mosaic compile time reasonable
    u = min(4 if (full_df or tf) else (5 if df else 7), r - 1) \
        if use_u16 else 4
    r_arr = jnp.asarray([r], dtype=jnp.int32)
    weighted = w_pair is not None
    if weighted:
        w_pair = jnp.asarray(w_pair)
    return _partials_jit(r_arr, xhi, xlo, smid, colst_hi, colst_lo, w_pair,
                         use_u16=use_u16, df=df,
                         exact_storage=exact_storage, kahan=kahan, tf=tf,
                         u=u, interpret=interpret, weighted=weighted,
                         reduce=reduce, allow_multi=allow_multi, amp=amp)


@functools.partial(
    jax.jit,
    static_argnames=("df", "exact_storage", "kahan", "tf", "u", "use_u16",
                     "interpret"))
def batch_partials(r_arr, xhi, xlo, smid, cth, ctl, *, df: bool,
                   exact_storage: bool, kahan: bool = False,
                   tf: bool = False, u: int = 4, use_u16: bool = True,
                   interpret: bool = False):
    """Serving batch: B matrices, each walked by its own L lanes in one
    program group (KB matrices per pallas program), lane-reduced on
    device so the transfer is a few words per matrix.

    xhi/xlo/smid: (B, n_pad, L) / (B, 1, L) per-matrix lane state;
    cth/ctl:      (B, n_pad, nb_pad) per-matrix column tables.
    Returns (B, 8, 1) f32: the tier's compensated lane-sum words.
    """
    B, n_pad, L = xhi.shape
    nb_pad = cth.shape[2]
    KB = 16 if B % 16 == 0 and B >= 16 else 1
    kern = functools.partial(
        _ryser_kernel_batch, df=df, exact_storage=exact_storage,
        kahan=kahan, tf=tf, u=u, use_u16=use_u16)
    out_sh = (KB, 8, L)
    flops_per = 2 * n_pad * (10 if df else 1)
    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_sh, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=KB * L * (1 << 16) * flops_per,
            bytes_accessed=KB * int(n_pad) * L * 4 * 3,
            transcendentals=0),
        interpret=interpret,
    )

    def one_group(args):
        # lax.map strips the G axis, so each element already carries the
        # KB axis — (KB, n_pad, L) — for every KB including KB == 1.
        gxhi, gxlo, gsmid, gcth, gctl = args
        return call(r_arr, gxhi, gxlo, gsmid, gcth, gctl)

    G = B // KB
    out = lax.map(one_group, (xhi.reshape(G, KB, n_pad, L),
                              xlo.reshape(G, KB, n_pad, L),
                              smid.reshape(G, KB, 1, L),
                              cth.reshape(G, KB, n_pad, nb_pad),
                              ctl.reshape(G, KB, n_pad, nb_pad)))
    out = out.reshape(B, 8, L)
    # per-matrix lane reduction (compensated tree over the lane axis)
    while out.shape[-1] > 1:
        h = out.shape[-1] // 2
        out = _merge_out8(out[..., :h], out[..., h:], df=df, kahan=kahan,
                          tf=tf)
    return out
