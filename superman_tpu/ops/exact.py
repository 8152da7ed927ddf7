"""Exact permanent via modular CRT — the arbiter of last resort.

Every fixed-precision engine (f64, df64, tf96, the reference's
``__float128`` quad walks, main.cpp:141-167) computes the Ryser sum with
an error of ~``amp * 2^-mantissa`` where ``amp`` is the cancellation
amplitude ``sum_m |term_m| / |per|``.  Real matrices can push ``amp``
past 2^280 (measured: pores_1_r.mtx), where EVERY such engine returns
pure noise — the reference included (its double and quad runs disagree
with each other by factors of 40-1300 there and it reports them anyway).

This engine is immune by construction: an f64 matrix is exactly
``M / 2^k`` for an integer matrix M (dyadic rationals), and ``per(M)``
is computed EXACTLY as an integer via the Nijenhuis–Wilf walk in Z_p
over enough ~2^61 primes (native/perman_cpu.cpp:sup_perman_mod,
Montgomery form) + Chinese remaindering.  One extra held-out prime
verifies the reconstruction end to end, so a kernel bug cannot produce
a silently wrong value.  Cost: ``nprimes * 2^(n_core-1)`` modular
products — practical to n ~ 33 on one core.

Degree-1 lines are folded exactly in bigint arithmetic first (the same
reduction as prep/compression.d1compress, reference revised
util.h:1200, but without the f64 rounding its merges incur).

No reference counterpart: this is what the reference would need to be
correct on its own ``matrices/`` corpus.
"""

from __future__ import annotations

import math
import time
from fractions import Fraction
from typing import List, Optional, Tuple

import numpy as np

#: primes live just under 2^61: sums x + c < 2^62 stay clear of u64,
#: and ~61 bits/prime keeps the CRT prime count minimal
_PRIME_CEIL = (1 << 61) - 1

_SMALL_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)


def _is_prime_u64(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 2^64 (fixed witness set)."""
    if n < 2:
        return False
    for p in _SMALL_PRIMES:
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in _SMALL_PRIMES:
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def primes_desc(count: int, start: int = _PRIME_CEIL) -> List[int]:
    out, c = [], start | 1
    while len(out) < count:
        if _is_prime_u64(c):
            out.append(c)
        c -= 2
    return out


def dyadic_int_matrix(a: np.ndarray) -> Tuple[List[List[int]], int]:
    """Exact (M, k) with a == M / 2^k elementwise (f64s are dyadic)."""
    rows = []
    k = 0
    ratios = [[float(v).as_integer_ratio() for v in row]
              for row in np.asarray(a, dtype=np.float64).tolist()]
    for row in ratios:
        for _, den in row:
            k = max(k, den.bit_length() - 1)   # den is a power of two
    for row in ratios:
        rows.append([num << (k - (den.bit_length() - 1))
                     for num, den in row])
    return rows, k


def _fold_lines(m: List[List[int]]) -> Tuple[List[List[int]], int]:
    """Exactly fold degree-1 AND degree-2 lines: per(M) = mult * per(core).

    d1: a single-support line contributes its entry as a factor (the
    bigint twin of prep/compression.d1compress, reference revised
    util.h:1200).  d2: a 2-support row (entries a@j1, b@j2) folds by
    column multilinearity into one merged column a*col_j2 + b*col_j1
    (d2compress, revised util.h:1260) — exact here in bigints, where the
    reference's f64 merges round and concentrate magnitude (the very
    effect that makes its compressed walks cancellation-bound on e.g.
    d_ss.mtx; pinned in EXACT_KNOWN.jsonl).  Columns fold by transpose
    symmetry.  Entry bit-lengths grow under d2 merges; the CRT prime
    count scales with the bound, so exactness is never at risk.
    """
    mult = 1
    while m:
        n = len(m)
        deg_r = [sum(1 for v in row if v) for row in m]
        deg_c = [sum(1 for row in m if row[j]) for j in range(n)]
        if 0 in deg_r or 0 in deg_c:
            return [], 0                       # structural zero
        if 1 in deg_r:
            i = deg_r.index(1)
            j = next(jj for jj, v in enumerate(m[i]) if v)
        elif 1 in deg_c:
            j = deg_c.index(1)
            i = next(ii for ii in range(n) if m[ii][j])
        elif 2 in deg_r:
            i = deg_r.index(2)
            j1, j2 = (jj for jj, v in enumerate(m[i]) if v)
            a, b = m[i][j1], m[i][j2]
            m = [[v for jj, v in enumerate(row) if jj not in (j1, j2)]
                 + [a * row[j2] + b * row[j1]]
                 for ii, row in enumerate(m) if ii != i]
            continue
        elif 2 in deg_c:
            j = deg_c.index(2)
            i1, i2 = (ii for ii in range(n) if m[ii][j])
            a, b = m[i1][j], m[i2][j]
            merged = [a * v2 + b * v1 for v1, v2 in zip(
                (v for jj, v in enumerate(m[i1]) if jj != j),
                (v for jj, v in enumerate(m[i2]) if jj != j))]
            m = [[v for jj, v in enumerate(row) if jj != j]
                 for ii, row in enumerate(m) if ii not in (i1, i2)]
            m.append(merged)
            continue
        else:
            break
        mult *= m[i][j]
        m = [[v for jj, v in enumerate(row) if jj != j]
             for ii, row in enumerate(m) if ii != i]
    return m, mult


def _perman_bigint_dfs(m: List[List[int]]) -> int:
    """Exact DFS permanent on a small bigint matrix (host fallback)."""
    n = len(m)
    rows = [[(j, row[j]) for j in range(n) if row[j]] for row in m]
    order = sorted(range(n), key=lambda i: len(rows[i]))

    def rec(level: int, used: int) -> int:
        if level == n:
            return 1
        tot = 0
        for j, v in rows[order[level]]:
            if not (used >> j) & 1:
                sub = rec(level + 1, used | (1 << j))
                if sub:
                    tot += v * sub
        return tot

    return rec(0, 0)


def _perman_mod_host(m: List[List[int]], p: int) -> int:
    """Pure-Python Z_p Nijenhuis–Wilf walk (oracle.py math block).

    Mirrors native sup_perman_mod for the no-compiler fallback and as
    the kernel's unit-test twin; practical to n ~ 20.
    """
    n = len(m)
    if n == 0:
        return 1 % p
    if n == 1:
        return m[0][0] % p
    inv2 = (p + 1) // 2
    x = [(m[j][n - 1] - sum(m[j]) * inv2) % p for j in range(n)]
    colp = [[m[j][k] % p for j in range(n)] for k in range(n - 1)]
    colm = [[(p - v) % p for v in col] for col in colp]
    acc = 1
    for v in x:
        acc = acc * v % p
    for i in range(1, 1 << (n - 1)):
        k = (i & -i).bit_length() - 1
        g = i ^ (i >> 1)
        c = colp[k] if (g >> k) & 1 else colm[k]
        prod = 1
        for j in range(n):
            xv = x[j] + c[j]
            if xv >= p:
                xv -= p
            x[j] = xv
            prod = prod * xv % p
        acc = (acc - prod if i & 1 else acc + prod) % p
    acc = acc * 2 % p
    if not n & 1:
        acc = (-acc) % p
    return acc


def _log2_bound(m: List[List[int]]) -> float:
    """log2 upper bound on |per(M)|.

    Base: the row-sum bound prod_i sum_j |M_ij| in BOTH orientations
    (per(M) = per(M^T)), taking the smaller.  For 0/1 matrices it is
    tightened to Bregman–Minc  per(A) <= prod_i (r_i!)^(1/r_i)  — on
    pattern cores (chesapeake-class, row degrees ~10-20) that is ~25-30%
    fewer bits, which is ~25-30% fewer CRT primes and hence walks for
    the native and TPU Z_p engines (every prime is a full 2^(n-1-r)
    Gray walk; the bound is a direct throughput multiplier)."""
    n = len(m)
    rows = [sum(abs(v) for v in row) for row in m]
    if any(s == 0 for s in rows):
        return 0.0
    cols = [sum(abs(m[i][j]) for i in range(n)) for j in range(n)]
    if any(s == 0 for s in cols):
        return 0.0

    def lg(s):
        return math.log2(s) if s.bit_length() < 900 else float(s.bit_length())

    best = min(sum(map(lg, rows)), sum(map(lg, cols)))
    if all(v == 0 or v == 1 for row in m for v in row):
        # Bregman–Minc; lgamma is ~1e-15-relative, absolute slack well
        # under the caller's +3-bit margin
        def bm(degs):
            return sum(math.lgamma(r + 1) / (math.log(2) * r) for r in degs)

        best = min(best, bm(rows), bm(cols))
    return best


#: native cost above which the TPU modular engine (ops/modp.py) takes
#: over when a TPU is attached; below it the CPU walk wins (no Mosaic
#: compile, 61-bit primes need ~5x fewer walks per CRT bit)
_TPU_CROSSOVER_S = 300.0

#: fixed TPU overhead charged in estimates: Mosaic compiles + packing
_TPU_FIXED_S = 120.0

#: dense-native cost above which the CPU path pays for a pruned plan
#: (core_plan: host bigint liveness, seconds-minutes) and runs the
#: checkpointed CRT pipeline instead of the flat batch walk
_NATIVE_PLAN_FLOOR_S = 60.0


def _tpu_backend() -> bool:
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def exact_cost_estimate(a: np.ndarray,
                        budget_s: float = None) -> Tuple[float, int, int]:
    """(seconds, nprimes, core_n) for perman_exact_fraction on this host.

    ~6 ns per (column-update + Montgomery product) element step for the
    native CPU walk; past _TPU_CROSSOVER_S with a TPU attached, the
    estimate switches to the modular Pallas engine's (ops/modp.py).

    budget_s: the caller's acceptance threshold, if it has one.  The TPU
    estimate itself is EXPENSIVE (it computes the real pruned plan —
    host bigint liveness over up to 2^26-entry gray masks) and can never
    come in under _TPU_FIXED_S, so when the budget is below that the TPU
    branch is skipped outright: the answer ("too expensive") is already
    known, and the plan would be wasted.
    """
    m, k = dyadic_int_matrix(a)
    core, mult = _fold_lines([row[:] for row in m])
    if mult == 0 or not core:
        return 0.0, 0, 0
    n = len(core)
    bits = _log2_bound(core) + 3
    npr = max(1, math.ceil(bits / 61.0)) + 1
    secs = npr * (1 << max(0, n - 1)) * n * 6e-9
    from ..bindings.native import native_available
    if n > 16 and not native_available():
        # the 6 ns/element model prices the NATIVE walk, but the
        # engine=None selection below can only route this core to the
        # TPU engine (real floor: _TPU_FIXED_S of Mosaic compiles) or
        # raise — returning the native price would let a caller with a
        # small budget accept an estimate no backend can honor
        # (round-3 advisor finding).
        if not _tpu_backend():
            return math.inf, npr, n
        from .modp import PRIME_CEIL, tpu_cost_estimate
        # prime count must match the engine being priced: the TPU walk
        # uses <=11-bit primes (~5.5x more walks than the native 61-bit
        # count computed above — round-4 review finding #4)
        npr = max(1, math.ceil(bits / math.log2(PRIME_CEIL))) + 1
        secs = max(secs, _TPU_FIXED_S)
        if budget_s is not None and budget_s <= _TPU_FIXED_S:
            return secs, npr, n     # already over budget; skip the plan
        return tpu_cost_estimate(core, bits) + _TPU_FIXED_S, npr, n
    if (secs > _TPU_CROSSOVER_S and _tpu_backend()
            and (budget_s is None or budget_s > _TPU_FIXED_S)):
        from .modp import tpu_cost_estimate
        secs = min(secs, tpu_cost_estimate(core, bits) + _TPU_FIXED_S)
    if (secs > _NATIVE_PLAN_FLOOR_S and native_available()
            and (budget_s is None or budget_s > _NATIVE_PLAN_FLOOR_S)):
        # pruned-native price: the plan is cached by core fingerprint,
        # so the run (perman_exact_fraction -> crt_perman_core
        # backend="native") reuses exactly the plan priced here
        from .modp import core_plan
        from ..bindings.native import cpu_ifma
        ifma = cpu_ifma()
        npr_nat = max(1, math.ceil(bits / (50.0 if ifma else 61.0))) + 1
        pl_ = core_plan(core)
        live_iters = ((len(pl_[1]) << pl_[2]) if pl_ is not None
                      else (1 << max(0, n - 1)))       # dense index space
        # measured per-element rates on the chesapeake core plan
        # (one host core): 0.46 ns IFMA (strict), ~0.3 ns lazy,
        # 4.8 ns scalar — priced with headroom
        secs = min(secs, npr_nat * live_iters * n
                   * (0.5e-9 if ifma else 6e-9))
    return secs, npr, n


def perman_exact_fraction(a: np.ndarray, threads: int = 0,
                          log=None, engine: Optional[str] = None,
                          checkpoint_path: Optional[str] = None,
                          ) -> Tuple[Fraction, dict]:
    """EXACT permanent of the f64 matrix `a`, as a Fraction.

    engine: None picks by cost — native CPU Montgomery walks for cheap
    cores, the TPU modular Pallas engine (ops/modp.py) past
    _TPU_CROSSOVER_S when a TPU is attached; "native" / "tpu" / "host"
    force a backend (tests force "tpu" in interpret mode off-device).
    """
    t0 = time.perf_counter()
    a = np.asarray(a, dtype=np.float64)
    n0 = a.shape[0]
    m, k = dyadic_int_matrix(a)
    core, mult = _fold_lines(m)
    den = 1 << (k * n0)
    meta = {"k": k, "core_n": len(core), "n": n0}
    if mult == 0:
        meta["wall_s"] = time.perf_counter() - t0
        return Fraction(0), meta
    if not core:                                # fully folded
        per_core = 1
        meta.update(nprimes=0, engine="fold_only")
    else:
        nc = len(core)
        bits = _log2_bound(core) + 3            # sign + slack headroom
        need = max(1, math.ceil(bits / 61.0))
        from ..bindings.native import native_available, perman_mod_batch
        if engine is None:
            native_secs = ((need + 1) * (1 << max(0, nc - 1)) * nc * 6e-9
                           if native_available() and nc >= 2 else math.inf)
            if native_secs <= _TPU_CROSSOVER_S:
                engine = "native"
            elif _tpu_backend():
                from .modp import tpu_cost_estimate
                engine = ("tpu" if tpu_cost_estimate(core, bits)
                          + _TPU_FIXED_S < native_secs else "native")
            elif math.isfinite(native_secs):
                engine = "native"
            elif nc <= 16:
                engine = "host"
            else:
                raise RuntimeError(
                    f"exact permanent needs the native engine or a TPU "
                    f"for core n={nc}")
        if engine == "tpu":
            from .modp import crt_perman_core
            per_core, tmeta = crt_perman_core(
                core, log=log, checkpoint_path=checkpoint_path)
            meta.update(engine="tpu_mod", nprimes=tmeta["nprimes"],
                        bound_bits=tmeta["bound_bits"],
                        live_frac=tmeta["live_frac"])
        elif (engine == "native" and native_available() and nc >= 2
              and (need + 1) * (1 << max(0, nc - 1)) * nc * 6e-9
              > _NATIVE_PLAN_FLOOR_S):
            # big core on the CPU: run the full pruned-plan CRT pipeline
            # (checkpointed, held-out-verified) — the dense batch below
            # would walk the whole 2^(nc-1) index space per prime
            from .modp import crt_perman_core
            per_core, tmeta = crt_perman_core(
                core, backend="native", threads=threads, log=log,
                checkpoint_path=checkpoint_path)
            meta.update(engine="native_mod_crt", nprimes=tmeta["nprimes"],
                        bound_bits=tmeta["bound_bits"],
                        live_frac=tmeta["live_frac"])
        else:
            prs = primes_desc(need + 1)         # +1 held-out verifier
            if engine == "native" and native_available() and nc >= 2:
                mats = np.empty((len(prs), nc, nc), dtype=np.uint64)
                for i, p in enumerate(prs):
                    mats[i] = [[v % p for v in row] for row in core]
                res = perman_mod_batch(mats, np.asarray(prs, np.uint64),
                                       threads)
                residues = [int(r) for r in res]
                meta["engine"] = "native_mod"
            elif nc <= 16:
                residues = [_perman_mod_host(core, p) for p in prs]
                meta["engine"] = "host_mod"
            else:
                raise RuntimeError(
                    f"exact permanent needs the native engine for core "
                    f"n={nc}")
            X, P = 0, 1
            for r, p in zip(residues[:need], prs[:need]):
                t = (r - X) * pow(P, -1, p) % p
                X += P * t
                P *= p
            if X > P // 2:
                X -= P
            # end-to-end certification against the held-out prime: a
            # kernel or CRT bug cannot return silently (P covers |per|
            # by the row-sum bound, so X is forced — the verifier must
            # match)
            if X % prs[need] != residues[need]:
                raise AssertionError(
                    "exact CRT verification prime mismatch — modular "
                    "walk or reconstruction is broken")
            per_core = X
            meta.update(nprimes=need, bound_bits=round(bits, 1))
    per_int = mult * per_core
    frac = Fraction(per_int, den)
    meta["wall_s"] = time.perf_counter() - t0
    if per_int:
        meta["log2"] = (1.0 if per_int > 0 else -1.0,
                        log2_abs_fraction(frac))
    if log:
        log(f"exact CRT: core n={meta['core_n']} "
            f"primes={meta.get('nprimes')} wall={meta['wall_s']:.1f}s")
    return frac, meta


def _float_of_fraction(f: Fraction) -> float:
    try:
        return float(f)
    except OverflowError:
        return math.inf if f > 0 else -math.inf


def log2_abs_fraction(f: Fraction) -> float:
    if f == 0:
        return -math.inf
    num, den = abs(f.numerator), f.denominator
    shift = num.bit_length() - 64
    top = num >> shift if shift > 0 else num
    return (math.log2(top) + max(0, shift)) - (den.bit_length() - 1)


def perman_exact(dense, flags):
    """calc="exact" engine entry (Result-producing)."""
    from ..core.result import Result

    a = np.asarray(dense.mat, dtype=np.float64)
    frac, meta = perman_exact_fraction(a, threads=flags.threads)
    val = _float_of_fraction(frac)
    res = Result(val, meta["wall_s"], algo_name="exact_crt")
    res.meta["exact"] = {
        "log2": (log2_abs_fraction(frac) if frac else -math.inf),
        "core_n": meta["core_n"], "nprimes": meta.get("nprimes"),
        "engine": meta.get("engine"), "k": meta["k"],
    }
    res.meta["exact_fraction"] = frac
    return res
