"""Randomized differential fuzzer for the exact engines.

Random (size, density, magnitude, sign, dtype) matrices through random
flag combinations, compared against the f64 oracle — with the exact
python-int DFS as arbiter when the oracle itself cancels to noise, and a
calc-aware noise floor for near-zero permanents.

Found in round 1: the 2.0**E OverflowError, the scale-product underflow
in unscale_permanent, the compression-induced Ryser conditioning blowup
(auto-Sinkhorn fix), and the compounding scale-shift overflow.

    python -m superman_tpu.tools.fuzz [--trials N] [--seed S]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

EPS = {"f32k": 2 ** -22, "df64": 2 ** -45, "tf96": 2 ** -60,
       "auto": 2 ** -45}


def run(trials: int = 40, seed: int = 0, log=print) -> int:
    import superman_tpu as sp
    from superman_tpu.ops.oracle import perman64, perman_brute

    rng = np.random.default_rng(seed)
    fails = 0
    for trial in range(trials):
        n = int(rng.integers(19, 24))
        d = float(rng.uniform(0.08, 0.95))
        mag = float(rng.choice([1.0, 1e-12, 1e12, 1e-6]))
        ftype = rng.random() < 0.5
        signed = rng.random() < 0.25
        a = (rng.random((n, n)) < d)
        if ftype:
            v = rng.random((n, n)) * mag
            if signed:
                v = v * rng.choice([-1, 1], (n, n))
            a = (a * v).astype(np.float64)
        else:
            v = rng.integers(1, 5, (n, n))
            if signed:
                v = v * rng.choice([-1, 1], (n, n))
            a = (a * v).astype(np.int64)
        kw = {}
        roll = rng.random()
        if roll < 0.2:
            kw.update(sparse=True, preprocessing=int(rng.integers(0, 8)))
        elif roll < 0.35:
            kw.update(compression=True)
        elif roll < 0.5 and not signed:
            kw.update(scaling_threshold=float(rng.choice([1.0, 2.0])))
        elif roll < 0.6:
            kw.update(perman_algo="glynn")
        elif roll < 0.7:
            kw.update(dm_prune=True, sparse=True)
        if rng.random() < 0.2:
            kw.update(chunk_log2=int(rng.integers(5, 9)), lanes=128)
        calc = str(rng.choice(["df64", "tf96", "auto", "f32k"]))
        if kw.get("compression") and calc == "f32k":
            # d1/d2 merges multiply entries, inflating the noise floor
            # of f32-class tiers beyond what the ORIGINAL matrix's
            # termmax bounds — the comparison is meaningless there (the
            # reference's -o with -h is equally garbage); compression
            # accuracy is fuzzed at the double-class tiers
            calc = "df64"
        try:
            want = float(perman64(a))
            got = sp.permanent(a, calc=calc, **kw).permanent
        except Exception as e:                 # noqa: BLE001 — reported
            fails += 1
            log(f"RAISE trial={trial} calc={calc} kw={kw}: "
                f"{type(e).__name__}: {e}")
            continue
        with np.errstate(over="ignore"):
            termmax = float(np.prod(np.abs(a).sum(axis=1) / 2
                                    + np.abs(a[:, -1])))
        floor = EPS[calc] * termmax if np.isfinite(termmax) else 0.0
        tol = 1e-3 if calc == "f32k" else 1e-6
        if np.isinf(want) or np.isinf(got):
            # an inf result is acceptable when the tier's noise floor
            # swamps the true answer AND an exact-preserving rescale
            # (compression/Sinkhorn) could amplify that noise past
            # double range
            ok = (np.isinf(want) == np.isinf(got)
                  or (np.isinf(got) and floor >= abs(want)))
        else:
            ok = abs(got - want) <= max(tol * abs(want), floor)
        if not ok and d < 0.35:
            # the f64 oracle cancels to noise on sparse near-zero
            # permanents; arbitrate with the exact DFS
            exact = float(perman_brute(a))
            ok = abs(got - exact) <= max(tol * abs(exact), floor)
        if not ok:
            fails += 1
            log(f"FAIL trial={trial} n={n} d={d:.2f} mag={mag:g} "
                f"signed={signed} ftype={ftype} calc={calc} kw={kw} "
                f"want={want:.6e} got={got:.6e}")
    log(f"fuzz: {trials - fails}/{trials} ok")
    return fails


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="superman-fuzz")
    p.add_argument("--trials", type=int, default=40)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    return 1 if run(args.trials, args.seed) else 0


if __name__ == "__main__":
    sys.exit(main())
