"""Measure the realized TPU Z_p walk rate and compare to its roofline.

Round-3 verdict #8 asked for ~2x modp CRT throughput ("prime packing").
The flop ledger shows packing cannot help — walk cost scales with
(#primes x #live-chunks x 2^r) and lanes are full for every flagship
core — so round 4 attacked flops-per-step and bits-per-walk instead:

* LAZY residues in [0, 2p), downward reciprocal (ops/modp.py): the
  per-multiply reduce drops 10 -> 4 flops; per-step ledger at n_pad=40
  falls ~593 -> ~360 flops (x update 4/row unchanged, tree
  (n_pad-1) x (1 mul + 4 reduce), accumulator ~4);
* the cost is 1 bit/prime (PRIME_CEIL 4093 -> 2039, 12 -> 11 bits);
* Bregman-Minc CRT bound (ops/exact._log2_bound): 25-30% fewer primes
  on 0/1 pattern cores (chesapeake/will57 class).

Net: ~1.5x CRT bits/s from the kernel x ~1.35x from the bound = ~2x on
the flagship targets.  This tool measures the realized iters/s on the
attached TPU and prints the ledger-implied VPU utilization so the claim
is anchored to hardware (analogous to BENCH_TABLE.md's df64 roofline).

Run:  python -m superman_tpu.tools.modp_rate [--n 32] [--r 16] [--reps 3]
"""

from __future__ import annotations

import json
import time

import numpy as np


def ledger_flops_per_step(n_pad: int) -> dict:
    """Per-Gray-step per-lane f32 op counts of the lazy unrolled walk
    (static steps, which are 31/32 of all steps at u=5)."""
    x_update = 4 * n_pad            # add + cmp + select + sub (one bound)
    tree = (n_pad - 1) * (1 + 4)    # mul + (mul,floor,mul,sub) lazy reduce
    acc = 4                         # t select/complement + add + bound
    return {"x_update": x_update, "tree": tree, "acc": acc,
            "total": x_update + tree + acc}


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--r", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--lanes", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from ..ops import gray, modp

    rng = np.random.default_rng(args.seed)
    n = args.n
    core = [[int(v) for v in row]
            for row in rng.integers(0, 50, (n, n))]
    pr = modp.primes_mod(2)
    n_pad = gray.pad_n(n)
    led = ledger_flops_per_step(n_pad)

    walls = []
    for i, q in enumerate([pr[0]] + [pr[i % 2] for i in range(args.reps)]):
        t0 = time.perf_counter()
        res = modp.perman_core_mod(core, q, r=args.r, lanes=args.lanes)
        w = time.perf_counter() - t0
        if i == 0:
            print(f"cold (compile) walk: {w:.1f}s", flush=True)
            continue
        walls.append(w)
        print(f"warm walk p={q}: {w:.3f}s res={res}", flush=True)

    iters = 1 << (n - 1)
    rate = iters / min(walls)
    flops = rate * led["total"]
    out = {"metric": "modp_g_iters_per_sec",
           "value": round(rate / 1e9, 3),
           "n": n, "r": args.r, "n_pad": n_pad,
           "ledger_flops_per_step": led,
           "sustained_tflops": round(flops / 1e12, 3),
           "vpu_peak_tflops": 3.85,
           "vpu_utilization": round(flops / 3.85e12, 3),
           "crt_bits_per_sec_g": round(
               rate * np.log2(modp.PRIME_CEIL) / 1e9, 3)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
