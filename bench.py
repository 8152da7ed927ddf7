"""Headline benchmark: n=32 dense exact permanent on real TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference publishes no GPU numbers (BASELINE.md); the
only measured wall-clock for an exact n=32 permanent in the repo is the CPU
SkipPer suite (0.563-1.30 s for the SPARSE d=0.20 case, and 114.2 s for
sequential dense Ryser).  We report Gray-code iters/s/chip on the DENSE
n=32 problem — the BASELINE.json north-star metric — and use the 2-GPU CUDA
estimate as vs_baseline denominator: the v1 kernel does 2^31 iterations of
~2n flops with a grid of 2048x256 threads; on 2x V100-class GPUs a
well-tuned run is ~0.5 s => ~4.3e9 iters/s.  vs_baseline > 1 means faster
than that estimate on ONE v5e chip.
"""

import json
import time

import numpy as np

BASELINE_ITERS_PER_SEC = 4.3e9   # est. 2-GPU CUDA (see module docstring)


def main():
    import superman_tpu as sp
    from superman_tpu.io.triplet import read_triplet

    dm = read_triplet("/root/reference/int/32_0.50_0")
    # warm-up / compile
    sp.permanent(dm, calc="f32")
    best = None
    for _ in range(3):
        r = sp.permanent(dm, calc="f32")
        if best is None or r.time < best.time:
            best = r
    iters_per_sec = best.iterations / best.time
    print(json.dumps({
        "metric": "n32_dense_exact_gray_iters_per_sec_per_chip",
        "value": round(iters_per_sec / 1e9, 4),
        "unit": "G iters/s",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 4),
        "detail": {
            "wall_s": round(best.time, 4),
            "permanent": best.permanent,
            "calc": "f32",
            "matrix": "int/32_0.50_0",
            "df64_check": None,
        },
    }))


if __name__ == "__main__":
    main()
