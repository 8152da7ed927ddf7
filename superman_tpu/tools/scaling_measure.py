"""Measured multi-chip scaling constants (round-2 verdict #2).

SCALING.md's efficiency argument had every constant estimated; this tool
measures what one chip CAN measure and computes the N-chip efficiency
bound from measured numbers:

* the shard_map fixed overhead: wall of the mesh_shape=(1,) path vs the
  plain single-device path on the SAME matrix (identical kernels and
  block layout -> the difference is the shard_map/infeed machinery);
* per-run fixed costs from the trace spans (pack, sparse_plan);
* padding/quantization accounting for the sharded block layout (exact,
  from pad_ids): useful-work fraction per shard for 1/8/64 shards.

Efficiency model for N chips (uniform 2^r chunk costs by construction):

    eff(N) = T_walk / N
             -----------------------------------------
             T_walk_padded(N) / N + T_fixed + T_overhead

with T_walk the measured single-chip walk, T_walk_padded(N) the walk
inflated by pad_ids' block quantization at N shards, T_fixed the
measured pack+plan host cost and T_overhead the measured shard_map
delta.  Communication is one f64 allgather per run (µs, ignored).

Reference anchor this must beat: the static equal split of
gpu_exact_dense.cu:729-755 (same quantization, plus a per-GPU context +
D2H per partial).

Writes SCALING_MEASURED.json; run on the real TPU:
    python -m superman_tpu.tools.scaling_measure [--reps 3] [--big]
"""

from __future__ import annotations

import json
import time

import numpy as np


def _time_case(path_or_mat, reps: int, **kw):
    import superman_tpu as sp
    walls, spans, res = [], {}, None
    for i in range(reps + 1):
        t0 = time.perf_counter()
        res = sp.permanent(path_or_mat, **kw)
        w = time.perf_counter() - t0
        if i == 0:
            continue                      # warm-up / compile rep
        walls.append(w)
        for name, dt in res.meta.get("spans", []):
            spans.setdefault(name, []).append(dt)
    return {"wall_mean": float(np.mean(walls)),
            "wall_min": float(np.min(walls)),
            "walls": [round(w, 4) for w in walls],
            "spans": {k: round(float(np.mean(v)), 5)
                      for k, v in spans.items()},
            "permanent": res.permanent}


def quantization_table(n: int, density: float, seed: int = 0,
                       shards=(1, 8, 64)):
    """Exact padding/quantization accounting for the sparse mesh layout:
    per-shard useful-work fraction from the real planner + pad_ids."""
    from superman_tpu.ops.pruning import plan_sparse
    from superman_tpu.parallel.sharding import pad_ids

    rng = np.random.default_rng(seed)
    a = ((rng.random((n, n)) < density) * rng.integers(1, 9, (n, n))
         ).astype(np.float64)
    np.fill_diagonal(a, rng.integers(1, 9, n))
    sp_plan = plan_sparse(a, chunk_log2=None, df=True, allow_factor=True)
    rows = []
    if sp_plan is None:
        return {"n": n, "density": density, "note": "planner declined"}, rows
    from superman_tpu.parallel.sharding import sparse_lanes
    live = len(sp_plan.ids)
    for s in shards:
        # mirror the engine exactly: shard-aware lane width + per-shard
        # block_multiple rounding (ops/ryser.py sparse branch)
        L = sparse_lanes(live, s, 512)
        blocks = pad_ids(sp_plan.ids.astype(np.int32), L, s,
                         block_multiple=32)
        per_shard = blocks.shape[0] // s
        live_per = [(blocks[i * per_shard:(i + 1) * per_shard] >= 0).sum()
                    for i in range(s)]
        rows.append({"shards": s, "lanes": int(L),
                     "blocks": int(blocks.shape[0]),
                     "blocks_per_shard": int(per_shard),
                     "useful_frac": round(live / (blocks.size), 4),
                     "live_lane_min": int(min(live_per)),
                     "live_lane_max": int(max(live_per))})
    return {"n": n, "density": density, "live_chunks": live,
            "r": sp_plan.r}, rows


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--big", action="store_true",
                   help="include the n=36 (8 s/run) case")
    p.add_argument("--out", default="SCALING_MEASURED.json")
    args = p.parse_args(argv)

    out = {"cases": {}}
    ns = [30, 32] + ([36] if args.big else [])
    for n in ns:
        path = f"/root/reference/int/{n}_0.50_0"
        plain = _time_case(path, args.reps, skip_pruning=False)
        mesh1 = _time_case(path, args.reps, skip_pruning=False,
                           mesh_shape=(1,))
        delta = mesh1["wall_mean"] - plain["wall_mean"]
        out["cases"][f"n{n}"] = {
            "plain": plain, "mesh1": mesh1,
            "shardmap_overhead_s": round(delta, 4)}
        print(f"n={n}: plain {plain['wall_mean']:.4f}s "
              f"mesh(1,) {mesh1['wall_mean']:.4f}s "
              f"delta {delta*1e3:.1f} ms  spans={plain['spans']}")

    # measured constants -> N-chip efficiency bound (dense n=36/40)
    t_fixed = 0.0
    for c in out["cases"].values():
        t_fixed = max(t_fixed, sum(v for k, v in c["plain"]["spans"].items()
                                   if k in ("pack", "sparse_plan")))
    ov = max(c["shardmap_overhead_s"] for c in out["cases"].values())
    ov = max(ov, 0.0)
    eff = {}
    base = out["cases"].get("n36") or out["cases"][f"n{ns[-1]}"]
    t_walk = base["plain"]["wall_mean"]
    nn = 36 if "n36" in out["cases"] else ns[-1]
    for N in (8, 64):
        # dense: block quantization at L=512, r chosen by the planner so
        # blocks >= N (the planner takes num_shards); worst case one
        # extra block per shard of the ~2^(n-1)/(512 * 2^r) blocks
        blocks = max(N, (1 << (nn - 1)) // (512 << max(0, nn - 1 - 9 - 13)))
        quant = (np.ceil(blocks / N) * N) / blocks
        e = (t_walk / N) / ((t_walk * quant) / N + t_fixed + ov)
        eff[f"chips_{N}"] = round(float(e), 4)
    out["efficiency_bound"] = {"from_case": f"n{nn}", "t_walk_s": t_walk,
                               "t_fixed_s": round(t_fixed, 5),
                               "shardmap_overhead_s": round(ov, 4),
                               **eff}

    # sparse layout accounting (no hardware needed; exact bookkeeping)
    meta, rows = quantization_table(36, 0.10)
    out["sparse_layout"] = {"meta": meta, "shards": rows}

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "shardmap_overhead_ms",
                      "value": round(ov * 1e3, 2),
                      "efficiency_bound": eff}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
