"""On-chip attribution of the in-graph Hungarian solver.

The post-warm-up stage solves a (max_gt x num_queries) assignment per
image per loss head — 7 heads (6 decoder + 1 encoder) x batch images
inside every train step (`models/assign.py:one_to_one_targets` ->
`ops/hungarian.py:solve`, reference scipy call sites
`dino_detr_ssod_head.py:1188-1207`, `dino_detr_ssod.py:279`). The solver
runs `nr` sequential augmenting paths, each an O(nr*nc) while_loop —
potentially a serial bottleneck on TPU (VERDICT r2 weak #5).

Measures: vmapped solve over the per-step problem count at recipe scale,
for several GT counts (the loop count scales with VALID rows).

Usage: python tools/benchmarks/hungarian_bench.py [--problems 14]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--problems", type=int, default=14,
                   help="assignment problems per step (heads x images)")
    p.add_argument("--queries", type=int, default=900)
    p.add_argument("--max-gt", type=int, default=100)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from semi_detr_tpu.ops import hungarian

    P, G, Q = args.problems, args.max_gt, args.queries
    rs = np.random.RandomState(0)
    cost = jnp.asarray(rs.rand(P, G, Q).astype(np.float32))

    solve = jax.jit(jax.vmap(lambda c, v: hungarian.solve(c, v)))

    for n_valid in (8, 32, 100):
        n_valid = min(n_valid, G)
        valid = jnp.tile(jnp.arange(G)[None] < n_valid, (P, 1))
        out = solve(cost, valid)
        _ = np.asarray(out)              # compile + sync
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = solve(cost, valid)
            _ = np.asarray(out)
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"hungarian: {P} problems of ({G}x{Q}), {n_valid} valid GTs "
              f"-> {med * 1000:.1f} ms/step-equivalent")

    # correctness spot-check vs scipy on one problem
    try:
        from scipy.optimize import linear_sum_assignment
        c = np.asarray(cost[0, :32])
        ours = np.asarray(hungarian.solve(jnp.asarray(c)))
        rows, cols = linear_sum_assignment(c)
        assert (c[np.arange(32), ours].sum()
                <= c[rows, cols].sum() + 1e-4), "suboptimal assignment!"
        print("parity vs scipy: optimal cost matched")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
