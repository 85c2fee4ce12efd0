"""Micro-profile of the windowed BA internals on the real chip.

Times, at the bench shape (15 cams x 2048 pts x 6144 obs):
  - _ba_normal_terms (Jacobians + segment-sum accumulation)
  - _schur_solve     (landmark elimination + dense reduced solve)
  - one full inner LM iteration (both + accept/reject bookkeeping)

Usage: python examples/profile_ba.py [--iters 30]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/coslam_jax_cache")
    import jax.numpy as jnp
    import coslam_tpu  # matmul precision
    from coslam_tpu.solvers.ba import (BAProblem, _ba_normal_terms,
                                       _schur_solve, bundle_adjust)
    from coslam_tpu.geometry.se3 import so3_exp

    rng = np.random.default_rng(0)
    M, Ppts = 15, 2048
    W, H = 640, 480
    K1 = np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]],
                  np.float32)
    Xw = rng.uniform(-4, 4, (Ppts, 3)).astype(np.float32)
    Xw[:, 2] += 10
    Rb = np.stack([np.asarray(so3_exp(jnp.asarray(
        0.05 * rng.standard_normal(3).astype(np.float32))))
        for _ in range(M)])
    tb = np.stack([np.array([0.2 * m, 0, 0], np.float32) for m in range(M)])
    oc = rng.integers(0, M, 3 * Ppts).astype(np.int32)
    op = np.tile(np.arange(Ppts), 3).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", Rb[oc], Xw[op]) + tb[oc]
    px = (Xc[:, :2] / Xc[:, 2:3] * 500 + [W / 2, H / 2]).astype(np.float32)
    cam_fixed = np.zeros(M, bool)
    cam_fixed[:2] = True
    prob = BAProblem(
        K=jnp.broadcast_to(jnp.asarray(K1)[None], (M, 3, 3)),
        R=jnp.asarray(Rb), t=jnp.asarray(tb), X=jnp.asarray(Xw + 0.05),
        obs_cam=jnp.asarray(oc), obs_pt=jnp.asarray(op),
        obs_px=jnp.asarray(px), obs_valid=jnp.ones(len(oc), bool),
        cam_fixed=jnp.asarray(cam_fixed),
        point_fixed=jnp.zeros(Ppts, bool))
    w = prob.obs_valid.astype(jnp.float32)
    n = args.iters

    terms = jax.jit(lambda X: _ba_normal_terms(
        prob.K, prob.R, prob.t, X, prob, w, None))
    out = terms(prob.X)
    _ = np.asarray(out[5])
    t0 = time.perf_counter()
    X = prob.X
    for _ in range(n):
        out = terms(X)
        X = X + 0.0 * out[4]          # chain through gp
    _ = np.asarray(X[0])
    dt_terms = (time.perf_counter() - t0) / n * 1e3
    print(f"normal_terms          {dt_terms:8.3f} ms", flush=True)

    Hcc, Wcp, Hpp, gc, gp, cost = out
    lam = jnp.asarray(1e-4, jnp.float32)
    solve = jax.jit(lambda gc: _schur_solve(
        Hcc, Wcp, Hpp, gc, gp, lam, prob.cam_fixed, prob.point_fixed))
    dc, dX = solve(gc)
    _ = np.asarray(dc)
    t0 = time.perf_counter()
    g = gc
    for _ in range(n):
        dc, dX = solve(g)
        g = g + 0.0 * dc              # chain
    _ = np.asarray(g)
    dt_solve = (time.perf_counter() - t0) / n * 1e3
    print(f"schur_solve           {dt_solve:8.3f} ms", flush=True)

    # full solver: iters/s over (max_iter x inner_iter) LM iterations
    full = jax.jit(lambda prob: bundle_adjust(prob, max_err=10.0,
                                              max_iter=2, inner_iter=30))
    res = full(prob)
    _ = np.asarray(res.cost)
    t0 = time.perf_counter()
    reps = 5
    c = prob
    for _ in range(reps):
        res = full(c._replace(X=res.X))
    _ = np.asarray(res.cost)
    dt_full = time.perf_counter() - t0
    print(f"bundle_adjust (2x30)  {dt_full / reps * 1e3:8.3f} ms  "
          f"= {reps * 60 / dt_full:7.1f} LM iters/s")


if __name__ == "__main__":
    main()
