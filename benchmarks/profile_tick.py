"""Stage-level profiling of the warm-resolve MPC tick (the headline bench path).

Times, separately jitted and vmapped over the bench batch:
  prepare   — vmapped per-step Lagrangian Hessian/Jacobian AD (StructuredKKT.prepare)
  assemble  — block-tridiagonal + arrowhead block construction
  solve     — the CR (or scan) block solve given assembled blocks
  tick      — the full fused 3-iteration resolve (what bench.py measures)

Usage: python benchmarks/profile_tick.py [--cpu] [--b 512] [--n 100] [--algo cr]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--algo", default="cr")
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    if args.f32:
        os.environ["CTDIRECT_TPU_X64"] = "0"

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from ctdirect_tpu import transcribe
    from ctdirect_tpu.problems import get_problem
    from ctdirect_tpu.parallel.mpc import MPCController, broadcast_state
    from ctdirect_tpu.solver.ipm import IPMOptions
    from ctdirect_tpu.solver import structured_kkt as sk

    prob = get_problem("double_integrator_minenergy")
    docp = transcribe(prob.ocp, grid_size=args.n, scheme="trapeze")
    kkt = sk.StructuredKKT(docp, algorithm=args.algo)
    B = args.b

    ctrl = MPCController(
        docp, x0_boundary_rows=[0, 1], resolve_iters=3, kkt_algorithm=args.algo
    )
    warm = ctrl.cold_start(options=IPMOptions(tol=1e-8, max_iter=60))
    states = broadcast_state(warm, B)
    log(f"device={jax.devices()[0]}  B={B} N={args.n} algo={args.algo}")

    z_b = states.z
    lam_b = states.lam
    sf = jnp.ones((), z_b.dtype)
    sc = jnp.ones((docp.nc,), z_b.dtype)
    nz = docp.nz

    def bench(name, fn, *xs, reps=10):
        out = fn(*xs)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*xs)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        log(f"{name:>10}: {dt*1e3:9.2f} ms")
        return out, dt

    # ---- stage 1: prepare (AD) ----
    prep1 = jax.jit(jax.vmap(lambda z, lam: kkt.prepare(z, lam, sf, sc)))
    data, t_prep = bench("prepare", prep1, z_b, lam_b)

    # ---- stage 2: assemble blocks ----
    sigma_z = jnp.ones((B, nz), z_b.dtype) * 0.1
    Drow = jnp.ones((B, docp.nc), z_b.dtype)
    rz = jnp.ones((B, nz), z_b.dtype)
    rp = jnp.ones((B, docp.nc), z_b.dtype)

    asm1 = jax.jit(
        jax.vmap(lambda d, s, dr, a, b: kkt._assemble(d, s, dr, 1e-8, 1e-8, a, b))
    )
    blocks, t_asm = bench("assemble", asm1, data, sigma_z, Drow, rz, rp)

    # ---- stage 3: block solve ----
    solver_fn = sk._cr_solve if args.algo == "cr" else sk._scan_solve
    sol1 = jax.jit(jax.vmap(lambda A, Bb, E, F, r, rb: solver_fn(A, Bb, E, F, r, rb)))
    _, t_sol = bench("solve", sol1, *blocks)

    # ---- full tick ----
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.03 * rng.standard_normal((B, 2)))
    tick1 = lambda s, x: ctrl(s, x)
    (_, u0, _, _), t_tick = bench("tick(3it)", tick1, states, x0)

    log(
        f"sum(3*(prep+asm+solve)) = {3*(t_prep+t_asm+t_sol)*1e3:.2f} ms "
        f"vs tick {t_tick*1e3:.2f} ms"
    )


if __name__ == "__main__":
    main()
