"""Headline benchmark: warm-started MPC solves/s at N=100 trapezoidal collocation
(BASELINE.json north star: >= 10k solves/s on v5p-8; vs_baseline = value/10000).

Runs on the real TPU chip (axon platform, the environment default). Prints ONE
JSON line. Extra diagnostics go to stderr.

Vmapped IPM over the structured block-tridiagonal KKT path (f64). Batch and
iteration budget are chosen for a warm-started receding-horizon setting: each
instance re-solves a shifted problem from the previous optimum with a
perturbed initial state arriving through the boundary-constraint rhs.
"""

import json
import os
import sys
import time

# f64 everywhere: the structured KKT path is lapack-free, so double precision
# runs on TPU (XLA f64 emulation). Set BENCH_F32=1 to experiment with f32.
if os.environ.get("BENCH_F32") == "1":
    os.environ["CTDIRECT_TPU_X64"] = "0"

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from ctdirect_tpu import transcribe
    from ctdirect_tpu.problems import get_problem
    from ctdirect_tpu.parallel.batch import BatchSolver
    from ctdirect_tpu.solver.ipm import IPMOptions, ipm_solve, make_spec
    from ctdirect_tpu.solver.interface import solve_docp

    dev = jax.devices()[0]
    log(f"device: {dev}")

    N = 100
    B = int(os.environ.get("BENCH_BATCH", "256"))
    MAX_IT = 6

    prob = get_problem("double_integrator_minenergy")
    docp = transcribe(prob.ocp, grid_size=N, scheme="trapeze")

    # reference solve (cold) to warm-start from
    t0 = time.time()
    base = solve_docp(
        docp,
        options=IPMOptions(tol=1e-4, max_iter=60, lsq_lambda_init=False,
                           kkt_mode=os.environ.get("BENCH_KKT", "structured")),
    )
    log(f"cold reference solve: status {base.status} obj {base.objective:.4f} "
        f"({time.time()-t0:.1f}s incl compile)")

    # B MPC instances: perturb x0 via the boundary rhs; warm start from base z
    rng = np.random.default_rng(0)
    dx0 = 0.05 * rng.standard_normal((B, 2))
    cl = np.tile(docp._c_lb, (B, 1))
    cu = np.tile(docp._c_ub, (B, 1))
    bidx = docp.boundary_row_indices()
    cl[:, bidx[0]] += dx0[:, 0]
    cu[:, bidx[0]] += dx0[:, 0]
    cl[:, bidx[1]] += dx0[:, 1]
    cu[:, bidx[1]] += dx0[:, 1]

    zstar = np.asarray(base.infos.get("z", None)) if base.infos.get("z") is not None else None
    if zstar is None:
        # rebuild flat z from the solution trajectories
        from ctdirect_tpu.model.init import InitialGuess

        zstar = docp.initial_guess(InitialGuess.from_solution(base))
    z0 = np.tile(zstar, (B, 1))

    kkt_mode = os.environ.get("BENCH_KKT", "structured")
    solver = BatchSolver(
        docp,
        options=IPMOptions(
            tol=1e-4, max_iter=MAX_IT, lsq_lambda_init=False, kkt_mode=kkt_mode
        ),
    )

    # compile
    t0 = time.time()
    res = solver(jnp.asarray(z0), jnp.asarray(cl), jnp.asarray(cu))
    res.objective.block_until_ready()
    log(f"compile+first batch: {time.time()-t0:.1f}s; "
        f"success {int(np.sum(np.asarray(res.successful)))}/{B}")

    # timed runs
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        res = solver(jnp.asarray(z0), jnp.asarray(cl), jnp.asarray(cu))
        res.objective.block_until_ready()
    dt = (time.time() - t0) / reps
    solves_per_s = B / dt

    ok = int(np.sum(np.asarray(res.successful)))
    log(f"batch {B} in {dt*1e3:.1f} ms -> {solves_per_s:.1f} solves/s "
        f"({ok}/{B} converged, mean it {float(np.mean(np.asarray(res.iterations))):.1f})")

    print(
        json.dumps(
            {
                "metric": "warm-start MPC solves/s/chip, N=100 trapezoid",
                "value": round(solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 10000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
