"""Multi-device tests on the 8-virtual-CPU-device mesh: batch sharding,
time-axis distributed cyclic reduction, MPC driver, warm resolve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ctdirect_tpu import transcribe
from ctdirect_tpu.parallel.batch import BatchSolver
from ctdirect_tpu.parallel.mpc import MPCController, broadcast_state
from ctdirect_tpu.parallel.time_shard import TimeShardedKKT
from ctdirect_tpu.problems import get_problem
from ctdirect_tpu.solver.ipm import IPMOptions, ipm_solve, make_spec
from ctdirect_tpu.solver.structured_kkt import StructuredKKT


def mesh8(axis):
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
    return Mesh(np.array(jax.devices()[:8]), axis_names=(axis,))


def test_batch_solver_sharded():
    p = get_problem("double_integrator_minenergy")
    d = transcribe(p.ocp, grid_size=12, scheme="trapeze")
    solver = BatchSolver(d, options=IPMOptions(tol=1e-6, max_iter=20), mesh=mesh8("batch"))
    B = 16
    z0 = jnp.asarray(np.tile(d.initial_guess(None), (B, 1)))
    res = solver(z0)
    assert bool(jnp.all(res.successful))
    np.testing.assert_allclose(np.asarray(res.objective), 12.0, rtol=5e-2)  # N=12 grid


@pytest.mark.parametrize(
    "name,scheme,gs",
    [
        # one small fast-tier cell keeps the distributed-CR equivalence gated
        # on every run; the bigger grids/borders go to the slow tier (their
        # CI cost is the dense+sharded compiles — 100-230 s each on 2 cores)
        ("double_integrator_minenergy", "trapeze", 32),
        pytest.param("double_integrator_minenergy", "trapeze", 100,
                     marks=pytest.mark.slow),
        # free tf + path + boundary border
        pytest.param("goddard_all", "midpoint", 24, marks=pytest.mark.slow),
        # stagewise IRK, non-power-of-2 N: same distributed recurrence over a
        # bigger block
        pytest.param("beam", "gauss_legendre_2", 13, marks=pytest.mark.slow),
    ],
)
def test_time_sharded_cr_matches_sequential(name, scheme, gs):
    rng = np.random.default_rng(5)
    p = get_problem(name)
    d = transcribe(p.ocp, grid_size=gs, scheme=scheme)
    seq = StructuredKKT(d)
    dist = TimeShardedKKT(d, mesh8("time"), axis="time")
    z = jnp.asarray(d.initial_guess(p.init) + 0.01 * rng.standard_normal(d.nz))
    lam = jnp.asarray(rng.standard_normal(d.nc))
    sf = jnp.asarray(1.0)
    sc = jnp.ones(d.nc)
    sigma = jnp.asarray(rng.uniform(0.1, 2.0, d.nz))
    Drow = jnp.asarray(rng.uniform(0.0, 1.0, d.nc))
    rz = jnp.asarray(rng.standard_normal(d.nz))
    rp = jnp.asarray(rng.standard_normal(d.nc))
    data = seq.prepare(z, lam, sf, sc)
    dz1, dl1 = seq.solve(data, sigma, Drow, 1e-6, 1e-7, rz, rp)
    dz2, dl2 = dist.solve(data, sigma, Drow, 1e-6, 1e-7, rz, rp)
    scale = 1 + np.max(np.abs(np.asarray(dz1)))
    np.testing.assert_allclose(np.asarray(dz2), np.asarray(dz1), atol=1e-10 * scale)


def test_time_sharded_full_solve():
    """Full IPM with the distributed-CR KKT operator converges."""
    p = get_problem("beam")
    d = transcribe(p.ocp, grid_size=16, scheme="trapeze")
    spec = make_spec(d._z_lb, d._z_ub, d._c_lb, d._c_ub)
    kkt = TimeShardedKKT(d, mesh8("time"), axis="time")
    res = jax.jit(
        lambda z0: ipm_solve(
            d.nlp_objective,
            d.constraints,
            spec,
            z0,
            d._z_lb,
            d._z_ub,
            d._c_lb,
            d._c_ub,
            options=IPMOptions(tol=1e-8, lsq_lambda_init=False),
            kkt=kkt,
        )
    )(jnp.asarray(d.initial_guess(None)))
    assert bool(res.successful)
    np.testing.assert_allclose(float(res.objective), 8.898598, rtol=5e-2)  # N=16 grid


def test_mpc_controller_converges():
    """Batched MPC ticks keep KKT error at machine-precision levels."""
    p = get_problem("double_integrator_minenergy")
    d = transcribe(p.ocp, grid_size=30, scheme="trapeze")
    ctrl = MPCController(d, x0_boundary_rows=[0, 1], resolve_iters=3, kkt_algorithm="cr")
    warm = ctrl.cold_start(options=IPMOptions(tol=1e-8, max_iter=40))
    B = 4
    states = broadcast_state(warm, B)
    x0 = jnp.asarray(0.02 * np.random.default_rng(0).standard_normal((B, 2)))
    states, u0, kkt, viol = ctrl(states, x0)
    assert float(jnp.max(kkt)) < 1e-8
    assert float(jnp.max(viol)) < 1e-10
    # a second tick from the updated state stays converged
    states, u0, kkt, viol = ctrl(states, x0)
    assert float(jnp.max(kkt)) < 1e-10
