"""Zero-dimensional control (pure parameter estimation) end-to-end
(≙ reference test/ci/test_zero_control.jl and test_zero_control_allocations.jl:
dims, getters/setters, bounds, and a real solve must all work with m = 0)."""

import numpy as np
import jax.numpy as jnp

from ctdirect_tpu import transcribe
from ctdirect_tpu.problems import get_problem
from ctdirect_tpu.solver.interface import solve_docp
from ctdirect_tpu.solver.ipm import IPMOptions


def test_dims_and_layout():
    p = get_problem("estimate_initial_condition")
    docp = transcribe(p.ocp, grid_size=10, scheme="trapeze")
    assert docp.m == 0 and docp.q == 2
    # trapeze: bw = n + m = 2; nz = 10*2 + 2 (tail x+u(empty)) + 2 (v)
    assert docp.bw == 2
    assert docp.nz == 10 * 2 + 2 + 2
    V = docp.unpack(jnp.asarray(np.arange(docp.nz, dtype=float)))
    assert V.U.shape == (11, 1, 0)
    z2 = np.asarray(docp.pack(V.X, V.U, V.K, V.v))
    np.testing.assert_allclose(z2, np.arange(docp.nz, dtype=float))


def test_solve_estimate_initial():
    """Estimated initial condition must be ~[1, 0] (quarter-period rotation)."""
    p = get_problem("estimate_initial_condition")
    docp = transcribe(p.ocp, grid_size=50, scheme="trapeze")
    sol = solve_docp(docp, options=IPMOptions(tol=1e-8))
    assert sol.successful
    np.testing.assert_allclose(sol.variable, [1.0, 0.0], atol=5e-3)
    # control accessor returns empty arrays (test_zero_control.jl:50–70)
    assert sol.control(0.5).shape == (0,)
    assert sol.control_values.shape[1] == 0


def test_solve_estimate_rotation():
    from ctdirect_tpu import InitialGuess

    p = get_problem("estimate_rotation_rate")
    docp = transcribe(p.ocp, grid_size=50, scheme="midpoint")
    # alpha has local minima at pi/2 + 2k*pi; start near the principal one
    sol = solve_docp(
        docp, init=InitialGuess(variable=[1.0]), options=IPMOptions(tol=1e-8)
    )
    assert sol.successful
    np.testing.assert_allclose(sol.variable[0], np.pi / 2, rtol=5e-2)


def test_zero_control_structured_kkt():
    """The structured path must handle zero-width control blocks."""
    from ctdirect_tpu.solver.kkt import DenseKKT
    from ctdirect_tpu.solver.structured_kkt import StructuredKKT

    rng = np.random.default_rng(1)
    p = get_problem("estimate_rotation_rate")
    d = transcribe(p.ocp, grid_size=6, scheme="trapeze")
    dense = DenseKKT(d.nlp_objective, d.constraints, d.nz, d.nc)
    struct = StructuredKKT(d)
    z = jnp.asarray(d.initial_guess(None) + 0.01 * rng.standard_normal(d.nz))
    lam = jnp.asarray(rng.standard_normal(d.nc))
    sigma = jnp.asarray(rng.uniform(0.1, 1.0, d.nz))
    Drow = jnp.asarray(rng.uniform(0.0, 1.0, d.nc))
    rz = jnp.asarray(rng.standard_normal(d.nz))
    rp = jnp.asarray(rng.standard_normal(d.nc))
    sf = jnp.asarray(1.0)
    sc = jnp.ones(d.nc)
    dz_d, dl_d = dense.solve(dense.prepare(z, lam, sf, sc), sigma, Drow, 1e-6, 1e-7, rz, rp)
    dz_s, dl_s = struct.solve(struct.prepare(z, lam, sf, sc), sigma, Drow, 1e-6, 1e-7, rz, rp)
    np.testing.assert_allclose(np.asarray(dz_s), np.asarray(dz_d), atol=1e-9)
    np.testing.assert_allclose(np.asarray(dl_s), np.asarray(dl_d), atol=1e-9)
