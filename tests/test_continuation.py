"""Continuation + warm-start sequences (≙ test_initial_guess.jl:188–266)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ctdirect_tpu.model.ocp import PreOCP
from ctdirect_tpu.solver.continuation import continuation
from ctdirect_tpu.solver.ipm import IPMOptions


def make_di_horizon(T):
    """Min-energy double integrator with horizon T (reference sweep T=1..5
    expects objectives [12, 1.5, 0.44, 0.19, 0.096])."""
    pre = PreOCP(f"di_T{T}")
    pre.state(2).control(1)
    pre.time(t0=0.0, tf=float(T))
    pre.dynamics(lambda t, x, u, v: jnp.array([x[1], u[0]]))
    pre.objective(lagrange=lambda t, x, u, v: u[0] ** 2)
    pre.initial_state([0.0, 0.0]).final_state([1.0, 0.0])
    return pre.build()


@pytest.mark.slow  # 5 sequential solve compiles (~50 s; fast-tier budget)
def test_horizon_continuation_objective_curve():
    sols = continuation(
        make_di_horizon,
        [1, 2, 3, 4, 5],
        grid_size=50,
        scheme="trapeze",
        options=IPMOptions(tol=1e-8),
    )
    objs = [s.objective for s in sols]
    # analytic: min ∫u² with x:0->1 over T is 12/T^3
    np.testing.assert_allclose(objs, [12 / T**3 for T in (1, 2, 3, 4, 5)], rtol=2e-2)
    assert all(s.successful for s in sols)
    # warm-started continuation steps converge quickly
    assert max(s.iterations for s in sols[1:]) <= 25
