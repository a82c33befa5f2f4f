"""OCP model layer unit tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctdirect_tpu import PreOCP, InitialGuess
from ctdirect_tpu.model.ocp import TimeSpec


def test_builder_minimal():
    pre = PreOCP("p")
    pre.state(2).control(1)
    pre.time(t0=0.0, tf=1.0)
    pre.dynamics(lambda t, x, u, v: jnp.array([x[1], u[0]]))
    pre.objective(lagrange=lambda t, x, u, v: u[0] ** 2)
    ocp = pre.build()
    assert ocp.n == 2 and ocp.m == 1 and ocp.q == 0
    assert ocp.time.fixed
    assert not ocp.maximize
    assert ocp.n_path == 0 and ocp.n_boundary == 0
    np.testing.assert_array_equal(ocp.x_lb, [-np.inf, -np.inf])


def test_timespec_validation():
    with pytest.raises(ValueError):
        TimeSpec(t0=0.0, tf=None, tf_index=None)
    with pytest.raises(ValueError):
        TimeSpec(t0=0.0, t0_index=0, tf=1.0)
    ts = TimeSpec(t0=0.0, tf_index=0)
    assert ts.free_tf and not ts.free_t0 and not ts.fixed


def test_box_bounds_intersect():
    pre = PreOCP()
    pre.state(3)
    pre.state_bounds(lb=[0.0], rg=[1])
    pre.state_bounds(lb=[-1.0, 0.5], ub=[2.0, 2.0], rg=[1, 2])
    pre.control(0)
    pre.time(t0=0.0, tf=1.0)
    pre.dynamics(lambda t, x, u, v: x)
    pre.objective(mayer=lambda x0, xf, v: xf[0])
    ocp = pre.build()
    # intersection: lb[1] = max(0, -1) = 0
    np.testing.assert_array_equal(ocp.x_lb, [-np.inf, 0.0, 0.5])
    np.testing.assert_array_equal(ocp.x_ub, [np.inf, 2.0, 2.0])


def test_boundary_concat():
    pre = PreOCP()
    pre.state(2).control(1)
    pre.time(t0=0.0, tf=1.0)
    pre.dynamics(lambda t, x, u, v: jnp.array([x[1], u[0]]))
    pre.objective(mayer=lambda x0, xf, v: xf[0])
    pre.initial_state([1.0, 2.0])
    pre.final_state([3.0], rg=[1])
    ocp = pre.build()
    assert ocp.n_boundary == 3
    out = np.asarray(ocp.boundary(jnp.array([1.0, 2.0]), jnp.array([9.0, 3.0]), jnp.zeros(0)))
    np.testing.assert_allclose(out, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(ocp.boundary_lb, [1.0, 2.0, 3.0])


def test_initial_guess_default_and_forms():
    t = np.linspace(0, 1, 5)
    ig = InitialGuess()
    # reference-mandated 0.1 default (DOCP_variables.jl:122–145)
    np.testing.assert_allclose(ig.eval_state(t, 2), 0.1)
    np.testing.assert_allclose(ig.eval_variable(3), 0.1)

    ig2 = InitialGuess(state=[1.0, 2.0], control=lambda tt: [tt * 2], variable=[5.0])
    xs = ig2.eval_state(t, 2)
    np.testing.assert_allclose(xs[:, 0], 1.0)
    np.testing.assert_allclose(xs[:, 1], 2.0)
    us = ig2.eval_control(t, 1)
    np.testing.assert_allclose(us[:, 0], 2 * t)
    np.testing.assert_allclose(ig2.eval_variable(1), [5.0])

    # interpolation table
    ig3 = InitialGuess(state=(np.array([0.0, 1.0]), np.array([[0.0, 0.0], [1.0, 2.0]])))
    xs3 = ig3.eval_state(t, 2)
    np.testing.assert_allclose(xs3[:, 1], 2 * t)


def test_zero_control_model():
    pre = PreOCP("zero_u")
    pre.state(1).control(0).variable(1)
    pre.time(t0=0.0, tf=1.0)
    pre.dynamics(lambda t, x, u, v: jnp.array([v[0] * x[0]]))
    pre.objective(mayer=lambda x0, xf, v: xf[0])
    ocp = pre.build()
    assert ocp.m == 0
    out = ocp.dynamics(0.0, jnp.array([2.0]), jnp.zeros((0,)), jnp.array([3.0]))
    np.testing.assert_allclose(np.asarray(out), [6.0])
