"""End-to-end solve tests against analytic and reference oracles.

Mirrors the reference test strategy (SURVEY.md §4): every test does a real
interior-point solve and checks the objective against a stored reference value at
rtol 1e-2 (reference runtests.jl:5–11), plus the analytic control/costate oracle
on the double integrator (test/ci/test_modeler_solver.jl:50–89)."""

import numpy as np
import pytest

from ctdirect_tpu import InitialGuess, transcribe
from ctdirect_tpu.problems import get_problem
from ctdirect_tpu.solver.interface import solve_docp
from ctdirect_tpu.solver.ipm import IPMOptions


def run(name, grid_size, scheme="trapeze", tol=1e-8, **kw):
    p = get_problem(name)
    docp = transcribe(p.ocp, grid_size=grid_size, scheme=scheme)
    sol = solve_docp(docp, init=p.init, options=IPMOptions(tol=tol, **kw))
    return p, sol


def test_double_integrator_analytic():
    """Analytic oracle: u(t) = 6-12t, p(t) = [24, 12-24t] (T=1)."""
    p, sol = run("double_integrator_minenergy", 100)
    assert sol.successful
    t = sol.time_grid
    u = sol.control_values[:, 0]
    # interior controls match analytic at O(h^2); endpoints have the classic
    # O(h) discrete boundary layer of the trapeze optimum
    assert np.max(np.abs(u[2:-2] - (6 - 12 * t[2:-2]))) < 5e-3, "interior control error"
    np.testing.assert_allclose(sol.objective, 12.0, rtol=1e-2)
    P = sol.costate_values
    np.testing.assert_allclose(P[:-1, 0], 24.0, rtol=1e-2)
    # defect-row multiplier i approximates the costate at the interval midpoint
    tm = 0.5 * (t[:-1] + t[1:])
    np.testing.assert_allclose(P[:-1, 1], 12 - 24 * tm, rtol=1e-2, atol=0.05)


@pytest.mark.parametrize(
    "name,grid,scheme,rtol",
    [
        ("double_integrator_mintf", 50, "trapeze", 1e-2),
        ("double_integrator_nobounds", 50, "trapeze", 1e-2),
        ("beam", 100, "trapeze", 1e-2),
        ("fuller", 100, "trapeze", 1e-2),
        ("vanderpol", 100, "trapeze", 1e-2),
        ("jackson", 100, "trapeze", 1e-2),
        ("simple_integrator", 50, "trapeze", 1e-2),
        ("beam", 50, "gauss_legendre_2", 2e-3),
        ("vanderpol", 50, "midpoint", 1e-2),
    ],
)
def test_reference_objectives(name, grid, scheme, rtol):
    p, sol = run(name, grid, scheme)
    assert sol.successful, sol.message
    np.testing.assert_allclose(sol.objective, p.obj, rtol=rtol)


def test_free_t0tf():
    """Max-t0 with both endpoints free: obj 8 (double_integrator.jl:79–98).
    Starts from the degenerate t0 = tf = 0.1 default init."""
    p, sol = run("double_integrator_freet0tf", 50)
    assert sol.successful
    np.testing.assert_allclose(sol.objective, 8.0, rtol=1e-2)
    np.testing.assert_allclose(sol.variable, [8.0, 10.0], rtol=1e-2)


def test_goddard_free_tf():
    """Goddard: free tf, active speed arc, bang-bang control; obj 1.01257."""
    p, sol = run("goddard", 100)
    np.testing.assert_allclose(sol.objective, 1.01257, rtol=1e-2)
    # final mass pinned by boundary constraint
    np.testing.assert_allclose(sol.state_values[-1, 2], 0.6, atol=1e-4)


def test_goddard_box_dual_groups():
    """Per-group box-multiplier views (≙ build_OCP_solution's per-node
    state/control/variable bound-multiplier unpacking, DOCP_data.jl:521–560):
    on goddard's active speed-limit arc (v == vmax) the upper state-box
    multiplier for v must be active — positive in the minimization sense
    (goddard maximizes, so the user-sense sign is flipped) — and ~zero away
    from the arc."""
    p, sol = run("goddard", 100)
    v = sol.state_values[:, 1]
    on = np.where(v > 0.1 - 1e-4)[0]
    assert len(on) > 5  # the constrained arc exists
    up = sol.state_box_duals_upper  # (N+1, n), user (max) sense
    internal_up = -up[:, 1]  # minimization-sense multiplier, >= 0
    assert internal_up[on].max() > 1e-4
    off = np.setdiff1d(np.arange(len(v)), np.concatenate([on, on - 1, on + 1]))
    assert np.abs(internal_up[off]).max() < 1e-5
    # functional accessors agree with the grid views
    t_mid = sol.time_grid[on[len(on) // 2]]
    lo_t, up_t = sol.state_box_duals(t_mid)
    assert up_t.shape == (3,) and lo_t.shape == (3,)
    np.testing.assert_allclose(up_t[1], up[on[len(on) // 2], 1], rtol=1e-10)
    # control duals: bang arc at u = 1 early on -> active upper control bound
    clo, cup = sol.control_box_duals(sol.control_grid[1])
    assert clo.shape == (1,) and cup.shape == (1,)
    # variable (free tf, unbounded above; lb inactive) -> ~zero duals
    vlo, vup = sol.variable_box_duals
    assert vlo.shape == (1,) and np.abs(vlo).max() < 1e-6


def test_goddard_all_constraint_types():
    """Goddard with nonlinear path constraints + partial boxes (goddard.jl:87–158)."""
    p, sol = run("goddard_all", 60)
    np.testing.assert_allclose(sol.objective, 1.01257, rtol=1e-2)
    # path constraint rows produced duals of matching shape
    assert sol.path_duals is not None and sol.path_duals.shape == (61, 3)


def test_max_iter_zero_roundtrip():
    """max_iter=0 returns the init unchanged (test_initial_guess.jl:6–54)."""
    p = get_problem("beam")
    docp = transcribe(p.ocp, grid_size=20, scheme="trapeze")
    # NB. keep init values strictly interior: like Ipopt (bound_push), the IPM
    # pushes boundary-touching values into the interior even at max_iter=0
    ig = InitialGuess(state=lambda t: [0.02 + 0.05 * t, 0.1], control=[0.3])
    sol = solve_docp(docp, init=ig, options=IPMOptions(max_iter=0))
    assert sol.status == 0
    t = sol.time_grid
    np.testing.assert_allclose(sol.state_values[:, 0], 0.02 + 0.05 * t, atol=1e-12)
    np.testing.assert_allclose(sol.control_values[:, 0], 0.3, atol=1e-12)


def test_warm_start():
    """A previous Solution is a valid init (test_initial_guess.jl:179–185)."""
    p, sol = run("beam", 50)
    docp = transcribe(p.ocp, grid_size=50, scheme="trapeze")
    sol2 = solve_docp(docp, init=sol, options=IPMOptions(tol=1e-8))
    assert sol2.successful
    assert sol2.iterations <= sol.iterations
    np.testing.assert_allclose(sol2.objective, sol.objective, rtol=1e-6)


def test_maximize_sign_conventions():
    """Max problem: objective reported in user sense, duals flipped back."""
    p, sol = run("jackson", 50)
    assert sol.objective > 0  # maximized value, not the negated internal one
    np.testing.assert_allclose(sol.objective, 0.192011, rtol=1e-2)
