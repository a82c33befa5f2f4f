"""Structured (block-tridiagonal + arrowhead) KKT path vs the dense oracle.

The structured operator must produce EXACTLY the dense path's Newton direction
(same math, different factorization) — machine-precision agreement, not rtol."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctdirect_tpu import transcribe
from ctdirect_tpu.problems import get_problem
from ctdirect_tpu.solver.ipm import IPMOptions
from ctdirect_tpu.solver.interface import solve_docp
from ctdirect_tpu.solver.kkt import DenseKKT, gj_inverse, gj_solve
from ctdirect_tpu.solver.structured_kkt import StructuredKKT

# fast tier keeps one cell per structural feature (trapeze incl. free-tf/max/
# border, explicit+implicit euler); the IRK/midpoint cells are identical logic
# over bigger per-step blocks whose dense-oracle compile dominates CI time
# (~90-175 s each on CPU), so they run in the slow tier
CASES = [
    ("double_integrator_minenergy", "trapeze", 7),
    ("goddard", "trapeze", 6),  # free tf, maximize, boundary, v border
    pytest.param("goddard_all", "midpoint", 5, marks=pytest.mark.slow),  # nonlinear path rows + boundary
    ("vanderpol", "euler", 5),
    ("vanderpol", "euler_implicit", 5),
    pytest.param("beam", "gauss_legendre_2", 4, marks=pytest.mark.slow),  # stagewise IRK
    pytest.param("beam", "gauss_legendre_2_constant_control", 4, marks=pytest.mark.slow),
    pytest.param("fuller", "gauss_legendre_3", 3, marks=pytest.mark.slow),
]


@pytest.mark.parametrize("name,scheme,gs", CASES)
def test_direction_matches_dense(name, scheme, gs):
    rng = np.random.default_rng(42)
    p = get_problem(name)
    d = transcribe(p.ocp, grid_size=gs, scheme=scheme)
    dense = DenseKKT(d.nlp_objective, d.constraints, d.nz, d.nc)
    struct = StructuredKKT(d)
    z = jnp.asarray(d.initial_guess(p.init) + 0.01 * rng.standard_normal(d.nz))
    lam = jnp.asarray(rng.standard_normal(d.nc))
    sf = jnp.asarray(0.7)
    sc = jnp.asarray(rng.uniform(0.5, 1.0, d.nc))
    sigma = jnp.asarray(rng.uniform(0.1, 2.0, d.nz))
    Drow = jnp.asarray(rng.uniform(0.0, 1.0, d.nc))
    rz = jnp.asarray(rng.standard_normal(d.nz))
    rp = jnp.asarray(rng.standard_normal(d.nc))

    np.testing.assert_allclose(
        np.asarray(struct.row_norms(z)), np.asarray(dense.row_norms(z)), rtol=1e-12
    )
    dz_d, dl_d = dense.solve(dense.prepare(z, lam, sf, sc), sigma, Drow, 1e-6, 1e-7, rz, rp)
    dz_s, dl_s = struct.solve(struct.prepare(z, lam, sf, sc), sigma, Drow, 1e-6, 1e-7, rz, rp)
    scale = 1 + np.max(np.abs(np.asarray(dz_d)))
    np.testing.assert_allclose(np.asarray(dz_s), np.asarray(dz_d), atol=1e-9 * scale)
    scale_l = 1 + np.max(np.abs(np.asarray(dl_d)))
    np.testing.assert_allclose(np.asarray(dl_s), np.asarray(dl_d), atol=1e-9 * scale_l)


@pytest.mark.slow
def test_end_to_end_structured_equals_dense():
    p = get_problem("beam")
    d = transcribe(p.ocp, grid_size=40, scheme="trapeze")
    s_struct = solve_docp(d, options=IPMOptions(tol=1e-8, kkt_mode="structured"))
    s_dense = solve_docp(d, options=IPMOptions(tol=1e-8, kkt_mode="dense"))
    assert s_struct.successful and s_dense.successful
    np.testing.assert_allclose(s_struct.objective, s_dense.objective, rtol=1e-9)
    np.testing.assert_allclose(
        s_struct.state_values, s_dense.state_values, atol=1e-7
    )


def test_structured_free_tf_solve():
    p = get_problem("goddard")
    d = transcribe(p.ocp, grid_size=80, scheme="trapeze")
    s = solve_docp(d, init=p.init, options=IPMOptions(tol=1e-8, kkt_mode="structured"))
    np.testing.assert_allclose(s.objective, 1.01257, rtol=1e-2)


def test_gj_kernels():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((12, 12))
    A[0, 0] = 0.0  # force a pivot swap
    B = rng.standard_normal((12, 3))
    X = np.asarray(gj_solve(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(A @ X, B, atol=1e-10)
    Ainv = np.asarray(gj_inverse(jnp.asarray(A)))
    np.testing.assert_allclose(A @ Ainv, np.eye(12), atol=1e-10)
