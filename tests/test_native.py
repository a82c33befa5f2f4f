"""Native C++ block-tridiagonal solver vs the JAX structured solver."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctdirect_tpu import transcribe
from ctdirect_tpu import native
from ctdirect_tpu.problems import get_problem
from ctdirect_tpu.solver.structured_kkt import StructuredKKT, _scan_solve

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ toolchain unavailable"
)


def _blocks(name, scheme, gs, seed=7):
    rng = np.random.default_rng(seed)
    p = get_problem(name)
    d = transcribe(p.ocp, grid_size=gs, scheme=scheme)
    kkt = StructuredKKT(d)
    z = jnp.asarray(d.initial_guess(p.init) + 0.01 * rng.standard_normal(d.nz))
    lam = jnp.asarray(rng.standard_normal(d.nc))
    data = kkt.prepare(z, lam, jnp.asarray(1.0), jnp.ones(d.nc))
    sigma = jnp.asarray(rng.uniform(0.1, 2.0, d.nz))
    Drow = jnp.asarray(rng.uniform(0.0, 1.0, d.nc))
    rz = jnp.asarray(rng.standard_normal(d.nz))
    rp = jnp.asarray(rng.standard_normal(d.nc))
    return kkt._assemble(data, sigma, Drow, 1e-6, 1e-7, rz, rp)


@pytest.mark.parametrize(
    "name,scheme,gs",
    [
        ("double_integrator_minenergy", "trapeze", 50),
        pytest.param("goddard_all", "midpoint", 10, marks=pytest.mark.slow),
        ("beam", "gauss_legendre_2", 8),
    ],
)
def test_native_matches_jax(name, scheme, gs):
    A, B, E, F, r, rb = [np.asarray(x) for x in _blocks(name, scheme, gs)]
    Xj, xbj = _scan_solve(*[jnp.asarray(x) for x in (A, B, E, F, r, rb)])
    Xn, xbn = native.blocktri_solve(A, B, E, F, r, rb)
    scale = 1 + np.max(np.abs(np.asarray(Xj)))
    np.testing.assert_allclose(Xn, np.asarray(Xj), atol=1e-9 * scale)
    np.testing.assert_allclose(xbn, np.asarray(xbj), atol=1e-9 * scale)


def test_native_batch():
    A, B, E, F, r, rb = [np.asarray(x) for x in _blocks("beam", "trapeze", 20)]
    batch = 5
    Ab = np.tile(A, (batch, 1, 1, 1))
    Bb = np.tile(B, (batch, 1, 1, 1))
    Eb = np.tile(E, (batch, 1, 1, 1))
    Fb = np.tile(F, (batch, 1, 1))
    rbatch = np.tile(r, (batch, 1, 1))
    rbb = np.tile(rb, (batch, 1))
    rbatch[2] *= 2.0  # make one instance differ (scale BOTH rhs parts: linearity)
    rbb[2] *= 2.0
    Xb, xbb = native.blocktri_solve_batch(Ab, Bb, Eb, Fb, rbatch, rbb)
    X0, xb0 = native.blocktri_solve(A, B, E, F, r, rb)
    np.testing.assert_allclose(Xb[0], X0, atol=1e-12)
    np.testing.assert_allclose(Xb[2], 2 * X0, atol=1e-9)
    np.testing.assert_allclose(xbb[2], 2 * xb0, atol=1e-9)
