"""Pallas whole-CR kernel vs the XLA lane-minor engine (solver/pallas_cr.py).

Runs in interpret mode on CPU (tests/conftest.py forces the CPU backend); the
compiled-on-TPU timing lives in benchmarks/profile_tick.py --pallas. Both
engines implement the same elimination in the same order, so agreement is at
f32 roundoff, not discretization level."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctdirect_tpu.solver import lanes
from ctdirect_tpu.solver.pallas_cr import cr_solve_lanes_pallas, fits_vmem


def _random_chain(P, bs, wb, B, seed=0):
    """Random well-conditioned padded block chain in lane-minor f32 layout.

    A and F must be SYMMETRIC: the CR recurrences exploit the KKT system's
    symmetry (the reduced even-even subdiagonal is taken as the transpose of
    -Bl A_o^{-1} Br, which requires A_o = A_o^T). Couplings Bp/E are general."""
    rng = np.random.default_rng(seed)

    def rnd(*s):
        return rng.standard_normal(s).astype(np.float32)

    # diagonally-dominant symmetric blocks keep the chain invertible
    A = rnd(P, bs, bs, B) * 0.3
    A = A + np.swapaxes(A, 1, 2) + np.eye(bs, dtype=np.float32)[None, :, :, None] * 4.0
    Bp = rnd(P, bs, bs, B) * 0.3
    Bp[-1] = 0.0
    E = rnd(P, bs, wb, B) * 0.2
    F = rnd(wb, wb, B) * 0.2
    F = F + np.swapaxes(F, 0, 1) + np.eye(wb, dtype=np.float32)[:, :, None] * (4.0 + P)
    r = rnd(P, bs, B)
    rb = rnd(wb, B)
    return tuple(jnp.asarray(x) for x in (A, Bp, E, F, r, rb))


@pytest.mark.parametrize("P,bs,wb,B", [
    (8, 3, 2, 128),
    # bigger shapes are the same kernel at ~2-3 min CPU interpret-mode cost
    # each; the Pallas kernel is a demoted x64-off experiment (PALLAS_r04), so
    # they live in the slow tier
    pytest.param(16, 5, 5, 128, marks=pytest.mark.slow),
    pytest.param(32, 4, 3, 256, marks=pytest.mark.slow),
])
def test_pallas_cr_matches_lanes(P, bs, wb, B):
    chain = _random_chain(P, bs, wb, B)
    X_ref, xb_ref = lanes.cr_solve_lanes(*chain)
    X, xb = cr_solve_lanes_pallas(*chain, interpret=True)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(xb_ref), rtol=2e-4, atol=2e-4)


def test_pallas_cr_solves_the_system(P=16, bs=4, wb=3, B=128):
    """Independent oracle: reassemble the dense block-tridiagonal + arrowhead
    system for a few lanes and check the residual of the pallas solution."""
    chain = _random_chain(P, bs, wb, B, seed=3)
    A, Bp, E, F, r, rb = (np.asarray(x, dtype=np.float64) for x in chain)
    X, xb = cr_solve_lanes_pallas(*chain, interpret=True)
    X, xb = np.asarray(X, dtype=np.float64), np.asarray(xb, dtype=np.float64)
    n = P * bs + wb
    for lane in (0, 7, B - 1):
        K = np.zeros((n, n))
        rhs = np.zeros(n)
        for i in range(P):
            sl = slice(i * bs, (i + 1) * bs)
            K[sl, sl] = A[i, :, :, lane]
            if i + 1 < P:
                sl1 = slice((i + 1) * bs, (i + 2) * bs)
                K[sl, sl1] = Bp[i, :, :, lane]
                K[sl1, sl] = Bp[i, :, :, lane].T
            K[sl, P * bs :] = E[i, :, :, lane]
            K[P * bs :, sl] = E[i, :, :, lane].T
            rhs[sl] = r[i, :, lane]
        K[P * bs :, P * bs :] = F[:, :, lane]
        rhs[P * bs :] = rb[:, lane]
        x = np.concatenate([X[:, :, lane].reshape(-1), xb[:, lane]])
        # backward-error-style relative residual: |Kx - b| / (|K||x| + |b|);
        # the solve runs in f32 so the bound is ~cond * eps_f32
        resid = np.abs(K @ x - rhs).max()
        scale = np.abs(K).sum(axis=1).max() * np.abs(x).max() + np.abs(rhs).max()
        assert resid / scale < 2e-4, (lane, resid, scale)


def test_fits_vmem_envelope():
    assert fits_vmem(128, 5, 5, 64)  # headline MPC shape at the default chunk
    assert not fits_vmem(4096, 16, 16, 128)  # far outside
