"""From-scratch primal-dual interior-point NLP solver in JAX.

Replaces the reference stack's external C++/Fortran/Julia solvers (Ipopt + MUMPS,
MadNLP — SURVEY.md §2.2, L5) with a solver whose every iteration is a fixed-shape
JAX program: the whole solve `jit`s, `vmap`s across thousands of problem
instances, and shards over device meshes. No tape AD, no sparsity detection, no
general sparse LU — derivatives come from `jax.grad`/`jax.hessian`/`jax.jacfwd`,
and the KKT solve is pluggable (dense LU for small problems, block-structured
cyclic reduction for collocation NLPs).

Problem form (the DOCP emits exactly this):

    min  f(z)   s.t.   cl <= c(z) <= cu,   zl <= z <= zu

Rows with cl == cu are equalities; the rest get slacks s with box [cl, cu]
(Ipopt's formulation). Barrier terms are applied to every finite bound of z and
s. The Newton system is condensed to the symmetric (nz + nc) form

    [ W + Sigma_z + dw*I    J^T          ] [dz  ]   [ -rbar_z ]
    [ J                     -(D + dc*I)  ] [dlam] = [ -rbar_p ]

with D = 0 on equality rows and Sigma_s^{-1} on inequality rows, followed by
recovery of ds and the bound multiplier steps, fraction-to-boundary step limits,
and a backtracking line search on the l1-penalty merit function. Regularization
(dw, dc) is adapted inertia-free: if the step has insufficient positive
curvature (or the solve produced NaNs), dw is increased and the KKT system
re-solved — the structured analogue of Ipopt's inertia-correction loop
(which we cannot replicate without an LDL^T inertia signal; SURVEY.md §7.3.1).

Monotone Fiacco-McCormick barrier schedule (Ipopt defaults: kappa_mu = 0.2,
theta_mu = 1.5), Ipopt-scaled termination error, and a fixed-iteration
`lax.while_loop` so batched instances with divergent iteration counts simply
mask out (SURVEY.md §7.3.3).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------------
# Specs
# ----------------------------------------------------------------------------


@dataclass(frozen=True)
class IPMOptions:
    """Solver options (≙ the reference's Ipopt/MadNLP option dicts,
    test/test_common.jl:66–94; defaults chosen to match Ipopt's)."""

    tol: float = 1e-8
    mu_init: float = 0.1
    mu_min: float = 1e-12
    kappa_mu: float = 0.2  # linear barrier decrease factor
    theta_mu: float = 1.5  # superlinear barrier decrease exponent
    kappa_eps: float = 10.0  # barrier subproblem tolerance = kappa_eps * mu
    tau_min: float = 0.99  # fraction-to-boundary minimum
    max_iter: int = 200
    max_ls: int = 25  # backtracking steps
    eta_ls: float = 1e-4  # Armijo constant
    s_max: float = 100.0  # KKT error scaling threshold (Ipopt s_max)
    kappa_push: float = 1e-2  # initial-point push from bounds
    delta_w_init: float = 1e-8
    delta_w_max: float = 1e20
    delta_c: float = 1e-8  # constraint-block regularization
    max_reg_trials: int = 20
    nu_init: float = 1.0  # l1 merit penalty init
    curvature_frac: float = 1e-9  # required dz'(W+Sigma)dz >= frac*|dz|^2
    max_soft_fail: int = 8  # consecutive failed line searches before abort

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class NLPSpec(NamedTuple):
    """Static structure of the NLP (masks are concrete numpy bools — they define
    the compiled program; bound *values* are runtime arrays)."""

    nz: int
    nc: int
    eq_mask: np.ndarray  # (nc,) True on equality rows (cl == cu)
    zl_mask: np.ndarray  # (nz,) True where zl finite
    zu_mask: np.ndarray
    sl_mask: np.ndarray  # (nc,) finite lower bound on inequality-row slack
    su_mask: np.ndarray


def make_spec(zl, zu, cl, cu) -> NLPSpec:
    zl, zu = np.asarray(zl), np.asarray(zu)
    cl, cu = np.asarray(cl), np.asarray(cu)
    eq = np.isfinite(cl) & np.isfinite(cu) & (cl == cu)
    ineq = ~eq
    return NLPSpec(
        nz=zl.shape[0],
        nc=cl.shape[0],
        eq_mask=eq,
        zl_mask=np.isfinite(zl),
        zu_mask=np.isfinite(zu),
        sl_mask=ineq & np.isfinite(cl),
        su_mask=ineq & np.isfinite(cu),
    )


class IPMResult(NamedTuple):
    z: jnp.ndarray
    lam: jnp.ndarray  # constraint multipliers (nc,)
    zL: jnp.ndarray  # lower bound multipliers on z (nz,)
    zU: jnp.ndarray
    s: jnp.ndarray  # slacks (nc; meaningful on inequality rows)
    objective: jnp.ndarray
    iterations: jnp.ndarray
    kkt_error: jnp.ndarray
    constraints_violation: jnp.ndarray
    status: jnp.ndarray  # 0 solved, 1 max_iter, 2 line-search stall, 3 diverged
    successful: jnp.ndarray  # bool


STATUS_MESSAGES = {
    0: "Solve_Succeeded",
    1: "Maximum_Iterations_Exceeded",
    2: "Search_Direction_Becomes_Too_Small",
    3: "Diverging_Iterates",
}


# ----------------------------------------------------------------------------
# Helpers
# ----------------------------------------------------------------------------


def _safe_gap(x, lb, mask):
    """x - lb where the bound is finite, else 1 (keeps arithmetic NaN-free)."""
    return jnp.where(mask, x - jnp.where(mask, lb, 0.0), 1.0)


def _max_step_to_boundary(x, dx, lb, ub, lmask, umask, tau):
    """Largest alpha in (0, 1] with x + alpha dx >= lb + (1-tau) gap etc."""
    gapL = _safe_gap(x, lb, lmask)
    gapU = _safe_gap(ub, x, umask)
    # alpha limit where dx pushes toward a finite bound
    aL = jnp.where(lmask & (dx < 0), -tau * gapL / jnp.where(dx < 0, dx, -1.0), 1.0)
    aU = jnp.where(umask & (dx > 0), tau * gapU / jnp.where(dx > 0, dx, 1.0), 1.0)
    lo = jnp.minimum(jnp.min(aL, initial=1.0), jnp.min(aU, initial=1.0))
    return jnp.clip(lo, 0.0, 1.0)


def _dual_step_to_boundary(w, dw, mask, tau):
    """Largest alpha keeping w + alpha dw >= (1-tau) w (w >= 0 duals)."""
    a = jnp.where(mask & (dw < 0), -tau * w / jnp.where(dw < 0, dw, -1.0), 1.0)
    return jnp.clip(jnp.min(a, initial=1.0), 0.0, 1.0)


# ----------------------------------------------------------------------------
# Core solver
# ----------------------------------------------------------------------------


class _Carry(NamedTuple):
    z: jnp.ndarray
    s: jnp.ndarray  # (nc,) slacks; 0 on eq rows
    lam: jnp.ndarray
    wL: jnp.ndarray  # z lower bound duals
    wU: jnp.ndarray
    yL: jnp.ndarray  # slack lower bound duals
    yU: jnp.ndarray
    mu: jnp.ndarray
    nu: jnp.ndarray  # merit penalty
    delta_w_last: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    status: jnp.ndarray
    kkt_err: jnp.ndarray
    soft_fails: jnp.ndarray


def ipm_solve(
    f: Callable,
    c: Callable,
    spec: NLPSpec,
    z0,
    zl,
    zu,
    cl,
    cu,
    options: IPMOptions = IPMOptions(),
    kkt_solve: Optional[Callable] = None,
    hess_and_jac: Optional[Callable] = None,
) -> IPMResult:
    """Solve the NLP. Fully traceable: jit/vmap over z0 and bound values.

    kkt_solve(Hbar, J, Dreg, rz, rp) -> (dz, dlam) solves the condensed system;
    default is a dense symmetric-indefinite solve. hess_and_jac(z, lam) ->
    (W, J) supplies the Lagrangian Hessian and constraint Jacobian; default is
    dense jax.hessian / jax.jacfwd. Both hooks exist so the structured
    block-tridiagonal path can reuse this exact iteration loop.
    """
    opts = options
    nz, nc = spec.nz, spec.nc
    dtype = jnp.result_type(jnp.asarray(z0).dtype, jnp.float32)

    z0 = jnp.asarray(z0, dtype)
    zl = jnp.asarray(zl, dtype)
    zu = jnp.asarray(zu, dtype)
    cl = jnp.asarray(cl, dtype)
    cu = jnp.asarray(cu, dtype)

    eq = jnp.asarray(spec.eq_mask)
    ineq = ~eq
    zlm = jnp.asarray(spec.zl_mask)
    zum = jnp.asarray(spec.zu_mask)
    slm = jnp.asarray(spec.sl_mask)
    sum_ = jnp.asarray(spec.su_mask)
    n_duals = float(nc + nz)  # for Ipopt-style scaling

    grad_f = jax.grad(f)
    if hess_and_jac is None:

        def hess_and_jac(z, lam):
            W = jax.hessian(lambda zz: f(zz) + jnp.dot(lam, c(zz)))(z)
            J = jax.jacfwd(c)(z)
            return W, J

    if kkt_solve is None:

        def kkt_solve(Hbar, J, Dreg, rz, rp):
            KKT = jnp.block([[Hbar, J.T], [J, -jnp.diag(Dreg)]])
            sol = jnp.linalg.solve(KKT, -jnp.concatenate([rz, rp]))
            return sol[:nz], sol[nz:]

    # slack bounds: cl/cu on inequality rows; harmless [0,0] placeholders on eq rows
    sl = jnp.where(ineq, cl, 0.0)
    su = jnp.where(ineq, cu, 0.0)

    # ---- initial point (Ipopt-style push into the interior) ----
    kap = opts.kappa_push

    def push_interior(x, lb, ub, lmask, umask):
        lo = jnp.where(lmask, lb, -jnp.inf)
        hi = jnp.where(umask, ub, jnp.inf)
        width = jnp.where(lmask & umask, hi - lo, jnp.inf)
        pL = jnp.where(lmask, jnp.minimum(kap * jnp.maximum(1.0, jnp.abs(lo)), 0.5 * width), 0.0)
        pU = jnp.where(umask, jnp.minimum(kap * jnp.maximum(1.0, jnp.abs(hi)), 0.5 * width), 0.0)
        x = jnp.where(lmask, jnp.maximum(x, lo + pL), x)
        x = jnp.where(umask, jnp.minimum(x, hi - pU), x)
        return x

    z_init = push_interior(z0, zl, zu, zlm, zum)
    c0 = c(z_init)
    s_init = jnp.where(ineq, push_interior(c0, sl, su, slm, sum_), 0.0)

    mu0 = jnp.asarray(opts.mu_init, dtype)
    gapL0 = _safe_gap(z_init, zl, zlm)
    gapU0 = _safe_gap(zu, z_init, zum)
    sgapL0 = _safe_gap(s_init, sl, slm)
    sgapU0 = _safe_gap(su, s_init, sum_)
    wL0 = jnp.where(zlm, mu0 / gapL0, 0.0)
    wU0 = jnp.where(zum, mu0 / gapU0, 0.0)
    yL0 = jnp.where(slm, mu0 / sgapL0, 0.0)
    yU0 = jnp.where(sum_, mu0 / sgapU0, 0.0)

    rhs_eq = jnp.where(eq, cl, 0.0)

    # ---- residuals ----
    def primal_residual(z, s):
        return c(z) - rhs_eq - jnp.where(ineq, s, 0.0)

    def kkt_error(z, s, lam, wL, wU, yL, yU, mu):
        """Ipopt's scaled optimality error E_mu (Waechter-Biegler eq. 5)."""
        gL = _safe_gap(z, zl, zlm)
        gU = _safe_gap(zu, z, zum)
        sgL = _safe_gap(s, sl, slm)
        sgU = _safe_gap(su, s, sum_)
        r_d = grad_f(z) + jax.vjp(c, z)[1](lam)[0] - wL + wU
        r_s = jnp.where(ineq, -lam - yL + yU, 0.0)
        r_p = primal_residual(z, s)
        compl = jnp.concatenate(
            [
                jnp.where(zlm, wL * gL - mu, 0.0),
                jnp.where(zum, wU * gU - mu, 0.0),
                jnp.where(slm, yL * sgL - mu, 0.0),
                jnp.where(sum_, yU * sgU - mu, 0.0),
            ]
        )
        bound_dual_sum = jnp.sum(wL + wU) + jnp.sum(yL + yU)
        dual_sum = jnp.sum(jnp.abs(lam)) + bound_dual_sum
        s_d = jnp.maximum(opts.s_max, dual_sum / n_duals) / opts.s_max
        s_c = (
            jnp.maximum(opts.s_max, bound_dual_sum / jnp.maximum(1.0, float(nz + nc)))
            / opts.s_max
        )
        e_d = jnp.max(jnp.abs(jnp.concatenate([r_d, r_s]))) / s_d
        e_p = jnp.max(jnp.abs(r_p), initial=0.0)
        e_c = jnp.max(jnp.abs(compl), initial=0.0) / s_c
        return jnp.maximum(jnp.maximum(e_d, e_p), e_c), e_p

    def barrier_phi(z, s):
        gL = _safe_gap(z, zl, zlm)
        gU = _safe_gap(zu, z, zum)
        sgL = _safe_gap(s, sl, slm)
        sgU = _safe_gap(su, s, sum_)
        barr = (
            jnp.sum(jnp.where(zlm, jnp.log(gL), 0.0))
            + jnp.sum(jnp.where(zum, jnp.log(gU), 0.0))
            + jnp.sum(jnp.where(slm, jnp.log(sgL), 0.0))
            + jnp.sum(jnp.where(sum_, jnp.log(sgU), 0.0))
        )
        return f(z), barr

    # ---- one IPM iteration ----
    def step(carry: _Carry) -> _Carry:
        z, s, lam, wL, wU, yL, yU = (
            carry.z,
            carry.s,
            carry.lam,
            carry.wL,
            carry.wU,
            carry.yL,
            carry.yU,
        )
        mu = carry.mu

        gL = _safe_gap(z, zl, zlm)
        gU = _safe_gap(zu, z, zum)
        sgL = _safe_gap(s, sl, slm)
        sgU = _safe_gap(su, s, sum_)

        sigma_z = jnp.where(zlm, wL / gL, 0.0) + jnp.where(zum, wU / gU, 0.0)
        sigma_s = jnp.where(slm, yL / sgL, 0.0) + jnp.where(sum_, yU / sgU, 0.0)
        # inequality rows with no finite slack bound at all would make D singular;
        # the DOCP never emits such rows, but guard anyway
        sigma_s = jnp.where(ineq, jnp.maximum(sigma_s, 1e-12), 1.0)

        W, J = hess_and_jac(z, lam)

        gf = grad_f(z)
        rbar_z = (
            gf
            + jax.vjp(c, z)[1](lam)[0]
            - jnp.where(zlm, mu / gL, 0.0)
            + jnp.where(zum, mu / gU, 0.0)
        )
        rbar_s = jnp.where(ineq, -lam - jnp.where(slm, mu / sgL, 0.0) + jnp.where(sum_, mu / sgU, 0.0), 0.0)
        r_p = primal_residual(z, s)
        rbar_p = r_p + jnp.where(ineq, rbar_s / sigma_s, 0.0)

        Drow = jnp.where(ineq, 1.0 / sigma_s, 0.0)

        # ---- regularized KKT solve with inertia-free curvature retry ----
        Hbar_base = W + jnp.diag(sigma_z)
        h_scale = 1.0 + jnp.max(jnp.abs(Hbar_base))

        def reg_solve(trial):
            delta_w, _ = trial
            Dreg = Drow + opts.delta_c
            dz, dlam = kkt_solve(
                Hbar_base + delta_w * jnp.eye(nz, dtype=dtype), J, Dreg, rbar_z, rbar_p
            )
            curv = dz @ (Hbar_base @ dz) + delta_w * (dz @ dz)
            ok = (
                jnp.all(jnp.isfinite(dz))
                & jnp.all(jnp.isfinite(dlam))
                & (curv >= opts.curvature_frac * (dz @ dz))
            )
            return dz, dlam, ok

        def reg_cond(state):
            (delta_w, trials), _, _, ok = state
            return (~ok) & (trials < opts.max_reg_trials)

        def reg_body(state):
            (delta_w, trials), _, _, _ = state
            new_dw = jnp.where(
                trials == 0,
                jnp.maximum(opts.delta_w_init * h_scale, carry.delta_w_last / 3.0),
                delta_w * 10.0,
            )
            dz, dlam, ok = reg_solve((new_dw, trials))
            return (new_dw, trials + 1), dz, dlam, ok

        dz0_, dlam0_, ok0 = reg_solve((jnp.asarray(0.0, dtype), -1))
        (delta_w_used, _), dz, dlam, solve_ok = jax.lax.while_loop(
            reg_cond, reg_body, ((jnp.asarray(0.0, dtype), jnp.asarray(0, jnp.int32)), dz0_, dlam0_, ok0)
        )
        delta_w_last = jnp.where(delta_w_used > 0, delta_w_used, carry.delta_w_last)

        ds = jnp.where(ineq, (dlam - rbar_s) / sigma_s, 0.0)
        dwL = jnp.where(zlm, -(wL / gL) * dz - wL + mu / gL, 0.0)
        dwU = jnp.where(zum, (wU / gU) * dz - wU + mu / gU, 0.0)
        dyL = jnp.where(slm, -(yL / sgL) * ds - yL + mu / sgL, 0.0)
        dyU = jnp.where(sum_, (yU / sgU) * ds - yU + mu / sgU, 0.0)

        # ---- fraction-to-boundary ----
        tau = jnp.maximum(opts.tau_min, 1.0 - mu)
        a_z = _max_step_to_boundary(z, dz, zl, zu, zlm, zum, tau)
        a_s = _max_step_to_boundary(s, ds, sl, su, slm, sum_, tau)
        alpha_max = jnp.minimum(a_z, a_s)
        a_wL = _dual_step_to_boundary(wL, dwL, zlm, tau)
        a_wU = _dual_step_to_boundary(wU, dwU, zum, tau)
        a_yL = _dual_step_to_boundary(yL, dyL, slm, tau)
        a_yU = _dual_step_to_boundary(yU, dyU, sum_, tau)
        alpha_dual = jnp.minimum(jnp.minimum(a_wL, a_wU), jnp.minimum(a_yL, a_yU))

        # ---- l1 merit line search ----
        theta0 = jnp.sum(jnp.abs(r_p))
        # merit slope: grad phi . d  - nu * theta
        dphi = (
            gf @ dz
            - jnp.sum(jnp.where(zlm, mu / gL * dz, 0.0))
            + jnp.sum(jnp.where(zum, mu / gU * dz, 0.0))
            - jnp.sum(jnp.where(slm, mu / sgL * ds, 0.0))
            + jnp.sum(jnp.where(sum_, mu / sgU * ds, 0.0))
        )
        nu_req = jnp.max(jnp.abs(lam + dlam), initial=0.0) * 1.1 + 1e-4
        nu = jnp.maximum(carry.nu, nu_req)
        # keep the direction a descent direction for the merit
        nu = jnp.where(
            theta0 > 1e-14,
            jnp.maximum(nu, (dphi + 1e-12) / (0.5 * theta0 + 1e-30) + 1e-4),
            nu,
        )
        slope = dphi - nu * theta0

        f0, b0 = barrier_phi(z, s)
        psi0 = f0 - mu * b0 + nu * theta0

        def ls_cond(state):
            alpha, ls_it, accepted = state
            return (~accepted) & (ls_it < opts.max_ls)

        def ls_body(state):
            alpha, ls_it, _ = state
            zt = z + alpha * dz
            st = s + alpha * ds
            ft, bt = barrier_phi(zt, st)
            thetat = jnp.sum(jnp.abs(primal_residual(zt, st)))
            psit = ft - mu * bt + nu * thetat
            ok = jnp.isfinite(psit) & (psit <= psi0 + opts.eta_ls * alpha * slope)
            return jnp.where(ok, alpha, alpha * 0.5), ls_it + 1, ok

        alpha, _, ls_ok = jax.lax.while_loop(
            ls_cond, ls_body, (alpha_max, jnp.asarray(0, jnp.int32), jnp.asarray(False))
        )
        alpha = jnp.where(ls_ok, alpha, alpha_max * (0.5 ** opts.max_ls))
        soft_fails = jnp.where(ls_ok & solve_ok, 0, carry.soft_fails + 1)

        z_n = z + alpha * dz
        s_n = s + alpha * ds
        lam_n = lam + alpha * dlam
        wL_n = jnp.clip(wL + alpha_dual * dwL, 0.0)
        wU_n = jnp.clip(wU + alpha_dual * dwU, 0.0)
        yL_n = jnp.clip(yL + alpha_dual * dyL, 0.0)
        yU_n = jnp.clip(yU + alpha_dual * dyU, 0.0)

        # Ipopt's kappa_Sigma dual safeguard: keep bound duals consistent with mu
        def clamp_dual(wv, gap, mask):
            lo = mu / (1e10 * gap)
            hi = 1e10 * mu / gap
            return jnp.where(mask, jnp.clip(wv, lo, hi), 0.0)

        gLn = _safe_gap(z_n, zl, zlm)
        gUn = _safe_gap(zu, z_n, zum)
        sgLn = _safe_gap(s_n, sl, slm)
        sgUn = _safe_gap(su, s_n, sum_)
        wL_n = clamp_dual(wL_n, gLn, zlm)
        wU_n = clamp_dual(wU_n, gUn, zum)
        yL_n = clamp_dual(yL_n, sgLn, slm)
        yU_n = clamp_dual(yU_n, sgUn, sum_)

        # ---- convergence & barrier update ----
        err_mu, _ = kkt_error(z_n, s_n, lam_n, wL_n, wU_n, yL_n, yU_n, mu)
        err_0, viol = kkt_error(z_n, s_n, lam_n, wL_n, wU_n, yL_n, yU_n, 0.0)

        mu_next = jnp.where(
            err_mu <= opts.kappa_eps * mu,
            jnp.maximum(
                opts.mu_min,
                jnp.minimum(opts.kappa_mu * mu, mu**opts.theta_mu),
            ),
            mu,
        )
        mu_next = jnp.maximum(mu_next, opts.mu_min)

        converged = err_0 <= opts.tol
        diverged = ~jnp.isfinite(err_0) | (jnp.max(jnp.abs(z_n)) > 1e20)
        stalled = soft_fails >= opts.max_soft_fail
        done = converged | diverged | stalled
        status = jnp.where(
            converged, 0, jnp.where(diverged, 3, jnp.where(stalled, 2, 1))
        ).astype(jnp.int32)

        return _Carry(
            z=z_n,
            s=s_n,
            lam=lam_n,
            wL=wL_n,
            wU=wU_n,
            yL=yL_n,
            yU=yU_n,
            mu=mu_next,
            nu=nu,
            delta_w_last=delta_w_last,
            it=carry.it + 1,
            done=done,
            status=status,
            kkt_err=err_0,
            soft_fails=soft_fails,
        )

    # ---- driver loop ----
    lam0 = jnp.zeros((nc,), dtype)
    err_init, viol_init = kkt_error(z_init, s_init, lam0, wL0, wU0, yL0, yU0, 0.0)

    init_carry = _Carry(
        z=z_init,
        s=s_init,
        lam=lam0,
        wL=wL0,
        wU=wU0,
        yL=yL0,
        yU=yU0,
        mu=mu0,
        nu=jnp.asarray(opts.nu_init, dtype),
        delta_w_last=jnp.asarray(0.0, dtype),
        it=jnp.asarray(0, jnp.int32),
        done=err_init <= opts.tol,
        status=jnp.where(err_init <= opts.tol, 0, 1).astype(jnp.int32),
        kkt_err=err_init,
        soft_fails=jnp.asarray(0, jnp.int32),
    )

    if opts.max_iter == 0:
        final = init_carry
    else:
        final = jax.lax.while_loop(
            lambda cr: (~cr.done) & (cr.it < opts.max_iter),
            step,
            init_carry,
        )

    _, viol_final = kkt_error(
        final.z, final.s, final.lam, final.wL, final.wU, final.yL, final.yU, 0.0
    )
    status = jnp.where(
        final.done, final.status, jnp.asarray(1, jnp.int32)
    )
    if opts.max_iter == 0:
        # transcription round-trip mode (reference max_iter=0 trick,
        # test/ci/test_initial_guess.jl:6–54): report the init as "solved"
        status = jnp.asarray(0, jnp.int32)

    return IPMResult(
        z=final.z,
        lam=final.lam,
        zL=final.wL,
        zU=final.wU,
        s=final.s,
        objective=f(final.z),
        iterations=final.it,
        kkt_error=final.kkt_err,
        constraints_violation=viol_final,
        status=status,
        successful=status == 0,
    )
