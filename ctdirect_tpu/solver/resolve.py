"""Fixed-iteration warm resolve (real-time-iteration mode for batched MPC).

The full IPM (ipm.py) carries Ipopt-grade globalization: filter line search,
SOC, regularization retries — all data-dependent while_loops. A warm-started
MPC re-solve doesn't need any of that: the iterate starts next to the solution,
so K fixed predictor-corrector steps at a fixed small barrier parameter
converge quadratically. This module is that hot path: a branch-free,
fixed-shape program (K unrolled Newton steps, fraction-to-boundary step rule,
no line search) that compiles small, vmaps over thousands of instances, and is
the engine behind the headline solves/s benchmark (BASELINE.json).

The resolve consumes and produces a full primal-dual state, so controllers
hand the state from one horizon to the next (shift + resolve)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ctdirect_tpu.solver.ipm import (
    NLPSpec,
    _dual_step_to_boundary,
    _max_step_to_boundary,
    _safe_gap,
)


class WarmState(NamedTuple):
    """Full primal-dual state handed between resolves."""

    z: jnp.ndarray
    s: jnp.ndarray
    lam: jnp.ndarray
    wL: jnp.ndarray
    wU: jnp.ndarray
    yL: jnp.ndarray
    yU: jnp.ndarray


def warm_state_from_result(res) -> WarmState:
    """Build a WarmState from a full-IPM IPMResult (slack duals are
    reconstructed from complementarity at the result's implicit mu ~ 0:
    we re-init them from the gaps with a floor)."""
    return WarmState(
        z=jnp.asarray(res.z),
        s=jnp.asarray(res.s),
        lam=jnp.asarray(res.lam),
        wL=jnp.asarray(res.zL),
        wU=jnp.asarray(res.zU),
        yL=jnp.asarray(res.yL),
        yU=jnp.asarray(res.yU),
    )


class ResolveResult(NamedTuple):
    state: WarmState
    objective: jnp.ndarray
    kkt_error: jnp.ndarray
    constraints_violation: jnp.ndarray


def make_resolver(
    f,
    c,
    spec: NLPSpec,
    kkt,
    *,
    iters: int = 3,
    mu: float = 1e-6,
    delta_w: float = 1e-8,
    delta_c: float = 1e-8,
    tau: float = 0.99,
    loop: str = "unroll",
):
    """Build resolve(state, zl, zu, cl, cu) -> ResolveResult.

    `kkt` is a KKT operator (StructuredKKT for production). No scaling is
    applied (warm MPC problems should be pre-scaled by construction)."""

    eq = jnp.asarray(spec.eq_mask)
    ineq = ~eq
    zlm = jnp.asarray(spec.zl_mask)
    zum = jnp.asarray(spec.zu_mask)
    slm = jnp.asarray(spec.sl_mask)
    sum_ = jnp.asarray(spec.su_mask)
    grad_f = jax.grad(f)

    def resolve(state: WarmState, zl, zu, cl, cu) -> ResolveResult:
        dtype = state.z.dtype
        sl = jnp.where(ineq, cl, 0.0)
        su = jnp.where(ineq, cu, 0.0)
        rhs_eq = jnp.where(eq, cl, 0.0)
        sf = jnp.ones((), dtype)
        sc = jnp.ones_like(cl)

        def primal_residual(z, s):
            return c(z) - rhs_eq - jnp.where(ineq, s, 0.0)

        def one_step(st: WarmState) -> WarmState:
            z, s, lam, wL, wU, yL, yU = st
            gL = _safe_gap(z, zl, zlm)
            gU = _safe_gap(zu, z, zum)
            sgL = _safe_gap(s, sl, slm)
            sgU = _safe_gap(su, s, sum_)
            sigma_z = jnp.where(zlm, wL / gL, 0.0) + jnp.where(zum, wU / gU, 0.0)
            sigma_s = jnp.where(slm, yL / sgL, 0.0) + jnp.where(sum_, yU / sgU, 0.0)
            sigma_s = jnp.where(ineq, jnp.maximum(sigma_s, 1e-12), 1.0)
            Drow = jnp.where(ineq, 1.0 / sigma_s, 0.0)

            data = kkt.prepare(z, lam, sf, sc)
            gf = grad_f(z)
            rbar_z = (
                gf
                + jax.vjp(c, z)[1](lam)[0]
                - jnp.where(zlm, mu / gL, 0.0)
                + jnp.where(zum, mu / gU, 0.0)
            )
            rbar_s = jnp.where(
                ineq,
                -lam - jnp.where(slm, mu / sgL, 0.0) + jnp.where(sum_, mu / sgU, 0.0),
                0.0,
            )
            r_p = primal_residual(z, s)
            rbar_p = r_p + jnp.where(ineq, rbar_s / sigma_s, 0.0)

            # NOTE on singular KKT (active-set flip mid-tick): a per-iteration
            # rescue re-solve under lax.cond was tried in round 2 and REGRESSED
            # the tick 5.5x — under vmap, cond lowers to select and BOTH
            # branches run for every instance, so every tick paid two CR
            # solves/iteration for an event rare by construction. The hot path
            # stays at ONE solve/iteration; non-finite directions freeze the
            # iterate (below), and callers needing extra robustness raise
            # delta_w/delta_c (an always-on floor costs nothing).
            dz, dlam = kkt.solve(data, sigma_z, Drow, delta_w, delta_c, rbar_z, rbar_p)
            ds = jnp.where(ineq, (dlam - rbar_s) / sigma_s, 0.0)
            dwL = jnp.where(zlm, -(wL / gL) * dz - wL + mu / gL, 0.0)
            dwU = jnp.where(zum, (wU / gU) * dz - wU + mu / gU, 0.0)
            dyL = jnp.where(slm, -(yL / sgL) * ds - yL + mu / sgL, 0.0)
            dyU = jnp.where(sum_, (yU / sgU) * ds - yU + mu / sgU, 0.0)

            a_z = _max_step_to_boundary(z, dz, zl, zu, zlm, zum, tau)
            a_s = _max_step_to_boundary(s, ds, sl, su, slm, sum_, tau)
            alpha = jnp.minimum(a_z, a_s)
            a_d = jnp.minimum(
                jnp.minimum(
                    _dual_step_to_boundary(wL, dwL, zlm, tau),
                    _dual_step_to_boundary(wU, dwU, zum, tau),
                ),
                jnp.minimum(
                    _dual_step_to_boundary(yL, dyL, slm, tau),
                    _dual_step_to_boundary(yU, dyU, sum_, tau),
                ),
            )
            # guard: a NaN direction (singular system) freezes the iterate
            # instead of destroying the state
            finite = jnp.all(jnp.isfinite(dz)) & jnp.all(jnp.isfinite(dlam))
            alpha = jnp.where(finite, alpha, 0.0)
            a_d = jnp.where(finite, a_d, 0.0)
            return WarmState(
                z=z + alpha * dz,
                s=s + alpha * ds,
                lam=lam + alpha * dlam,
                wL=jnp.clip(wL + a_d * dwL, 0.0),
                wU=jnp.clip(wU + a_d * dwU, 0.0),
                yL=jnp.clip(yL + a_d * dyL, 0.0),
                yU=jnp.clip(yU + a_d * dyU, 0.0),
            )

        # Python unroll by default; loop="scan" is kept as a measurable
        # variant (round 2 changed scan + rescue-cond together and regressed
        # 5.5x — the clean A/B lives in the bench via BENCH_LOOP=scan).
        if loop == "scan":
            st = jax.lax.scan(
                lambda s, _: (one_step(s), None), state, None, length=iters
            )[0]
        else:
            st = state
            for _ in range(iters):
                st = one_step(st)

        # cheap exit diagnostics (no Ipopt scaling — raw inf norms)
        gL = _safe_gap(st.z, zl, zlm)
        gU = _safe_gap(zu, st.z, zum)
        r_d = (
            grad_f(st.z)
            + jax.vjp(c, st.z)[1](st.lam)[0]
            - jnp.where(zlm, st.wL, 0.0)
            + jnp.where(zum, st.wU, 0.0)
        )
        r_p = primal_residual(st.z, st.s)
        viol = jnp.max(jnp.abs(r_p), initial=0.0)
        kkt_err = jnp.maximum(jnp.max(jnp.abs(r_d)), viol)
        return ResolveResult(
            state=st, objective=f(st.z), kkt_error=kkt_err, constraints_violation=viol
        )

    return resolve
