"""Discrete continuation: re-solve a family of OCPs, warm-starting each from
the previous solution (reference test/ci/test_initial_guess.jl:188–266 — the
T = 1..5 horizon sweep, the parametric rho sweep, the Goddard Tmax sweep).

The reference rebuilds the OCP per step and passes `init=sol`. Same shape here:
`continuation(make_ocp, values, ...)` returns the list of Solutions. When the
DOCP structure is unchanged across the family (same dims/scheme/grid), the
compiled solver is reused — only the numeric content changes."""

from __future__ import annotations

import warnings
from typing import Callable, Iterable, List, Optional

from ctdirect_tpu.model.init import InitialGuess
from ctdirect_tpu.model.solution import Solution
from ctdirect_tpu.solver.interface import solve_docp
from ctdirect_tpu.solver.ipm import IPMOptions
from ctdirect_tpu.transcription.docp import transcribe


def continuation(
    make_ocp: Callable,
    values: Iterable,
    grid_size: int = 100,
    scheme: str = "midpoint",
    options: IPMOptions = IPMOptions(),
    init: Optional[InitialGuess] = None,
    display: bool = False,
) -> List[Solution]:
    """Solve make_ocp(v) for each v in values, warm-starting from the previous
    solution. Returns all solutions in order."""
    sols: List[Solution] = []
    guess = init
    for v in values:
        ocp = make_ocp(v)
        docp = transcribe(ocp, grid_size=grid_size, scheme=scheme)
        sol = solve_docp(docp, init=guess, options=options)
        if display:
            print(f"continuation {v}: {sol}")
        sols.append(sol)
        guess = InitialGuess.from_solution(sol)
    return sols


def grid_continuation(
    ocp,
    grids: Iterable[int],
    scheme: str = "trapeze",
    options: IPMOptions = IPMOptions(),
    warm_options: Optional[IPMOptions] = None,
    init: Optional[InitialGuess] = None,
    display: bool = False,
    strict: bool = False,
) -> List[Solution]:
    """Coarse-to-fine mesh refinement: solve the SAME ocp on grids[0], then
    warm-start each finer grid from the previous solution (the Solution's
    functional t->x,u,p accessors resample onto the new grid).

    This is the standard rescue for degenerate fixtures that stall when solved
    cold on a fine grid (e.g. the Purcell swimmer and the truck-trailer
    jackknife park): the coarse problem is far better conditioned, and the
    warm fine solve then converges in a handful of iterations (measured:
    swimmer N=60 cold 634 it -> warm N=120 Solve_Succeeded in 24 it,
    benchmarks/swimmer_lab.py). The reference reaches these fixtures through
    Ipopt's restoration phase instead (test/ci/test_all_ocp.jl:83,123); mesh
    refinement is the same practice the reference documents for hard problems
    via warm start (test/ci/test_initial_guess.jl:188-266).

    warm_options, when given, is used for every stage after the first (e.g. a
    cooler barrier: options.replace(mu_init=1e-4) — re-heating mu to 0.1 on a
    near-optimal warm point discards most of its value). Returns the list of
    Solutions, finest last.

    Failure semantics: every intermediate stage still warm-starts the next one
    even if it did not formally converge (a near-feasible stall is usually
    still an excellent warm start — the truck-trailer lab relies on this), but
    a warnings.warn is emitted for each unsuccessful non-final stage so
    callers inspecting only the final Solution can tell the chain ran through
    a diverged stage. Pass strict=True to raise RuntimeError instead."""
    sols: List[Solution] = []
    guess = init
    grids = list(grids)
    for k, n in enumerate(grids):
        docp = transcribe(ocp, grid_size=int(n), scheme=scheme)
        opts = options if (k == 0 or warm_options is None) else warm_options
        sol = solve_docp(docp, init=guess, options=opts)
        if display:
            print(f"grid_continuation N={n}: {sol}")
        if k < len(grids) - 1 and not bool(sol.successful):
            msg = (
                f"grid_continuation: intermediate stage N={n} did not converge "
                f"({sol.message}); the next stage is warm-started from it anyway"
            )
            if strict:
                raise RuntimeError(msg)
            warnings.warn(msg, stacklevel=2)
        sols.append(sol)
        guess = InitialGuess.from_solution(sol)
    return sols
