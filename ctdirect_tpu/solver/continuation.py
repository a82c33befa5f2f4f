"""Discrete continuation: re-solve a family of OCPs, warm-starting each from
the previous solution (reference test/ci/test_initial_guess.jl:188–266 — the
T = 1..5 horizon sweep, the parametric rho sweep, the Goddard Tmax sweep).

The reference rebuilds the OCP per step and passes `init=sol`. Same shape here:
`continuation(make_ocp, values, ...)` returns the list of Solutions. When the
DOCP structure is unchanged across the family (same dims/scheme/grid), the
compiled solver is reused — only the numeric content changes."""

from __future__ import annotations

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
