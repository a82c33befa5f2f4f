from ctdirect_tpu.solver.ipm import IPMOptions, IPMResult, ipm_solve
from ctdirect_tpu.solver.interface import solve, solve_docp
from ctdirect_tpu.solver.continuation import continuation, grid_continuation

__all__ = [
    "IPMOptions",
    "IPMResult",
    "ipm_solve",
    "solve",
    "solve_docp",
    "continuation",
    "grid_continuation",
]
