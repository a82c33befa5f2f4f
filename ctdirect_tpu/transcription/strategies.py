"""Discretizer strategies (≙ CTDirect's Collocation / DirectShooting,
reference collocation.jl:8–48 and direct_shooting.jl:6–46).

`discretize(ocp, strategy)` mirrors `CTDirect.discretize(ocp, discretizer)`
(CTDirect.jl:31–50); the default discretizer is `Collocation()` with
grid_size=250 and scheme=midpoint, matching the reference defaults.
DirectShooting is the reference's sub-sampled-control mode: `control_steps`
controls per integration step on the midpoint scheme (direct_shooting.jl:26–31,
midpoint.jl:98–113)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ctdirect_tpu.model.ocp import OCP
from ctdirect_tpu.transcription.docp import DOCP
from ctdirect_tpu.transcription.schemes import SCHEMES
from ctdirect_tpu.utils.options import OptionDef, OptionSet


def _valid_scheme(s):
    return s in SCHEMES


class Collocation:
    """Collocation discretizer strategy."""

    options = OptionSet(
        [
            OptionDef(
                "grid_size",
                int,
                250,
                description="number of time steps N",
                validate=lambda v: v >= 1,
            ),
            OptionDef(
                "scheme",
                str,
                "midpoint",
                aliases=("disc_method",),
                description=f"discretization scheme, one of {SCHEMES}",
                validate=_valid_scheme,
            ),
            OptionDef(
                "time_grid",
                object,
                None,
                description="explicit (possibly non-uniform) time grid; overrides grid_size",
            ),
        ]
    )

    def __init__(self, mode: str = "strict", **kwargs):
        self.opts = self.options.build(kwargs, mode=mode)

    def __call__(self, ocp: OCP) -> DOCP:
        return DOCP(
            ocp,
            grid_size=self.opts["grid_size"],
            scheme=self.opts["scheme"],
            time_grid=self.opts["time_grid"],
            control_steps=1,
        )

    @classmethod
    def metadata(cls):
        return cls.options.metadata()


class DirectShooting:
    """Direct-shooting strategy: >=1 controls per integration step (midpoint)."""

    options = OptionSet(
        [
            OptionDef(
                "grid_size", int, 250, description="number of time steps N",
                validate=lambda v: v >= 1,
            ),
            OptionDef(
                "control_steps",
                int,
                1,
                description="controls per integration step",
                validate=lambda v: v >= 1,
            ),
            OptionDef(
                "scheme",
                str,
                "midpoint",
                aliases=("disc_method",),
                description="integration scheme (midpoint only for control_steps > 1)",
                validate=_valid_scheme,
            ),
            OptionDef(
                "time_grid", object, None, description="explicit time grid"
            ),
        ]
    )

    def __init__(self, mode: str = "strict", **kwargs):
        self.opts = self.options.build(kwargs, mode=mode)

    def __call__(self, ocp: OCP) -> DOCP:
        return DOCP(
            ocp,
            grid_size=self.opts["grid_size"],
            scheme=self.opts["scheme"],
            time_grid=self.opts["time_grid"],
            control_steps=self.opts["control_steps"],
        )

    @classmethod
    def metadata(cls):
        return cls.options.metadata()


def discretize(ocp: OCP, strategy=None) -> DOCP:
    """Front door: discretize with a strategy (default Collocation())."""
    if strategy is None:
        strategy = Collocation()
    return strategy(ocp)
