"""Fixture OCP library with known reference objectives (≙ test/problems/ in the
reference; each entry returns (ocp, obj, name, init) and the stored objective is
the ground-truth oracle used by tests at rtol 1e-2 — reference runtests.jl:5–11)."""

from __future__ import annotations

from typing import NamedTuple, Optional

from ctdirect_tpu.model.init import InitialGuess
from ctdirect_tpu.model.ocp import OCP


class Problem(NamedTuple):
    ocp: OCP
    obj: Optional[float]
    name: str
    init: Optional[InitialGuess] = None


_REGISTRY = {}


def register(fn):
    _REGISTRY[fn.__name__] = fn
    return fn


def get_problem(name: str) -> Problem:
    return _REGISTRY[name]()


def problem_names():
    return sorted(_REGISTRY)


from ctdirect_tpu.problems import basic  # noqa: E402,F401
from ctdirect_tpu.problems import goddard  # noqa: E402,F401
from ctdirect_tpu.problems import advanced  # noqa: E402,F401
from ctdirect_tpu.problems import misc  # noqa: E402,F401
from ctdirect_tpu.problems import vehicles  # noqa: E402,F401
from ctdirect_tpu.problems import mpc_fixtures  # noqa: E402,F401
