from ctdirect_tpu.model.ocp import OCP, PreOCP, TimeSpec
from ctdirect_tpu.model.define import define
from ctdirect_tpu.model.init import InitialGuess
from ctdirect_tpu.model.solution import Solution

__all__ = ["OCP", "PreOCP", "TimeSpec", "define", "InitialGuess", "Solution"]
