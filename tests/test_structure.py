"""Structure-report tests: the machine-checkable replacement for the
reference's hand-maintained sparsity patterns (trapeze.jl:149–303 etc.) and its
`pattern` visualization fixture. The key invariant: the TRUE AD Jacobian of the
vectorized constraint program is contained in the block-band + arrowhead
envelope that StructuredKKT assembles — for every scheme and for the edge cases
(zero control, free tf, path+boundary constraints)."""

import numpy as np
import pytest

from ctdirect_tpu import transcribe
from ctdirect_tpu.problems import get_problem
from ctdirect_tpu.utils.structure import (
    jacobian_occupancy,
    predicted_jacobian_envelope,
    structure_report,
    verify_structure,
)

ALL_SCHEMES = [
    "trapeze",
    "midpoint",
    "euler",
    "euler_implicit",
    "gauss_legendre_1",
    "gauss_legendre_2",
    "gauss_legendre_3",
    "gauss_legendre_2_constant_control",
    "gauss_legendre_3_constant_control",
]


@pytest.mark.parametrize("scheme", ALL_SCHEMES)
def test_pattern_problem_envelope(scheme):
    """pattern problem: every KKT coupling active at dims (1,1,1)."""
    prob = get_problem("pattern")
    docp = transcribe(prob.ocp, grid_size=5, scheme=scheme)
    assert verify_structure(docp)


@pytest.mark.parametrize(
    "name,scheme",
    [
        ("goddard", "trapeze"),  # free tf + path cons + boundary
        ("goddard", "gauss_legendre_2"),
        ("double_integrator_minenergy", "midpoint"),
        ("estimate_initial_condition", "trapeze"),  # zero control
        ("truck_trailer", "midpoint"),  # free tf + path + multi-boundary
    ],
)
def test_fixture_envelopes(name, scheme):
    prob = get_problem(name)
    docp = transcribe(prob.ocp, grid_size=4, scheme=scheme)
    assert verify_structure(docp)


def test_report_contents():
    prob = get_problem("goddard")
    docp = transcribe(prob.ocp, grid_size=10, scheme="trapeze")
    rep = structure_report(docp)
    n, m = 3, 1
    assert rep["step_block_width"] == n + m
    assert rep["tail_width"] == n + m  # trapeze carries the final control
    assert rep["nz"] == docp.nz and rep["nc"] == docp.nc
    assert rep["envelope_contains_jacobian"]
    # the true jacobian is strictly sparser than dense
    assert rep["jacobian_density"] < 0.5


def test_occupancy_vs_envelope_shapes():
    prob = get_problem("pattern")
    docp = transcribe(prob.ocp, grid_size=3, scheme="trapeze")
    occ = jacobian_occupancy(docp)
    env = predicted_jacobian_envelope(docp)
    assert occ.shape == env.shape == (docp.nc, docp.nz)
    # envelope is banded: first defect row must NOT touch the last step block
    assert not env[0, (docp.N - 1) * docp.bw + docp.tail_w - 1]
    assert np.all(env | ~occ)
