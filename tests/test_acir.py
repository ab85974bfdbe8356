"""ACIR parser + witness solver vs. the committed withdraw circuit."""

import pytest

from tpu_zkpool.groth16.acir import load_artifact
from tpu_zkpool.groth16 import solver
from tpu_zkpool.refimpl import curve_ref

import vectors


@pytest.fixture(scope="module")
def program():
    abi, prog = load_artifact(vectors.WITHDRAW_ARTIFACT)
    return prog


def test_parse_structure(program):
    circ = program.circuits[0]
    assert circ.name == "main"
    assert len(circ.opcodes) == 6180
    assert circ.public_parameters == [0, 1, 2, 3, 4]
    assert len(circ.private_parameters) == 21


def test_solve_full_witness(program):
    # Solving with the committed prover-params.toml assignment must satisfy
    # every in-circuit assert (wa, nullifier, root, curve check).
    w = solver.solve(program, vectors.withdraw_inputs())
    assert len(w) > 6000
    # the MSM outputs are the owner point
    assert w[40] == vectors.OWNER_X
    assert w[41] == vectors.OWNER_Y


def test_embedded_curve_vector():
    pt = curve_ref.scalar_mul(vectors.SECRET_KEY)
    assert pt == (vectors.OWNER_X, vectors.OWNER_Y)
    assert curve_ref.is_on_curve(pt)
