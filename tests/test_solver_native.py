"""Native compiled witness generation (groth16/solver_native.py +
native/witness.cpp) vs the pure-Python interpreter, on the committed
withdraw artifact — exact-match oracle testing, negatives included."""

import numpy as np
import pytest

import vectors
from tpu_zkpool.groth16.acir import load_artifact
from tpu_zkpool.groth16 import r1cs as r1cs_mod
from tpu_zkpool.groth16 import solver, solver_native


@pytest.fixture(scope="module")
def prog():
    _, p = load_artifact(vectors.WITHDRAW_ARTIFACT)
    return p


@pytest.fixture(scope="module")
def compiled(prog):
    try:
        return solver_native.CompiledSolver(prog, vectors.withdraw_inputs())
    except (OSError, Exception) as e:  # toolchain missing -> skip module
        pytest.skip(f"native solver unavailable: {e}")


def test_exact_match_with_interpreter(prog, compiled):
    ins = vectors.withdraw_inputs()
    assert compiled.solve(ins) == solver.solve(prog, ins)


def test_single_segment_with_native_msm(compiled):
    # the withdraw circuit's one multi_scalar_mul lowers to a native
    # record, not a Python callback segment
    assert len(compiled.segments) == 1
    assert not compiled.callbacks


def test_corrupted_input_rejected(compiled):
    bad = dict(vectors.withdraw_inputs())
    k = sorted(bad)[0]
    bad[k] = bad[k] + 1
    with pytest.raises(solver.SolveError):
        compiled.solve(bad)


def test_solve_wrapper_and_fallback(prog):
    ins = vectors.withdraw_inputs()
    assert solver_native.solve(prog, ins) == solver.solve(prog, ins)


def test_raw_buffer_matches_dict(compiled):
    ins = vectors.withdraw_inputs()
    wit, known = compiled.solve_raw(ins)
    d = compiled.solve(ins)
    assert int(known.sum()) == len(d)
    for k in list(d)[:50]:
        assert solver_native._from_u64x4(wit[k]) == d[k]


def test_eval_rows_native_matches_python(prog, compiled):
    ins = vectors.withdraw_inputs()
    ar = r1cs_mod.convert(prog)
    w_full = r1cs_mod.build_witness(ar, solver.solve(prog, ins))
    w64 = solver_native.ints_to_u64x4(w_full)
    got = solver_native.eval_rows_native(
        ("test", id(ar.r1cs)), ar.r1cs.a_rows[:64], w64)
    exp = [ar.r1cs.eval_row(r, w_full) for r in ar.r1cs.a_rows[:64]]
    assert [solver_native._from_u64x4(g) for g in got] == exp


def test_to_mont_and_limb_views():
    from tpu_zkpool.fields.bn254 import FR_MOD as P
    vals = [0, 1, P - 1, 1234567890123456789]
    a = solver_native.ints_to_u64x4(vals)
    m = solver_native.to_mont_batch(a)
    R = 1 << 256
    assert [solver_native._from_u64x4(r) for r in m] == \
        [v * R % P for v in vals]
    limbs = solver_native.u64x4_to_limbs16(a)
    from tpu_zkpool.fields.limbs import ints_to_limbs
    assert np.array_equal(limbs, ints_to_limbs(vals))
