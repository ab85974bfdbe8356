"""Device-prover components: natural-order interpolation + H pipeline."""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_zkpool.fields.bn254 import FR_MOD as R
from tpu_zkpool.fields.fctx import FR
from tpu_zkpool.groth16 import domain
from tpu_zkpool.refimpl.groth16_ref import R1CS, compute_h, fr_fft


def test_interpolate_natural():
    rng = random.Random(15)
    coeffs = [rng.randrange(R) for _ in range(16)]
    evals = fr_fft(coeffs)  # natural order
    dev = jnp.asarray(FR.to_mont(np.asarray(evals, dtype=object)))
    got = FR.from_mont(np.asarray(jax.jit(domain.interpolate_natural)(dev)))
    assert [int(v) for v in got] == coeffs


def test_compute_h_device_matches_oracle():
    from tpu_zkpool.groth16.prove_tpu import compute_h_device
    r1cs = R1CS(num_vars=5, num_public=2,
                a_rows=[{2: 1}, {3: 1}, {}],
                b_rows=[{2: 1}, {2: 1}, {0: 1}],
                c_rows=[{3: 1}, {4: 1},
                        {1: 1, 4: -1 % R, 2: -1 % R, 0: -5 % R}])
    x = 3
    w = [1, x**3 + x + 5, x, x * x, x**3]
    assert compute_h_device(r1cs, w, 4) == compute_h(r1cs, w, 4)


def test_h_pipeline_split_matches_monolithic():
    """The big-domain (HBM-bounded) split H pipeline must be bit-exact vs
    the monolithic one — exercised at a tiny domain on CPU; the split
    engages automatically above _H_SPLIT_MIN_N (the 2^21 var-PK domain
    OOM'd the monolithic graph at 27.4 GB)."""
    from tpu_zkpool.groth16 import prove_tpu as pt
    rng = random.Random(77)
    n = 32
    evs = jnp.asarray(FR.to_mont(np.asarray(
        [[rng.randrange(R) for _ in range(n)] for _ in range(3)],
        dtype=object)))
    tinv = jnp.asarray(FR.to_mont(np.asarray([rng.randrange(1, R)],
                                             dtype=object))[0])
    tables = domain.tables_device(n)
    for demont in (False, True):
        a = np.asarray(pt._h_pipeline(evs, tinv, tables, demont))
        b = np.asarray(pt._h_pipeline_split(evs, tinv, tables, demont))
        assert (a == b).all()


def test_packed_uploads_bit_exact():
    """The packed host->device wire format (two 16-bit limbs per uint32,
    halving tunnel uploads) must unpack bit-exactly, and the on-device
    Montgomery conversion of packed plain values must equal the host
    to_mont path."""
    from tpu_zkpool.fields.limbs import ints_to_limbs, pack_limbs16
    from tpu_zkpool.groth16 import prove_tpu as pt
    from tpu_zkpool.groth16 import solver_native as sn
    rng = random.Random(9)
    vals = [rng.randrange(R) for _ in range(33)]
    limbs = ints_to_limbs(vals)
    assert (np.asarray(pt._unpack_dev(pack_limbs16(limbs))) == limbs).all()
    w64 = sn.ints_to_u64x4(vals)
    assert (w64.view("<u4") == pack_limbs16(limbs)).all()
    mont_host = FR.to_mont(np.asarray(vals, dtype=object))
    assert (np.asarray(pt._unpack_mont_fr(w64.view("<u4"))) == mont_host).all()


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="MSM graph compile is minutes on CPU (RUN_SLOW=1)")
def test_prove_tpu_tiny_end_to_end():
    """Device prover (grid MSMs incl. the Fp2 G2 leg) on the tiny circuit,
    via the portable XLA backend."""
    from tpu_zkpool.refimpl.groth16_ref import setup, verify
    from tpu_zkpool.groth16 import prove_tpu
    r1cs = R1CS(num_vars=5, num_public=2,
                a_rows=[{2: 1}, {3: 1}, {}],
                b_rows=[{2: 1}, {2: 1}, {0: 1}],
                c_rows=[{3: 1}, {4: 1},
                        {1: 1, 4: -1 % R, 2: -1 % R, 0: -5 % R}])
    x = 3
    w = [1, x**3 + x + 5, x, x * x, x**3]
    pk, vk = setup(r1cs)
    dpk = prove_tpu.DeviceProvingKey(pk, backend="xla")
    proof = prove_tpu.prove(dpk, r1cs, w)
    assert verify(vk, proof, [w[1]])
    assert not verify(vk, proof, [w[1] + 1])

    # batch prover: distinct witnesses, every proof verifies, and proof i
    # equals prove(w_i, seed=base+i) (same blinding derivation).
    ws = []
    for x in (4, 5, 6):
        ws.append([1, x**3 + x + 5, x, x * x, x**3])
    proofs = prove_tpu.prove_batch(dpk, r1cs, ws, seed=30)
    for i, (p, wi) in enumerate(zip(proofs, ws)):
        assert verify(vk, p, [wi[1]])
        assert p == prove_tpu.prove(dpk, r1cs, wi, seed=30 + i)
