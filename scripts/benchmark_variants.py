"""Audit-circuit benchmark harness — C9 parity.

Generates and times the reference's 4 audit-circuit variants
({const PK, var PK} x {e as witness, e computed in-circuit};
``/root/reference/scripts/benchmark_all.py:331-572,601-702``) through OUR
pipeline: CircuitBuilder -> R1CS -> Groth16 setup/prove/verify, recording
constraint counts and per-stage timings to ``benchmark_variants.json``.
The reference never committed its results file; we commit ours.

Usage: python scripts/benchmark_variants.py [--full] [--variants a,b,...]
  --full    also run setup/prove/verify for the ~1M-constraint var_pk
            variants (tens of minutes); otherwise they record build/witness
            times and counts only.
  --device  prove through the TPU device prover (grid MSMs + NTT on chip,
            prove_tpu) instead of the host prover; implies the full
            pipeline for every selected variant. The reference's prover
            for these circuits is gnark on CPU (sunspot prove).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--device" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    from tpu_zkpool.utils import enable_compile_cache
    enable_compile_cache()

VARIANTS = ["const_pk_e_witness", "const_pk_e_computed",
            "var_pk_e_witness", "var_pk_e_computed"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--device", action="store_true")
    ap.add_argument("--logderiv", action="store_true",
                    help="benchmark the committed log-derivative range "
                         "variants (builder.range_value — the 42x "
                         "constraint-count mechanism of README.md:49) "
                         "alongside the bit-decomposition ones")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmark_variants.json"))
    args = ap.parse_args()

    from tpu_zkpool.protocol.audit_circuit import (
        build_audit_circuit, ct_commitment_of)
    from tpu_zkpool.refimpl import rlwe_ref, groth16_ref as g16
    from tpu_zkpool.groth16.cache import cached_setup
    from tpu_zkpool.hash.poseidon_params import poseidon_hash_ref
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tests"))
    import vectors

    pk = json.load(open(f"{vectors.RLWE_DIR}/rlwe_pk.json"))
    a_pk = [int(v, 16) for v in pk["a"]]
    b_pk = [int(v, 16) for v in pk["b"]]
    enc = rlwe_ref.encrypt(a_pk, b_pk, vectors.OWNER_X, vectors.OWNER_Y,
                           seed=999)
    wa = poseidon_hash_ref([vectors.OWNER_X, vectors.OWNER_Y])
    ct = ct_commitment_of(enc)

    results = {}
    variant_list = args.variants.split(",")
    if args.logderiv:
        variant_list += [v + "+logderiv" for v in variant_list
                         if v.startswith("const_pk")]
    for variant in variant_list:
        print(f"=== {variant} ===", flush=True)
        logderiv = variant.endswith("+logderiv")
        base_variant = variant.split("+")[0]
        rec = {}
        t0 = time.time()
        circ = build_audit_circuit(a_pk, b_pk, variant=base_variant,
                                   logderiv=logderiv)
        r1cs = circ.builder.r1cs()
        rec["build_s"] = round(time.time() - t0, 2)
        rec["constraints"] = len(r1cs.a_rows)
        rec["wires"] = r1cs.num_vars
        print(f"  {rec['constraints']} constraints, {rec['wires']} wires "
              f"({rec['build_s']}s)", flush=True)

        pkg = vkg = None
        if logderiv:
            # committed setup must precede witness assembly (the bsb22
            # challenge is the commitment hash over pk.basis)
            t0 = time.time()
            pkg, vkg = g16.setup(r1cs, seed=5, committed=circ.committed)
            rec["setup_s"] = round(time.time() - t0, 1)
            rec["committed_wires"] = len(circ.committed)
        t0 = time.time()
        if logderiv:
            w = circ.builder.witness_committed(circ.assignment(
                vectors.OWNER_X, vectors.OWNER_Y, enc, wa, ct,
                vectors.SECRET_KEY), circ.v_challenge, pkg)
        else:
            w = circ.builder.witness(circ.assignment(
                vectors.OWNER_X, vectors.OWNER_Y, enc, wa, ct,
                vectors.SECRET_KEY))
        rec["witness_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        sat = r1cs.is_satisfied(w)
        rec["satisfied"] = bool(sat)
        rec["check_s"] = round(time.time() - t0, 2)
        assert sat, f"{variant}: witness does not satisfy"
        print(f"  witness {rec['witness_s']}s, satisfied ({rec['check_s']}s)",
              flush=True)

        heavy = variant.startswith("var_pk")
        if args.full or args.device or not heavy:
            if pkg is None:
                t0 = time.time()
                pkg, vkg = cached_setup(r1cs, verbose=True)
                rec["setup_s"] = round(time.time() - t0, 1)
            if args.device:
                from tpu_zkpool.groth16 import prove_tpu
                t0 = time.time()
                # const-PK circuits (~71K rows) pad every leg to 2^17 so
                # both variants (and the bench-warm G1 MSM size) share
                # one set of compiled graphs
                pad_to = (1 << 17) if len(r1cs.a_rows) < (1 << 17) else 0
                dpk = prove_tpu.DeviceProvingKey(pkg, backend="pallas",
                                                 pad_to=pad_to)
                rec["device_pk_upload_s"] = round(time.time() - t0, 1)
                t0 = time.time()
                proof = prove_tpu.prove(dpk, r1cs, w)
                rec["prove_device_cold_s"] = round(time.time() - t0, 1)
                t0 = time.time()
                proof = prove_tpu.prove(dpk, r1cs, w, seed=11)
                rec["prove_device_warm_s"] = round(time.time() - t0, 1)
                rec["prover"] = "tpu_grid"
            else:
                t0 = time.time()
                proof = g16.prove(pkg, r1cs, w)
                rec["prove_s"] = round(time.time() - t0, 1)
            t0 = time.time()
            ok = g16.verify(vkg, proof, [wa, ct])
            rec["verify_s"] = round(time.time() - t0, 1)
            assert ok
            print(f"  {json.dumps(rec)}", flush=True)
        else:
            rec["pipeline"] = "skipped (use --full)"
        results[variant] = rec

    payload = {"harness": "scripts/benchmark_variants.py",
               "reference": "scripts/benchmark_all.py:331-572",
               "results": results}
    if os.path.exists(args.out):   # merge partial runs (e.g. --device on
        try:                       # one variant) into the committed file
            old = json.load(open(args.out))
            merged = old.get("results", {})
            for k, v in results.items():
                ent = merged.setdefault(k, {})
                ent.update(v)
                if "verify_s" in ent:   # full pipeline ran: drop stale marker
                    ent.pop("pipeline", None)
            payload["results"] = merged
        except Exception:
            pass
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
