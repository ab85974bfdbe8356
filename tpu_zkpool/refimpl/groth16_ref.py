"""Pure-Python Groth16 (setup / prove / verify) over BN254 — reference path.

The proving system behind the reference's Sunspot/gnark pipeline
(``noir_circuit/prove_linux.sh:61-87``; SURVEY.md §2.3). This module works
over an explicit R1CS (see ``tpu_zkpool.groth16.r1cs`` for the ACIR
converter); the TPU path replaces the MSMs and the H(X) FFTs with
Pippenger/NTT kernels but shares these exact semantics.

Groth16 recap (notation follows the paper):
  QAP: (A·w) ∘ (B·w) = (C·w) over a multiplicative domain of size n,
  u_i/v_i/w_i the variable polynomials, t(X) = X^n - 1.
  Proof: A = [alpha + U(tau) + r*delta]_1, B = [beta + V(tau) + s*delta]_2,
  C = [ (sum_priv w_i K_i + H(tau)t(tau))/delta + sA + rB1 - rs*delta ]_1.
  Verify: e(A, B) == e(alpha,beta) * e(PUB, gamma) * e(C, delta).
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from tpu_zkpool.fields.bn254 import FR_MOD as R, G1_GX, G1_GY
from tpu_zkpool.refimpl import pairing_ref as pr

G1_GEN = (G1_GX, G1_GY)
G2_GEN = pr.G2_GEN


# ------------------------------------------------------------------ Fr FFT

def _fr_root(n: int) -> int:
    # Fr - 1 = 2^28 * odd; 5 generates the multiplicative group.
    assert n & (n - 1) == 0 and n <= 1 << 28
    return pow(5, (R - 1) // n, R)


def fr_fft(coeffs: list, invert: bool = False) -> list:
    n = len(coeffs)
    if n == 1:
        return list(coeffs)
    w = _fr_root(n)
    if invert:
        w = pow(w, -1, R)
    even = fr_fft(coeffs[0::2], invert)
    odd = fr_fft(coeffs[1::2], invert)
    out = [0] * n
    wk = 1
    for k in range(n // 2):
        t = wk * odd[k] % R
        out[k] = (even[k] + t) % R
        out[k + n // 2] = (even[k] - t) % R
        wk = wk * w % R
    return out


def fr_ifft(evals: list) -> list:
    n = len(evals)
    inv_n = pow(n, -1, R)
    return [v * inv_n % R for v in fr_fft(evals, invert=True)]


# ------------------------------------------------------------------ R1CS

@dataclass
class R1CS:
    """Constraints as sparse rows {var_index: coeff}; w[0] = 1 constant.

    Variables: [1, public..., private...]. ``num_public`` counts the constant
    slot plus the public inputs.
    """

    num_vars: int
    num_public: int
    a_rows: list
    b_rows: list
    c_rows: list

    def eval_row(self, row: dict, w: list) -> int:
        return sum(c * w[i] for i, c in row.items()) % R

    def is_satisfied(self, w: list) -> bool:
        for a, b, c in zip(self.a_rows, self.b_rows, self.c_rows):
            if self.eval_row(a, w) * self.eval_row(b, w) % R != self.eval_row(c, w):
                return False
        return True


# ------------------------------------------------------------------ setup

@dataclass
class ProvingKey:
    n_domain: int
    alpha1: tuple
    beta1: tuple
    delta1: tuple
    beta2: tuple
    delta2: tuple
    a_query: list      # [u_i(tau)]_1
    b1_query: list     # [v_i(tau)]_1
    b2_query: list     # [v_i(tau)]_2
    k_query: list      # [(beta u_i + alpha v_i + w_i)/delta]_1, private i
    h_query: list      # [tau^i t(tau)/delta]_1
    # gnark-style Pedersen commitment extension (None when unused):
    committed: tuple = ()          # committed private wire indices (sorted)
    basis: tuple = ()              # [( . )/gamma]_1 per committed wire
    basis_exp_sigma: tuple = ()    # sigma * basis


@dataclass
class VerifyingKey:
    alpha1: tuple
    beta2: tuple
    gamma2: tuple
    delta2: tuple
    gamma_abc: list    # [(beta u_i + alpha v_i + w_i)/gamma]_1, public i
    commitment_key: tuple | None = None   # (G g2, GSigmaNeg g2)
    committed: tuple = ()                 # committed private wire indices


def setup(r1cs: R1CS, seed: int = 1337, committed=()) -> tuple:
    """``committed``: private wire indices bound by a gnark-style Pedersen
    commitment instead of the delta leg (their basis points move to the
    gamma leg and the commitment's hash-to-field becomes an extra public
    input — the committed VKs' layout, ``groth16/gnark_fmt.py``). The
    commitment-hash wire must be the LAST declared public input."""
    rng = random.Random(seed)
    tau, alpha, beta, gamma, delta = (rng.randrange(1, R) for _ in range(5))
    committed = tuple(sorted(committed))

    m = len(r1cs.a_rows)
    n = 1
    while n < m:
        n <<= 1
    omega = _fr_root(n)

    # Lagrange values L_c(tau) for all constraints c.
    t_tau = (pow(tau, n, R) - 1) % R
    assert t_tau != 0, "tau hit the domain (resample seed)"
    inv_n = pow(n, -1, R)
    lag = []
    wc = 1
    for c in range(n):
        lag.append(t_tau * wc % R * pow((tau - wc) % R, -1, R) % R * inv_n % R)
        wc = wc * omega % R

    nv = r1cs.num_vars
    u = [0] * nv
    v = [0] * nv
    w = [0] * nv
    for c in range(m):
        lc = lag[c]
        for i, coef in r1cs.a_rows[c].items():
            u[i] = (u[i] + coef * lc) % R
        for i, coef in r1cs.b_rows[c].items():
            v[i] = (v[i] + coef * lc) % R
        for i, coef in r1cs.c_rows[c].items():
            w[i] = (w[i] + coef * lc) % R

    inv_delta = pow(delta, -1, R)
    inv_gamma = pow(gamma, -1, R)

    # Fixed-base generator multiplications — native C++ batch path when the
    # toolchain is available (~160x the pure-Python loop), else fallback.
    try:
        from tpu_zkpool import native_bridge as nb
        nb.get_lib()
        g1_batch, g2_batch = nb.g1_gen_mul_batch, nb.g2_gen_mul_batch
    except Exception:
        g1_batch = lambda ks: [pr.g1_mul(k % R, G1_GEN) for k in ks]
        g2_batch = lambda ks: [pr.g2_mul(k % R, G2_GEN) for k in ks]

    cset = set(committed)
    assert all(r1cs.num_public <= i < nv for i in committed)
    priv_idx = [i for i in range(r1cs.num_public, nv) if i not in cset]
    k_scalars = [
        (beta * u[i] + alpha * v[i] + w[i]) * inv_delta % R
        for i in priv_idx
    ]
    basis_scalars = [
        (beta * u[i] + alpha * v[i] + w[i]) * inv_gamma % R
        for i in committed
    ]
    sigma = rng.randrange(1, R)
    g2r = rng.randrange(1, R)
    h_scalars = [pow(tau, i, R) * t_tau % R * inv_delta % R for i in range(n - 1)]
    abc_scalars = [
        (beta * u[i] + alpha * v[i] + w[i]) * inv_gamma % R
        for i in range(r1cs.num_public)
    ]
    basis_sigma_scalars = [b * sigma % R for b in basis_scalars]
    flat = ([alpha, beta, delta] + [ui % R for ui in u] + [vi % R for vi in v]
            + k_scalars + h_scalars + abc_scalars
            + basis_scalars + basis_sigma_scalars)
    g1s = g1_batch(flat)
    g2s = g2_batch([beta, delta, gamma] + [vi % R for vi in v]
                   + [g2r, (R - sigma * g2r) % R])
    o = 3
    a_query = g1s[o : o + nv]
    b1_query = g1s[o + nv : o + 2 * nv]
    o2 = o + 2 * nv
    k_query = g1s[o2 : o2 + len(k_scalars)]
    o2 += len(k_scalars)
    h_query = g1s[o2 : o2 + len(h_scalars)]
    o2 += len(h_scalars)
    gamma_abc = g1s[o2 : o2 + len(abc_scalars)]
    o2 += len(abc_scalars)
    basis = tuple(g1s[o2 : o2 + len(basis_scalars)])
    o2 += len(basis_scalars)
    basis_sigma = tuple(g1s[o2 : o2 + len(basis_sigma_scalars)])

    pk = ProvingKey(
        n_domain=n,
        alpha1=g1s[0], beta1=g1s[1], delta1=g1s[2],
        beta2=g2s[0], delta2=g2s[1],
        a_query=a_query, b1_query=b1_query, b2_query=g2s[3 : 3 + nv],
        k_query=k_query, h_query=h_query,
        committed=committed, basis=basis, basis_exp_sigma=basis_sigma,
    )
    vk = VerifyingKey(
        alpha1=g1s[0], beta2=g2s[0], gamma2=g2s[2], delta2=g2s[1],
        gamma_abc=gamma_abc,
        commitment_key=(g2s[3 + nv], g2s[4 + nv]) if committed else None,
        committed=committed,
    )
    return pk, vk


# ------------------------------------------------------------------ prove

def _native():
    try:
        from tpu_zkpool import native_bridge as nb
        nb.get_lib()
        return nb
    except Exception:
        return None


def _msm(points: list, scalars: list):
    pairs = [(pnt, s % R) for pnt, s in zip(points, scalars)
             if s % R and pnt is not None]
    if not pairs:
        return None
    nb = _native()
    if nb is not None and len(pairs) > 8:
        return nb.g1_msm([s for _, s in pairs], [p for p, _ in pairs])
    acc = None
    for pnt, s in pairs:
        acc = pr.g1_add(acc, pr.g1_mul(s, pnt))
    return acc


def _msm2(points: list, scalars: list):
    pairs = [(pnt, s % R) for pnt, s in zip(points, scalars)
             if s % R and pnt is not None]
    if not pairs:
        return None
    nb = _native()
    if nb is not None and len(pairs) > 8:
        return nb.g2_msm([s for _, s in pairs], [p for p, _ in pairs])
    acc = None
    for pnt, s in pairs:
        acc = pr.g2_add(acc, pr.g2_mul(s, pnt))
    return acc


def compute_h(r1cs: R1CS, w_full: list, n: int) -> list:
    """Coefficients of H(X) = (U V - W)/t on a coset (exact division)."""
    m = len(r1cs.a_rows)
    ua = [r1cs.eval_row(r1cs.a_rows[c], w_full) for c in range(m)] + [0] * (n - m)
    vb = [r1cs.eval_row(r1cs.b_rows[c], w_full) for c in range(m)] + [0] * (n - m)
    wc = [r1cs.eval_row(r1cs.c_rows[c], w_full) for c in range(m)] + [0] * (n - m)
    # interpolate to coefficients
    ua_c = fr_ifft(ua)
    vb_c = fr_ifft(vb)
    wc_c = fr_ifft(wc)
    # evaluate on the coset g*omega^i, g a generator shift
    g = 5
    def coset_eval(coeffs):
        shifted = [coeffs[i] * pow(g, i, R) % R for i in range(n)]
        return fr_fft(shifted)
    ua_e = coset_eval(ua_c)
    vb_e = coset_eval(vb_c)
    wc_e = coset_eval(wc_c)
    t_coset = (pow(g, n, R) - 1) % R  # t(g w^i) = g^n w^{ni} - 1 = g^n - 1
    inv_t = pow(t_coset, -1, R)
    h_e = [(ua_e[i] * vb_e[i] - wc_e[i]) % R * inv_t % R for i in range(n)]
    h_c = fr_ifft(h_e)
    inv_g = pow(g, -1, R)
    return [h_c[i] * pow(inv_g, i, R) % R for i in range(n)]


def prove(pk: ProvingKey, r1cs: R1CS, w_full: list, seed: int = 7):
    rng = random.Random(seed)
    r_rand, s_rand = rng.randrange(R), rng.randrange(R)
    n = pk.n_domain

    # A = alpha + sum w_i u_i + r delta
    A = pr.g1_add(pk.alpha1, _msm(pk.a_query, w_full))
    A = pr.g1_add(A, pr.g1_mul(r_rand, pk.delta1) if r_rand else None)
    # B2 = beta + sum w_i v_i + s delta ; B1 same over G1
    B2 = pr.g2_add(pk.beta2, _msm2(pk.b2_query, w_full))
    B2 = pr.g2_add(B2, pr.g2_mul(s_rand, pk.delta2) if s_rand else None)
    B1 = pr.g1_add(pk.beta1, _msm(pk.b1_query, w_full))
    B1 = pr.g1_add(B1, pr.g1_mul(s_rand, pk.delta1) if s_rand else None)

    h = compute_h(r1cs, w_full, n)
    HT = _msm(pk.h_query, h[: n - 1])

    if pk.committed:
        cset = set(pk.committed)
        priv_w = [w_full[i] for i in range(r1cs.num_public, len(w_full))
                  if i not in cset]
    else:
        priv_w = w_full[r1cs.num_public:]
    Kpriv = _msm(pk.k_query, priv_w)
    C = pr.g1_add(Kpriv, HT)
    C = pr.g1_add(C, pr.g1_mul(s_rand, A) if s_rand else None)
    C = pr.g1_add(C, pr.g1_mul(r_rand, B1) if r_rand else None)
    rs = r_rand * s_rand % R
    C = pr.g1_add(C, pr.g1_mul((R - rs) % R, pk.delta1) if rs else None)
    if pk.committed:
        from tpu_zkpool.refimpl import pedersen
        cm, pok = pedersen.commit(
            list(pk.basis), list(pk.basis_exp_sigma),
            [w_full[i] for i in pk.committed])
        return (A, B2, C, cm, pok)
    return (A, B2, C)


# ------------------------------------------------------------------ verify

def verify(vk: VerifyingKey, proof: tuple, public_inputs: list) -> bool:
    """Groth16 verify incl. the gnark commitment extension: when the VK
    carries committed wires, the proof must supply (Commitment, Pok); the
    verifier derives the commitment's hash-to-field as the final public
    input, folds the commitment into the gamma leg, and checks the
    proof-of-knowledge pairing (matching the committed verifier programs,
    ``withdraw.rs:163-175`` / ``gnark_fmt.py`` layouts)."""
    from tpu_zkpool.refimpl import pedersen
    cm = pok = None
    if len(proof) == 5:
        A, B2, C, cm, pok = proof
    else:
        A, B2, C = proof
    if getattr(vk, "committed", ()) and cm is None:
        return False  # commitment required by this VK
    pubs = list(public_inputs)
    if cm is not None:
        if not pedersen.verify_pok(cm, pok, vk.commitment_key):
            return False
        pubs.append(pedersen.commitment_to_field(cm))
    acc = vk.gamma_abc[0]
    for pi, pnt in zip(pubs, vk.gamma_abc[1:]):
        acc = pr.g1_add(acc, pr.g1_mul(pi % R, pnt) if pi % R else None)
    if cm is not None:
        acc = pr.g1_add(acc, cm)
    lhs = pr.pairing(A, B2)
    rhs = pr.pairing(vk.alpha1, vk.beta2)
    rhs = pr.f12_mul(rhs, pr.pairing(acc, vk.gamma2))
    rhs = pr.f12_mul(rhs, pr.pairing(C, vk.delta2))
    return lhs == rhs
