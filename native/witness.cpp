// Native witness-generation VM over BN254 Fr — the compiled replay engine
// behind tpu_zkpool/groth16/solver_native.py.
//
// The Python ACIR solver (groth16/solver.py) discovers the RESOLUTION
// SCHEDULE of a circuit once (which gate solves which witness, in what
// order — a function of the circuit and the input-witness SET only); the
// lowering pass flattens that schedule into the instruction stream this
// VM replays at C speed for every subsequent proof. This replaces the
// witness-generation half of the reference's `nargo execute` step
// (/root/reference/client/proof.helper.ts:55) the way gnark's compiled
// constraint system replaces repeated circuit interpretation.
//
// Also exports fr_eval_rows (CSR sparse matvec over Fr) for the Groth16
// prover's U/V/W evaluations (groth16/prove_tpu.compute_h_device).
//
// Build: g++ -O3 -shared -fPIC -o libwitness.so witness.cpp
// ABI: flat little-endian u64[4] field values (PLAIN, not Montgomery).

#include <cstdint>
#include <cstring>
#include <vector>

using u64 = uint64_t;
using i64 = int64_t;
using u128 = unsigned __int128;

// ------------------------------------------------------------ Fr (4x64)

struct Fr { u64 v[4]; };

static const Fr P = {{0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                      0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const u64 P_INV = 0xc2e1f593efffffffULL;  // -r^-1 mod 2^64
static const Fr R2 = {{0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                       0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL}};

static inline bool fr_is_zero(const Fr &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool geq_p(const Fr &a) {
  for (int i = 3; i >= 0; --i) {
    if (a.v[i] > P.v[i]) return true;
    if (a.v[i] < P.v[i]) return false;
  }
  return true;
}

static inline void sub_p(Fr &a) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - P.v[i] - borrow;
    a.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

static inline Fr fr_add(const Fr &a, const Fr &b) {
  Fr r; u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (u64)s; carry = s >> 64;
  }
  if (carry || geq_p(r)) sub_p(r);
  return r;
}

static inline Fr fr_sub(const Fr &a, const Fr &b) {
  Fr r; u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (u64)d; borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)r.v[i] + P.v[i] + carry;
      r.v[i] = (u64)s; carry = s >> 64;
    }
  }
  return r;
}

// CIOS Montgomery multiplication: returns a * b * 2^-256 mod r.
static inline Fr fr_mont_mul(const Fr &a, const Fr &b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
      t[j] = (u64)cur; carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (u64)cur; t[5] = (u64)(cur >> 64);

    u64 m = t[0] * P_INV;
    carry = ((u128)t[0] + (u128)m * P.v[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 c2 = (u128)t[j] + (u128)m * P.v[j] + carry;
      t[j - 1] = (u64)c2; carry = c2 >> 64;
    }
    cur = (u128)t[4] + carry;
    t[3] = (u64)cur;
    t[4] = t[5] + (u64)(cur >> 64);
    t[5] = 0;
  }
  Fr r = {{t[0], t[1], t[2], t[3]}};
  if (t[4] || geq_p(r)) sub_p(r);
  return r;
}

static inline Fr to_mont(const Fr &a) { return fr_mont_mul(a, R2); }

// a^-1 mod r via Fermat (a in PLAIN form; result PLAIN). Exponent r-2.
static Fr fr_inv_plain(const Fr &a) {
  static const Fr E = {{0x43e1f593efffffffULL, 0x2833e84879b97091ULL,
                        0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
  Fr base = to_mont(a);
  Fr acc = to_mont(Fr{{1, 0, 0, 0}});
  for (int w = 3; w >= 0; --w) {
    for (int bit = 63; bit >= 0; --bit) {
      acc = fr_mont_mul(acc, acc);
      if ((E.v[w] >> bit) & 1) acc = fr_mont_mul(acc, base);
    }
  }
  // leave Montgomery: mont_mul(x*R, 1) = x
  return fr_mont_mul(acc, Fr{{1, 0, 0, 0}});
}

// --------------------------------------------------- 256-bit integer ops

static inline bool u256_geq(const u64 *a, const u64 *b) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] > b[i]) return true;
    if (a[i] < b[i]) return false;
  }
  return true;
}

// q = a / b, rem = a % b (b != 0), schoolbook binary long division.
static void u256_divmod(const u64 *a, const u64 *b, u64 *q, u64 *rem) {
  u64 r[4] = {0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) q[i] = 0;
  for (int bit = 255; bit >= 0; --bit) {
    // r = (r << 1) | a_bit
    for (int i = 3; i > 0; --i) r[i] = (r[i] << 1) | (r[i - 1] >> 63);
    r[0] = (r[0] << 1) | ((a[bit / 64] >> (bit % 64)) & 1);
    if (u256_geq(r, b)) {
      u128 borrow = 0;
      for (int i = 0; i < 4; ++i) {
        u128 d = (u128)r[i] - b[i] - borrow;
        r[i] = (u64)d; borrow = (d >> 64) & 1;
      }
      q[bit / 64] |= 1ULL << (bit % 64);
    }
  }
  for (int i = 0; i < 4; ++i) rem[i] = r[i];
}

// a % (small u64 m), destructive digit extraction helper: a /= m.
static u64 u256_divmod_small(u64 *a, u64 m) {
  u128 rem = 0;
  for (int i = 3; i >= 0; --i) {
    u128 cur = (rem << 64) | a[i];
    a[i] = (u64)(cur / m);
    rem = cur % m;
  }
  return (u64)rem;
}

// -------------------------------------- embedded curve y^2 = x^3 - 17 / Fr
//
// Noir's std::embedded_curve_ops curve (reference client/merkle.ts:44-75):
// short Weierstrass a = 0 over the BN254 SCALAR field, group order =
// the BN254 BASE field modulus. Jacobian coordinates in Montgomery form;
// Z = 0 encodes the identity. Matches refimpl/curve_ref.py bit-exactly.

static const u64 EC_ORDER[4] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                                0xb85045b68181585dULL, 0x30644e72e131a029ULL};

struct EcJ { Fr X, Y, Z; };

static inline bool ec_is_inf(const EcJ &p) { return fr_is_zero(p.Z); }

static EcJ ec_dbl(const EcJ &p) {
  if (ec_is_inf(p)) return p;
  Fr A = fr_mont_mul(p.X, p.X);
  Fr B = fr_mont_mul(p.Y, p.Y);
  Fr C = fr_mont_mul(B, B);
  Fr xb = fr_add(p.X, B);
  Fr D = fr_sub(fr_sub(fr_mont_mul(xb, xb), A), C);
  D = fr_add(D, D);
  Fr E = fr_add(fr_add(A, A), A);
  Fr F = fr_mont_mul(E, E);
  EcJ r;
  r.X = fr_sub(F, fr_add(D, D));
  Fr C8 = fr_add(C, C); C8 = fr_add(C8, C8); C8 = fr_add(C8, C8);
  r.Y = fr_sub(fr_mont_mul(E, fr_sub(D, r.X)), C8);
  r.Z = fr_mont_mul(p.Y, p.Z); r.Z = fr_add(r.Z, r.Z);
  return r;
}

static EcJ ec_add(const EcJ &p, const EcJ &q) {
  if (ec_is_inf(p)) return q;
  if (ec_is_inf(q)) return p;
  Fr Z1Z1 = fr_mont_mul(p.Z, p.Z);
  Fr Z2Z2 = fr_mont_mul(q.Z, q.Z);
  Fr U1 = fr_mont_mul(p.X, Z2Z2);
  Fr U2 = fr_mont_mul(q.X, Z1Z1);
  Fr S1 = fr_mont_mul(p.Y, fr_mont_mul(q.Z, Z2Z2));
  Fr S2 = fr_mont_mul(q.Y, fr_mont_mul(p.Z, Z1Z1));
  Fr H = fr_sub(U2, U1);
  Fr rr = fr_sub(S2, S1);
  if (fr_is_zero(H)) {
    if (fr_is_zero(rr)) return ec_dbl(p);
    EcJ inf = {{{0,0,0,0}}, {{0,0,0,0}}, {{0,0,0,0}}};
    return inf;
  }
  Fr HH = fr_mont_mul(H, H);
  Fr HHH = fr_mont_mul(H, HH);
  Fr V = fr_mont_mul(U1, HH);
  EcJ o;
  o.X = fr_sub(fr_sub(fr_mont_mul(rr, rr), HHH), fr_add(V, V));
  o.Y = fr_sub(fr_mont_mul(rr, fr_sub(V, o.X)), fr_mont_mul(S1, HHH));
  o.Z = fr_mont_mul(fr_mont_mul(p.Z, q.Z), H);
  return o;
}

// scalar (512-bit LE words) mod EC_ORDER, bit-serial.
static void u512_mod_order(const u64 *a, u64 *out) {
  u64 r[4] = {0, 0, 0, 0};
  for (int bit = 511; bit >= 0; --bit) {
    u64 top = r[3] >> 63;
    for (int i = 3; i > 0; --i) r[i] = (r[i] << 1) | (r[i - 1] >> 63);
    r[0] = (r[0] << 1) | ((a[bit / 64] >> (bit % 64)) & 1);
    if (top || u256_geq(r, EC_ORDER)) {
      u128 borrow = 0;
      for (int i = 0; i < 4; ++i) {
        u128 d = (u128)r[i] - EC_ORDER[i] - borrow;
        r[i] = (u64)d; borrow = (d >> 64) & 1;
      }
    }
  }
  for (int i = 0; i < 4; ++i) out[i] = r[i];
}

// k * (x, y) with k the 512-bit value lo + (hi << 128), inputs/outputs
// PLAIN affine; inf flags as in ACIR (x=y=0, inf=1).
static EcJ ec_scalar_mul(const Fr &lo, const Fr &hi, const Fr &px,
                         const Fr &py, bool pinf) {
  u64 full[8] = {lo.v[0], lo.v[1], lo.v[2], lo.v[3], 0, 0, 0, 0};
  // += hi << 128
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)full[i + 2] + hi.v[i] + carry;
    full[i + 2] = (u64)s; carry = s >> 64;
  }
  for (int i = 6; carry && i < 8; ++i) {
    u128 s = (u128)full[i] + carry; full[i] = (u64)s; carry = s >> 64;
  }
  u64 k[4];
  u512_mod_order(full, k);
  EcJ acc = {{{0,0,0,0}}, {{0,0,0,0}}, {{0,0,0,0}}};
  if (pinf || (k[0] | k[1] | k[2] | k[3]) == 0) return acc;
  EcJ base;
  base.X = to_mont(px); base.Y = to_mont(py);
  base.Z = to_mont(Fr{{1, 0, 0, 0}});
  int top = 255;
  while (top >= 0 && !((k[top / 64] >> (top % 64)) & 1)) --top;
  for (int bit = top; bit >= 0; --bit) {
    acc = ec_dbl(acc);
    if ((k[bit / 64] >> (bit % 64)) & 1) acc = ec_add(acc, base);
  }
  return acc;
}

// Jacobian Montgomery -> plain affine (+ inf flag). Matches the ACIR
// blackbox output encoding (0, 0, 1) for the identity.
static void ec_to_affine(const EcJ &p, Fr &ox, Fr &oy, bool &inf) {
  if (ec_is_inf(p)) {
    ox = Fr{{0,0,0,0}}; oy = Fr{{0,0,0,0}}; inf = true; return;
  }
  Fr one = {{1, 0, 0, 0}};
  Fr z_plain = fr_mont_mul(p.Z, one);             // leave Montgomery
  Fr zi = to_mont(fr_inv_plain(z_plain));         // Z^-1, Montgomery
  Fr zi2 = fr_mont_mul(zi, zi);
  ox = fr_mont_mul(fr_mont_mul(p.X, zi2), one);
  oy = fr_mont_mul(fr_mont_mul(p.Y, fr_mont_mul(zi2, zi)), one);
  inf = false;
}

// ----------------------------------------------------------- program IR
//
// Expression table: rows of 5 i64 [n_mul, mul_off, n_lin, lin_off, qc_idx]
//   mul terms: triples (coeff_idx, wa, wb); lin terms: pairs (coeff_idx, wa).
// Stream: records of 8 i64.
//   [0, expr, coeff_expr, invc_pool_idx, target, 0,0,0]   GATE
//       target = -1: assert eval(expr) == 0.
//       else: w[target] = -eval(expr) / eval(coeff_expr); invc_pool_idx
//       >= 0 short-circuits the division with a precomputed inverse.
//   [1, wit, bits, ...]                                    RANGE check
//   [2, expr_a, expr_b, out_q, out_r, ...]                 integer quotient
//   [3, expr_x, out, ...]                                  field inverse
//   [4, expr_val, radix, out_off, out_len, ...]            to_le_radix
//       writes digits to witness indices outidx[out_off .. out_off+len).
// Witness buffer: n x 4 u64 PLAIN values; known: n x u8.

struct Program {
  std::vector<Fr> pool_r;    // coeff * R   (for linear terms)
  std::vector<Fr> pool_r2;   // coeff * R^2 (for mul terms)
  std::vector<Fr> pool;      // plain coeffs (for quotient args etc.)
  std::vector<i64> expr;     // 5-wide rows
  std::vector<i64> mul;      // 3-wide rows
  std::vector<i64> lin;      // 2-wide rows
  std::vector<i64> stream;   // 8-wide records
  std::vector<i64> outidx;
  size_t n_witness;
};

static inline Fr load_w(const u64 *wit, i64 idx) {
  Fr r;
  std::memcpy(r.v, wit + 4 * idx, 32);
  return r;
}

static inline void store_w(u64 *wit, uint8_t *known, i64 idx, const Fr &x) {
  std::memcpy(wit + 4 * idx, x.v, 32);
  known[idx] = 1;
}

// Evaluate expression row ei over plain witness values.
static Fr eval_expr(const Program &pg, i64 ei, const u64 *wit) {
  const i64 *e = pg.expr.data() + 5 * ei;
  Fr acc = pg.pool[e[4]];  // q_c (plain)
  const i64 *mt = pg.mul.data() + 3 * e[1];
  for (i64 i = 0; i < e[0]; ++i, mt += 3) {
    Fr ab = fr_mont_mul(load_w(wit, mt[1]), load_w(wit, mt[2]));  // ab/R
    acc = fr_add(acc, fr_mont_mul(ab, pg.pool_r2[mt[0]]));        // c*a*b
  }
  const i64 *lt = pg.lin.data() + 2 * e[3];
  for (i64 i = 0; i < e[2]; ++i, lt += 2) {
    acc = fr_add(acc, fr_mont_mul(pg.pool_r[lt[0]], load_w(wit, lt[1])));
  }
  return acc;
}

extern "C" {

void *wp_create(const u64 *pool, size_t npool,
                const i64 *expr, size_t nexpr,
                const i64 *mul, size_t nmul,
                const i64 *lin, size_t nlin,
                const i64 *stream, size_t nrec,
                const i64 *outidx, size_t nout,
                size_t n_witness) {
  Program *pg = new Program();
  pg->pool.resize(npool);
  pg->pool_r.resize(npool);
  pg->pool_r2.resize(npool);
  for (size_t i = 0; i < npool; ++i) {
    std::memcpy(pg->pool[i].v, pool + 4 * i, 32);
    pg->pool_r[i] = to_mont(pg->pool[i]);
    pg->pool_r2[i] = fr_mont_mul(pg->pool_r[i], R2);
  }
  pg->expr.assign(expr, expr + 5 * nexpr);
  pg->mul.assign(mul, mul + 3 * nmul);
  pg->lin.assign(lin, lin + 2 * nlin);
  pg->stream.assign(stream, stream + 8 * nrec);
  pg->outidx.assign(outidx, outidx + nout);
  pg->n_witness = n_witness;
  return pg;
}

void wp_destroy(void *h) { delete (Program *)h; }

// Replay records [start, end). Returns 0 on success, else
// 1000000 * errcode + record_index (errcode 1 = unsatisfied gate,
// 2 = range fail, 3 = div by zero).
long wp_run(void *h, size_t start, size_t end, u64 *wit, uint8_t *known) {
  Program &pg = *(Program *)h;
  for (size_t k = start; k < end; ++k) {
    const i64 *rec = &pg.stream[8 * k];
    switch (rec[0]) {
      case 0: {  // GATE
        Fr val = eval_expr(pg, rec[1], wit);
        if (rec[4] < 0) {
          if (!fr_is_zero(val)) return 1000000L * 1 + (long)k;
          break;
        }
        Fr c_inv;
        if (rec[3] >= 0) {
          c_inv = pg.pool[rec[3]];
        } else {
          Fr c = eval_expr(pg, rec[2], wit);
          if (fr_is_zero(c)) return 1000000L * 3 + (long)k;
          c_inv = fr_inv_plain(c);
        }
        // w[target] = (-val) * c_inv; mont_mul(x, y*R) = x*y (plain out)
        Fr nval = fr_sub(Fr{{0, 0, 0, 0}}, val);
        store_w(wit, known, rec[4], fr_mont_mul(nval, to_mont(c_inv)));
        break;
      }
      case 1: {  // RANGE
        Fr v = load_w(wit, rec[1]);
        i64 bits = rec[2];
        // v < 2^bits ?
        for (int i = 3; i >= 0; --i) {
          i64 lo = 64 * i;
          if (bits <= lo) {
            if (v.v[i] != 0) return 1000000L * 2 + (long)k;
          } else if (bits < lo + 64) {
            if (v.v[i] >> (bits - lo)) return 1000000L * 2 + (long)k;
          }
        }
        break;
      }
      case 2: {  // integer quotient: out_q = a / b, out_r = a % b
        Fr a = eval_expr(pg, rec[1], wit);
        Fr b = eval_expr(pg, rec[2], wit);
        if (fr_is_zero(b)) return 1000000L * 3 + (long)k;
        Fr q, r;
        u256_divmod(a.v, b.v, q.v, r.v);
        store_w(wit, known, rec[3], q);
        store_w(wit, known, rec[4], r);
        break;
      }
      case 3: {  // field inverse (0 -> 0)
        Fr x = eval_expr(pg, rec[1], wit);
        Fr r = fr_is_zero(x) ? x : fr_inv_plain(x);
        store_w(wit, known, rec[2], r);
        break;
      }
      case 4: {  // to_le_radix
        Fr v = eval_expr(pg, rec[1], wit);
        u64 radix = (u64)rec[2];
        for (i64 i = 0; i < rec[4]; ++i) {
          u64 d = u256_divmod_small(v.v, radix);
          Fr dv = {{d, 0, 0, 0}};
          store_w(wit, known, pg.outidx[rec[3] + i], dv);
        }
        break;
      }
      case 5: {  // embedded-curve MSM: aux = nterms x 10 (kind, val) pairs
        const i64 *aux = pg.outidx.data() + rec[2];
        EcJ acc = {{{0,0,0,0}}, {{0,0,0,0}}, {{0,0,0,0}}};
        for (i64 t = 0; t < rec[1]; ++t, aux += 10) {
          Fr fi[5];
          for (int j = 0; j < 5; ++j)
            fi[j] = aux[2 * j] ? pg.pool[aux[2 * j + 1]]
                               : load_w(wit, aux[2 * j + 1]);
          bool pinf = !fr_is_zero(fi[2]);
          EcJ term = ec_scalar_mul(fi[3], fi[4], fi[0], fi[1], pinf);
          acc = ec_add(acc, term);
        }
        Fr ox, oy; bool inf;
        ec_to_affine(acc, ox, oy, inf);
        store_w(wit, known, rec[3], ox);
        store_w(wit, known, rec[4], oy);
        store_w(wit, known, rec[5], Fr{{inf ? 1ULL : 0ULL, 0, 0, 0}});
        break;
      }
      case 6: {  // embedded-curve add: aux = 12 ints (6 fis)
        const i64 *aux = pg.outidx.data() + rec[1];
        Fr fi[6];
        for (int j = 0; j < 6; ++j)
          fi[j] = aux[2 * j] ? pg.pool[aux[2 * j + 1]]
                             : load_w(wit, aux[2 * j + 1]);
        EcJ p = {{{0,0,0,0}}, {{0,0,0,0}}, {{0,0,0,0}}}, q = p;
        Fr onem = to_mont(Fr{{1, 0, 0, 0}});
        if (fr_is_zero(fi[2])) {
          p.X = to_mont(fi[0]); p.Y = to_mont(fi[1]); p.Z = onem;
        }
        if (fr_is_zero(fi[5])) {
          q.X = to_mont(fi[3]); q.Y = to_mont(fi[4]); q.Z = onem;
        }
        EcJ acc = ec_add(p, q);
        Fr ox, oy; bool inf;
        ec_to_affine(acc, ox, oy, inf);
        store_w(wit, known, rec[2], ox);
        store_w(wit, known, rec[3], oy);
        store_w(wit, known, rec[4], Fr{{inf ? 1ULL : 0ULL, 0, 0, 0}});
        break;
      }
      default:
        return 1000000L * 9 + (long)k;
    }
  }
  return 0;
}

// CSR sparse matvec over Fr: out[row] = sum coeffs[k] * wit[indices[k]]
// for k in [indptr[row], indptr[row+1]). coeffs in c*R (Montgomery) form
// (pre-converted once per circuit by fr_to_mont_batch); wit PLAIN;
// out PLAIN.
void fr_eval_rows(const i64 *indptr, const i64 *indices, const u64 *coeffs,
                  size_t nrows, const u64 *wit, u64 *out) {
  for (size_t r = 0; r < nrows; ++r) {
    Fr acc = {{0, 0, 0, 0}};
    for (i64 k = indptr[r]; k < indptr[r + 1]; ++k) {
      Fr c;
      std::memcpy(c.v, coeffs + 4 * k, 32);
      acc = fr_add(acc, fr_mont_mul(c, load_w(wit, indices[k])));
    }
    std::memcpy(out + 4 * r, acc.v, 32);
  }
}

// Batch plain -> Montgomery (x -> x * 2^256 mod r), n values of u64[4].
void fr_to_mont_batch(const u64 *in, size_t n, u64 *out) {
  for (size_t i = 0; i < n; ++i) {
    Fr x;
    std::memcpy(x.v, in + 4 * i, 32);
    x = to_mont(x);
    std::memcpy(out + 4 * i, x.v, 32);
  }
}

}  // extern "C"
