// Native BN254 runtime kernels (host-side): Fp/Fp2 Montgomery arithmetic,
// G1/G2 Jacobian ops, fixed-base scalar multiplication and Pippenger MSM.
//
// This is the C++ counterpart of the reference's native compute (the
// Rust/Go prover internals behind `sunspot prove`); the TPU owns the
// batched/sharded paths, this library owns host-side setup and
// serialization-adjacent hot loops (trusted setup, per-proof G2 work).
//
// Build: g++ -O3 -shared -fPIC -o libbn254.so bn254.cpp
// ABI: flat little-endian u64 limb arrays; see extern "C" section.

#include <cstdint>
#include <cstring>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;

// ----------------------------------------------------------- Fp (4x64)

struct Fp { u64 v[4]; };

static const Fp P = {{0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                      0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const u64 P_INV = 0x87d20782e4866389ULL;  // -p^-1 mod 2^64
// R = 2^256 mod p
static const Fp R1 = {{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                       0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}};
// R^2 mod p
static const Fp R2 = {{0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                       0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL}};

static inline bool is_zero(const Fp &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool geq_p(const Fp &a) {
  for (int i = 3; i >= 0; --i) {
    if (a.v[i] > P.v[i]) return true;
    if (a.v[i] < P.v[i]) return false;
  }
  return true;  // equal
}

static inline void sub_p(Fp &a) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - P.v[i] - borrow;
    a.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

static inline Fp add(const Fp &a, const Fp &b) {
  Fp r; u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (u64)s; carry = s >> 64;
  }
  if (carry || geq_p(r)) sub_p(r);
  return r;
}

static inline Fp sub(const Fp &a, const Fp &b) {
  Fp r; u128 borrow = 0;
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

static inline Fp neg(const Fp &a) {
  if (is_zero(a)) return a;
  Fp r; u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)P.v[i] - a.v[i] - borrow;
    r.v[i] = (u64)d; borrow = (d >> 64) & 1;
  }
  return r;
}

// CIOS Montgomery multiplication.
static inline Fp mul(const Fp &a, const Fp &b) {
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
  Fp r = {{t[0], t[1], t[2], t[3]}};
  if (t[4] || geq_p(r)) sub_p(r);
  return r;
}

static inline Fp sqr(const Fp &a) { return mul(a, a); }

static Fp fp_pow(const Fp &a, const u64 *e, int words) {
  Fp result = R1, base = a;
  for (int w = 0; w < words; ++w)
    for (int b = 0; b < 64; ++b) {
      if ((e[w] >> b) & 1) result = mul(result, base);
      base = sqr(base);
    }
  return result;
}

static Fp inv(const Fp &a) {
  // p - 2
  u64 e[4] = {P.v[0] - 2, P.v[1], P.v[2], P.v[3]};
  return fp_pow(a, e, 4);
}

static Fp to_mont(const Fp &a) { return mul(a, R2); }
static Fp from_mont(const Fp &a) { Fp one = {{1,0,0,0}}; return mul(a, one); }

// ----------------------------------------------------------- Fp2

struct Fp2 { Fp c0, c1; };

static inline bool is_zero(const Fp2 &a) { return is_zero(a.c0) && is_zero(a.c1); }
static inline Fp2 add(const Fp2 &a, const Fp2 &b) { return {add(a.c0,b.c0), add(a.c1,b.c1)}; }
static inline Fp2 sub(const Fp2 &a, const Fp2 &b) { return {sub(a.c0,b.c0), sub(a.c1,b.c1)}; }
static inline Fp2 neg(const Fp2 &a) { return {neg(a.c0), neg(a.c1)}; }
static inline Fp2 mul(const Fp2 &a, const Fp2 &b) {
  Fp t0 = mul(a.c0, b.c0), t1 = mul(a.c1, b.c1);
  Fp s = mul(add(a.c0, a.c1), add(b.c0, b.c1));
  return {sub(t0, t1), sub(sub(s, t0), t1)};
}
static inline Fp2 sqr(const Fp2 &a) { return mul(a, a); }
static Fp2 inv(const Fp2 &a) {
  Fp d = add(mul(a.c0, a.c0), mul(a.c1, a.c1));
  Fp di = inv(d);
  return {mul(a.c0, di), neg(mul(a.c1, di))};
}

// ------------------------------------------- generic Jacobian curve ops

template <typename F> struct Jac { F X, Y, Z; };

template <typename F>
static inline bool jac_is_inf(const Jac<F> &p) { return is_zero(p.Z); }

template <typename F>
static Jac<F> jac_double(const Jac<F> &p) {
  F A = sqr(p.X), B = sqr(p.Y), C = sqr(B);
  F xb = add(p.X, B);
  F D = sub(sub(sqr(xb), A), C); D = add(D, D);
  F E = add(add(A, A), A);
  F Fv = sqr(E);
  Jac<F> r;
  r.X = sub(Fv, add(D, D));
  F C8 = add(C, C); C8 = add(C8, C8); C8 = add(C8, C8);
  r.Y = sub(mul(E, sub(D, r.X)), C8);
  F yz = mul(p.Y, p.Z);
  r.Z = add(yz, yz);
  return r;
}

template <typename F>
static Jac<F> jac_add(const Jac<F> &p, const Jac<F> &q) {
  if (jac_is_inf(p)) return q;
  if (jac_is_inf(q)) return p;
  F z1z1 = sqr(p.Z), z2z2 = sqr(q.Z);
  F u1 = mul(p.X, z2z2), u2 = mul(q.X, z1z1);
  F s1 = mul(p.Y, mul(q.Z, z2z2)), s2 = mul(q.Y, mul(p.Z, z1z1));
  F h = sub(u2, u1), r = sub(s2, s1);
  if (is_zero(h)) {
    if (is_zero(r)) return jac_double(p);
    Jac<F> inf; std::memset(&inf, 0, sizeof(inf)); return inf;
  }
  F hh = sqr(h), hhh = mul(h, hh), v = mul(u1, hh);
  Jac<F> o;
  o.X = sub(sub(sqr(r), hhh), add(v, v));
  o.Y = sub(mul(r, sub(v, o.X)), mul(s1, hhh));
  o.Z = mul(mul(p.Z, q.Z), h);
  return o;
}

// scalar as 4x64 LE; double-and-add MSB->LSB
template <typename F>
static Jac<F> jac_mul(const Jac<F> &p, const u64 *k) {
  Jac<F> acc; std::memset(&acc, 0, sizeof(acc));
  bool started = false;
  for (int w = 3; w >= 0; --w)
    for (int b = 63; b >= 0; --b) {
      if (started) acc = jac_double(acc);
      if ((k[w] >> b) & 1) { acc = jac_add(acc, p); started = true; }
    }
  return acc;
}

// ------------------------------------------------------------- helpers

using G1 = Jac<Fp>;
using G2 = Jac<Fp2>;

static void g1_to_affine(const G1 &p, u64 *out8) {
  if (jac_is_inf(p)) { std::memset(out8, 0, 64); return; }
  Fp zi = inv(p.Z), zi2 = sqr(zi);
  Fp x = from_mont(mul(p.X, zi2));
  Fp y = from_mont(mul(p.Y, mul(zi2, zi)));
  std::memcpy(out8, x.v, 32);
  std::memcpy(out8 + 4, y.v, 32);
}

static void g2_to_affine(const G2 &p, u64 *out16) {
  if (jac_is_inf(p)) { std::memset(out16, 0, 128); return; }
  Fp2 zi = inv(p.Z), zi2 = sqr(zi);
  Fp2 x = mul(p.X, zi2);
  Fp2 y = mul(p.Y, mul(zi2, zi));
  Fp v[4] = {from_mont(x.c0), from_mont(x.c1), from_mont(y.c0), from_mont(y.c1)};
  for (int i = 0; i < 4; ++i) std::memcpy(out16 + 4 * i, v[i].v, 32);
}

static G1 g1_from_affine(const u64 *in8) {
  G1 p;
  Fp x, y;
  std::memcpy(x.v, in8, 32);
  std::memcpy(y.v, in8 + 4, 32);
  if (is_zero(x) && is_zero(y)) { std::memset(&p, 0, sizeof(p)); return p; }
  p.X = to_mont(x); p.Y = to_mont(y); p.Z = R1;
  return p;
}

// generators (canonical form)
static G1 g1_gen() {
  u64 xy[8] = {1, 0, 0, 0, 2, 0, 0, 0};
  return g1_from_affine(xy);
}

static G2 g2_gen() {
  // canonical coordinates (x = x0 + x1 u, y = y0 + y1 u), little-endian limbs
  static const u64 X0[4] = {0x46debd5cd992f6edULL, 0x674322d4f75edaddULL,
                            0x426a00665e5c4479ULL, 0x1800deef121f1e76ULL};
  static const u64 X1[4] = {0x97e485b7aef312c2ULL, 0xf1aa493335a9e712ULL,
                            0x7260bfb731fb5d25ULL, 0x198e9393920d483aULL};
  static const u64 Y0[4] = {0x4ce6cc0166fa7daaULL, 0xe3d1e7690c43d37bULL,
                            0x4aab71808dcb408fULL, 0x12c85ea5db8c6debULL};
  static const u64 Y1[4] = {0x55acdadcd122975bULL, 0xbc4b313370b38ef3ULL,
                            0xec9e99ad690c3395ULL, 0x090689d0585ff075ULL};
  G2 p;
  Fp a, b, c, d;
  std::memcpy(a.v, X0, 32); std::memcpy(b.v, X1, 32);
  std::memcpy(c.v, Y0, 32); std::memcpy(d.v, Y1, 32);
  p.X = {to_mont(a), to_mont(b)};
  p.Y = {to_mont(c), to_mont(d)};
  p.Z = {R1, {{0,0,0,0}}};
  return p;
}

// ------------------------------------------------------------ extern C

extern "C" {

// out8: canonical affine (x, y) 4+4 u64 LE each; scalars n x 4 u64 LE.
void g1_fixed_base_mul_batch(const u64 *scalars, size_t n, u64 *out) {
  // 4-bit windowed table of the generator: 64 windows x 15 entries.
  static std::vector<G1> table;
  if (table.empty()) {
    table.resize(64 * 15);
    G1 base = g1_gen();
    for (int w = 0; w < 64; ++w) {
      G1 acc; std::memset(&acc, 0, sizeof(acc));
      for (int k = 0; k < 15; ++k) {
        acc = jac_add(acc, base);
        table[w * 15 + k] = acc;
      }
      for (int d = 0; d < 4; ++d) base = jac_double(base);
    }
  }
  for (size_t i = 0; i < n; ++i) {
    const u64 *k = scalars + 4 * i;
    G1 acc; std::memset(&acc, 0, sizeof(acc));
    for (int w = 0; w < 64; ++w) {
      unsigned d = (unsigned)((k[w / 16] >> (4 * (w % 16))) & 0xF);
      if (d) acc = jac_add(acc, table[w * 15 + d - 1]);
    }
    g1_to_affine(acc, out + 8 * i);
  }
}

void g2_fixed_base_mul_batch(const u64 *scalars, size_t n, u64 *out) {
  static std::vector<G2> table;
  if (table.empty()) {
    table.resize(64 * 15);
    G2 base = g2_gen();
    for (int w = 0; w < 64; ++w) {
      G2 acc; std::memset(&acc, 0, sizeof(acc));
      for (int k = 0; k < 15; ++k) {
        acc = jac_add(acc, base);
        table[w * 15 + k] = acc;
      }
      for (int d = 0; d < 4; ++d) base = jac_double(base);
    }
  }
  for (size_t i = 0; i < n; ++i) {
    const u64 *k = scalars + 4 * i;
    G2 acc; std::memset(&acc, 0, sizeof(acc));
    for (int w = 0; w < 64; ++w) {
      unsigned d = (unsigned)((k[w / 16] >> (4 * (w % 16))) & 0xF);
      if (d) acc = jac_add(acc, table[w * 15 + d - 1]);
    }
    g2_to_affine(acc, out + 16 * i);
  }
}

// General MSM: points n x 8 u64 canonical affine; Pippenger c=8.
void g1_msm(const u64 *scalars, const u64 *points, size_t n, u64 *out) {
  const int c = 8, n_buckets = 255, n_windows = 32;
  std::vector<G1> pts(n);
  for (size_t i = 0; i < n; ++i) pts[i] = g1_from_affine(points + 8 * i);
  G1 total; std::memset(&total, 0, sizeof(total));
  std::vector<G1> buckets(n_buckets);
  for (int w = n_windows - 1; w >= 0; --w) {
    for (int d = 0; d < c; ++d) total = jac_double(total);
    std::memset(buckets.data(), 0, sizeof(G1) * n_buckets);
    for (size_t i = 0; i < n; ++i) {
      unsigned dig = (unsigned)((scalars[4 * i + w / 8] >> (8 * (w % 8))) & 0xFF);
      if (dig) buckets[dig - 1] = jac_add(buckets[dig - 1], pts[i]);
    }
    G1 run; std::memset(&run, 0, sizeof(run));
    G1 acc; std::memset(&acc, 0, sizeof(acc));
    for (int b = n_buckets - 1; b >= 0; --b) {
      run = jac_add(run, buckets[b]);
      acc = jac_add(acc, run);
    }
    total = jac_add(total, acc);
  }
  g1_to_affine(total, out);
}

// batched variable-base scalar muls (for pk queries in setup):
// bases n x 8 affine, scalars n x 4 -> out n x 8
void g1_mul_batch(const u64 *scalars, const u64 *points, size_t n, u64 *out) {
  for (size_t i = 0; i < n; ++i) {
    G1 p = g1_from_affine(points + 8 * i);
    G1 r = jac_mul(p, scalars + 4 * i);
    g1_to_affine(r, out + 8 * i);
  }
}

static G2 g2_from_affine(const u64 *in16) {
  G2 p;
  Fp c[4];
  for (int i = 0; i < 4; ++i) std::memcpy(c[i].v, in16 + 4 * i, 32);
  bool zero = true;
  for (int i = 0; i < 4; ++i) zero = zero && is_zero(c[i]);
  if (zero) { std::memset(&p, 0, sizeof(p)); return p; }
  p.X = {to_mont(c[0]), to_mont(c[1])};
  p.Y = {to_mont(c[2]), to_mont(c[3])};
  p.Z = {R1, {{0, 0, 0, 0}}};
  return p;
}

// points n x 16 canonical affine Fp2 pairs (x0,x1,y0,y1), scalars n x 4.
void g2_mul_batch(const u64 *scalars, const u64 *points, size_t n, u64 *out) {
  for (size_t i = 0; i < n; ++i) {
    G2 p = g2_from_affine(points + 16 * i);
    G2 r = jac_mul(p, scalars + 4 * i);
    g2_to_affine(r, out + 16 * i);
  }
}

// G2 Pippenger MSM -> single affine point (16 u64).
void g2_msm(const u64 *scalars, const u64 *points, size_t n, u64 *out) {
  const int c = 8, n_buckets = 255, n_windows = 32;
  std::vector<G2> pts(n);
  for (size_t i = 0; i < n; ++i) pts[i] = g2_from_affine(points + 16 * i);
  G2 total; std::memset(&total, 0, sizeof(total));
  std::vector<G2> buckets(n_buckets);
  for (int w = n_windows - 1; w >= 0; --w) {
    for (int d = 0; d < c; ++d) total = jac_double(total);
    std::memset(buckets.data(), 0, sizeof(G2) * n_buckets);
    for (size_t i = 0; i < n; ++i) {
      unsigned dig = (unsigned)((scalars[4 * i + w / 8] >> (8 * (w % 8))) & 0xFF);
      if (dig) buckets[dig - 1] = jac_add(buckets[dig - 1], pts[i]);
    }
    G2 run; std::memset(&run, 0, sizeof(run));
    G2 acc; std::memset(&acc, 0, sizeof(acc));
    for (int b = n_buckets - 1; b >= 0; --b) {
      run = jac_add(run, buckets[b]);
      acc = jac_add(acc, run);
    }
    total = jac_add(total, acc);
  }
  g2_to_affine(total, out);
}

}  // extern "C"
