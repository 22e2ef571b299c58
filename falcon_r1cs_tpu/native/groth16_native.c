/* Native Groth16 hot loops: BLS12-381 Montgomery arithmetic, Pippenger
 * MSM, fixed-base CRS generation, and Fr radix-2 FFT.
 *
 * The reference gets these from ark-ec/ark-poly (Rust + rayon); this is
 * the from-scratch C equivalent driven via ctypes
 * (falcon_r1cs_tpu/snark/native_backend.py), parallelized with OpenMP.
 * Differentially tested limb-for-limb against the pure-Python
 * implementation in falcon_r1cs_tpu/snark/{bls12_381,msm,fr}.py.
 *
 * Interface conventions:
 *   - field elements cross the boundary as little-endian u64 limb arrays
 *     in STANDARD (non-Montgomery) form: Fq = 6 limbs, Fr = 4 limbs;
 *   - G1 affine points are (x[6], y[6]) + a uint8 infinity flag;
 *     G2 affine points are (x[12], y[12]) (c0 then c1 limbs) + flag;
 *   - scalars are Fr standard-form (n,4) arrays, already reduced mod r.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#ifdef _OPENMP
#include <omp.h>
#endif

typedef uint64_t u64;
typedef unsigned __int128 u128;

/* ----------------------------------------------------------------- Fq -- */

#define NQ 6
static const u64 Q[NQ] = {
    0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static u64 Q_N0;        /* -q^{-1} mod 2^64 */
static u64 Q_R2[NQ];    /* 2^768 mod q (to-Montgomery factor) */
static u64 Q_ONE[NQ];   /* 2^384 mod q (Montgomery one) */

#define NR 4
static const u64 FRM[NR] = {
    0xffffffff00000001ULL, 0x53bda402fffe5bfeULL, 0x3339d80809a1d805ULL,
    0x73eda753299d7d48ULL};
static u64 FR_N0;
static u64 FR_R2[NR];
static u64 FR_ONE[NR];

/* generic helpers over n limbs */
static int ge_n(const u64 *a, const u64 *m, int n) {
  for (int i = n - 1; i >= 0; i--) {
    if (a[i] > m[i]) return 1;
    if (a[i] < m[i]) return 0;
  }
  return 1;
}

static void sub_n(u64 *a, const u64 *m, int n) { /* a -= m (a >= m) */
  u128 borrow = 0;
  for (int i = 0; i < n; i++) {
    u128 d = (u128)a[i] - m[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

static void add_mod_n(const u64 *a, const u64 *b, u64 *out, const u64 *m,
                      int n) {
  u128 carry = 0;
  for (int i = 0; i < n; i++) {
    u128 s = (u128)a[i] + b[i] + carry;
    out[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || ge_n(out, m, n)) sub_n(out, m, n);
}

static void sub_mod_n(const u64 *a, const u64 *b, u64 *out, const u64 *m,
                      int n) {
  u128 borrow = 0;
  for (int i = 0; i < n; i++) {
    u128 d = (u128)a[i] - b[i] - borrow;
    out[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < n; i++) {
      u128 s = (u128)out[i] + m[i] + carry;
      out[i] = (u64)s;
      carry = s >> 64;
    }
  }
}

static int is_zero_n(const u64 *a, int n) {
  for (int i = 0; i < n; i++)
    if (a[i]) return 0;
  return 1;
}

/* CIOS Montgomery multiplication, n limbs */
static void mont_mul_n(const u64 *a, const u64 *b, u64 *out, const u64 *m,
                       u64 n0, int n) {
  u64 t[NQ + 2];
  memset(t, 0, (n + 2) * sizeof(u64));
  for (int i = 0; i < n; i++) {
    u128 carry = 0;
    for (int j = 0; j < n; j++) {
      u128 cur = (u128)a[j] * b[i] + t[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 s = (u128)t[n] + carry;
    t[n] = (u64)s;
    t[n + 1] = (u64)(s >> 64);
    u64 mfac = t[0] * n0;
    u128 cur = (u128)mfac * m[0] + t[0];
    carry = cur >> 64;
    for (int j = 1; j < n; j++) {
      cur = (u128)mfac * m[j] + t[j] + carry;
      t[j - 1] = (u64)cur;
      carry = cur >> 64;
    }
    s = (u128)t[n] + carry;
    t[n - 1] = (u64)s;
    t[n] = t[n + 1] + (u64)(s >> 64);
  }
  if (t[n] || ge_n(t, m, n)) sub_n(t, m, n);
  memcpy(out, t, n * sizeof(u64));
}

/* Fq wrappers */
static void fq_mul(const u64 *a, const u64 *b, u64 *o) {
  mont_mul_n(a, b, o, Q, Q_N0, NQ);
}
static void fq_sqr(const u64 *a, u64 *o) { fq_mul(a, a, o); }
static void fq_add(const u64 *a, const u64 *b, u64 *o) {
  add_mod_n(a, b, o, Q, NQ);
}
static void fq_sub(const u64 *a, const u64 *b, u64 *o) {
  sub_mod_n(a, b, o, Q, NQ);
}
static void fq_neg(const u64 *a, u64 *o) {
  if (is_zero_n(a, NQ)) {
    memset(o, 0, NQ * 8);
  } else {
    u64 t[NQ];
    memcpy(t, Q, NQ * 8);
    sub_n(t, a, NQ);
    memcpy(o, t, NQ * 8);
  }
}
static void fq_dbl(const u64 *a, u64 *o) { fq_add(a, a, o); }
static void fq_to_mont(const u64 *a, u64 *o) { fq_mul(a, Q_R2, o); }
static void fq_from_mont(const u64 *a, u64 *o) {
  u64 one[NQ] = {1};
  fq_mul(a, one, o);
}
/* Fermat inversion (Montgomery in/out): a^(q-2) */
static void fq_inv(const u64 *a, u64 *o) {
  u64 e[NQ];
  memcpy(e, Q, NQ * 8);
  e[0] -= 2; /* q is odd, no borrow */
  u64 base[NQ], acc[NQ];
  memcpy(base, a, NQ * 8);
  memcpy(acc, Q_ONE, NQ * 8);
  for (int i = 0; i < NQ * 64; i++) {
    if ((e[i >> 6] >> (i & 63)) & 1) fq_mul(acc, base, acc);
    fq_sqr(base, base);
  }
  memcpy(o, acc, NQ * 8);
}

/* Binary extended-GCD inversion (Montgomery in/out), ~15x cheaper than
 * the Fermat ladder: for input x = a*R, the integer xgcd gives
 * x^-1 = a^-1 R^-1 (standard); two R^2 Montgomery muls lift it back to
 * a^-1 R.  Used by the batch-affine MSM flush where inversion cost sets
 * the amortized per-point price. */
static void shr1_carry(u64 *a, u64 top, int n) { /* a = (top:a) >> 1 */
  for (int i = 0; i < n - 1; i++) a[i] = (a[i] >> 1) | (a[i + 1] << 63);
  a[n - 1] = (a[n - 1] >> 1) | (top << 63);
}

static void fq_inv_fast(const u64 *a, u64 *o) {
  u64 u[NQ], v[NQ], b[NQ], c[NQ];
  /* u = a as a standard integer (Montgomery rep IS an integer mod q) */
  memcpy(u, a, NQ * 8);
  memcpy(v, Q, NQ * 8);
  memset(b, 0, NQ * 8);
  b[0] = 1;
  memset(c, 0, NQ * 8);
  while (!is_zero_n(u, NQ)) {
    while (!(u[0] & 1)) {
      shr1_carry(u, 0, NQ);
      if (b[0] & 1) { /* b = (b + q)/2 with the carry bit */
        u128 carry = 0;
        for (int i = 0; i < NQ; i++) {
          u128 s = (u128)b[i] + Q[i] + carry;
          b[i] = (u64)s;
          carry = s >> 64;
        }
        shr1_carry(b, (u64)carry, NQ);
      } else {
        shr1_carry(b, 0, NQ);
      }
    }
    while (!(v[0] & 1)) {
      shr1_carry(v, 0, NQ);
      if (c[0] & 1) {
        u128 carry = 0;
        for (int i = 0; i < NQ; i++) {
          u128 s = (u128)c[i] + Q[i] + carry;
          c[i] = (u64)s;
          carry = s >> 64;
        }
        shr1_carry(c, (u64)carry, NQ);
      } else {
        shr1_carry(c, 0, NQ);
      }
    }
    if (ge_n(u, v, NQ)) {
      sub_n(u, v, NQ);
      sub_mod_n(b, c, b, Q, NQ);
    } else {
      sub_n(v, u, NQ);
      sub_mod_n(c, b, c, Q, NQ);
    }
  }
  /* v == gcd == 1 (q prime, a != 0); c = x^-1 standard */
  u64 t[NQ];
  fq_mul(c, Q_R2, t); /* = a^-1 standard */
  fq_mul(t, Q_R2, o); /* = a^-1 Montgomery */
}

/* Fr wrappers */
static void fr_mul(const u64 *a, const u64 *b, u64 *o) {
  mont_mul_n(a, b, o, FRM, FR_N0, NR);
}
static void fr_add(const u64 *a, const u64 *b, u64 *o) {
  add_mod_n(a, b, o, FRM, NR);
}
static void fr_sub(const u64 *a, const u64 *b, u64 *o) {
  sub_mod_n(a, b, o, FRM, NR);
}
static void fr_to_mont(const u64 *a, u64 *o) { fr_mul(a, FR_R2, o); }
static void fr_from_mont(const u64 *a, u64 *o) {
  u64 one[NR] = {1};
  fr_mul(a, one, o);
}
static void fr_pow(const u64 *a_mont, const u64 *e, int ebits, u64 *o) {
  u64 base[NR], acc[NR];
  memcpy(base, a_mont, NR * 8);
  memcpy(acc, FR_ONE, NR * 8);
  for (int i = 0; i < ebits; i++) {
    if ((e[i >> 6] >> (i & 63)) & 1) fr_mul(acc, base, acc);
    fr_mul(base, base, base);
  }
  memcpy(o, acc, NR * 8);
}
static void fr_inv(const u64 *a_mont, u64 *o) {
  u64 e[NR];
  memcpy(e, FRM, NR * 8);
  e[0] -= 2;
  fr_pow(a_mont, e, NR * 64, o);
}

/* ---------------------------------------------------------------- Fq2 -- */

typedef struct {
  u64 c0[NQ], c1[NQ];
} fq2;

static void f2_add(const fq2 *a, const fq2 *b, fq2 *o) {
  fq_add(a->c0, b->c0, o->c0);
  fq_add(a->c1, b->c1, o->c1);
}
static void f2_sub(const fq2 *a, const fq2 *b, fq2 *o) {
  fq_sub(a->c0, b->c0, o->c0);
  fq_sub(a->c1, b->c1, o->c1);
}
static void f2_dbl(const fq2 *a, fq2 *o) { f2_add(a, a, o); }
static void f2_neg(const fq2 *a, fq2 *o) {
  fq_neg(a->c0, o->c0);
  fq_neg(a->c1, o->c1);
}
static void f2_mul(const fq2 *a, const fq2 *b, fq2 *o) {
  u64 t0[NQ], t1[NQ], s0[NQ], s1[NQ], r0[NQ];
  fq_mul(a->c0, b->c0, t0);
  fq_mul(a->c1, b->c1, t1);
  fq_add(a->c0, a->c1, s0);
  fq_add(b->c0, b->c1, s1);
  fq_sub(t0, t1, r0);
  fq_mul(s0, s1, s0);
  fq_sub(s0, t0, s0);
  fq_sub(s0, t1, o->c1);
  memcpy(o->c0, r0, NQ * 8);
}
static void f2_sqr(const fq2 *a, fq2 *o) {
  u64 s[NQ], d[NQ], m[NQ];
  fq_add(a->c0, a->c1, s);
  fq_sub(a->c0, a->c1, d);
  fq_mul(a->c0, a->c1, m);
  fq_mul(s, d, o->c0);
  fq_dbl(m, o->c1);
}
static void f2_inv(const fq2 *a, fq2 *o) {
  u64 n0_[NQ], n1[NQ], ninv[NQ];
  fq_sqr(a->c0, n0_);
  fq_sqr(a->c1, n1);
  fq_add(n0_, n1, n0_);
  fq_inv(n0_, ninv);
  fq_mul(a->c0, ninv, o->c0);
  u64 t[NQ];
  fq_mul(a->c1, ninv, t);
  fq_neg(t, o->c1);
}
static int f2_is_zero(const fq2 *a) {
  return is_zero_n(a->c0, NQ) && is_zero_n(a->c1, NQ);
}
static int f2_eq(const fq2 *a, const fq2 *b) {
  return !memcmp(a->c0, b->c0, NQ * 8) && !memcmp(a->c1, b->c1, NQ * 8);
}

/* ------------------------------------------------ Jacobian points: G1 -- */

typedef struct {
  u64 x[NQ], y[NQ], z[NQ];
} g1p; /* infinity iff z == 0 */

static void g1_set_inf(g1p *p) { memset(p, 0, sizeof(*p)); }
static int g1_is_inf(const g1p *p) { return is_zero_n(p->z, NQ); }

static void g1_dbl(const g1p *p, g1p *o) {
  if (g1_is_inf(p)) {
    *o = *p;
    return;
  }
  u64 A[NQ], B[NQ], C[NQ], D[NQ], E[NQ], F[NQ], t[NQ];
  fq_sqr(p->x, A);
  fq_sqr(p->y, B);
  fq_sqr(B, C);
  fq_add(p->x, B, t);
  fq_sqr(t, t);
  fq_sub(t, A, t);
  fq_sub(t, C, t);
  fq_dbl(t, D);
  fq_dbl(A, E);
  fq_add(E, A, E);
  fq_sqr(E, F);
  u64 x3[NQ], y3[NQ], z3[NQ];
  fq_dbl(D, t);
  fq_sub(F, t, x3);
  fq_sub(D, x3, t);
  fq_mul(E, t, y3);
  fq_dbl(C, t);
  fq_dbl(t, t);
  fq_dbl(t, t); /* 8C */
  fq_sub(y3, t, y3);
  fq_mul(p->y, p->z, z3);
  fq_dbl(z3, z3);
  memcpy(o->x, x3, NQ * 8);
  memcpy(o->y, y3, NQ * 8);
  memcpy(o->z, z3, NQ * 8);
}

static void g1_add(const g1p *p, const g1p *q, g1p *o) {
  if (g1_is_inf(p)) {
    *o = *q;
    return;
  }
  if (g1_is_inf(q)) {
    *o = *p;
    return;
  }
  u64 z1z1[NQ], z2z2[NQ], u1[NQ], u2[NQ], s1[NQ], s2[NQ];
  fq_sqr(p->z, z1z1);
  fq_sqr(q->z, z2z2);
  fq_mul(p->x, z2z2, u1);
  fq_mul(q->x, z1z1, u2);
  u64 t[NQ];
  fq_mul(p->y, q->z, t);
  fq_mul(t, z2z2, s1);
  fq_mul(q->y, p->z, t);
  fq_mul(t, z1z1, s2);
  if (!memcmp(u1, u2, NQ * 8)) {
    if (memcmp(s1, s2, NQ * 8)) {
      g1_set_inf(o);
      return;
    }
    g1_dbl(p, o);
    return;
  }
  u64 H[NQ], I[NQ], J[NQ], rr[NQ], V[NQ];
  fq_sub(u2, u1, H);
  fq_dbl(H, t);
  fq_sqr(t, I);
  fq_mul(H, I, J);
  fq_sub(s2, s1, t);
  fq_dbl(t, rr);
  fq_mul(u1, I, V);
  u64 x3[NQ], y3[NQ], z3[NQ];
  fq_sqr(rr, x3);
  fq_sub(x3, J, x3);
  fq_dbl(V, t);
  fq_sub(x3, t, x3);
  fq_sub(V, x3, t);
  fq_mul(rr, t, y3);
  fq_mul(s1, J, t);
  fq_dbl(t, t);
  fq_sub(y3, t, y3);
  fq_mul(p->z, q->z, z3);
  fq_mul(z3, H, z3);
  fq_dbl(z3, z3);
  memcpy(o->x, x3, NQ * 8);
  memcpy(o->y, y3, NQ * 8);
  memcpy(o->z, z3, NQ * 8);
}

/* mixed add: q affine (Montgomery coords), madd-2007-bl */
static void g1_madd(const g1p *p, const u64 *qx, const u64 *qy, g1p *o) {
  if (g1_is_inf(p)) {
    memcpy(o->x, qx, NQ * 8);
    memcpy(o->y, qy, NQ * 8);
    memcpy(o->z, Q_ONE, NQ * 8);
    return;
  }
  u64 z1z1[NQ], u2[NQ], s2[NQ], t[NQ];
  fq_sqr(p->z, z1z1);
  fq_mul(qx, z1z1, u2);
  fq_mul(qy, p->z, t);
  fq_mul(t, z1z1, s2);
  if (!memcmp(p->x, u2, NQ * 8)) {
    if (memcmp(p->y, s2, NQ * 8)) {
      g1_set_inf(o);
      return;
    }
    g1_dbl(p, o);
    return;
  }
  u64 H[NQ], HH[NQ], I[NQ], J[NQ], rr[NQ], V[NQ];
  fq_sub(u2, p->x, H);
  fq_sqr(H, HH);
  fq_dbl(HH, I);
  fq_dbl(I, I);
  fq_mul(H, I, J);
  fq_sub(s2, p->y, t);
  fq_dbl(t, rr);
  fq_mul(p->x, I, V);
  u64 x3[NQ], y3[NQ], z3[NQ];
  fq_sqr(rr, x3);
  fq_sub(x3, J, x3);
  fq_dbl(V, t);
  fq_sub(x3, t, x3);
  fq_sub(V, x3, t);
  fq_mul(rr, t, y3);
  fq_mul(p->y, J, t);
  fq_dbl(t, t);
  fq_sub(y3, t, y3);
  fq_add(p->z, H, z3);
  fq_sqr(z3, z3);
  fq_sub(z3, z1z1, z3);
  fq_sub(z3, HH, z3);
  memcpy(o->x, x3, NQ * 8);
  memcpy(o->y, y3, NQ * 8);
  memcpy(o->z, z3, NQ * 8);
}

/* ------------------------------------------------ Jacobian points: G2 -- */

typedef struct {
  fq2 x, y, z;
} g2p;

static void g2_set_inf(g2p *p) { memset(p, 0, sizeof(*p)); }
static int g2_is_inf(const g2p *p) { return f2_is_zero(&p->z); }

static void g2_dbl(const g2p *p, g2p *o) {
  if (g2_is_inf(p)) {
    *o = *p;
    return;
  }
  fq2 A, B, C, D, E, F, t;
  f2_sqr(&p->x, &A);
  f2_sqr(&p->y, &B);
  f2_sqr(&B, &C);
  f2_add(&p->x, &B, &t);
  f2_sqr(&t, &t);
  f2_sub(&t, &A, &t);
  f2_sub(&t, &C, &t);
  f2_dbl(&t, &D);
  f2_dbl(&A, &E);
  f2_add(&E, &A, &E);
  f2_sqr(&E, &F);
  fq2 x3, y3, z3;
  f2_dbl(&D, &t);
  f2_sub(&F, &t, &x3);
  f2_sub(&D, &x3, &t);
  f2_mul(&E, &t, &y3);
  f2_dbl(&C, &t);
  f2_dbl(&t, &t);
  f2_dbl(&t, &t);
  f2_sub(&y3, &t, &y3);
  f2_mul(&p->y, &p->z, &z3);
  f2_dbl(&z3, &z3);
  o->x = x3;
  o->y = y3;
  o->z = z3;
}

static void g2_add(const g2p *p, const g2p *q, g2p *o) {
  if (g2_is_inf(p)) {
    *o = *q;
    return;
  }
  if (g2_is_inf(q)) {
    *o = *p;
    return;
  }
  fq2 z1z1, z2z2, u1, u2, s1, s2, t;
  f2_sqr(&p->z, &z1z1);
  f2_sqr(&q->z, &z2z2);
  f2_mul(&p->x, &z2z2, &u1);
  f2_mul(&q->x, &z1z1, &u2);
  f2_mul(&p->y, &q->z, &t);
  f2_mul(&t, &z2z2, &s1);
  f2_mul(&q->y, &p->z, &t);
  f2_mul(&t, &z1z1, &s2);
  if (f2_eq(&u1, &u2)) {
    if (!f2_eq(&s1, &s2)) {
      g2_set_inf(o);
      return;
    }
    g2_dbl(p, o);
    return;
  }
  fq2 H, I, J, rr, V;
  f2_sub(&u2, &u1, &H);
  f2_dbl(&H, &t);
  f2_sqr(&t, &I);
  f2_mul(&H, &I, &J);
  f2_sub(&s2, &s1, &t);
  f2_dbl(&t, &rr);
  f2_mul(&u1, &I, &V);
  fq2 x3, y3, z3;
  f2_sqr(&rr, &x3);
  f2_sub(&x3, &J, &x3);
  f2_dbl(&V, &t);
  f2_sub(&x3, &t, &x3);
  f2_sub(&V, &x3, &t);
  f2_mul(&rr, &t, &y3);
  f2_mul(&s1, &J, &t);
  f2_dbl(&t, &t);
  f2_sub(&y3, &t, &y3);
  f2_mul(&p->z, &q->z, &z3);
  f2_mul(&z3, &H, &z3);
  f2_dbl(&z3, &z3);
  o->x = x3;
  o->y = y3;
  o->z = z3;
}

static void g2_madd(const g2p *p, const fq2 *qx, const fq2 *qy, g2p *o) {
  if (g2_is_inf(p)) {
    o->x = *qx;
    o->y = *qy;
    memcpy(o->z.c0, Q_ONE, NQ * 8);
    memset(o->z.c1, 0, NQ * 8);
    return;
  }
  fq2 z1z1, u2, s2, t;
  f2_sqr(&p->z, &z1z1);
  f2_mul(qx, &z1z1, &u2);
  f2_mul(qy, &p->z, &t);
  f2_mul(&t, &z1z1, &s2);
  if (f2_eq(&p->x, &u2)) {
    if (!f2_eq(&p->y, &s2)) {
      g2_set_inf(o);
      return;
    }
    g2_dbl(p, o);
    return;
  }
  fq2 H, HH, I, J, rr, V;
  f2_sub(&u2, &p->x, &H);
  f2_sqr(&H, &HH);
  f2_dbl(&HH, &I);
  f2_dbl(&I, &I);
  f2_mul(&H, &I, &J);
  f2_sub(&s2, &p->y, &t);
  f2_dbl(&t, &rr);
  f2_mul(&p->x, &I, &V);
  fq2 x3, y3, z3;
  f2_sqr(&rr, &x3);
  f2_sub(&x3, &J, &x3);
  f2_dbl(&V, &t);
  f2_sub(&x3, &t, &x3);
  f2_sub(&V, &x3, &t);
  f2_mul(&rr, &t, &y3);
  f2_mul(&p->y, &J, &t);
  f2_dbl(&t, &t);
  f2_sub(&y3, &t, &y3);
  f2_add(&p->z, &H, &z3);
  f2_sqr(&z3, &z3);
  f2_sub(&z3, &z1z1, &z3);
  f2_sub(&z3, &HH, &z3);
  o->x = x3;
  o->y = y3;
  o->z = z3;
}

/* ------------------------------------------------------- init ---------- */

static int initialized = 0;

static u64 neg_inv64(u64 x) { /* -x^{-1} mod 2^64, x odd */
  u64 inv = 1;
  for (int i = 0; i < 6; i++) inv *= 2 - x * inv; /* Newton, 64-bit wrap */
  return (u64)(0 - inv);
}

static void compute_r2(const u64 *m, int n, u64 *r2out, u64 *oneout) {
  /* one = 2^(64n) mod m via 64n doublings from 1; r2 = one doubled 64n more */
  u64 acc[NQ] = {0};
  acc[0] = 1;
  for (int i = 0; i < 64 * n; i++) add_mod_n(acc, acc, acc, m, n);
  memcpy(oneout, acc, n * 8);
  for (int i = 0; i < 64 * n; i++) add_mod_n(acc, acc, acc, m, n);
  memcpy(r2out, acc, n * 8);
}

void g16_init(void) {
  if (initialized) return;
  Q_N0 = neg_inv64(Q[0]);
  FR_N0 = neg_inv64(FRM[0]);
  compute_r2(Q, NQ, Q_R2, Q_ONE);
  compute_r2(FRM, NR, FR_R2, FR_ONE);
  initialized = 1;
}

/* ------------------------------------------------------- batch utils --- */

/* Jacobian -> affine (standard form out), batched inversion, G1 */
static void g1_normalize_batch(const g1p *pts, long n, u64 *xs, u64 *ys,
                               uint8_t *inf) {
#pragma omp parallel
  {
    long chunk = 4096;
#pragma omp for schedule(dynamic)
    for (long c0 = 0; c0 < n; c0 += chunk) {
      long c1 = c0 + chunk < n ? c0 + chunk : n;
      /* prefix products of z */
      u64(*pre)[NQ] = malloc((c1 - c0 + 1) * sizeof(*pre));
      memcpy(pre[0], Q_ONE, NQ * 8);
      long k = 0;
      for (long i = c0; i < c1; i++) {
        if (g1_is_inf(&pts[i]))
          memcpy(pre[k + 1], pre[k], NQ * 8);
        else
          fq_mul(pre[k], pts[i].z, pre[k + 1]);
        k++;
      }
      u64 invall[NQ];
      fq_inv(pre[c1 - c0], invall);
      for (long i = c1 - 1; i >= c0; i--) {
        k = i - c0;
        if (g1_is_inf(&pts[i])) {
          inf[i] = 1;
          memset(xs + i * NQ, 0, NQ * 8);
          memset(ys + i * NQ, 0, NQ * 8);
          continue;
        }
        u64 zinv[NQ], zi2[NQ], t[NQ];
        fq_mul(pre[k], invall, zinv);
        fq_mul(invall, pts[i].z, invall);
        fq_sqr(zinv, zi2);
        fq_mul(pts[i].x, zi2, t);
        fq_from_mont(t, xs + i * NQ);
        fq_mul(pts[i].y, zi2, t);
        fq_mul(t, zinv, t);
        fq_from_mont(t, ys + i * NQ);
        inf[i] = 0;
      }
      free(pre);
    }
  }
}

static void g2_normalize_batch(const g2p *pts, long n, u64 *xs, u64 *ys,
                               uint8_t *inf) {
  /* simple per-point inversion (G2 batches are smaller); still parallel */
#pragma omp parallel for schedule(dynamic, 256)
  for (long i = 0; i < n; i++) {
    if (g2_is_inf(&pts[i])) {
      inf[i] = 1;
      memset(xs + i * 2 * NQ, 0, 2 * NQ * 8);
      memset(ys + i * 2 * NQ, 0, 2 * NQ * 8);
      continue;
    }
    fq2 zinv, zi2, t;
    f2_inv(&pts[i].z, &zinv);
    f2_sqr(&zinv, &zi2);
    f2_mul(&pts[i].x, &zi2, &t);
    fq_from_mont(t.c0, xs + i * 2 * NQ);
    fq_from_mont(t.c1, xs + i * 2 * NQ + NQ);
    f2_mul(&pts[i].y, &zi2, &t);
    f2_mul(&t, &zinv, &t);
    fq_from_mont(t.c0, ys + i * 2 * NQ);
    fq_from_mont(t.c1, ys + i * 2 * NQ + NQ);
    inf[i] = 0;
  }
}

/* -------------------------------------------------- fixed-base tables -- */

static const u64 G1X[NQ] = {
    0xfb3af00adb22c6bbULL, 0x6c55e83ff97a1aefULL, 0xa14e3a3f171bac58ULL,
    0xc3688c4f9774b905ULL, 0x2695638c4fa9ac0fULL, 0x17f1d3a73197d794ULL};
static const u64 G1Y[NQ] = {
    0x0caa232946c5e7e1ULL, 0xd03cc744a2888ae4ULL, 0x00db18cb2c04b3edULL,
    0xfcf5e095d5d00af6ULL, 0xa09e30ed741d8ae4ULL, 0x08b3f481e3aaa0f1ULL};
static const u64 G2X0[NQ] = {
    0xd48056c8c121bdb8ULL, 0x0bac0326a805bbefULL, 0xb4510b647ae3d177ULL,
    0xc6e47ad4fa403b02ULL, 0x260805272dc51051ULL, 0x024aa2b2f08f0a91ULL};
static const u64 G2X1[NQ] = {
    0xe5ac7d055d042b7eULL, 0x334cf11213945d57ULL, 0xb5da61bbdc7f5049ULL,
    0x596bd0d09920b61aULL, 0x7dacd3a088274f65ULL, 0x13e02b6052719f60ULL};
static const u64 G2Y0[NQ] = {
    0xe193548608b82801ULL, 0x923ac9cc3baca289ULL, 0x6d429a695160d12cULL,
    0xadfd9baa8cbdd3a7ULL, 0x8cc9cdc6da2e351aULL, 0x0ce5d527727d6e11ULL};
static const u64 G2Y1[NQ] = {
    0xaaa9075ff05f79beULL, 0x3f370d275cec1da1ULL, 0x267492ab572e99abULL,
    0xcb3e287e85a763afULL, 0x32acd2b02bc28b99ULL, 0x0606c4a02ea734ccULL};

#define FB_WBITS 8
#define FB_WINDOWS 32 /* ceil(255/8) */
#define FB_TSIZE (1 << FB_WBITS)

/* affine Montgomery-form tables; entry 0 unused (infinity) */
static u64 (*fb1_x)[NQ] = NULL, (*fb1_y)[NQ] = NULL;
static fq2 *fb2_x = NULL, *fb2_y = NULL;
static uint8_t *fb1_inf = NULL, *fb2_inf = NULL;

static void build_fb1(void) {
  if (fb1_x) return;
  long total = (long)FB_WINDOWS * FB_TSIZE;
  g1p *jac = malloc(total * sizeof(g1p));
  g1p base, cur;
  fq_to_mont(G1X, base.x);
  fq_to_mont(G1Y, base.y);
  memcpy(base.z, Q_ONE, NQ * 8);
  for (int w = 0; w < FB_WINDOWS; w++) {
    g1_set_inf(&jac[w * FB_TSIZE]);
    cur = base;
    for (int d = 1; d < FB_TSIZE; d++) {
      g1_add(&jac[w * FB_TSIZE + d - 1], &cur, &jac[w * FB_TSIZE + d]);
    }
    for (int k = 0; k < FB_WBITS; k++) g1_dbl(&base, &base);
  }
  /* normalize to affine Montgomery for madd */
  fb1_x = malloc(total * sizeof(*fb1_x));
  fb1_y = malloc(total * sizeof(*fb1_y));
  fb1_inf = malloc(total);
  for (long i = 0; i < total; i++) {
    if (g1_is_inf(&jac[i])) {
      fb1_inf[i] = 1;
      continue;
    }
    fb1_inf[i] = 0;
    u64 zinv[NQ], zi2[NQ];
    fq_inv(jac[i].z, zinv);
    fq_sqr(zinv, zi2);
    fq_mul(jac[i].x, zi2, fb1_x[i]);
    fq_mul(jac[i].y, zi2, fb1_y[i]);
    fq_mul(fb1_y[i], zinv, fb1_y[i]);
  }
  free(jac);
}

static void build_fb2(void) {
  if (fb2_x) return;
  long total = (long)FB_WINDOWS * FB_TSIZE;
  g2p *jac = malloc(total * sizeof(g2p));
  g2p base, cur;
  fq_to_mont(G2X0, base.x.c0);
  fq_to_mont(G2X1, base.x.c1);
  fq_to_mont(G2Y0, base.y.c0);
  fq_to_mont(G2Y1, base.y.c1);
  memcpy(base.z.c0, Q_ONE, NQ * 8);
  memset(base.z.c1, 0, NQ * 8);
  for (int w = 0; w < FB_WINDOWS; w++) {
    g2_set_inf(&jac[w * FB_TSIZE]);
    cur = base;
    for (int d = 1; d < FB_TSIZE; d++) {
      g2_add(&jac[w * FB_TSIZE + d - 1], &cur, &jac[w * FB_TSIZE + d]);
    }
    for (int k = 0; k < FB_WBITS; k++) g2_dbl(&base, &base);
  }
  fb2_x = malloc(total * sizeof(fq2));
  fb2_y = malloc(total * sizeof(fq2));
  fb2_inf = malloc(total);
  for (long i = 0; i < total; i++) {
    if (g2_is_inf(&jac[i])) {
      fb2_inf[i] = 1;
      continue;
    }
    fb2_inf[i] = 0;
    fq2 zinv, zi2;
    f2_inv(&jac[i].z, &zinv);
    f2_sqr(&zinv, &zi2);
    f2_mul(&jac[i].x, &zi2, &fb2_x[i]);
    f2_mul(&jac[i].y, &zi2, &fb2_y[i]);
    f2_mul(&fb2_y[i], &zinv, &fb2_y[i]);
  }
  free(jac);
}

/* scalars: (n,4) u64 standard form.  out: affine standard + inf flags. */
void g1_fixed_base_batch(const u64 *scalars, long n, u64 *xs, u64 *ys,
                         uint8_t *inf) {
  g16_init();
  build_fb1();
  g1p *acc = malloc(n * sizeof(g1p));
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; i++) {
    const u64 *s = scalars + i * NR;
    g1p a;
    g1_set_inf(&a);
    for (int w = 0; w < FB_WINDOWS; w++) {
      int bit = w * FB_WBITS;
      int limb = bit >> 6, off = bit & 63;
      u64 d = s[limb] >> off;
      if (off > 64 - FB_WBITS && limb + 1 < NR)
        d |= s[limb + 1] << (64 - off);
      d &= FB_TSIZE - 1;
      if (d && !fb1_inf[w * FB_TSIZE + d])
        g1_madd(&a, fb1_x[w * FB_TSIZE + d], fb1_y[w * FB_TSIZE + d], &a);
    }
    acc[i] = a;
  }
  g1_normalize_batch(acc, n, xs, ys, inf);
  free(acc);
}

void g2_fixed_base_batch(const u64 *scalars, long n, u64 *xs, u64 *ys,
                         uint8_t *inf) {
  g16_init();
  build_fb2();
  g2p *acc = malloc(n * sizeof(g2p));
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; i++) {
    const u64 *s = scalars + i * NR;
    g2p a;
    g2_set_inf(&a);
    for (int w = 0; w < FB_WINDOWS; w++) {
      int bit = w * FB_WBITS;
      int limb = bit >> 6, off = bit & 63;
      u64 d = s[limb] >> off;
      if (off > 64 - FB_WBITS && limb + 1 < NR)
        d |= s[limb + 1] << (64 - off);
      d &= FB_TSIZE - 1;
      if (d && !fb2_inf[w * FB_TSIZE + d])
        g2_madd(&a, &fb2_x[w * FB_TSIZE + d], &fb2_y[w * FB_TSIZE + d], &a);
    }
    acc[i] = a;
  }
  g2_normalize_batch(acc, n, xs, ys, inf);
  free(acc);
}

/* ------------------------------------------------------------ MSM ------ */

static int msm_window_bits(long n) {
  if (n < 32) return 3;
  int c = 0;
  long t = n;
  while (t > 1) {
    t >>= 1;
    c++;
  } /* log2(n) */
  c -= 3;
  if (c < 3) c = 3;
  if (c > 16) c = 16;
  return c;
}

/* Signed-digit recoding: digit w of scalar i in [-2^(c-1), 2^(c-1)],
 * scalar = sum_w d_w 2^(cw).  nw includes one extra carry window, so the
 * final carry is always absorbed (top digit <= 1). */
static void msm_recode(const u64 *scalars, long n, int c, int nw,
                       int16_t *dig) {
  const u64 mask = (1ULL << c) - 1;
  const long half = 1L << (c - 1);
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; i++) {
    const u64 *s = scalars + i * NR;
    long carry = 0;
    for (int w = 0; w < nw; w++) {
      long bit = (long)w * c;
      u64 raw = 0;
      int limb = (int)(bit >> 6), off = (int)(bit & 63);
      if (limb < NR) {
        raw = s[limb] >> off;
        if (off + c > 64 && limb + 1 < NR) raw |= s[limb + 1] << (64 - off);
        raw &= mask;
      }
      long d = (long)raw + carry;
      if (d > half) {
        d -= 1L << c;
        carry = 1;
      } else {
        carry = 0;
      }
      dig[i * nw + w] = (int16_t)d;
    }
  }
}

/* Batched Montgomery inversion of m nonzero Montgomery values, in place. */
#define ABATCH 192
static void fq_batch_inv(u64 (*a)[NQ], int m) {
  u64 pref[ABATCH + 1][NQ];
  memcpy(pref[0], Q_ONE, NQ * 8);
  for (int k = 0; k < m; k++) fq_mul(pref[k], a[k], pref[k + 1]);
  u64 inv_all[NQ], t[NQ];
  fq_inv_fast(pref[m], inv_all);
  for (int k = m - 1; k >= 0; k--) {
    fq_mul(pref[k], inv_all, t);
    fq_mul(inv_all, a[k], inv_all);
    memcpy(a[k], t, NQ * 8);
  }
}

/* Affine bucket for the batch-affine accumulation pass. */
typedef struct {
  u64 x[NQ], y[NQ];
  uint8_t set;
} g1aff;

/* One batch-affine addition with a precomputed lambda:
 * (x3, y3) = bucket + (px, py),  lam = (py - by) / (px - bx);
 * py enters only through lam. */
static void g1_aff_apply(g1aff *b, const u64 *px, const u64 *lam) {
  u64 x3[NQ], y3[NQ], t[NQ];
  fq_sqr(lam, x3);
  fq_sub(x3, b->x, x3);
  fq_sub(x3, px, x3);
  fq_sub(b->x, x3, t);
  fq_mul(lam, t, y3);
  fq_sub(y3, b->y, y3);
  memcpy(b->x, x3, NQ * 8);
  memcpy(b->y, y3, NQ * 8);
}

/* Slow path (x-collision: doubling or cancellation); single inversion. */
static void g1_aff_add_slow(g1aff *b, const u64 *px, const u64 *py) {
  u64 dx[NQ];
  fq_sub(px, b->x, dx);
  if (is_zero_n(dx, NQ)) {
    u64 sy[NQ];
    fq_sub(py, b->y, sy);
    if (!is_zero_n(sy, NQ)) { /* P + (-P) */
      b->set = 0;
      return;
    }
    u64 lam[NQ], num[NQ], den[NQ];
    fq_sqr(b->x, num); /* 3x^2 / 2y */
    fq_dbl(num, lam);
    fq_add(lam, num, num);
    fq_dbl(b->y, den);
    fq_inv(den, den);
    fq_mul(num, den, lam);
    g1_aff_apply(b, px, lam);
    return;
  }
  u64 lam[NQ];
  fq_inv(dx, dx);
  fq_sub(py, b->y, lam);
  fq_mul(lam, dx, lam);
  g1_aff_apply(b, px, lam);
}

/* Core MSM over Montgomery-form affine points: signed-digit Pippenger
 * with batch-affine bucket accumulation — one shared inversion per
 * ~ABATCH independent bucket additions.  A bucket with an addition
 * already pending in the current batch absorbs further hits through a
 * Jacobian overflow accumulator instead (so heavily repeated scalars —
 * the wire-value MSMs are mostly bits — cost one mixed add each, never
 * a deferral loop; random full-width scalars almost never conflict). */
static void g1_msm_core(const u64 (*mx)[NQ], const u64 (*my)[NQ],
                        const uint8_t *inf, const u64 *scalars, long n,
                        g1p *out) {
  int c = msm_window_bits(n);
  int nw = (255 + c - 1) / c + 1; /* + carry window */
  long half = 1L << (c - 1);
  int16_t *dig = malloc((size_t)n * nw * sizeof(int16_t));
  msm_recode(scalars, n, c, nw, dig);
  g1p *wsums = malloc(nw * sizeof(g1p));
#pragma omp parallel for schedule(dynamic)
  for (int w = 0; w < nw; w++) {
    g1aff *buckets = calloc(half + 1, sizeof(g1aff));
    g1p *jbuck = calloc(half + 1, sizeof(g1p)); /* z=0 => infinity */
    uint8_t *pend = calloc(half + 1, 1);
    /* batch slots: pointers into mx/my plus sign — no point copies */
    long sb[ABATCH], si[ABATCH];
    int8_t ssgn[ABATCH];
    u64 sden[ABATCH][NQ];
    int m = 0;
    for (long i = 0; i < n; i++) {
      if (inf[i]) continue;
      int d = dig[i * nw + w];
      if (!d) continue;
      long b = d > 0 ? d : -(long)d;
      g1aff *bk = &buckets[b];
      if (pend[b]) { /* conflict this batch: Jacobian overflow */
        u64 ny[NQ];
        const u64 *py = my[i];
        if (d < 0) {
          memcpy(ny, Q, NQ * 8);
          sub_n(ny, my[i], NQ);
          py = ny;
        }
        g1_madd(&jbuck[b], mx[i], py, &jbuck[b]);
        continue;
      }
      if (!bk->set) { /* free write */
        memcpy(bk->x, mx[i], NQ * 8);
        if (d > 0) {
          memcpy(bk->y, my[i], NQ * 8);
        } else {
          memcpy(bk->y, Q, NQ * 8);
          sub_n(bk->y, my[i], NQ); /* Montgomery negate: q - y */
        }
        bk->set = 1;
        pend[b] = 1;
        continue;
      }
      fq_sub(mx[i], bk->x, sden[m]);
      if (is_zero_n(sden[m], NQ)) { /* rare x-collision: slow path */
        u64 ny[NQ];
        const u64 *py = my[i];
        if (d < 0) {
          memcpy(ny, Q, NQ * 8);
          sub_n(ny, my[i], NQ);
          py = ny;
        }
        g1_aff_add_slow(bk, mx[i], py);
        pend[b] = 1;
        continue;
      }
      sb[m] = b;
      si[m] = i;
      ssgn[m] = d > 0 ? 1 : -1;
      pend[b] = 1;
      m++;
      if (m == ABATCH) {
        fq_batch_inv(sden, m);
        for (int k = 0; k < m; k++) {
          u64 lam[NQ];
          g1aff *t = &buckets[sb[k]];
          if (ssgn[k] > 0) {
            fq_sub(my[si[k]], t->y, lam); /* (py - by) * dx^-1 */
          } else {
            fq_add(my[si[k]], t->y, lam); /* -(py + by) * dx^-1 */
            fq_neg(lam, lam);
          }
          fq_mul(lam, sden[k], lam);
          g1_aff_apply(t, mx[si[k]], lam);
        }
        m = 0;
        memset(pend, 0, half + 1);
      }
    }
    if (m) {
      fq_batch_inv(sden, m);
      for (int k = 0; k < m; k++) {
        u64 lam[NQ];
        g1aff *t = &buckets[sb[k]];
        if (ssgn[k] > 0) {
          fq_sub(my[si[k]], t->y, lam);
        } else {
          fq_add(my[si[k]], t->y, lam);
          fq_neg(lam, lam);
        }
        fq_mul(lam, sden[k], lam);
        g1_aff_apply(t, mx[si[k]], lam);
      }
    }
    /* suffix-sum the affine buckets + Jacobian overflow */
    g1p running, acc;
    g1_set_inf(&running);
    g1_set_inf(&acc);
    for (long b = half; b >= 1; b--) {
      if (buckets[b].set)
        g1_madd(&running, buckets[b].x, buckets[b].y, &running);
      if (!g1_is_inf(&jbuck[b])) g1_add(&running, &jbuck[b], &running);
      g1_add(&acc, &running, &acc);
    }
    wsums[w] = acc;
    free(buckets);
    free(jbuck);
    free(pend);
  }
  g1p total;
  g1_set_inf(&total);
  for (int w = nw - 1; w >= 0; w--) {
    if (w != nw - 1)
      for (int k = 0; k < c; k++) g1_dbl(&total, &total);
    g1_add(&total, &wsums[w], &total);
  }
  free(wsums);
  free(dig);
  *out = total;
}

static int g1_out_affine(const g1p *total, u64 *ox, u64 *oy) {
  if (g1_is_inf(total)) return 1;
  u64 zinv[NQ], zi2[NQ], t[NQ];
  fq_inv(total->z, zinv);
  fq_sqr(zinv, zi2);
  fq_mul(total->x, zi2, t);
  fq_from_mont(t, ox);
  fq_mul(total->y, zi2, t);
  fq_mul(t, zinv, t);
  fq_from_mont(t, oy);
  return 0;
}

/* One-time standard -> Montgomery conversion of a point array (lets the
 * prover cache the conversion per proving key instead of per MSM call). */
void g1_to_mont(const u64 *xs, const u64 *ys, long n, u64 *mx, u64 *my) {
  g16_init();
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; i++) {
    fq_to_mont(xs + i * NQ, mx + i * NQ);
    fq_to_mont(ys + i * NQ, my + i * NQ);
  }
}

/* MSM over pre-converted Montgomery points. */
int g1_msm_pre(const u64 *mx, const u64 *my, const uint8_t *inf,
               const u64 *scalars, long n, u64 *ox, u64 *oy) {
  g16_init();
  g1p total;
  g1_msm_core((const u64(*)[NQ])mx, (const u64(*)[NQ])my, inf, scalars, n,
              &total);
  return g1_out_affine(&total, ox, oy);
}

/* points affine standard form; scalars (n,4) standard; out jacobian -> we
 * return affine standard via single inversion.  Returns 1 if infinity. */
int g1_msm(const u64 *xs, const u64 *ys, const uint8_t *inf,
           const u64 *scalars, long n, u64 *ox, u64 *oy) {
  g16_init();
  u64(*mx)[NQ] = malloc(n * sizeof(*mx));
  u64(*my)[NQ] = malloc(n * sizeof(*my));
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; i++) {
    fq_to_mont(xs + i * NQ, mx[i]);
    fq_to_mont(ys + i * NQ, my[i]);
  }
  g1p total;
  g1_msm_core((const u64(*)[NQ])mx, (const u64(*)[NQ])my, inf, scalars, n,
              &total);
  free(mx);
  free(my);
  return g1_out_affine(&total, ox, oy);
}

int g2_msm(const u64 *xs, const u64 *ys, const uint8_t *inf,
           const u64 *scalars, long n, u64 *ox, u64 *oy) {
  g16_init();
  int c = msm_window_bits(n);
  int nw = (255 + c - 1) / c;
  u64 mask = (1ULL << c) - 1;
  fq2 *mx = malloc(n * sizeof(fq2));
  fq2 *my = malloc(n * sizeof(fq2));
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; i++) {
    fq_to_mont(xs + i * 2 * NQ, mx[i].c0);
    fq_to_mont(xs + i * 2 * NQ + NQ, mx[i].c1);
    fq_to_mont(ys + i * 2 * NQ, my[i].c0);
    fq_to_mont(ys + i * 2 * NQ + NQ, my[i].c1);
  }
  g2p *wsums = malloc(nw * sizeof(g2p));
#pragma omp parallel for schedule(dynamic)
  for (int w = 0; w < nw; w++) {
    long nb = 1L << c;
    g2p *buckets = calloc(nb, sizeof(g2p));
    int bit = w * c;
    for (long i = 0; i < n; i++) {
      if (inf[i]) continue;
      const u64 *s = scalars + i * NR;
      int limb = bit >> 6, off = bit & 63;
      u64 d = s[limb] >> off;
      if (off + c > 64 && limb + 1 < NR) d |= s[limb + 1] << (64 - off);
      d &= mask;
      if (d) g2_madd(&buckets[d], &mx[i], &my[i], &buckets[d]);
    }
    g2p running, acc;
    g2_set_inf(&running);
    g2_set_inf(&acc);
    for (long b = nb - 1; b >= 1; b--) {
      g2_add(&running, &buckets[b], &running);
      g2_add(&acc, &running, &acc);
    }
    wsums[w] = acc;
    free(buckets);
  }
  g2p total;
  g2_set_inf(&total);
  for (int w = nw - 1; w >= 0; w--) {
    if (w != nw - 1)
      for (int k = 0; k < c; k++) g2_dbl(&total, &total);
    g2_add(&total, &wsums[w], &total);
  }
  free(wsums);
  free(mx);
  free(my);
  if (g2_is_inf(&total)) return 1;
  fq2 zinv, zi2, t;
  f2_inv(&total.z, &zinv);
  f2_sqr(&zinv, &zi2);
  f2_mul(&total.x, &zi2, &t);
  fq_from_mont(t.c0, ox);
  fq_from_mont(t.c1, ox + NQ);
  f2_mul(&total.y, &zi2, &t);
  f2_mul(&t, &zinv, &t);
  fq_from_mont(t.c0, oy);
  fq_from_mont(t.c1, oy + NQ);
  return 0;
}

/* ------------------------------------------------------------ Fr FFT --- */

static void bit_reverse(u64 *a, long n) {
  long j = 0;
  for (long i = 1; i < n; i++) {
    long bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j |= bit;
    if (i < j) {
      u64 tmp[NR];
      memcpy(tmp, a + i * NR, NR * 8);
      memcpy(a + i * NR, a + j * NR, NR * 8);
      memcpy(a + j * NR, tmp, NR * 8);
    }
  }
}

/* in-place NTT; a is (n,4) standard form; omega standard form; if
 * scale_inv, multiply all outputs by n^{-1} (i.e. this is the inverse
 * transform when omega = w^{-1}). */
void fr_fft(u64 *a, long log_n, const u64 *omega_std, int scale_inv) {
  g16_init();
  long n = 1L << log_n;
  /* to Montgomery */
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; i++) fr_to_mont(a + i * NR, a + i * NR);
  /* twiddles for the full size: tw[j] = omega^j, j < n/2 (Montgomery) */
  u64 om[NR];
  fr_to_mont(omega_std, om);
  u64(*tw)[NR] = malloc((n / 2 > 0 ? n / 2 : 1) * sizeof(*tw));
  memcpy(tw[0], FR_ONE, NR * 8);
  for (long j = 1; j < n / 2; j++) fr_mul(tw[j - 1], om, tw[j]);
  bit_reverse(a, n);
  for (long len = 2; len <= n; len <<= 1) {
    long half = len >> 1;
    long step = n / len;
#pragma omp parallel for schedule(static)
    for (long start = 0; start < n; start += len) {
      for (long k = 0; k < half; k++) {
        u64 *lo = a + (start + k) * NR;
        u64 *hi = a + (start + k + half) * NR;
        u64 t[NR], u[NR];
        fr_mul(hi, tw[k * step], t);
        memcpy(u, lo, NR * 8);
        fr_add(u, t, lo);
        fr_sub(u, t, hi);
      }
    }
  }
  free(tw);
  if (scale_inv) {
    /* n^{-1} mod r */
    u64 ninv[NR] = {0}, nval[NR] = {0};
    nval[log_n >> 6] = 1ULL << (log_n & 63);
    u64 nm[NR];
    fr_to_mont(nval, nm);
    fr_inv(nm, ninv);
#pragma omp parallel for schedule(static)
    for (long i = 0; i < n; i++) fr_mul(a + i * NR, ninv, a + i * NR);
  }
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; i++) fr_from_mont(a + i * NR, a + i * NR);
}

/* a[i] *= g^i (all standard form); invert_g for the coset inverse */
void fr_scale_powers(u64 *a, long n, const u64 *g_std, int invert_g) {
  g16_init();
  u64 g[NR];
  fr_to_mont(g_std, g);
  if (invert_g) fr_inv(g, g);
  /* per-thread chunks with a jump-in power */
  long nt = 1;
#ifdef _OPENMP
  nt = omp_get_max_threads();
#endif
  long chunk = (n + nt - 1) / nt;
#pragma omp parallel for schedule(static)
  for (long t = 0; t < nt; t++) {
    long lo = t * chunk, hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) continue;
    /* g^lo by square-and-multiply */
    u64 cur[NR], base[NR];
    memcpy(cur, FR_ONE, NR * 8);
    memcpy(base, g, NR * 8);
    long e = lo;
    while (e) {
      if (e & 1) fr_mul(cur, base, cur);
      fr_mul(base, base, base);
      e >>= 1;
    }
    for (long i = lo; i < hi; i++) {
      u64 am[NR];
      fr_to_mont(a + i * NR, am);
      fr_mul(am, cur, am);
      fr_from_mont(am, a + i * NR);
      fr_mul(cur, g, cur);
    }
  }
}

/* out = (a*b - c) * zinv, all (n,4) standard, elementwise */
void fr_quotient(const u64 *a, const u64 *b, const u64 *c, const u64 *zinv_std,
                 long n, u64 *out) {
  g16_init();
  u64 zi[NR];
  fr_to_mont(zinv_std, zi);
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; i++) {
    u64 am[NR], bm[NR], cm[NR], t[NR];
    fr_to_mont(a + i * NR, am);
    fr_to_mont(b + i * NR, bm);
    fr_to_mont(c + i * NR, cm);
    fr_mul(am, bm, t);
    fr_sub(t, cm, t);
    fr_mul(t, zi, t);
    fr_from_mont(t, out + i * NR);
  }
}

/* sparse matvec over Fr: out[rows[k]] += vals[k] * z[cols[k]].
 * vals standard form (n,4); z standard; out must be zeroed by caller.
 * Sequential per-row accumulation; parallel over disjoint row ranges is
 * the caller's job (rows are sorted in our COO artifacts). */
void fr_spmv(const int32_t *rows, const int32_t *cols, const u64 *vals,
             long nnz, const u64 *z_mont, u64 *out) {
  g16_init();
#pragma omp parallel
  {
    int nt = 1, tid = 0;
#ifdef _OPENMP
    nt = omp_get_num_threads();
    tid = omp_get_thread_num();
#endif
    for (long k = 0; k < nnz; k++) {
      int32_t r = rows[k];
      if (r % nt != tid) continue; /* row-disjoint partition */
      u64 t[NR];
      /* montmul(std, mont) = standard product */
      fr_mul(vals + k * NR, z_mont + (long)cols[k] * NR, t);
      fr_add(out + (long)r * NR, t, out + (long)r * NR);
    }
  }
}

/* z (n,4) standard -> Montgomery, helper for spmv */
void fr_batch_to_mont(const u64 *in, long n, u64 *out) {
  g16_init();
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; i++) fr_to_mont(in + i * NR, out + i * NR);
}

/* ----------------------------------------------------- self-check ------ */

/* returns 0 on success; exercises field round-trips for the build sanity
 * check in the Python loader */
int g16_selftest(void) {
  g16_init();
  /* fq: to/from Montgomery round trip on a known value */
  u64 a[NQ] = {12345, 678, 0, 0, 0, 0}, m[NQ], back[NQ];
  fq_to_mont(a, m);
  fq_from_mont(m, back);
  if (memcmp(a, back, NQ * 8)) return 1;
  /* fq: x * x^{-1} == 1 */
  u64 inv[NQ], prod[NQ], one_std[NQ] = {1};
  fq_inv(m, inv);
  fq_mul(m, inv, prod);
  fq_from_mont(prod, back);
  if (memcmp(back, one_std, NQ * 8)) return 2;
  /* g1: generator doubling stays on curve: y^2 = x^3 + 4 */
  g1p g;
  fq_to_mont(G1X, g.x);
  fq_to_mont(G1Y, g.y);
  memcpy(g.z, Q_ONE, NQ * 8);
  g1p d;
  g1_dbl(&g, &d);
  u64 xs[NQ], ys[NQ];
  uint8_t inf;
  g1_normalize_batch(&d, 1, xs, ys, &inf);
  if (inf) return 3;
  u64 xm[NQ], ym[NQ], lhs[NQ], rhs[NQ], four[NQ] = {4};
  fq_to_mont(xs, xm);
  fq_to_mont(ys, ym);
  fq_sqr(ym, lhs);
  fq_sqr(xm, rhs);
  fq_mul(rhs, xm, rhs);
  u64 fourm[NQ];
  fq_to_mont(four, fourm);
  fq_add(rhs, fourm, rhs);
  if (memcmp(lhs, rhs, NQ * 8)) return 4;
  return 0;
}
