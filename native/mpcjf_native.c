/* mpcjf_native: host-side bignum/EC/pairing kernels.
 *
 * TPU-native framework split (SURVEY.md §3.2): the prover's bulk math runs
 * on the TPU; the *verifier* does a ~30-point MSM and a 2-pairing product
 * check whose latency budget (<50 ms; reference verifier.rs:195-251 runs in
 * 1.46 ms) pure Python cannot meet.  This module is the C runtime for that
 * host path: 4x64 Montgomery field, a=0 short-Weierstrass G1 (Jacobian),
 * Pippenger MSM, and the Fq2/Fq6/Fq12 tower + optimal-ate Miller loop +
 * final exponentiation, mirroring mpc_jellyfish_tpu/utils/fq_tower.py and
 * mpc_jellyfish_tpu/pairing.py (same tower: u^2 = beta, v^3 = xi, w^2 = v).
 *
 * All curve constants (p, beta, xi, Frobenius gammas, loop digits, hard-part
 * digits) are supplied by Python - the C code is curve-generic.
 * Integers cross the boundary as 32-byte little-endian buffers.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>
#include <stdlib.h>
#include <unistd.h>

typedef unsigned __int128 u128;

typedef struct { uint64_t v[4]; } fe; /* Montgomery form */

typedef struct {
    uint64_t p[4];
    uint64_t n0;           /* -p^{-1} mod 2^64 */
    fe r2, one;            /* R^2 mod p, R mod p */
    fe beta;               /* u^2 = beta (Fq2), Montgomery */
    fe xi[2];              /* v^3 = xi (Fq6 over Fq2), Montgomery */
    fe frob[6][2];         /* gamma_j = xi^{j(p-1)/6} (Fq2), Montgomery */
    int beta_m1;           /* 1 when beta == -1 (BN254/BLS12-381 Fq2) */
} fctx;

/* ---------------- fe core ---------------- */

static int fe_cmp_raw(const uint64_t *a, const uint64_t *b) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] < b[i]) return -1;
        if (a[i] > b[i]) return 1;
    }
    return 0;
}

static void fe_add(const fctx *c, fe *o, const fe *a, const fe *b) {
    u128 t = 0;
    uint64_t s[4];
    for (int i = 0; i < 4; i++) {
        t += (u128)a->v[i] + b->v[i];
        s[i] = (uint64_t)t;
        t >>= 64;
    }
    uint64_t carry = (uint64_t)t;
    if (carry || fe_cmp_raw(s, c->p) >= 0) {
        u128 bt = 0;
        for (int i = 0; i < 4; i++) {
            bt = (u128)s[i] - c->p[i] - (uint64_t)(bt != 0 ? 1 : 0);
            o->v[i] = (uint64_t)bt;
            bt = (bt >> 64) & 1; /* borrow flag in low bit */
        }
    } else {
        memcpy(o->v, s, sizeof s);
    }
}

static void fe_sub(const fctx *c, fe *o, const fe *a, const fe *b) {
    u128 bt = 0;
    uint64_t d[4];
    uint64_t borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 t = (u128)a->v[i] - b->v[i] - borrow;
        d[i] = (uint64_t)t;
        borrow = (uint64_t)((t >> 64) & 1);
    }
    if (borrow) {
        u128 t = 0;
        for (int i = 0; i < 4; i++) {
            t += (u128)d[i] + c->p[i];
            o->v[i] = (uint64_t)t;
            t >>= 64;
        }
    } else {
        memcpy(o->v, d, sizeof d);
    }
    (void)bt;
}

static void fe_neg(const fctx *c, fe *o, const fe *a) {
    fe z;
    memset(&z, 0, sizeof z);
    fe_sub(c, o, &z, a);
}

/* CIOS Montgomery multiplication, 4 limbs */
static void fe_mul(const fctx *c, fe *o, const fe *a, const fe *b) {
    uint64_t t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        uint64_t ai = a->v[i];
        for (int j = 0; j < 4; j++) {
            carry = (u128)ai * b->v[j] + t[j] + (uint64_t)carry;
            t[j] = (uint64_t)carry;
            carry >>= 64;
        }
        carry = (u128)t[4] + (uint64_t)carry;
        t[4] = (uint64_t)carry;
        t[5] = (uint64_t)(carry >> 64);

        uint64_t m = t[0] * c->n0;
        carry = (u128)m * c->p[0] + t[0];
        carry >>= 64;
        for (int j = 1; j < 4; j++) {
            carry = (u128)m * c->p[j] + t[j] + (uint64_t)carry;
            t[j - 1] = (uint64_t)carry;
            carry >>= 64;
        }
        carry = (u128)t[4] + (uint64_t)carry;
        t[3] = (uint64_t)carry;
        t[4] = t[5] + (uint64_t)(carry >> 64);
    }
    if (t[4] || fe_cmp_raw(t, c->p) >= 0) {
        uint64_t borrow = 0;
        for (int i = 0; i < 4; i++) {
            u128 d = (u128)t[i] - c->p[i] - borrow;
            o->v[i] = (uint64_t)d;
            borrow = (uint64_t)((d >> 64) & 1);
        }
    } else {
        memcpy(o->v, t, 4 * sizeof(uint64_t));
    }
}

static void fe_sqr(const fctx *c, fe *o, const fe *a) { fe_mul(c, o, a, a); }

static int fe_is_zero(const fe *a) {
    return (a->v[0] | a->v[1] | a->v[2] | a->v[3]) == 0;
}

static void fe_pow_bytes(const fctx *c, fe *o, const fe *a,
                         const uint8_t *e, Py_ssize_t elen) {
    fe acc = c->one;
    int started = 0;
    for (Py_ssize_t byte = elen - 1; byte >= 0; byte--) {
        for (int bit = 7; bit >= 0; bit--) {
            if (started) fe_sqr(c, &acc, &acc);
            if ((e[byte] >> bit) & 1) {
                if (started) fe_mul(c, &acc, &acc, a);
                else { acc = *a; started = 1; }
            }
        }
    }
    *o = started ? acc : c->one;
}

static void fe_inv(const fctx *c, fe *o, const fe *a) {
    /* a^(p-2) */
    uint8_t e[32];
    uint64_t pm2[4];
    uint64_t borrow = 2;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)c->p[i] - borrow;
        pm2[i] = (uint64_t)d;
        borrow = (uint64_t)((d >> 64) & 1);
    }
    memcpy(e, pm2, 32);
    fe_pow_bytes(c, o, a, e, 32);
}

static void fe_from_bytes(const fctx *c, fe *o, const uint8_t *b) {
    fe t;
    memcpy(t.v, b, 32);
    fe_mul(c, o, &t, &c->r2); /* to Montgomery */
}

static void fe_to_bytes(const fctx *c, uint8_t *b, const fe *a) {
    fe one_raw, t;
    memset(&one_raw, 0, sizeof one_raw);
    one_raw.v[0] = 1;
    fe_mul(c, &t, a, &one_raw); /* from Montgomery */
    memcpy(b, t.v, 32);
}

/* ---------------- G1 Jacobian, a = 0 ---------------- */

typedef struct { fe x, y, z; } g1; /* z == 0 -> infinity */

static void g1_inf(const fctx *c, g1 *o) {
    o->x = c->one;
    o->y = c->one;
    memset(&o->z, 0, sizeof(fe));
}

static void g1_dbl(const fctx *c, g1 *o, const g1 *P) {
    if (fe_is_zero(&P->z)) { *o = *P; return; }
    fe A, B, C2, D, E, F, t, t2;
    fe_sqr(c, &A, &P->x);
    fe_sqr(c, &B, &P->y);
    fe_sqr(c, &C2, &B);
    fe_add(c, &t, &P->x, &B);
    fe_sqr(c, &t, &t);
    fe_sub(c, &t, &t, &A);
    fe_sub(c, &t, &t, &C2);
    fe_add(c, &D, &t, &t);
    fe_add(c, &E, &A, &A);
    fe_add(c, &E, &E, &A);
    fe_sqr(c, &F, &E);
    fe_add(c, &t, &D, &D);
    fe_sub(c, &o->x, &F, &t);
    fe_sub(c, &t, &D, &o->x);
    fe_mul(c, &t, &E, &t);
    fe_add(c, &t2, &C2, &C2);
    fe_add(c, &t2, &t2, &t2);
    fe_add(c, &t2, &t2, &t2);
    fe_mul(c, &o->z, &P->y, &P->z);
    fe_add(c, &o->z, &o->z, &o->z);
    fe_sub(c, &o->y, &t, &t2);
}

static void g1_add(const fctx *c, g1 *o, const g1 *P, const g1 *Q) {
    if (fe_is_zero(&P->z)) { *o = *Q; return; }
    if (fe_is_zero(&Q->z)) { *o = *P; return; }
    fe Z1Z1, Z2Z2, U1, U2, S1, S2, H, I, J, r, V, t;
    fe_sqr(c, &Z1Z1, &P->z);
    fe_sqr(c, &Z2Z2, &Q->z);
    fe_mul(c, &U1, &P->x, &Z2Z2);
    fe_mul(c, &U2, &Q->x, &Z1Z1);
    fe_mul(c, &t, &Q->z, &Z2Z2);
    fe_mul(c, &S1, &P->y, &t);
    fe_mul(c, &t, &P->z, &Z1Z1);
    fe_mul(c, &S2, &Q->y, &t);
    fe_sub(c, &H, &U2, &U1);
    fe_sub(c, &r, &S2, &S1);
    if (fe_is_zero(&H)) {
        if (fe_is_zero(&r)) { g1_dbl(c, o, P); return; }
        g1_inf(c, o);
        return;
    }
    fe_add(c, &t, &H, &H);
    fe_sqr(c, &I, &t);
    fe_mul(c, &J, &H, &I);
    fe_add(c, &r, &r, &r);
    fe_mul(c, &V, &U1, &I);
    fe_sqr(c, &t, &r);
    fe_sub(c, &t, &t, &J);
    fe_sub(c, &o->x, &t, &V);
    fe_sub(c, &o->x, &o->x, &V);
    fe_sub(c, &t, &V, &o->x);
    fe_mul(c, &t, &r, &t);
    fe mul2;
    fe_mul(c, &mul2, &S1, &J);
    fe_add(c, &mul2, &mul2, &mul2);
    fe_sub(c, &o->y, &t, &mul2);
    fe_add(c, &t, &P->z, &Q->z);
    fe_sqr(c, &t, &t);
    fe_sub(c, &t, &t, &Z1Z1);
    fe_sub(c, &t, &t, &Z2Z2);
    fe_mul(c, &o->z, &t, &H);
}

/* Mixed addition: o = P (Jacobian) + (x2, y2) affine (Z2 = 1).
 * 7M + 4S vs the 12M + 4S general add — bucket inserts are the MSM's hot
 * loop, and every input point is affine. */
static void g1_madd(const fctx *c, g1 *o, const g1 *P,
                    const fe *x2, const fe *y2) {
    if (fe_is_zero(&P->z)) { o->x = *x2; o->y = *y2; o->z = c->one; return; }
    fe Z1Z1, U2, S2, H, HH, I, J, r, V, t, t2;
    fe_sqr(c, &Z1Z1, &P->z);
    fe_mul(c, &U2, x2, &Z1Z1);
    fe_mul(c, &t, &P->z, &Z1Z1);
    fe_mul(c, &S2, y2, &t);
    fe_sub(c, &H, &U2, &P->x);
    fe_sub(c, &r, &S2, &P->y);
    if (fe_is_zero(&H)) {
        if (fe_is_zero(&r)) { g1_dbl(c, o, P); return; }
        g1_inf(c, o);
        return;
    }
    fe_sqr(c, &HH, &H);
    fe_add(c, &I, &HH, &HH);
    fe_add(c, &I, &I, &I);
    fe_mul(c, &J, &H, &I);
    fe_add(c, &r, &r, &r);
    fe_mul(c, &V, &P->x, &I);
    fe_sqr(c, &t, &r);
    fe_sub(c, &t, &t, &J);
    fe_sub(c, &t, &t, &V);
    fe_sub(c, &o->x, &t, &V);
    fe_sub(c, &t, &V, &o->x);
    fe_mul(c, &t, &r, &t);
    fe_mul(c, &t2, &P->y, &J);
    fe_add(c, &t2, &t2, &t2);
    fe_sub(c, &o->y, &t, &t2);
    fe_add(c, &t, &P->z, &H);
    fe_sqr(c, &t, &t);
    fe_sub(c, &t, &t, &Z1Z1);
    fe_sub(c, &o->z, &t, &HH);
}

/* Pippenger MSM: signed-digit windows (halves the bucket count), mixed
 * (affine) bucket inserts, and pthread parallelism across windows.
 * points: affine (x, y, inf) Montgomery; scalars raw 4x64 LE, < 2^255. */

static int msm_window_bits(Py_ssize_t n) {
    if (n < 8) return 3;
    int lg = 0;
    while ((1LL << (lg + 1)) <= n) lg++;
    int cb = lg * 69 / 100 + 2;   /* ~ln(n)+2, the Pippenger optimum */
    if (cb < 3) cb = 3;
    if (cb > 16) cb = 16;
    return cb;
}

/* One window's partial sum S_w = sum_b b * bucket_w[b] (no doublings). */
static void msm_window_sum(const fctx *c, g1 *out, const fe *xs,
                           const fe *ys, const int16_t *digits,
                           Py_ssize_t n, int nwin, int w, g1 *buckets,
                           int half) {
    for (int b = 0; b < half; b++) g1_inf(c, &buckets[b]);
    for (Py_ssize_t i = 0; i < n; i++) {
        int d = digits[i * nwin + w];
        if (d > 0) {
            g1 t = buckets[d - 1];
            g1_madd(c, &buckets[d - 1], &t, &xs[i], &ys[i]);
        } else if (d < 0) {
            fe ny;
            fe_neg(c, &ny, &ys[i]);
            g1 t = buckets[-d - 1];
            g1_madd(c, &buckets[-d - 1], &t, &xs[i], &ny);
        }
    }
    g1 running, sum, t;
    g1_inf(c, &running);
    g1_inf(c, &sum);
    for (int b = half - 1; b >= 0; b--) {
        t = running;
        g1_add(c, &running, &t, &buckets[b]);
        t = sum;
        g1_add(c, &sum, &t, &running);
    }
    *out = sum;
}

#include <pthread.h>

typedef struct {
    const fctx *c;
    const fe *xs, *ys;
    const int16_t *digits;
    Py_ssize_t n;
    int nwin, cbits, tid, nthreads;
    g1 *wins;      /* per-window partial sums, shared */
} msm_task;

static void *msm_worker(void *arg) {
    msm_task *t = (msm_task *)arg;
    int half = 1 << (t->cbits - 1);
    g1 *buckets = (g1 *)malloc(sizeof(g1) * half);
    if (!buckets) return (void *)1;
    for (int w = t->tid; w < t->nwin; w += t->nthreads)
        msm_window_sum(t->c, &t->wins[w], t->xs, t->ys, t->digits, t->n,
                       t->nwin, w, buckets, half);
    free(buckets);
    return NULL;
}

static long msm_nthreads(void) {
    const char *e = getenv("MPCJF_MSM_THREADS");
    long nt = e ? atol(e) : 0;
    if (nt <= 0) {
        nt = sysconf(_SC_NPROCESSORS_ONLN);
        if (nt <= 0) nt = 1;
    }
    if (nt > 16) nt = 16;
    return nt;
}

/* generic parallel-for over [0, n): fn(env, lo, hi, tid) per chunk.
 * Returns the thread count used (callers with per-thread accumulators
 * merge that many). grain: minimum items per thread. */
typedef void (*pfor_fn)(void *env, Py_ssize_t lo, Py_ssize_t hi, int tid);
typedef struct { pfor_fn fn; void *env; Py_ssize_t n; long nt; int tid; }
    pfor_task;

static void *pfor_worker(void *arg) {
    pfor_task *t = (pfor_task *)arg;
    Py_ssize_t chunk = (t->n + t->nt - 1) / t->nt;
    Py_ssize_t lo = (Py_ssize_t)t->tid * chunk;
    Py_ssize_t hi = lo + chunk < t->n ? lo + chunk : t->n;
    if (lo < hi) t->fn(t->env, lo, hi, t->tid);
    return NULL;
}

static long pfor(pfor_fn fn, void *env, Py_ssize_t n, Py_ssize_t grain) {
    long nt = msm_nthreads();
    if (grain > 0) {
        long cap = (long)(n / grain);
        if (cap < 1) cap = 1;
        if (nt > cap) nt = cap;
    }
    if (n <= 0) return 1;
    if (nt <= 1) { fn(env, 0, n, 0); return 1; }
    pthread_t th[16];
    pfor_task tasks[16];
    for (long t = 0; t < nt; t++) {
        tasks[t] = (pfor_task){fn, env, n, nt, (int)t};
        if (pthread_create(&th[t], NULL, pfor_worker, &tasks[t]) != 0) {
            pfor_worker(&tasks[t]);
            th[t] = pthread_self();
        }
    }
    for (long t = 0; t < nt; t++)
        if (!pthread_equal(th[t], pthread_self()))
            pthread_join(th[t], NULL);
    return nt;
}

static void g1_msm(const fctx *c, g1 *out, const fe *xs, const fe *ys,
                   const uint8_t *inf, const uint64_t *scalars,
                   Py_ssize_t n) {
    int cbits = msm_window_bits(n);
    int nwin = 256 / cbits + 2;   /* 256 bits + signed-digit carry room */
    /* Recode every scalar into signed digits in [-2^(c-1), 2^(c-1)];
     * infinity points recode to all-zero digits. */
    int16_t *digits = (int16_t *)malloc(sizeof(int16_t) * n * nwin);
    if (!digits) { g1_inf(c, out); return; }
    int half = 1 << (cbits - 1);
    for (Py_ssize_t i = 0; i < n; i++) {
        int carry = 0;
        for (int w = 0; w < nwin; w++) {
            int bit = w * cbits;
            int limb = bit / 64, off = bit % 64;
            uint64_t v = 0;
            if (limb < 4) {
                v = scalars[i * 4 + limb] >> off;
                if (off && limb + 1 < 4)
                    v |= scalars[i * 4 + limb + 1] << (64 - off);
            }
            int d = (int)(v & (uint64_t)((1 << cbits) - 1)) + carry;
            if (d > half) { d -= 1 << cbits; carry = 1; } else carry = 0;
            digits[i * nwin + w] = inf[i] ? 0 : (int16_t)d;
        }
    }
    g1 *wins = (g1 *)malloc(sizeof(g1) * nwin);
    if (!wins) { free(digits); g1_inf(c, out); return; }
    long nt = msm_nthreads();
    if (nt > nwin) nt = nwin;
    if ((Py_ssize_t)(n * nwin) < 512) nt = 1;   /* tiny MSM: skip threads */
    if (nt > 1) {
        pthread_t th[16];
        msm_task tasks[16];
        for (long t = 0; t < nt; t++) {
            tasks[t] = (msm_task){c, xs, ys, digits, n, nwin, cbits,
                                  (int)t, (int)nt, wins};
            if (pthread_create(&th[t], NULL, msm_worker, &tasks[t]) != 0) {
                /* fall back to inline execution for the remaining shards */
                msm_worker(&tasks[t]);
                th[t] = pthread_self();
            }
        }
        for (long t = 0; t < nt; t++)
            if (!pthread_equal(th[t], pthread_self()))
                pthread_join(th[t], NULL);
    } else {
        g1 *buckets = (g1 *)malloc(sizeof(g1) * half);
        if (!buckets) { free(digits); free(wins); g1_inf(c, out); return; }
        for (int w = 0; w < nwin; w++)
            msm_window_sum(c, &wins[w], xs, ys, digits, n, nwin, w,
                           buckets, half);
        free(buckets);
    }
    /* Horner combine: acc = ((S_top * 2^c + S_top-1) * 2^c + ...) */
    g1 acc, t;
    g1_inf(c, &acc);
    for (int w = nwin - 1; w >= 0; w--) {
        for (int d = 0; d < cbits; d++) {
            t = acc;
            g1_dbl(c, &acc, &t);
        }
        t = acc;
        g1_add(c, &acc, &t, &wins[w]);
    }
    free(digits);
    free(wins);
    *out = acc;
}

/* ---------------- Fq2 / Fq6 / Fq12 ---------------- */

typedef struct { fe c0, c1; } f2;
typedef struct { f2 c0, c1, c2; } f6;
typedef struct { f6 c0, c1; } f12;

static void f2_add(const fctx *c, f2 *o, const f2 *a, const f2 *b) {
    fe_add(c, &o->c0, &a->c0, &b->c0);
    fe_add(c, &o->c1, &a->c1, &b->c1);
}
static void f2_sub(const fctx *c, f2 *o, const f2 *a, const f2 *b) {
    fe_sub(c, &o->c0, &a->c0, &b->c0);
    fe_sub(c, &o->c1, &a->c1, &b->c1);
}
static void f2_neg(const fctx *c, f2 *o, const f2 *a) {
    fe_neg(c, &o->c0, &a->c0);
    fe_neg(c, &o->c1, &a->c1);
}
static void f2_conj(const fctx *c, f2 *o, const f2 *a) {
    o->c0 = a->c0;
    fe_neg(c, &o->c1, &a->c1);
}
static void f2_mul(const fctx *c, f2 *o, const f2 *a, const f2 *b) {
    /* Karatsuba: 3 base muls (+1 beta scale unless beta = -1) */
    fe t0, t1, sa, sb, m;
    fe_mul(c, &t0, &a->c0, &b->c0);
    fe_mul(c, &t1, &a->c1, &b->c1);
    fe_add(c, &sa, &a->c0, &a->c1);
    fe_add(c, &sb, &b->c0, &b->c1);
    fe_mul(c, &m, &sa, &sb);
    fe_sub(c, &m, &m, &t0);
    fe_sub(c, &o->c1, &m, &t1);
    if (c->beta_m1) {
        fe_sub(c, &o->c0, &t0, &t1);
    } else {
        fe bb;
        fe_mul(c, &bb, &t1, &c->beta);
        fe_add(c, &o->c0, &t0, &bb);
    }
}
static void f2_sqr(const fctx *c, f2 *o, const f2 *a) {
    if (c->beta_m1) {
        /* complex squaring: (a0+a1)(a0-a1), 2 a0 a1 -- 2 base muls */
        fe s, d, m;
        fe_add(c, &s, &a->c0, &a->c1);
        fe_sub(c, &d, &a->c0, &a->c1);
        fe_mul(c, &m, &a->c0, &a->c1);
        fe_mul(c, &o->c0, &s, &d);
        fe_add(c, &o->c1, &m, &m);
        return;
    }
    f2_mul(c, o, a, a);
}
static void f2_inv(const fctx *c, f2 *o, const f2 *a) {
    /* 1/(a0 + a1 u) = (a0 - a1 u)/(a0^2 - beta a1^2) */
    fe t0, t1, d;
    fe_sqr(c, &t0, &a->c0);
    fe_sqr(c, &t1, &a->c1);
    fe_mul(c, &t1, &t1, &c->beta);
    fe_sub(c, &d, &t0, &t1);
    fe_inv(c, &d, &d);
    fe_mul(c, &o->c0, &a->c0, &d);
    fe_mul(c, &t0, &a->c1, &d);
    fe_neg(c, &o->c1, &t0);
}

static void f6_add(const fctx *c, f6 *o, const f6 *a, const f6 *b) {
    f2_add(c, &o->c0, &a->c0, &b->c0);
    f2_add(c, &o->c1, &a->c1, &b->c1);
    f2_add(c, &o->c2, &a->c2, &b->c2);
}
static void f6_sub(const fctx *c, f6 *o, const f6 *a, const f6 *b) {
    f2_sub(c, &o->c0, &a->c0, &b->c0);
    f2_sub(c, &o->c1, &a->c1, &b->c1);
    f2_sub(c, &o->c2, &a->c2, &b->c2);
}
static void f6_neg(const fctx *c, f6 *o, const f6 *a) {
    f2_neg(c, &o->c0, &a->c0);
    f2_neg(c, &o->c1, &a->c1);
    f2_neg(c, &o->c2, &a->c2);
}
static void f2_mul_xi(const fctx *c, f2 *o, const f2 *a) {
    f2 xi = {c->xi[0], c->xi[1]};
    f2_mul(c, o, a, &xi);
}
static void f6_mul(const fctx *c, f6 *o, const f6 *a, const f6 *b) {
    f2 v0, v1, v2, t0, t1, t2, tmp;
    f2_mul(c, &v0, &a->c0, &b->c0);
    f2_mul(c, &v1, &a->c1, &b->c1);
    f2_mul(c, &v2, &a->c2, &b->c2);
    /* c0 = v0 + xi((a1+a2)(b1+b2) - v1 - v2) */
    f2_add(c, &t0, &a->c1, &a->c2);
    f2_add(c, &t1, &b->c1, &b->c2);
    f2_mul(c, &t2, &t0, &t1);
    f2_sub(c, &t2, &t2, &v1);
    f2_sub(c, &t2, &t2, &v2);
    f2_mul_xi(c, &tmp, &t2);
    f2_add(c, &t2, &v0, &tmp);
    /* c1 = (a0+a1)(b0+b1) - v0 - v1 + xi v2 */
    f2 t3;
    f2_add(c, &t0, &a->c0, &a->c1);
    f2_add(c, &t1, &b->c0, &b->c1);
    f2_mul(c, &t3, &t0, &t1);
    f2_sub(c, &t3, &t3, &v0);
    f2_sub(c, &t3, &t3, &v1);
    f2_mul_xi(c, &tmp, &v2);
    f2_add(c, &t3, &t3, &tmp);
    /* c2 = (a0+a2)(b0+b2) - v0 - v2 + v1 */
    f2 t4;
    f2_add(c, &t0, &a->c0, &a->c2);
    f2_add(c, &t1, &b->c0, &b->c2);
    f2_mul(c, &t4, &t0, &t1);
    f2_sub(c, &t4, &t4, &v0);
    f2_sub(c, &t4, &t4, &v2);
    f2_add(c, &t4, &t4, &v1);
    o->c0 = t2;
    o->c1 = t3;
    o->c2 = t4;
}
static void f6_mul_by_v(const fctx *c, f6 *o, const f6 *a) {
    f2 t;
    f2_mul_xi(c, &t, &a->c2);
    f2 a0 = a->c0, a1 = a->c1;
    o->c0 = t;
    o->c1 = a0;
    o->c2 = a1;
}
static void f6_inv(const fctx *c, f6 *o, const f6 *a) {
    /* standard: via c0,c1,c2 cofactors */
    f2 c0, c1, c2, t0, t1, t2, tmp;
    f2_sqr(c, &t0, &a->c0);
    f2_mul(c, &t1, &a->c1, &a->c2);
    f2_mul_xi(c, &tmp, &t1);
    f2_sub(c, &c0, &t0, &tmp);
    f2_sqr(c, &t0, &a->c2);
    f2_mul_xi(c, &t0, &t0);
    f2_mul(c, &t1, &a->c0, &a->c1);
    f2_sub(c, &c1, &t0, &t1);
    f2_sqr(c, &t0, &a->c1);
    f2_mul(c, &t1, &a->c0, &a->c2);
    f2_sub(c, &c2, &t0, &t1);
    /* t = a0 c0 + xi(a2 c1 + a1 c2) */
    f2 s0, s1;
    f2_mul(c, &s0, &a->c2, &c1);
    f2_mul(c, &s1, &a->c1, &c2);
    f2_add(c, &s0, &s0, &s1);
    f2_mul_xi(c, &s0, &s0);
    f2_mul(c, &t2, &a->c0, &c0);
    f2_add(c, &t2, &t2, &s0);
    f2_inv(c, &t2, &t2);
    f2_mul(c, &o->c0, &c0, &t2);
    f2_mul(c, &o->c1, &c1, &t2);
    f2_mul(c, &o->c2, &c2, &t2);
}

static void f12_mul(const fctx *c, f12 *o, const f12 *a, const f12 *b) {
    f6 v0, v1, t0, t1, t2;
    f6_mul(c, &v0, &a->c0, &b->c0);
    f6_mul(c, &v1, &a->c1, &b->c1);
    f6_add(c, &t0, &a->c0, &a->c1);
    f6_add(c, &t1, &b->c0, &b->c1);
    f6_mul(c, &t2, &t0, &t1);
    f6_sub(c, &t2, &t2, &v0);
    f6_sub(c, &t2, &t2, &v1);
    f6 vv;
    f6_mul_by_v(c, &vv, &v1);
    f6_add(c, &o->c0, &v0, &vv);
    o->c1 = t2;
}
static void f12_sqr(const fctx *c, f12 *o, const f12 *a) {
    /* complex squaring over Fq6 (exact for all inputs): 2 f6_muls vs 3 */
    f6 v0, t0, t1, vv;
    f6_mul(c, &v0, &a->c0, &a->c1);               /* c0*c1 */
    f6_mul_by_v(c, &vv, &a->c1);
    f6_add(c, &t0, &a->c0, &a->c1);               /* c0 + c1 */
    f6_add(c, &t1, &a->c0, &vv);                  /* c0 + v*c1 */
    f6_mul(c, &t0, &t0, &t1);                     /* = c0^2 + v c1^2 + (1+v)c0c1 */
    f6_sub(c, &t0, &t0, &v0);
    f6_mul_by_v(c, &vv, &v0);
    f6_sub(c, &o->c0, &t0, &vv);
    f6_add(c, &o->c1, &v0, &v0);
}
static void f12_conj(const fctx *c, f12 *o, const f12 *a) {
    o->c0 = a->c0;
    f6_neg(c, &o->c1, &a->c1);
}
static void f12_inv(const fctx *c, f12 *o, const f12 *a) {
    /* 1/(a0 + a1 w) = (a0 - a1 w)/(a0^2 - v a1^2) */
    f6 t0, t1;
    f6_mul(c, &t0, &a->c0, &a->c0);
    f6_mul(c, &t1, &a->c1, &a->c1);
    f6_mul_by_v(c, &t1, &t1);
    f6_sub(c, &t0, &t0, &t1);
    f6_inv(c, &t0, &t0);
    f6_mul(c, &o->c0, &a->c0, &t0);
    f6 t2;
    f6_mul(c, &t2, &a->c1, &t0);
    f6_neg(c, &o->c1, &t2);
}
static void f12_one(const fctx *c, f12 *o) {
    memset(o, 0, sizeof *o);
    o->c0.c0.c0 = c->one;
}
static int f12_is_one(const fctx *c, const f12 *a) {
    f12 one;
    f12_one(c, &one);
    return memcmp(a, &one, sizeof one) == 0;
}

/* Frobenius: coefficient-wise conjugation + gamma_j scaling (fq_tower.py
 * f12_frobenius). coeffs of w^j: [c0.c0, c1.c0, c0.c1, c1.c1, c0.c2, c1.c2] */
static void f12_frobenius(const fctx *c, f12 *o, const f12 *a, int n) {
    f12 cur = *a;
    for (int it = 0; it < n; it++) {
        f2 cs[6] = {cur.c0.c0, cur.c1.c0, cur.c0.c1,
                    cur.c1.c1, cur.c0.c2, cur.c1.c2};
        for (int j = 0; j < 6; j++) {
            f2 cj, g = {c->frob[j][0], c->frob[j][1]};
            f2_conj(c, &cj, &cs[j]);
            f2_mul(c, &cs[j], &cj, &g);
        }
        cur.c0.c0 = cs[0]; cur.c1.c0 = cs[1]; cur.c0.c1 = cs[2];
        cur.c1.c1 = cs[3]; cur.c0.c2 = cs[4]; cur.c1.c2 = cs[5];
    }
    *o = cur;
}

/* Granger-Scott cyclotomic squaring: valid for f in the cyclotomic
 * subgroup G_{Phi_6}(q^2) (i.e. after the easy part of the final
 * exponentiation).  Fq12 = Fq4 + Fq4 w + Fq4 w^2 with Fq4 = Fq2[W],
 * W = w^3, W^2 = xi; the three Fq4 pairs in tower coordinates are
 * (c0.c0, c1.c1), (c1.c0, c0.c2), (c0.c1, c1.c2).  9 Fq2 squarings
 * vs 12+ Fq2 muls for a generic f12_sqr. */
static void fp4_sqr(const fctx *c, f2 *o0, f2 *o1, const f2 *z0,
                    const f2 *z1) {
    f2 t0, t1, s;
    f2_sqr(c, &t0, z0);
    f2_sqr(c, &t1, z1);
    f2_add(c, &s, z0, z1);
    f2_sqr(c, &s, &s);
    f2_mul_xi(c, o0, &t1);
    f2_add(c, o0, o0, &t0);
    f2_sub(c, &s, &s, &t0);
    f2_sub(c, o1, &s, &t1);
}

static void f12_cyclo_sqr(const fctx *c, f12 *o, const f12 *a) {
    const f2 *r0 = &a->c0.c0, *r1 = &a->c1.c1;
    const f2 *r2 = &a->c1.c0, *r3 = &a->c0.c2;
    const f2 *r4 = &a->c0.c1, *r5 = &a->c1.c2;
    f2 t0, t1, t2, t3, t4, t5, x;
    fp4_sqr(c, &t0, &t1, r0, r1);
    fp4_sqr(c, &t2, &t3, r2, r3);
    fp4_sqr(c, &t4, &t5, r4, r5);
    /* z = 3t - 2r for c0 components, 3t + 2r for c1 components */
    f2_sub(c, &x, &t0, r0); f2_add(c, &x, &x, &x);
    f2_add(c, &o->c0.c0, &x, &t0);
    f2_add(c, &x, &t1, r1); f2_add(c, &x, &x, &x);
    f2_add(c, &o->c1.c1, &x, &t1);
    f2_sub(c, &x, &t2, r4); f2_add(c, &x, &x, &x);
    f2_add(c, &o->c0.c1, &x, &t2);
    f2_add(c, &x, &t3, r5); f2_add(c, &x, &x, &x);
    f2_add(c, &o->c1.c2, &x, &t3);
    f2 xt5;
    f2_mul_xi(c, &xt5, &t5);
    f2_add(c, &x, &xt5, r2); f2_add(c, &x, &x, &x);
    f2_add(c, &o->c1.c0, &x, &xt5);
    f2_sub(c, &x, &t4, r3); f2_add(c, &x, &x, &x);
    f2_add(c, &o->c0.c2, &x, &t4);
}

/* f^e for e given MSB-first as 0/1 bytes, cyclotomic squarings (caller
 * guarantees f is in the cyclotomic subgroup) */
static void f12_cyclo_exp_bits(const fctx *c, f12 *o, const f12 *f,
                               const uint8_t *bits, Py_ssize_t nbits) {
    f12 acc = *f;
    for (Py_ssize_t i = 1; i < nbits; i++) {
        f12 s;
        f12_cyclo_sqr(c, &s, &acc);
        if (bits[i]) f12_mul(c, &acc, &s, f);
        else acc = s;
    }
    *o = acc;
}

/* ---------------- ate Miller loop (Fq12 coordinates) ---------------- */

/* line through T (affine f12 pair) with slope lam, evaluated at (xP, yP):
 * l = yP - Ty - lam (xP - Tx)   -- mirrors pairing.py _ate_line */
static void ate_line(const fctx *c, f12 *l, const f12 *Tx, const f12 *Ty,
                     const f12 *lam, const fe *xP, const fe *yP) {
    f12 xPe, yPe, t;
    memset(&xPe, 0, sizeof xPe);
    memset(&yPe, 0, sizeof yPe);
    xPe.c0.c0.c0 = *xP;
    yPe.c0.c0.c0 = *yP;
    f12 d;
    f12 tmp;
    /* d = xP - Tx */
    f12 negTx;
    f12_conj(c, &negTx, Tx); /* placeholder; need full neg */
    /* full negation */
    f6_neg(c, &negTx.c0, &Tx->c0);
    f6_neg(c, &negTx.c1, &Tx->c1);
    f6_add(c, &d.c0, &xPe.c0, &negTx.c0);
    f6_add(c, &d.c1, &xPe.c1, &negTx.c1);
    f12_mul(c, &tmp, lam, &d);
    f12 negTy;
    f6_neg(c, &negTy.c0, &Ty->c0);
    f6_neg(c, &negTy.c1, &Ty->c1);
    f6_add(c, &t.c0, &yPe.c0, &negTy.c0);
    f6_add(c, &t.c1, &yPe.c1, &negTy.c1);
    f6_sub(c, &l->c0, &t.c0, &tmp.c0);
    f6_sub(c, &l->c1, &t.c1, &tmp.c1);
}

/* T <- 2T, return line (pairing.py _ate_dbl) */
static void ate_dbl(const fctx *c, f12 *Tx, f12 *Ty, f12 *l,
                    const fe *xP, const fe *yP) {
    f12 x2, lam, den, num, t;
    f12_sqr(c, &x2, Tx);
    /* lam = 3 x^2 / (2 y) */
    f12 three_x2;
    f6_add(c, &three_x2.c0, &x2.c0, &x2.c0);
    f6_add(c, &three_x2.c1, &x2.c1, &x2.c1);
    f6_add(c, &three_x2.c0, &three_x2.c0, &x2.c0);
    f6_add(c, &three_x2.c1, &three_x2.c1, &x2.c1);
    f6_add(c, &den.c0, &Ty->c0, &Ty->c0);
    f6_add(c, &den.c1, &Ty->c1, &Ty->c1);
    f12_inv(c, &den, &den);
    f12_mul(c, &lam, &three_x2, &den);
    ate_line(c, l, Tx, Ty, &lam, xP, yP);
    /* x3 = lam^2 - 2x ; y3 = lam(x - x3) - y */
    f12 lam2, x3, y3;
    f12_sqr(c, &lam2, &lam);
    f6_sub(c, &x3.c0, &lam2.c0, &Tx->c0);
    f6_sub(c, &x3.c1, &lam2.c1, &Tx->c1);
    f6_sub(c, &x3.c0, &x3.c0, &Tx->c0);
    f6_sub(c, &x3.c1, &x3.c1, &Tx->c1);
    f6_sub(c, &t.c0, &Tx->c0, &x3.c0);
    f6_sub(c, &t.c1, &Tx->c1, &x3.c1);
    f12_mul(c, &y3, &lam, &t);
    f6_sub(c, &y3.c0, &y3.c0, &Ty->c0);
    f6_sub(c, &y3.c1, &y3.c1, &Ty->c1);
    *Tx = x3;
    *Ty = y3;
    (void)num;
}

/* T <- T + Q, return line (pairing.py _ate_add) */
static void ate_add(const fctx *c, f12 *Tx, f12 *Ty,
                    const f12 *Qx, const f12 *Qy, f12 *l,
                    const fe *xP, const fe *yP) {
    f12 num, den, lam, t;
    f6_sub(c, &num.c0, &Qy->c0, &Ty->c0);
    f6_sub(c, &num.c1, &Qy->c1, &Ty->c1);
    f6_sub(c, &den.c0, &Qx->c0, &Tx->c0);
    f6_sub(c, &den.c1, &Qx->c1, &Tx->c1);
    f12_inv(c, &den, &den);
    f12_mul(c, &lam, &num, &den);
    ate_line(c, l, Tx, Ty, &lam, xP, yP);
    f12 lam2, x3, y3;
    f12_sqr(c, &lam2, &lam);
    f6_sub(c, &x3.c0, &lam2.c0, &Tx->c0);
    f6_sub(c, &x3.c1, &lam2.c1, &Tx->c1);
    f6_sub(c, &x3.c0, &x3.c0, &Qx->c0);
    f6_sub(c, &x3.c1, &x3.c1, &Qx->c1);
    f6_sub(c, &t.c0, &Tx->c0, &x3.c0);
    f6_sub(c, &t.c1, &Tx->c1, &x3.c1);
    f12_mul(c, &y3, &lam, &t);
    f6_sub(c, &y3.c0, &y3.c0, &Ty->c0);
    f6_sub(c, &y3.c1, &y3.c1, &Ty->c1);
    *Tx = x3;
    *Ty = y3;
}

/* ---------------- Python boundary ---------------- */

static void ctx_free(PyObject *cap) {
    free(PyCapsule_GetPointer(cap, "mpcjf.fctx"));
}

/* ctx_new(p32, beta32, xi 2*32, gammas 12*32) */
static PyObject *py_ctx_new(PyObject *self, PyObject *args) {
    Py_buffer pb, betab, xib, gb;
    if (!PyArg_ParseTuple(args, "y*y*y*y*", &pb, &betab, &xib, &gb))
        return NULL;
    if (pb.len != 32 || betab.len != 32 || xib.len != 64 || gb.len != 384) {
        PyErr_SetString(PyExc_ValueError, "bad ctx buffer sizes");
        return NULL;
    }
    fctx *c = (fctx *)calloc(1, sizeof(fctx));
    memcpy(c->p, pb.buf, 32);
    /* n0 = -p^{-1} mod 2^64 (Newton) */
    uint64_t p0 = c->p[0], inv = 1;
    for (int i = 0; i < 6; i++) inv *= 2 - p0 * inv;
    c->n0 = (uint64_t)(-(int64_t)inv);
    /* one = R mod p: compute by reducing 2^256 ... set via repeated add */
    /* R mod p: start with 2^255 mod p via doubling from 1 */
    fe r;
    memset(&r, 0, sizeof r);
    r.v[0] = 1;
    for (int i = 0; i < 256; i++) {
        /* r = 2r mod p (raw domain) */
        uint64_t carry = 0;
        uint64_t s[4];
        for (int j = 0; j < 4; j++) {
            uint64_t hi = r.v[j] >> 63;
            s[j] = (r.v[j] << 1) | carry;
            carry = hi;
        }
        if (carry || fe_cmp_raw(s, c->p) >= 0) {
            uint64_t borrow = 0;
            for (int j = 0; j < 4; j++) {
                u128 d = (u128)s[j] - c->p[j] - borrow;
                r.v[j] = (uint64_t)d;
                borrow = (uint64_t)((d >> 64) & 1);
            }
        } else {
            memcpy(r.v, s, sizeof s);
        }
    }
    c->one = r; /* R mod p */
    /* r2 = R^2 mod p via 256 more doublings */
    for (int i = 0; i < 256; i++) {
        uint64_t carry = 0;
        uint64_t s[4];
        for (int j = 0; j < 4; j++) {
            uint64_t hi = r.v[j] >> 63;
            s[j] = (r.v[j] << 1) | carry;
            carry = hi;
        }
        if (carry || fe_cmp_raw(s, c->p) >= 0) {
            uint64_t borrow = 0;
            for (int j = 0; j < 4; j++) {
                u128 d = (u128)s[j] - c->p[j] - borrow;
                r.v[j] = (uint64_t)d;
                borrow = (uint64_t)((d >> 64) & 1);
            }
        } else {
            memcpy(r.v, s, sizeof s);
        }
    }
    c->r2 = r;
    fe_from_bytes(c, &c->beta, (const uint8_t *)betab.buf);
    {   /* beta == -1 enables complex Fq2 mul/sqr shortcuts */
        fe negone;
        fe_neg(c, &negone, &c->one);
        c->beta_m1 = memcmp(&c->beta, &negone, sizeof negone) == 0;
    }
    fe_from_bytes(c, &c->xi[0], (const uint8_t *)xib.buf);
    fe_from_bytes(c, &c->xi[1], (const uint8_t *)xib.buf + 32);
    for (int j = 0; j < 6; j++) {
        fe_from_bytes(c, &c->frob[j][0], (const uint8_t *)gb.buf + j * 64);
        fe_from_bytes(c, &c->frob[j][1], (const uint8_t *)gb.buf + j * 64 + 32);
    }
    PyBuffer_Release(&pb);
    PyBuffer_Release(&betab);
    PyBuffer_Release(&xib);
    PyBuffer_Release(&gb);
    return PyCapsule_New(c, "mpcjf.fctx", ctx_free);
}

static fctx *get_ctx(PyObject *cap) {
    return (fctx *)PyCapsule_GetPointer(cap, "mpcjf.fctx");
}

/* msm(ctx, xs n*32, ys n*32, inf n*1, scalars n*32) -> (x32, y32, inf) */
static PyObject *py_msm(PyObject *self, PyObject *args) {
    PyObject *cap;
    Py_buffer xb, yb, ib, sb;
    if (!PyArg_ParseTuple(args, "Oy*y*y*y*", &cap, &xb, &yb, &ib, &sb))
        return NULL;
    fctx *c = get_ctx(cap);
    Py_ssize_t n = ib.len;
    if (xb.len != 32 * n || yb.len != 32 * n || sb.len != 32 * n) {
        PyErr_SetString(PyExc_ValueError,
                        "msm: xs/ys/scalars must be 32 bytes per point");
        return NULL;
    }
    fe *xs = (fe *)malloc(sizeof(fe) * n);
    fe *ys = (fe *)malloc(sizeof(fe) * n);
    if (!xs || !ys) {
        free(xs); free(ys);
        return PyErr_NoMemory();
    }
    for (Py_ssize_t i = 0; i < n; i++) {
        fe_from_bytes(c, &xs[i], (const uint8_t *)xb.buf + 32 * i);
        fe_from_bytes(c, &ys[i], (const uint8_t *)yb.buf + 32 * i);
    }
    g1 res;
    Py_BEGIN_ALLOW_THREADS
    g1_msm(c, &res, xs, ys, (const uint8_t *)ib.buf,
           (const uint64_t *)sb.buf, n);
    Py_END_ALLOW_THREADS
    free(xs);
    free(ys);
    uint8_t out[65];
    if (fe_is_zero(&res.z)) {
        memset(out, 0, 64);
        out[64] = 1;
    } else {
        fe zi, zi2, ax, ay;
        fe_inv(c, &zi, &res.z);
        fe_sqr(c, &zi2, &zi);
        fe_mul(c, &ax, &res.x, &zi2);
        fe_mul(c, &zi2, &zi2, &zi);
        fe_mul(c, &ay, &res.y, &zi2);
        fe_to_bytes(c, out, &ax);
        fe_to_bytes(c, out + 32, &ay);
        out[64] = 0;
    }
    PyBuffer_Release(&xb);
    PyBuffer_Release(&yb);
    PyBuffer_Release(&ib);
    PyBuffer_Release(&sb);
    return PyBytes_FromStringAndSize((const char *)out, 65);
}

static void f12_from_bytes(const fctx *c, f12 *o, const uint8_t *b) {
    fe *fes = (fe *)o;
    for (int i = 0; i < 12; i++) fe_from_bytes(c, &fes[i], b + 32 * i);
}
static void f12_to_bytes(const fctx *c, uint8_t *b, const f12 *a) {
    const fe *fes = (const fe *)a;
    for (int i = 0; i < 12; i++) fe_to_bytes(c, b + 32 * i, &fes[i]);
}

/* miller(ctx, kind, sbits_bytes, P 64B, Qx 384B, Qy 384B) -> f12 768B
 * kind: 0 = plain loop (BLS x>0), 1 = conjugate at end (BLS x<0),
 *       2 = BN254 (frobenius correction lines; q1/q2 computed in C) */
/* ------------------------------------------------------------------ */
/* Projective twist-side Miller loop (no per-step inversions).         */
/*                                                                     */
/* T lives on the sextic twist E'(Fq2): y^2 = x^3 + b2, homogeneous    */
/* (X:Y:Z).  Per step only the LINE is embedded into Fq12 — three      */
/* sparse monomial coefficients whose w-positions depend on the twist  */
/* type (derivation in pairing.py untwist conventions):                */
/*   D-twist (u2=w^2, u3=w^3):  l = a*w^0 + b*w^1 + cc*w^3             */
/*   M-twist (u2=w^4/xi, u3=w^3/xi), scaled by xi:                     */
/*                               l = xi*a*w^0 + b*w^5 + cc*w^3         */
/* with a = H*yP, b = -3X^2*xP, cc = Y^2 - 3 b2 Z^2 (doubling;         */
/* H = 2YZ) and a = D*yP, b = -E*xP, cc = E*x2 - D*y2 (mixed add,      */
/* D = X - x2 Z, E = Y - y2 Z).  Lines are scaled freely (subfield     */
/* factors die in the final exponentiation).                          */
/* ------------------------------------------------------------------ */

static void f2_scale_fe(const fctx *c, f2 *o, const f2 *a, const fe *s) {
    fe_mul(c, &o->c0, &a->c0, s);
    fe_mul(c, &o->c1, &a->c1, s);
}

typedef struct { f2 X, Y, Z; } g2p;

static void tw_dbl(const fctx *c, const f2 *b2, g2p *T,
                   f2 *la, f2 *lb, f2 *lc) {
    f2 B, C, E, J, XY, YZ, t0, t1, E3;
    f2_sqr(c, &B, &T->Y);                    /* Y^2 */
    f2_sqr(c, &C, &T->Z);                    /* Z^2 */
    f2_mul(c, &E, &C, b2);                   /* b' Z^2 */
    f2_add(c, &t0, &E, &E);
    f2_add(c, &E, &t0, &E);                  /* E = 3 b' Z^2 */
    f2_sqr(c, &J, &T->X);                    /* X^2 */
    f2_mul(c, &XY, &T->X, &T->Y);
    f2_mul(c, &YZ, &T->Y, &T->Z);
    /* line: la = 2YZ ; lb = -3X^2 ; lc = Y^2 - 3 b' Z^2 (pre-P scaling) */
    f2_add(c, la, &YZ, &YZ);
    f2_add(c, &t0, &J, &J);
    f2_add(c, &t0, &t0, &J);
    f2_neg(c, lb, &t0);
    f2_sub(c, lc, &B, &E);
    /* F = 3E; X3 = 2 XY (B - F); Y3 = (B+F)^2 - 12 E^2; Z3 = 8 B Y Z */
    f2_add(c, &E3, &E, &E);
    f2_add(c, &E3, &E3, &E);                 /* F = 3E */
    f2_sub(c, &t0, &B, &E3);
    f2_mul(c, &t0, &t0, &XY);
    f2_add(c, &T->X, &t0, &t0);              /* X3 */
    f2_add(c, &t0, &B, &E3);
    f2_sqr(c, &t0, &t0);                     /* (B+F)^2 */
    f2_sqr(c, &t1, &E);
    f2_add(c, &E, &t1, &t1);
    f2_add(c, &E, &E, &E);                   /* 4 E^2 */
    f2_add(c, &t1, &E, &E);
    f2_add(c, &t1, &t1, &E);                 /* 12 E^2 */
    f2_sub(c, &T->Y, &t0, &t1);              /* Y3 */
    f2_mul(c, &t0, &B, &YZ);
    f2_add(c, &t0, &t0, &t0);
    f2_add(c, &t0, &t0, &t0);
    f2_add(c, &T->Z, &t0, &t0);              /* Z3 = 8 B YZ */
}

static void tw_add(const fctx *c, g2p *T, const f2 *x2, const f2 *y2,
                   f2 *la, f2 *lb, f2 *lc) {
    f2 D, E, D2, D3, C1, t0, t1;
    f2_mul(c, &t0, x2, &T->Z);
    f2_sub(c, &D, &T->X, &t0);               /* D = X - x2 Z */
    f2_mul(c, &t0, y2, &T->Z);
    f2_sub(c, &E, &T->Y, &t0);               /* E = Y - y2 Z */
    /* line: la = D ; lb = -E ; lc = E x2 - D y2 */
    *la = D;
    f2_neg(c, lb, &E);
    f2_mul(c, &t0, &E, x2);
    f2_mul(c, &t1, &D, y2);
    f2_sub(c, lc, &t0, &t1);
    /* point update */
    f2_sqr(c, &D2, &D);
    f2_mul(c, &D3, &D2, &D);
    f2_sqr(c, &t0, &E);
    f2_mul(c, &t0, &t0, &T->Z);              /* E^2 Z */
    f2_mul(c, &t1, x2, &T->Z);
    f2_add(c, &t1, &t1, &T->X);              /* X + x2 Z */
    f2_mul(c, &t1, &t1, &D2);
    f2_sub(c, &C1, &t0, &t1);                /* C1 */
    f2_mul(c, &t0, &T->X, &D2);
    f2_sub(c, &t0, &t0, &C1);
    f2_mul(c, &t0, &t0, &E);
    f2_mul(c, &t1, &T->Y, &D3);
    f2_sub(c, &T->Y, &t0, &t1);              /* Y3 */
    f2_mul(c, &T->X, &D, &C1);               /* X3 */
    f2_mul(c, &T->Z, &T->Z, &D3);            /* Z3 */
}

/* place the line into f12 and multiply f by it */
static void tw_line_mul(const fctx *c, int m_twist, f12 *f,
                        const f2 *la, const f2 *lb, const f2 *lc,
                        const fe *xP, const fe *yP) {
    f12 l;
    memset(&l, 0, sizeof l);
    f2 a, b;
    f2_scale_fe(c, &a, la, yP);
    f2_scale_fe(c, &b, lb, xP);
    if (m_twist) {
        f2_mul_xi(c, &l.c0.c0, &a);          /* xi*a at w^0 */
        l.c1.c2 = b;                         /* w^5 */
        l.c1.c1 = *lc;                       /* w^3 */
    } else {
        l.c0.c0 = a;                         /* w^0 */
        l.c1.c0 = b;                         /* w^1 */
        l.c1.c1 = *lc;                       /* w^3 */
    }
    f12_mul(c, f, f, &l);
}

/* miller_twist(ctx, kind, m_twist, sbits, b2 64, P 64, Q 128, frob 256)
   kind: 0 = plain, 1 = conjugate at end (negative-x BLS),
         2 = BN: two extra add steps with q1 = pi(Q), q2 = -pi^2(Q);
   frob = A1 | B1 (Fq2 psi-map constants, 64B each) for kind 2 (else 0B). */
/* core of the projective twist-side Miller loop; A1/B1 only read for
 * kind 2 (BN frobenius correction) */
static void miller_twist_core(const fctx *c, int kind, int m_twist,
                              const uint8_t *bits, Py_ssize_t nbits,
                              const f2 *b2, const fe *xP, const fe *yP,
                              const f2 *qx, const f2 *qy,
                              const f2 *A1, const f2 *B1, f12 *out) {
    g2p T;
    T.X = *qx;
    T.Y = *qy;
    f2 one2;
    memset(&one2, 0, sizeof one2);
    one2.c0 = c->one;
    T.Z = one2;

    f12 f;
    f12_one(c, &f);
    f2 la, lb, lc;
    for (Py_ssize_t i = 1; i < nbits; i++) {
        f12 fs;
        f12_sqr(c, &fs, &f);
        f = fs;
        tw_dbl(c, b2, &T, &la, &lb, &lc);
        tw_line_mul(c, m_twist, &f, &la, &lb, &lc, xP, yP);
        if (bits[i]) {
            tw_add(c, &T, qx, qy, &la, &lb, &lc);
            tw_line_mul(c, m_twist, &f, &la, &lb, &lc, xP, yP);
        }
    }
    if (kind == 1) {
        f12 t;
        f12_conj(c, &t, &f);
        f = t;
    } else if (kind == 2) {
        f2 q1x, q1y, q2x, q2y, t;
        /* q1 = (conj(x) A1, conj(y) B1); q2 = -pi(q1) */
        f2_conj(c, &t, qx);
        f2_mul(c, &q1x, &t, A1);
        f2_conj(c, &t, qy);
        f2_mul(c, &q1y, &t, B1);
        f2_conj(c, &t, &q1x);
        f2_mul(c, &q2x, &t, A1);
        f2_conj(c, &t, &q1y);
        f2_mul(c, &t, &t, B1);
        f2_neg(c, &q2y, &t);
        tw_add(c, &T, &q1x, &q1y, &la, &lb, &lc);
        tw_line_mul(c, m_twist, &f, &la, &lb, &lc, xP, yP);
        tw_add(c, &T, &q2x, &q2y, &la, &lb, &lc);
        tw_line_mul(c, m_twist, &f, &la, &lb, &lc, xP, yP);
    }
    *out = f;
}

static PyObject *py_miller_twist(PyObject *self, PyObject *args) {
    PyObject *cap;
    int kind, m_twist;
    Py_buffer sbits, b2b, pb, qb, fr;
    if (!PyArg_ParseTuple(args, "Oiiy*y*y*y*y*", &cap, &kind, &m_twist,
                          &sbits, &b2b, &pb, &qb, &fr))
        return NULL;
    fctx *c = get_ctx(cap);
    if (b2b.len != 64 || pb.len != 64 || qb.len != 128 ||
        (kind == 2 && fr.len != 128)) {
        PyErr_SetString(PyExc_ValueError, "miller_twist: bad buffer sizes");
        return NULL;
    }
    f2 b2, qx, qy, A1, B1;
    fe xP, yP;
    memset(&A1, 0, sizeof A1);
    memset(&B1, 0, sizeof B1);
    fe_from_bytes(c, &b2.c0, (const uint8_t *)b2b.buf);
    fe_from_bytes(c, &b2.c1, (const uint8_t *)b2b.buf + 32);
    fe_from_bytes(c, &xP, (const uint8_t *)pb.buf);
    fe_from_bytes(c, &yP, (const uint8_t *)pb.buf + 32);
    fe_from_bytes(c, &qx.c0, (const uint8_t *)qb.buf);
    fe_from_bytes(c, &qx.c1, (const uint8_t *)qb.buf + 32);
    fe_from_bytes(c, &qy.c0, (const uint8_t *)qb.buf + 64);
    fe_from_bytes(c, &qy.c1, (const uint8_t *)qb.buf + 96);
    if (kind == 2) {
        fe_from_bytes(c, &A1.c0, (const uint8_t *)fr.buf);
        fe_from_bytes(c, &A1.c1, (const uint8_t *)fr.buf + 32);
        fe_from_bytes(c, &B1.c0, (const uint8_t *)fr.buf + 64);
        fe_from_bytes(c, &B1.c1, (const uint8_t *)fr.buf + 96);
    }
    f12 f;
    miller_twist_core(c, kind, m_twist, (const uint8_t *)sbits.buf,
                      sbits.len, &b2, &xP, &yP, &qx, &qy, &A1, &B1, &f);
    uint8_t out[768];
    f12_to_bytes(c, out, &f);
    PyBuffer_Release(&sbits);
    PyBuffer_Release(&b2b);
    PyBuffer_Release(&pb);
    PyBuffer_Release(&qb);
    PyBuffer_Release(&fr);
    return PyBytes_FromStringAndSize((const char *)out, 768);
}

static PyObject *py_miller(PyObject *self, PyObject *args) {
    PyObject *cap;
    int kind;
    Py_buffer sbits, pb, qxb, qyb;
    if (!PyArg_ParseTuple(args, "Oiy*y*y*y*", &cap, &kind, &sbits, &pb,
                          &qxb, &qyb))
        return NULL;
    fctx *c = get_ctx(cap);
    fe xP, yP;
    fe_from_bytes(c, &xP, (const uint8_t *)pb.buf);
    fe_from_bytes(c, &yP, (const uint8_t *)pb.buf + 32);
    f12 Qx, Qy, Tx, Ty, f, l;
    f12_from_bytes(c, &Qx, (const uint8_t *)qxb.buf);
    f12_from_bytes(c, &Qy, (const uint8_t *)qyb.buf);
    Tx = Qx;
    Ty = Qy;
    f12_one(c, &f);
    const uint8_t *bits = (const uint8_t *)sbits.buf;
    for (Py_ssize_t i = 1; i < sbits.len; i++) { /* MSB first, skip top bit */
        f12 fs;
        f12_sqr(c, &fs, &f);
        ate_dbl(c, &Tx, &Ty, &l, &xP, &yP);
        f12_mul(c, &f, &fs, &l);
        if (bits[i]) {
            ate_add(c, &Tx, &Ty, &Qx, &Qy, &l, &xP, &yP);
            f12_mul(c, &f, &f, &l);
        }
    }
    if (kind == 1) {
        f12 t;
        f12_conj(c, &t, &f);
        f = t;
    } else if (kind == 2) {
        /* q1 = pi(Q), q2 = -pi^2(Q) */
        f12 q1x, q1y, q2x, q2y, t;
        f12_frobenius(c, &q1x, &Qx, 1);
        f12_frobenius(c, &q1y, &Qy, 1);
        f12_frobenius(c, &q2x, &Qx, 2);
        f12_frobenius(c, &t, &Qy, 2);
        f6_neg(c, &q2y.c0, &t.c0);
        f6_neg(c, &q2y.c1, &t.c1);
        ate_add(c, &Tx, &Ty, &q1x, &q1y, &l, &xP, &yP);
        f12_mul(c, &f, &f, &l);
        ate_add(c, &Tx, &Ty, &q2x, &q2y, &l, &xP, &yP);
        f12_mul(c, &f, &f, &l);
    }
    uint8_t out[768];
    f12_to_bytes(c, out, &f);
    PyBuffer_Release(&sbits);
    PyBuffer_Release(&pb);
    PyBuffer_Release(&qxb);
    PyBuffer_Release(&qyb);
    return PyBytes_FromStringAndSize((const char *)out, 768);
}

/* f12_mul(ctx, a 768B, b 768B) -> 768B */
static PyObject *py_f12_mul(PyObject *self, PyObject *args) {
    PyObject *cap;
    Py_buffer ab, bb;
    if (!PyArg_ParseTuple(args, "Oy*y*", &cap, &ab, &bb)) return NULL;
    fctx *c = get_ctx(cap);
    f12 a, b, o;
    f12_from_bytes(c, &a, (const uint8_t *)ab.buf);
    f12_from_bytes(c, &b, (const uint8_t *)bb.buf);
    f12_mul(c, &o, &a, &b);
    uint8_t out[768];
    f12_to_bytes(c, out, &o);
    PyBuffer_Release(&ab);
    PyBuffer_Release(&bb);
    return PyBytes_FromStringAndSize((const char *)out, 768);
}

/* final_exp(ctx, f 768B, digits k*32B) -> 768B; digits base-p of hard part */
static PyObject *py_final_exp(PyObject *self, PyObject *args) {
    PyObject *cap;
    Py_buffer fb, db;
    if (!PyArg_ParseTuple(args, "Oy*y*", &cap, &fb, &db)) return NULL;
    fctx *c = get_ctx(cap);
    f12 f;
    f12_from_bytes(c, &f, (const uint8_t *)fb.buf);
    /* easy: f = frob^2( conj(f) * inv(f) ) * (conj(f) * inv(f)) */
    f12 fi, fc, t;
    f12_inv(c, &fi, &f);
    f12_conj(c, &fc, &f);
    f12_mul(c, &t, &fc, &fi);
    f12 t2;
    f12_frobenius(c, &t2, &t, 2);
    f12_mul(c, &f, &t2, &t);
    /* hard: shared-squaring multi-exp over frobenius powers */
    int k = (int)(db.len / 32);
    if (k < 1) {
        PyErr_SetString(PyExc_ValueError,
                        "final_exp: need at least one 32-byte digit");
        return NULL;
    }
    const uint8_t *digits = (const uint8_t *)db.buf;
    f12 *bases = (f12 *)malloc(sizeof(f12) * k);
    if (!bases) return PyErr_NoMemory();
    bases[0] = f;
    for (int i = 1; i < k; i++) f12_frobenius(c, &bases[i], &f, i);
    /* max bit length */
    int maxbit = 0;
    for (int i = 0; i < k; i++) {
        for (int byte = 31; byte >= 0; byte--) {
            uint8_t v = digits[i * 32 + byte];
            if (v) {
                int b = byte * 8 + 7;
                while (!((v >> (b - byte * 8)) & 1)) b--;
                if (b + 1 > maxbit) maxbit = b + 1;
                break;
            }
        }
    }
    f12 acc;
    f12_one(c, &acc);
    for (int bit = maxbit - 1; bit >= 0; bit--) {
        f12 s;
        f12_cyclo_sqr(c, &s, &acc);   /* acc stays cyclotomic */
        acc = s;
        for (int i = 0; i < k; i++) {
            if ((digits[i * 32 + bit / 8] >> (bit % 8)) & 1) {
                f12_mul(c, &s, &acc, &bases[i]);
                acc = s;
            }
        }
    }
    free(bases);
    uint8_t out[768];
    f12_to_bytes(c, out, &acc);
    PyBuffer_Release(&fb);
    PyBuffer_Release(&db);
    return PyBytes_FromStringAndSize((const char *)out, 768);
}

/* final_exp_bn(ctx, f 768B, xbits 0/1 MSB-first, x_neg) -> 768B.
 * BN-family final exponentiation with the Devegili et al. x-chain hard
 * part (the ark-bn254 chain) and Granger-Scott cyclotomic squarings:
 * ~3x fewer f12 ops than the generic base-p multi-exp in py_final_exp. */
static void final_exp_bn_core(const fctx *c, const f12 *fin,
                              const uint8_t *bits, Py_ssize_t nb,
                              int x_neg, f12 *out) {
    f12 f = *fin;
    /* easy: r = frob^2(conj(f) * inv(f)) * (conj(f) * inv(f)) */
    f12 fi, fc, m, r;
    f12_inv(c, &fi, &f);
    f12_conj(c, &fc, &f);
    f12_mul(c, &m, &fc, &fi);
    f12_frobenius(c, &r, &m, 2);
    f12_mul(c, &r, &r, &m);
    /* hard part, EXACT (matches f^((q^4-q^2+1)/r), not the
     * Fuentes-Castaneda multiple): base-q decomposition
     *   hard = q^3 + (6x^2+1) q^2 + (-36x^3-18x^2-12x+1) q
     *          + (-36x^3-30x^2-18x-2)
     * (verified as an integer identity for the BN parametrization).
     * exp_by_x(g) = g^x with x's sign honored via conjugation. */
#define EXP_BY_X(dst, src) do { \
        f12_cyclo_exp_bits(c, &(dst), &(src), bits, nb); \
        if (x_neg) f12_conj(c, &(dst), &(dst)); \
    } while (0)
    f12 fx, fx2, fx3, t, u;
    EXP_BY_X(fx, r);              /* f^x   */
    EXP_BY_X(fx2, fx);            /* f^x^2 */
    EXP_BY_X(fx3, fx2);           /* f^x^3 */
    f12 f6x2, f36x3, f18x2, f30x2, f12x, f6x, f18x, ff2;
    /* f^{6x^2}: sqr, *fx2, sqr */
    f12_cyclo_sqr(c, &t, &fx2);
    f12_mul(c, &t, &t, &fx2);
    f12_cyclo_sqr(c, &f6x2, &t);
    /* f^{36x^3}: 3x^3, 6x^3, 18x^3, 36x^3 */
    f12_cyclo_sqr(c, &t, &fx3);
    f12_mul(c, &t, &t, &fx3);           /* 3x^3 */
    f12_cyclo_sqr(c, &t, &t);           /* 6x^3 */
    f12_cyclo_sqr(c, &u, &t);           /* 12x^3 */
    f12_mul(c, &u, &u, &t);             /* 18x^3 */
    f12_cyclo_sqr(c, &f36x3, &u);       /* 36x^3 */
    /* f^{18x^2} = f^{12x^2} * f^{6x^2}; f^{30x^2} = f^{18x^2} * f^{12x^2} */
    f12_cyclo_sqr(c, &t, &f6x2);        /* 12x^2 */
    f12_mul(c, &f18x2, &t, &f6x2);
    f12_mul(c, &f30x2, &f18x2, &t);
    /* f^{12x} = f^{8x} * f^{4x}; f^{6x} = f^{4x} * f^{2x};
     * f^{18x} = f^{12x} * f^{6x} */
    f12_cyclo_sqr(c, &t, &fx);          /* 2x */
    f12_cyclo_sqr(c, &u, &t);           /* 4x */
    f12_mul(c, &f6x, &u, &t);           /* 6x */
    f12_cyclo_sqr(c, &t, &u);           /* 8x */
    f12_mul(c, &f12x, &t, &u);          /* 12x */
    f12_mul(c, &f18x, &f12x, &f6x);
    f12_cyclo_sqr(c, &ff2, &r);         /* f^2 */
    /* p2 = f^{6x^2+1}; p1 = f^{-36x^3-18x^2-12x+1};
     * p0 = f^{-36x^3-30x^2-18x-2} */
    f12 p2, p1, p0;
    f12_mul(c, &p2, &f6x2, &r);
    f12_mul(c, &p1, &f36x3, &f18x2);
    f12_mul(c, &p1, &p1, &f12x);
    f12_conj(c, &p1, &p1);
    f12_mul(c, &p1, &p1, &r);
    f12_mul(c, &p0, &f36x3, &f30x2);
    f12_mul(c, &p0, &p0, &f18x);
    f12_mul(c, &p0, &p0, &ff2);
    f12_conj(c, &p0, &p0);
    /* result = frob^3(f) * frob^2(p2) * frob(p1) * p0 */
    f12_frobenius(c, &t, &r, 3);
    f12_frobenius(c, &u, &p2, 2);
    f12_mul(c, &t, &t, &u);
    f12_frobenius(c, &u, &p1, 1);
    f12_mul(c, &t, &t, &u);
    f12_mul(c, &t, &t, &p0);
#undef EXP_BY_X
    *out = t;
}

static PyObject *py_final_exp_bn(PyObject *self, PyObject *args) {
    PyObject *cap;
    Py_buffer fb, xb;
    int x_neg;
    if (!PyArg_ParseTuple(args, "Oy*y*i", &cap, &fb, &xb, &x_neg))
        return NULL;
    fctx *c = get_ctx(cap);
    if (fb.len != 768 || xb.len < 1) {
        PyErr_SetString(PyExc_ValueError, "final_exp_bn: bad buffer sizes");
        PyBuffer_Release(&fb);
        PyBuffer_Release(&xb);
        return NULL;
    }
    f12 f, t;
    f12_from_bytes(c, &f, (const uint8_t *)fb.buf);
    final_exp_bn_core(c, &f, (const uint8_t *)xb.buf, xb.len, x_neg, &t);
    uint8_t out[768];
    f12_to_bytes(c, out, &t);
    PyBuffer_Release(&fb);
    PyBuffer_Release(&xb);
    return PyBytes_FromStringAndSize((const char *)out, 768);
}

/* ------------------------------------------------------------------ */
/* pair_check2: e(P1, Q1) * e(P2, Q2) == 1 with the two Miller loops   */
/* on two threads and one shared BN final exponentiation.  The single- */
/* proof verifier tail (verifier.rs:195-252's 2-pairing check) calls   */
/* this once per verify; fusing it into one C call removes 3 ctypes    */
/* crossings + Python f12 tuple conversions and overlaps the Millers.  */
/* ------------------------------------------------------------------ */

typedef struct {
    const fctx *c;
    int kind, m_twist;
    const uint8_t *bits;
    Py_ssize_t nbits;
    const f2 *b2;
    fe xP, yP;
    f2 qx, qy;
    const f2 *A1, *B1;
    int inf;           /* P at infinity: contribute f = 1 */
    f12 out;
} miller_task;

static void *miller_worker(void *arg) {
    miller_task *t = (miller_task *)arg;
    if (t->inf)
        f12_one(t->c, &t->out);
    else
        miller_twist_core(t->c, t->kind, t->m_twist, t->bits, t->nbits,
                          t->b2, &t->xP, &t->yP, &t->qx, &t->qy,
                          t->A1, t->B1, &t->out);
    return NULL;
}

/* pair_check2(ctx, kind, m_twist, sbits, b2 64, pts 130B (A|infA|B|infB
 * as 2x(64B xy + 1B inf)), qs 256B (Q1 | Q2), frob 128B (kind 2),
 * xbits, x_neg) -> bool.  Only kind 2 (BN final exp) supported; other
 * kinds raise so the caller falls back to the generic path. */
static PyObject *py_pair_check2(PyObject *self, PyObject *args) {
    PyObject *cap;
    int kind, m_twist, x_neg;
    Py_buffer sbits, b2b, pts, qs, fr, xb;
    if (!PyArg_ParseTuple(args, "Oiiy*y*y*y*y*y*i", &cap, &kind, &m_twist,
                          &sbits, &b2b, &pts, &qs, &fr, &xb, &x_neg))
        return NULL;
    fctx *c = get_ctx(cap);
    if (b2b.len != 64 || pts.len != 130 || qs.len != 256 || kind != 2 ||
        fr.len != 128 || xb.len < 1) {
        PyErr_SetString(PyExc_ValueError, "pair_check2: bad buffers/kind");
        PyBuffer_Release(&sbits); PyBuffer_Release(&b2b);
        PyBuffer_Release(&pts); PyBuffer_Release(&qs);
        PyBuffer_Release(&fr); PyBuffer_Release(&xb);
        return NULL;
    }
    f2 b2, A1, B1;
    fe_from_bytes(c, &b2.c0, (const uint8_t *)b2b.buf);
    fe_from_bytes(c, &b2.c1, (const uint8_t *)b2b.buf + 32);
    fe_from_bytes(c, &A1.c0, (const uint8_t *)fr.buf);
    fe_from_bytes(c, &A1.c1, (const uint8_t *)fr.buf + 32);
    fe_from_bytes(c, &B1.c0, (const uint8_t *)fr.buf + 64);
    fe_from_bytes(c, &B1.c1, (const uint8_t *)fr.buf + 96);

    miller_task tk[2];
    const uint8_t *pb = (const uint8_t *)pts.buf;
    const uint8_t *qb = (const uint8_t *)qs.buf;
    for (int i = 0; i < 2; i++) {
        tk[i].c = c;
        tk[i].kind = kind;
        tk[i].m_twist = m_twist;
        tk[i].bits = (const uint8_t *)sbits.buf;
        tk[i].nbits = sbits.len;
        tk[i].b2 = &b2;
        tk[i].A1 = &A1;
        tk[i].B1 = &B1;
        fe_from_bytes(c, &tk[i].xP, pb + 65 * i);
        fe_from_bytes(c, &tk[i].yP, pb + 65 * i + 32);
        tk[i].inf = pb[65 * i + 64];
        fe_from_bytes(c, &tk[i].qx.c0, qb + 128 * i);
        fe_from_bytes(c, &tk[i].qx.c1, qb + 128 * i + 32);
        fe_from_bytes(c, &tk[i].qy.c0, qb + 128 * i + 64);
        fe_from_bytes(c, &tk[i].qy.c1, qb + 128 * i + 96);
    }
    int ok;
    Py_BEGIN_ALLOW_THREADS
    pthread_t th;
    int threaded = pthread_create(&th, NULL, miller_worker, &tk[1]) == 0;
    miller_worker(&tk[0]);
    if (threaded)
        pthread_join(th, NULL);
    else
        miller_worker(&tk[1]);
    f12 f, r;
    f12_mul(c, &f, &tk[0].out, &tk[1].out);
    final_exp_bn_core(c, &f, (const uint8_t *)xb.buf, xb.len, x_neg, &r);
    ok = f12_is_one(c, &r);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&sbits); PyBuffer_Release(&b2b);
    PyBuffer_Release(&pts); PyBuffer_Release(&qs);
    PyBuffer_Release(&fr); PyBuffer_Release(&xb);
    return PyBool_FromLong(ok);
}

/* ------------------------------------------------------------------ */
/* Fixed-G2 Miller-loop line precomputation.  The verifier's 2-pairing */
/* check always pairs against the SAME two G2 points ([1]_2 and the    */
/* SRS beta_h, verifier.rs:243-250), so the Q-side doubling/addition   */
/* chain (tw_dbl/tw_add, ~1/3 of each Miller iteration) can be done    */
/* once per verifying key and replayed as stored (la, lb, lc) triples. */
/* ------------------------------------------------------------------ */

/* number of line triples the loop consumes */
static Py_ssize_t miller_nlines(int kind, const uint8_t *bits,
                                Py_ssize_t nbits) {
    Py_ssize_t nl = nbits - 1;
    for (Py_ssize_t i = 1; i < nbits; i++)
        if (bits[i]) nl++;
    if (kind == 2) nl += 2;
    return nl;
}

/* replay of miller_twist_core's T chain, storing each line (raw f2 x3,
 * in-process Montgomery representation) */
static void miller_lines_core(const fctx *c, int kind,
                              const uint8_t *bits, Py_ssize_t nbits,
                              const f2 *b2, const f2 *qx, const f2 *qy,
                              const f2 *A1, const f2 *B1, f2 *lines) {
    g2p T;
    T.X = *qx;
    T.Y = *qy;
    f2 one2;
    memset(&one2, 0, sizeof one2);
    one2.c0 = c->one;
    T.Z = one2;
    Py_ssize_t idx = 0;
    for (Py_ssize_t i = 1; i < nbits; i++) {
        tw_dbl(c, b2, &T, &lines[idx], &lines[idx + 1], &lines[idx + 2]);
        idx += 3;
        if (bits[i]) {
            tw_add(c, &T, qx, qy, &lines[idx], &lines[idx + 1],
                   &lines[idx + 2]);
            idx += 3;
        }
    }
    if (kind == 2) {
        f2 q1x, q1y, q2x, q2y, t;
        f2_conj(c, &t, qx);
        f2_mul(c, &q1x, &t, A1);
        f2_conj(c, &t, qy);
        f2_mul(c, &q1y, &t, B1);
        f2_conj(c, &t, &q1x);
        f2_mul(c, &q2x, &t, A1);
        f2_conj(c, &t, &q1y);
        f2_mul(c, &t, &t, B1);
        f2_neg(c, &q2y, &t);
        tw_add(c, &T, &q1x, &q1y, &lines[idx], &lines[idx + 1],
               &lines[idx + 2]);
        idx += 3;
        tw_add(c, &T, &q2x, &q2y, &lines[idx], &lines[idx + 1],
               &lines[idx + 2]);
    }
}

/* Miller loop over precomputed lines: only f12_sqr + sparse line muls */
static void miller_pre_core(const fctx *c, int kind, int m_twist,
                            const uint8_t *bits, Py_ssize_t nbits,
                            const fe *xP, const fe *yP,
                            const f2 *lines, f12 *out) {
    f12 f;
    f12_one(c, &f);
    Py_ssize_t idx = 0;
    for (Py_ssize_t i = 1; i < nbits; i++) {
        f12 fs;
        f12_sqr(c, &fs, &f);
        f = fs;
        tw_line_mul(c, m_twist, &f, &lines[idx], &lines[idx + 1],
                    &lines[idx + 2], xP, yP);
        idx += 3;
        if (bits[i]) {
            tw_line_mul(c, m_twist, &f, &lines[idx], &lines[idx + 1],
                        &lines[idx + 2], xP, yP);
            idx += 3;
        }
    }
    if (kind == 1) {
        f12 t;
        f12_conj(c, &t, &f);
        f = t;
    } else if (kind == 2) {
        tw_line_mul(c, m_twist, &f, &lines[idx], &lines[idx + 1],
                    &lines[idx + 2], xP, yP);
        idx += 3;
        tw_line_mul(c, m_twist, &f, &lines[idx], &lines[idx + 1],
                    &lines[idx + 2], xP, yP);
    }
    *out = f;
}

/* pair_lines(ctx, kind, sbits, b2 64B, Q 128B, frob 128B) -> bytes
 * (raw process-internal f2 triples; only valid with the same ctx) */
static PyObject *py_pair_lines(PyObject *self, PyObject *args) {
    PyObject *cap;
    int kind;
    Py_buffer sbits, b2b, qb, fr;
    if (!PyArg_ParseTuple(args, "Oiy*y*y*y*", &cap, &kind, &sbits, &b2b,
                          &qb, &fr))
        return NULL;
    fctx *c = get_ctx(cap);
    if (b2b.len != 64 || qb.len != 128 || (kind == 2 && fr.len != 128)) {
        PyErr_SetString(PyExc_ValueError, "pair_lines: bad buffers");
        PyBuffer_Release(&sbits); PyBuffer_Release(&b2b);
        PyBuffer_Release(&qb); PyBuffer_Release(&fr);
        return NULL;
    }
    f2 b2, qx, qy, A1, B1;
    fe_from_bytes(c, &b2.c0, (const uint8_t *)b2b.buf);
    fe_from_bytes(c, &b2.c1, (const uint8_t *)b2b.buf + 32);
    fe_from_bytes(c, &qx.c0, (const uint8_t *)qb.buf);
    fe_from_bytes(c, &qx.c1, (const uint8_t *)qb.buf + 32);
    fe_from_bytes(c, &qy.c0, (const uint8_t *)qb.buf + 64);
    fe_from_bytes(c, &qy.c1, (const uint8_t *)qb.buf + 96);
    memset(&A1, 0, sizeof A1);
    memset(&B1, 0, sizeof B1);
    if (kind == 2) {
        fe_from_bytes(c, &A1.c0, (const uint8_t *)fr.buf);
        fe_from_bytes(c, &A1.c1, (const uint8_t *)fr.buf + 32);
        fe_from_bytes(c, &B1.c0, (const uint8_t *)fr.buf + 64);
        fe_from_bytes(c, &B1.c1, (const uint8_t *)fr.buf + 96);
    }
    Py_ssize_t nl = miller_nlines(kind, (const uint8_t *)sbits.buf,
                                  sbits.len);
    PyObject *outb = PyBytes_FromStringAndSize(NULL, nl * 3 * sizeof(f2));
    if (outb)
        miller_lines_core(c, kind, (const uint8_t *)sbits.buf, sbits.len,
                          &b2, &qx, &qy, &A1, &B1,
                          (f2 *)PyBytes_AS_STRING(outb));
    PyBuffer_Release(&sbits); PyBuffer_Release(&b2b);
    PyBuffer_Release(&qb); PyBuffer_Release(&fr);
    return outb;
}

typedef struct {
    const fctx *c;
    int kind, m_twist;
    const uint8_t *bits;
    Py_ssize_t nbits;
    fe xP, yP;
    const f2 *lines;
    int inf;
    f12 out;
} miller_pre_task;

static void *miller_pre_worker(void *arg) {
    miller_pre_task *t = (miller_pre_task *)arg;
    if (t->inf)
        f12_one(t->c, &t->out);
    else
        miller_pre_core(t->c, t->kind, t->m_twist, t->bits, t->nbits,
                        &t->xP, &t->yP, t->lines, &t->out);
    return NULL;
}

/* pair_check2_pre(ctx, kind, m_twist, sbits, pts 130B, lines1, lines2,
 * xbits, x_neg) -> bool.  pair_check2 with both G2 chains precomputed. */
static PyObject *py_pair_check2_pre(PyObject *self, PyObject *args) {
    PyObject *cap;
    int kind, m_twist, x_neg;
    Py_buffer sbits, pts, l1, l2, xb;
    if (!PyArg_ParseTuple(args, "Oiiy*y*y*y*y*i", &cap, &kind, &m_twist,
                          &sbits, &pts, &l1, &l2, &xb, &x_neg))
        return NULL;
    fctx *c = get_ctx(cap);
    Py_ssize_t need = miller_nlines(kind, (const uint8_t *)sbits.buf,
                                    sbits.len) * 3 * (Py_ssize_t)sizeof(f2);
    if (pts.len != 130 || kind != 2 || xb.len < 1 || l1.len != need
        || l2.len != need) {
        PyErr_SetString(PyExc_ValueError, "pair_check2_pre: bad buffers");
        PyBuffer_Release(&sbits); PyBuffer_Release(&pts);
        PyBuffer_Release(&l1); PyBuffer_Release(&l2);
        PyBuffer_Release(&xb);
        return NULL;
    }
    miller_pre_task tk[2];
    const uint8_t *pb = (const uint8_t *)pts.buf;
    const f2 *ls[2] = {(const f2 *)l1.buf, (const f2 *)l2.buf};
    for (int i = 0; i < 2; i++) {
        tk[i].c = c;
        tk[i].kind = kind;
        tk[i].m_twist = m_twist;
        tk[i].bits = (const uint8_t *)sbits.buf;
        tk[i].nbits = sbits.len;
        fe_from_bytes(c, &tk[i].xP, pb + 65 * i);
        fe_from_bytes(c, &tk[i].yP, pb + 65 * i + 32);
        tk[i].inf = pb[65 * i + 64];
        tk[i].lines = ls[i];
    }
    int ok;
    Py_BEGIN_ALLOW_THREADS
    pthread_t th;
    int threaded = pthread_create(&th, NULL, miller_pre_worker, &tk[1]) == 0;
    miller_pre_worker(&tk[0]);
    if (threaded)
        pthread_join(th, NULL);
    else
        miller_pre_worker(&tk[1]);
    f12 f, r;
    f12_mul(c, &f, &tk[0].out, &tk[1].out);
    final_exp_bn_core(c, &f, (const uint8_t *)xb.buf, xb.len, x_neg, &r);
    ok = f12_is_one(c, &r);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&sbits); PyBuffer_Release(&pts);
    PyBuffer_Release(&l1); PyBuffer_Release(&l2);
    PyBuffer_Release(&xb);
    return PyBool_FromLong(ok);
}

/* pcs_scalars_batch(ctx_fr, k 5*32B, log_n, gen 32B, npi, jobs) -> bytes
 *
 * Batch TurboPlonk verifier scalar computation (the per-proof host math of
 * plonk/verifier.py pcs_info_with_challenges, single-vk no-plookup case;
 * reference verifier.rs:340-668).  jobs carries, per proof, 17+npi field
 * elements (32B LE each):
 *   [tau, beta, gamma, alpha, zeta, v, u,
 *    w0..w4, sigma0..sigma3, perm_next, pi_0..pi_{npi-1}]
 * Returns per proof 30 field elements:
 *   [prod_perm_coeff, last_sigma_coeff, q0..q12, quot0..quot4,
 *    v^1..v^9, aggregated_eval]
 * Inverses (1 + npi per proof) use one shared Montgomery batch inversion. */
typedef struct {
    const fctx *c;
    const uint8_t *jobs;
    int IN_F, npi, ND, log_n;
    const fe *gpow, *k;
    fe n_fe, n_inv;
    fe *den, *zeta_n;
    uint8_t *out;
} pcs_env;

static void pcs_pass1(void *envp, Py_ssize_t lo, Py_ssize_t hi, int tid) {
    pcs_env *e = (pcs_env *)envp;
    const fctx *c = e->c;
    const uint8_t *jobs = e->jobs;
    const int IN_F = e->IN_F, npi = e->npi, ND = e->ND, log_n = e->log_n;
    const fe *gpow = e->gpow;
    (void)tid;
    for (Py_ssize_t pi_ = lo; pi_ < hi; pi_++) {
        const uint8_t *in = jobs + pi_ * IN_F * 32;
        fe zeta, t;
        fe_from_bytes(c, &zeta, in + 4 * 32);
        fe *d = e->den + pi_ * ND;
        fe_sub(c, &t, &zeta, &c->one);
        fe_mul(c, &d[0], &t, &e->n_fe);
        for (int i = 0; i < npi; i++)
            fe_sub(c, &d[1 + i], &zeta, &gpow[i]);
        fe zn = zeta;
        for (int i = 0; i < log_n; i++) fe_mul(c, &zn, &zn, &zn);
        e->zeta_n[pi_] = zn;
    }
}

static void pcs_pass2(void *envp, Py_ssize_t lo, Py_ssize_t hi, int tid) {
    pcs_env *e = (pcs_env *)envp;
    const fctx *c = e->c;
    const uint8_t *jobs = e->jobs;
    const int IN_F = e->IN_F, npi = e->npi, ND = e->ND;
    const fe *gpow = e->gpow, *k = e->k;
    const fe *den = e->den;
    const fe *zeta_n = e->zeta_n;
    uint8_t *out = e->out;
    (void)tid;
    for (Py_ssize_t pi_ = lo; pi_ < hi; pi_++) {
        const uint8_t *in = jobs + pi_ * IN_F * 32;
        fe ch[7], w[5], se[4], perm_next;
        for (int i = 0; i < 7; i++) fe_from_bytes(c, &ch[i], in + i * 32);
        for (int i = 0; i < 5; i++) fe_from_bytes(c, &w[i], in + (7 + i) * 32);
        for (int i = 0; i < 4; i++)
            fe_from_bytes(c, &se[i], in + (12 + i) * 32);
        fe_from_bytes(c, &perm_next, in + 16 * 32);
        const fe *beta = &ch[1], *gamma = &ch[2], *alpha = &ch[3],
                 *zeta = &ch[4], *v = &ch[5], *u = &ch[6];
        const fe *dinv = den + pi_ * ND;
        fe vanish, alpha2, l1, t, t2;
        fe_sub(c, &vanish, &zeta_n[pi_], &c->one);
        fe_mul(c, &alpha2, alpha, alpha);
        fe_mul(c, &l1, &vanish, &dinv[0]);
        /* pi_eval = sum (vanish/n) g^i (zeta-g^i)^{-1} pi_i */
        fe vdn, pi_eval;
        fe_mul(c, &vdn, &vanish, &e->n_inv);
        memset(&pi_eval, 0, sizeof pi_eval);
        for (int i = 0; i < npi; i++) {
            fe pe;
            fe_from_bytes(c, &pe, in + (17 + i) * 32);
            fe_mul(c, &t, &vdn, &gpow[i]);
            fe_mul(c, &t, &t, &dinv[1 + i]);
            fe_mul(c, &t, &t, &pe);
            fe_add(c, &pi_eval, &pi_eval, &t);
        }
        /* lin_const = pi_eval - alpha^2 l1
         *             - alpha perm_next (gamma+w4) prod(gamma+w_i+beta se_i) */
        fe acc, lin_const;
        fe_mul(c, &acc, alpha, &perm_next);
        fe_add(c, &t, gamma, &w[4]);
        fe_mul(c, &acc, &acc, &t);
        for (int i = 0; i < 4; i++) {
            fe_mul(c, &t, beta, &se[i]);
            fe_add(c, &t, &t, gamma);
            fe_add(c, &t, &t, &w[i]);
            fe_mul(c, &acc, &acc, &t);
        }
        fe_mul(c, &t, &alpha2, &l1);
        fe_sub(c, &lin_const, &pi_eval, &t);
        fe_sub(c, &lin_const, &lin_const, &acc);
        uint8_t *op = out + pi_ * 30 * 32;
        /* s0: prod_perm = alpha^2 l1 + alpha prod(beta k_i zeta + gamma + w_i) */
        fe s0 = *alpha;
        for (int i = 0; i < 5; i++) {
            fe_mul(c, &t, beta, &k[i]);
            fe_mul(c, &t, &t, zeta);
            fe_add(c, &t, &t, gamma);
            fe_add(c, &t, &t, &w[i]);
            fe_mul(c, &s0, &s0, &t);
        }
        fe_mul(c, &t, &alpha2, &l1);
        fe_add(c, &s0, &s0, &t);
        fe_to_bytes(c, op, &s0);
        /* s1: last sigma = -(alpha beta perm_next prod(beta se_i+gamma+w_i)) */
        fe s1;
        fe_mul(c, &s1, alpha, beta);
        fe_mul(c, &s1, &s1, &perm_next);
        for (int i = 0; i < 4; i++) {
            fe_mul(c, &t, beta, &se[i]);
            fe_add(c, &t, &t, gamma);
            fe_add(c, &t, &t, &w[i]);
            fe_mul(c, &s1, &s1, &t);
        }
        fe_neg(c, &s1, &s1);
        fe_to_bytes(c, op + 32, &s1);
        /* selectors: w0..w3, w0w1, w2w3, w_i^5 x4, -w4, 1, w0w1w2w3w4 */
        fe q[13];
        q[0] = w[0]; q[1] = w[1]; q[2] = w[2]; q[3] = w[3];
        fe_mul(c, &q[4], &w[0], &w[1]);
        fe_mul(c, &q[5], &w[2], &w[3]);
        for (int i = 0; i < 4; i++) {
            fe_mul(c, &t, &w[i], &w[i]);
            fe_mul(c, &t, &t, &t);
            fe_mul(c, &q[6 + i], &t, &w[i]);
        }
        fe_neg(c, &q[10], &w[4]);
        q[11] = c->one;
        fe_mul(c, &q[12], &q[4], &q[5]);
        fe_mul(c, &q[12], &q[12], &w[4]);
        for (int i = 0; i < 13; i++) fe_to_bytes(c, op + (2 + i) * 32, &q[i]);
        /* split quotient: c0 = -vanish, c_{j+1} = c_j (1+vanish) zeta^2 */
        fe znp2, qc;
        fe_mul(c, &znp2, zeta, zeta);
        fe_add(c, &t, &c->one, &vanish);
        fe_mul(c, &znp2, &znp2, &t);
        fe_neg(c, &qc, &vanish);
        fe_to_bytes(c, op + 15 * 32, &qc);
        for (int j = 1; j < 5; j++) {
            fe_mul(c, &qc, &qc, &znp2);
            fe_to_bytes(c, op + (15 + j) * 32, &qc);
        }
        /* v powers v^1..v^9 and aggregated eval */
        fe vp = *v, eval;
        fe_neg(c, &eval, &lin_const);
        for (int i = 0; i < 5; i++) {
            fe_to_bytes(c, op + (20 + i) * 32, &vp);
            fe_mul(c, &t2, &vp, &w[i]);
            fe_add(c, &eval, &eval, &t2);
            fe_mul(c, &vp, &vp, v);
        }
        for (int i = 0; i < 4; i++) {
            fe_to_bytes(c, op + (25 + i) * 32, &vp);
            fe_mul(c, &t2, &vp, &se[i]);
            fe_add(c, &eval, &eval, &t2);
            fe_mul(c, &vp, &vp, v);
        }
        fe_mul(c, &t2, u, &perm_next);
        fe_add(c, &eval, &eval, &t2);
        fe_to_bytes(c, op + 29 * 32, &eval);
    }
}

static PyObject *py_pcs_scalars_batch(PyObject *self, PyObject *args) {
    PyObject *cap;
    Py_buffer kb, gb, jb;
    int log_n, npi;
    if (!PyArg_ParseTuple(args, "Oy*iy*iy*", &cap, &kb, &log_n, &gb, &npi,
                          &jb))
        return NULL;
    fctx *c = get_ctx(cap);
    const int IN_F = 17 + npi;
    if (kb.len != 5 * 32 || gb.len != 32 || log_n < 1 || log_n > 40
        || npi < 0 || jb.len % (IN_F * 32) != 0) {
        PyErr_SetString(PyExc_ValueError, "pcs_scalars_batch: bad buffers");
        PyBuffer_Release(&kb); PyBuffer_Release(&gb); PyBuffer_Release(&jb);
        return NULL;
    }
    const Py_ssize_t np = jb.len / (IN_F * 32);
    const uint8_t *jobs = (const uint8_t *)jb.buf;
    fe k[5], gen;
    for (int i = 0; i < 5; i++)
        fe_from_bytes(c, &k[i], (const uint8_t *)kb.buf + i * 32);
    fe_from_bytes(c, &gen, (const uint8_t *)gb.buf);
    /* n and n^{-1} as field elements (n = 2^log_n) */
    fe n_fe = c->one;
    for (int i = 0; i < log_n; i++) fe_add(c, &n_fe, &n_fe, &n_fe);
    fe n_inv;
    fe_inv(c, &n_inv, &n_fe);
    /* g^i table for public inputs */
    fe *gpow = (fe *)malloc(sizeof(fe) * (npi > 0 ? npi : 1));
    if (!gpow) { PyBuffer_Release(&kb); PyBuffer_Release(&gb);
                 PyBuffer_Release(&jb); return PyErr_NoMemory(); }
    gpow[0] = c->one;
    for (int i = 1; i < npi; i++) fe_mul(c, &gpow[i], &gpow[i - 1], &gen);

    const int ND = 1 + npi;       /* denominators per proof */
    fe *den = (fe *)malloc(sizeof(fe) * ND * np);
    fe *pref = (fe *)malloc(sizeof(fe) * (ND * np + 1));
    fe *zeta_n = (fe *)malloc(sizeof(fe) * np);   /* zeta^n */
    uint8_t *out = (uint8_t *)malloc((size_t)np * 30 * 32);
    if (!den || !pref || !zeta_n || !out) {
        free(gpow); free(den); free(pref); free(zeta_n); free(out);
        PyBuffer_Release(&kb); PyBuffer_Release(&gb); PyBuffer_Release(&jb);
        return PyErr_NoMemory();
    }
    pcs_env env;
    env.c = c; env.jobs = jobs; env.IN_F = IN_F; env.npi = npi;
    env.ND = ND; env.log_n = log_n; env.gpow = gpow; env.k = k;
    env.n_fe = n_fe; env.n_inv = n_inv; env.den = den;
    env.zeta_n = zeta_n; env.out = out;
    Py_BEGIN_ALLOW_THREADS
    /* pass 1: denominators  d0 = n(zeta-1), d_{1+i} = zeta - g^i
     * (pthread-parallel over proofs) */
    pfor(pcs_pass1, &env, np, 64);
    /* shared Montgomery batch inversion (zero entries pass through as
     * zero-products; vanish==0 cannot occur for Fiat-Shamir zeta) */
    pref[0] = c->one;
    for (Py_ssize_t i = 0; i < ND * np; i++)
        fe_mul(c, &pref[i + 1], &pref[i], &den[i]);
    fe inv_all;
    fe_inv(c, &inv_all, &pref[ND * np]);
    for (Py_ssize_t i = ND * np - 1; i >= 0; i--) {
        fe di;
        fe_mul(c, &di, &pref[i], &inv_all);
        fe_mul(c, &inv_all, &inv_all, &den[i]);
        den[i] = di;                     /* den now holds the inverses */
    }
    /* pass 2: scalars (pthread-parallel over proofs) */
    pfor(pcs_pass2, &env, np, 64);
    Py_END_ALLOW_THREADS
    PyObject *res = PyBytes_FromStringAndSize((const char *)out,
                                              (Py_ssize_t)np * 30 * 32);
    free(gpow); free(den); free(pref); free(zeta_n); free(out);
    PyBuffer_Release(&kb); PyBuffer_Release(&gb); PyBuffer_Release(&jb);
    return res;
}

/* ---- fused batch opening-proof aggregation ----------------------------
 *
 * batch_opening_msm(ctx_fr, ctx_fq, rows, extras, r, vk_bases, proof_bases)
 *   -> bytes 130B:  A (x32 y32 inf1) || B (x32 y32 inf1)
 *
 * Fuses Verifier::batch_verify_opening_proofs (reference verifier.rs:195-251)
 * over the TurboPlonk fast-path scalar rows of pcs_scalars_batch: r^i
 * combiner scaling, per-vk scalar accumulation, base dedup and both MSMs run
 * natively; Python only supplies bytes and does the final pairing check.
 *   rows:        np * 30 * 32B   (pcs_scalars_batch output, raw)
 *   extras:      np * 3 * 32B    per proof [u, zeta, next_eval_point]
 *   r:           32B             batch combiner challenge
 *   vk_bases:    19 * 65B        [sigma_last, sel0..sel12, sigma0..3, G]
 *   proof_bases: np * 13 * 65B   [prod_perm, quot0..4, wire0..4,
 *                                 opening_proof, shifted_opening_proof]
 * Points are x32||y32||inf1 LE affine. Repeated bases (identical coord
 * bytes) merge their scalars before the MSM, so same-vk batches collapse to
 * ~32 unique points. */

static void g1_out65(const fctx *c, uint8_t *out, const g1 *res) {
    if (fe_is_zero(&res->z)) {
        memset(out, 0, 64);
        out[64] = 1;
        return;
    }
    fe zi, zi2, ax, ay;
    fe_inv(c, &zi, &res->z);
    fe_sqr(c, &zi2, &zi);
    fe_mul(c, &ax, &res->x, &zi2);
    fe_mul(c, &zi2, &zi2, &zi);
    fe_mul(c, &ay, &res->y, &zi2);
    fe_to_bytes(c, out, &ax);
    fe_to_bytes(c, out + 32, &ay);
    out[64] = 0;
}

static uint64_t bomsm_hash(const uint8_t *k) {
    uint64_t h = 1469598103934665603ULL;
    for (int i = 0; i < 64; i++) { h ^= k[i]; h *= 1099511628211ULL; }
    return h;
}

/* Dedup n (base, scalar) pairs by 64B coord key, then MSM over cq. */
static int bomsm_run(const fctx *cr, const fctx *cq, g1 *out,
                     const uint8_t **keys, const fe *scal, Py_ssize_t n) {
    Py_ssize_t cap = 16;
    while (cap < 2 * n) cap <<= 1;
    int32_t *ht = (int32_t *)malloc(cap * sizeof(int32_t));
    fe *acc = (fe *)malloc((n ? n : 1) * sizeof(fe));
    const uint8_t **ukey =
        (const uint8_t **)malloc((n ? n : 1) * sizeof(void *));
    if (!ht || !acc || !ukey) { free(ht); free(acc); free(ukey); return -1; }
    memset(ht, 0xff, cap * sizeof(int32_t));
    Py_ssize_t m = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        const uint8_t *k = keys[i];
        if (k[64]) continue;                 /* infinity base contributes 0 */
        uint64_t h = bomsm_hash(k) & (uint64_t)(cap - 1);
        for (;;) {
            int32_t s = ht[h];
            if (s < 0) {
                ht[h] = (int32_t)m;
                ukey[m] = k;
                acc[m] = scal[i];
                m++;
                break;
            }
            if (memcmp(ukey[s], k, 64) == 0) {
                fe_add(cr, &acc[s], &acc[s], &scal[i]);
                break;
            }
            h = (h + 1) & (uint64_t)(cap - 1);
        }
    }
    if (m == 0) { g1_inf(cq, out); free(ht); free(acc); free(ukey); return 0; }
    uint8_t *scb = (uint8_t *)malloc(m * 32);
    fe *xs = (fe *)malloc(m * sizeof(fe));
    fe *ys = (fe *)malloc(m * sizeof(fe));
    uint8_t *infs = (uint8_t *)malloc(m);
    if (!scb || !xs || !ys || !infs) {
        free(ht); free(acc); free(ukey);
        free(scb); free(xs); free(ys); free(infs);
        return -1;
    }
    for (Py_ssize_t j = 0; j < m; j++) {
        fe_to_bytes(cr, scb + j * 32, &acc[j]);
        fe_from_bytes(cq, &xs[j], ukey[j]);
        fe_from_bytes(cq, &ys[j], ukey[j] + 32);
        infs[j] = 0;
    }
    g1_msm(cq, out, xs, ys, infs, (const uint64_t *)scb, m);
    free(ht); free(acc); free(ukey);
    free(scb); free(xs); free(ys); free(infs);
    return 0;
}

typedef struct {
    const fctx *cr, *cq;
    g1 *out;
    const uint8_t **keys;
    const fe *scal;
    Py_ssize_t n;
    int rc;
} bo_ab;

static void *bo_ab_worker(void *arg) {
    bo_ab *t = (bo_ab *)arg;
    t->rc = bomsm_run(t->cr, t->cq, t->out, t->keys, t->scal, t->n);
    return NULL;
}

typedef struct {
    const fctx *cr;
    const uint8_t *rw, *ex, *pf;
    const fe *rpow;
    fe *bscal; const uint8_t **bkey;
    fe *ascal; const uint8_t **akey;
    fe *tacc;   /* 16 x 19 per-thread accumulators: [vkacc[18] | gacc] */
} bo_env;

static void bo_scale(void *envp, Py_ssize_t lo, Py_ssize_t hi, int tid) {
    bo_env *e = (bo_env *)envp;
    const fctx *cr = e->cr;
    fe *vkacc = e->tacc + (Py_ssize_t)tid * 19;
    fe *gacc = vkacc + 18;
    fe t, s, u, zeta, nxt;
    for (Py_ssize_t i = lo; i < hi; i++) {
        const uint8_t *row = e->rw + i * 30 * 32;
        const uint8_t *pb = e->pf + i * 13 * 65;
        const fe *ri = &e->rpow[i];
        fe_from_bytes(cr, &u, e->ex + i * 96);
        fe_from_bytes(cr, &zeta, e->ex + i * 96 + 32);
        fe_from_bytes(cr, &nxt, e->ex + i * 96 + 64);
        /* vk-shared accumulators */
        fe_from_bytes(cr, &s, row + 1 * 32);          /* sigma_last */
        fe_mul(cr, &t, &s, ri);
        fe_add(cr, &vkacc[0], &vkacc[0], &t);
        for (int j = 0; j < 13; j++) {                /* selectors */
            fe_from_bytes(cr, &s, row + (2 + j) * 32);
            fe_mul(cr, &t, &s, ri);
            fe_add(cr, &vkacc[1 + j], &vkacc[1 + j], &t);
        }
        for (int j = 0; j < 4; j++) {                 /* sigma 0..3 */
            fe_from_bytes(cr, &s, row + (25 + j) * 32);
            fe_mul(cr, &t, &s, ri);
            fe_add(cr, &vkacc[14 + j], &vkacc[14 + j], &t);
        }
        fe_from_bytes(cr, &s, row + 29 * 32);         /* agg eval -> -G */
        fe_mul(cr, &t, &s, ri);
        fe_sub(cr, gacc, gacc, &t);
        /* per-proof B-side entries */
        fe *sb_ = e->bscal + 19 + i * 13;
        const uint8_t **kb_ = e->bkey + 19 + i * 13;
        fe_from_bytes(cr, &s, row);                   /* prod_perm + u */
        fe_add(cr, &s, &s, &u);
        fe_mul(cr, &sb_[0], &s, ri);
        kb_[0] = pb;
        for (int j = 0; j < 5; j++) {                 /* quotient */
            fe_from_bytes(cr, &s, row + (15 + j) * 32);
            fe_mul(cr, &sb_[1 + j], &s, ri);
            kb_[1 + j] = pb + (1 + j) * 65;
        }
        for (int j = 0; j < 5; j++) {                 /* wires */
            fe_from_bytes(cr, &s, row + (20 + j) * 32);
            fe_mul(cr, &sb_[6 + j], &s, ri);
            kb_[6 + j] = pb + (6 + j) * 65;
        }
        fe_mul(cr, &sb_[11], &zeta, ri);              /* z_i W_i */
        kb_[11] = pb + 11 * 65;
        fe_mul(cr, &s, &u, &nxt);                     /* u_i z'_i W'_i */
        fe_mul(cr, &sb_[12], &s, ri);
        kb_[12] = pb + 12 * 65;
        /* A-side entries */
        e->ascal[2 * i] = *ri;
        e->akey[2 * i] = pb + 11 * 65;
        fe_mul(cr, &e->ascal[2 * i + 1], &u, ri);
        e->akey[2 * i + 1] = pb + 12 * 65;
    }
}

static PyObject *py_batch_opening_msm(PyObject *self, PyObject *args) {
    PyObject *capr, *capq;
    Py_buffer rows, extras, rb, vkb, pfb;
    if (!PyArg_ParseTuple(args, "OOy*y*y*y*y*", &capr, &capq, &rows, &extras,
                          &rb, &vkb, &pfb))
        return NULL;
    fctx *cr = get_ctx(capr), *cq = get_ctx(capq);
    const Py_ssize_t np = rows.len / (30 * 32);
    if (np < 1 || rows.len != np * 30 * 32 || extras.len != np * 3 * 32
        || rb.len != 32 || vkb.len != 19 * 65 || pfb.len != np * 13 * 65) {
        PyErr_SetString(PyExc_ValueError, "batch_opening_msm: bad buffers");
        PyBuffer_Release(&rows); PyBuffer_Release(&extras);
        PyBuffer_Release(&rb); PyBuffer_Release(&vkb); PyBuffer_Release(&pfb);
        return NULL;
    }
    const Py_ssize_t nb = 19 + 13 * np, na = 2 * np;
    const uint8_t **bkey =
        (const uint8_t **)malloc((nb + na) * sizeof(void *));
    fe *bscal = (fe *)malloc((nb + na) * sizeof(fe));
    uint8_t out[130];
    int rc = 0;
    if (!bkey || !bscal) {
        free(bkey); free(bscal);
        PyBuffer_Release(&rows); PyBuffer_Release(&extras);
        PyBuffer_Release(&rb); PyBuffer_Release(&vkb); PyBuffer_Release(&pfb);
        return PyErr_NoMemory();
    }
    const uint8_t **akey = bkey + nb;
    fe *ascal = bscal + nb;
    bo_env env;
    fe *rpow = (fe *)malloc((np > 0 ? np : 1) * sizeof(fe));
    fe *tacc = (fe *)malloc(16 * 19 * sizeof(fe));
    if (!rpow || !tacc) {
        free(rpow); free(tacc); free(bkey); free(bscal);
        PyBuffer_Release(&rows); PyBuffer_Release(&extras);
        PyBuffer_Release(&rb); PyBuffer_Release(&vkb); PyBuffer_Release(&pfb);
        return PyErr_NoMemory();
    }
    Py_BEGIN_ALLOW_THREADS
    {
        const uint8_t *vk = (const uint8_t *)vkb.buf;
        fe r;
        fe_from_bytes(cr, &r, (const uint8_t *)rb.buf);
        /* r^i table (serial: np muls, cheap), then parallel scaling with
         * per-thread vk/G accumulators merged after the join */
        rpow[0] = cr->one;
        for (Py_ssize_t i = 1; i < np; i++)
            fe_mul(cr, &rpow[i], &rpow[i - 1], &r);
        memset(tacc, 0, 16 * 19 * sizeof(fe));
        env.cr = cr;
        env.rw = (const uint8_t *)rows.buf;
        env.ex = (const uint8_t *)extras.buf;
        env.pf = (const uint8_t *)pfb.buf;
        env.rpow = rpow;
        env.bscal = bscal; env.bkey = bkey;
        env.ascal = ascal; env.akey = akey;
        env.tacc = tacc;
        long nt = pfor(bo_scale, &env, np, 64);
        fe vkacc[18], gacc;
        memcpy(vkacc, tacc, sizeof vkacc);
        gacc = tacc[18];
        for (long t = 1; t < nt; t++) {
            for (int j = 0; j < 18; j++)
                fe_add(cr, &vkacc[j], &vkacc[j], &tacc[t * 19 + j]);
            fe_add(cr, &gacc, &gacc, &tacc[t * 19 + 18]);
        }
        for (int j = 0; j < 18; j++) {
            bkey[j] = vk + j * 65;
            bscal[j] = vkacc[j];
        }
        bkey[18] = vk + 18 * 65;
        bscal[18] = gacc;
        g1 A, B;
        /* A and B aggregations are independent: overlap them on two
         * threads (the B MSM dominates; A is the opening-proof pair) */
        bo_ab ab = {cr, cq, &A, akey, ascal, na, 0};
        pthread_t abth;
        int ab_threaded =
            pthread_create(&abth, NULL, bo_ab_worker, &ab) == 0;
        if (!ab_threaded)
            ab.rc = bomsm_run(cr, cq, &A, akey, ascal, na);
        rc = bomsm_run(cr, cq, &B, bkey, bscal, nb);
        if (ab_threaded)
            pthread_join(abth, NULL);
        if (rc == 0) rc = ab.rc;
        if (rc == 0) {
            g1_out65(cq, out, &A);
            g1_out65(cq, out + 65, &B);
        }
    }
    Py_END_ALLOW_THREADS
    free(rpow); free(tacc);
    free(bkey); free(bscal);
    PyBuffer_Release(&rows); PyBuffer_Release(&extras);
    PyBuffer_Release(&rb); PyBuffer_Release(&vkb); PyBuffer_Release(&pfb);
    if (rc != 0) return PyErr_NoMemory();
    return PyBytes_FromStringAndSize((const char *)out, 130);
}

/* is_one(ctx, f 768B) -> bool (f in NORMAL form bytes? no: montgomery cmp) */
static PyObject *py_f12_is_one(PyObject *self, PyObject *args) {
    PyObject *cap;
    Py_buffer fb;
    if (!PyArg_ParseTuple(args, "Oy*", &cap, &fb)) return NULL;
    fctx *c = get_ctx(cap);
    f12 f;
    f12_from_bytes(c, &f, (const uint8_t *)fb.buf);
    int r = f12_is_one(c, &f);
    PyBuffer_Release(&fb);
    return PyBool_FromLong(r);
}


/* ---- Keccak-256 (Ethereum 0x01 padding) -------------------------------- */

static const uint64_t KC_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

static inline uint64_t kc_rotl(uint64_t x, int n) {
    return n ? (x << n) | (x >> (64 - n)) : x;
}

static void keccak_f1600(uint64_t s[25]) {
    /* s[x + 5*y] */
    static const int ROT[25] = {
         0, 36,  3, 41, 18,
         1, 44, 10, 45,  2,
        62,  6, 43, 15, 61,
        28, 55, 25, 21, 56,
        27, 20, 39,  8, 14,
    };
    uint64_t b[25], c[5], d[5];
    for (int r = 0; r < 24; r++) {
        for (int x = 0; x < 5; x++)
            c[x] = s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20];
        for (int x = 0; x < 5; x++)
            d[x] = c[(x + 4) % 5] ^ kc_rotl(c[(x + 1) % 5], 1);
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                s[x + 5 * y] ^= d[x];
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                b[y + 5 * ((2 * x + 3 * y) % 5)] = kc_rotl(s[x + 5 * y],
                                                           ROT[x * 5 + y]);
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                s[x + 5 * y] = b[x + 5 * y]
                    ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
        s[0] ^= KC_RC[r];
    }
}

static PyObject *py_keccak256(PyObject *self, PyObject *args) {
    Py_buffer data;
    if (!PyArg_ParseTuple(args, "y*", &data)) return NULL;
    const size_t rate = 136;
    uint64_t s[25] = {0};
    const uint8_t *p = (const uint8_t *)data.buf;
    size_t len = data.len;
    uint8_t block[136];
    size_t off = 0;
    while (len - off >= rate) {
        for (size_t i = 0; i < rate / 8; i++) {
            uint64_t lane;
            memcpy(&lane, p + off + 8 * i, 8);
            s[i % 5 + 5 * (i / 5)] ^= lane;
        }
        keccak_f1600(s);
        off += rate;
    }
    /* final partial block with 0x01 .. 0x80 padding */
    size_t rem = len - off;
    memset(block, 0, rate);
    memcpy(block, p + off, rem);
    block[rem] ^= 0x01;
    block[rate - 1] ^= 0x80;
    for (size_t i = 0; i < rate / 8; i++) {
        uint64_t lane;
        memcpy(&lane, block + 8 * i, 8);
        s[i % 5 + 5 * (i / 5)] ^= lane;
    }
    keccak_f1600(s);
    PyBuffer_Release(&data);
    uint8_t out[32];
    for (int i = 0; i < 4; i++) {
        uint64_t lane = s[i % 5 + 5 * (i / 5)];
        memcpy(out + 8 * i, &lane, 8);
    }
    return PyBytes_FromStringAndSize((const char *)out, 32);
}

static void keccak256_raw(const uint8_t *p, size_t len, uint8_t out[32]) {
    const size_t rate = 136;
    uint64_t s[25] = {0};
    uint8_t block[136];
    size_t off = 0;
    while (len - off >= rate) {
        for (size_t i = 0; i < rate / 8; i++) {
            uint64_t lane;
            memcpy(&lane, p + off + 8 * i, 8);
            s[i] ^= lane;
        }
        keccak_f1600(s);
        off += rate;
    }
    size_t rem = len - off;
    memset(block, 0, rate);
    memcpy(block, p + off, rem);
    block[rem] ^= 0x01;
    block[rate - 1] ^= 0x80;
    for (size_t i = 0; i < rate / 8; i++) {
        uint64_t lane;
        memcpy(&lane, block + 8 * i, 8);
        s[i] ^= lane;
    }
    keccak_f1600(s);
    for (int i = 0; i < 4; i++)
        memcpy(out + 8 * i, &s[i], 8);
}

/* ---- 8-way AVX-512 keccak (one lane per independent chain) ----------
 * The batch verifier's per-proof Fiat-Shamir chains are independent and
 * (for a shared vk) have identical segment layouts, so eight chains hash
 * in lockstep with each 64-bit AVX-512 lane carrying one chain.  Runtime
 * dispatch via __builtin_cpu_supports keeps the .so portable. */
#if defined(__x86_64__) || defined(_M_X64)
#define MPCJF_HAVE_AVX512_BUILD 1
#include <immintrin.h>

__attribute__((target("avx512f")))
static void keccak_f1600_x8(__m512i s[25]) {
    static const int ROT[25] = {
         0, 36,  3, 41, 18,
         1, 44, 10, 45,  2,
        62,  6, 43, 15, 61,
        28, 55, 25, 21, 56,
        27, 20, 39,  8, 14,
    };
    __m512i b[25], c[5], d[5];
    for (int r = 0; r < 24; r++) {
        for (int x = 0; x < 5; x++)
            c[x] = _mm512_ternarylogic_epi64(
                _mm512_ternarylogic_epi64(s[x], s[x + 5], s[x + 10], 0x96),
                s[x + 15], s[x + 20], 0x96);
        for (int x = 0; x < 5; x++)
            d[x] = _mm512_xor_si512(c[(x + 4) % 5],
                                    _mm512_rol_epi64(c[(x + 1) % 5], 1));
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                s[x + 5 * y] = _mm512_xor_si512(s[x + 5 * y], d[x]);
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _mm512_rolv_epi64(
                    s[x + 5 * y], _mm512_set1_epi64(ROT[x * 5 + y]));
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                /* b0 ^ (~b1 & b2) == ternarylogic 0xD2 */
                s[x + 5 * y] = _mm512_ternarylogic_epi64(
                    b[x + 5 * y], b[(x + 1) % 5 + 5 * y],
                    b[(x + 2) % 5 + 5 * y], 0xD2);
        s[0] = _mm512_xor_si512(s[0], _mm512_set1_epi64((long long)KC_RC[r]));
    }
}

__attribute__((target("avx512f")))
static inline __m512i kc_load8(const uint8_t *const p[8], size_t off) {
    uint64_t w[8];
    for (int l = 0; l < 8; l++)
        memcpy(&w[l], p[l] + off, 8);
    return _mm512_set_epi64((long long)w[7], (long long)w[6], (long long)w[5],
                            (long long)w[4], (long long)w[3], (long long)w[2],
                            (long long)w[1], (long long)w[0]);
}

/* keccak256 of 8 equal-length inputs; out[l] gets lane l's 32B digest. */
__attribute__((target("avx512f")))
static void keccak256_x8(const uint8_t *const p[8], size_t len,
                         uint8_t out[8][32]) {
    const size_t rate = 136;
    __m512i s[25];
    for (int i = 0; i < 25; i++) s[i] = _mm512_setzero_si512();
    size_t off = 0;
    while (len - off >= rate) {
        for (size_t i = 0; i < rate / 8; i++)
            s[i] = _mm512_xor_si512(s[i], kc_load8(p, off + 8 * i));
        keccak_f1600_x8(s);
        off += rate;
    }
    size_t rem = len - off;
    uint8_t block[8][136];
    const uint8_t *bp[8];
    for (int l = 0; l < 8; l++) {
        memset(block[l], 0, rate);
        memcpy(block[l], p[l] + off, rem);
        block[l][rem] ^= 0x01;
        block[l][rate - 1] ^= 0x80;
        bp[l] = block[l];
    }
    for (size_t i = 0; i < rate / 8; i++)
        s[i] = _mm512_xor_si512(s[i], kc_load8(bp, 8 * i));
    keccak_f1600_x8(s);
    uint64_t w[4][8];
    for (int i = 0; i < 4; i++)
        _mm512_storeu_si512((__m512i *)w[i], s[i]);
    for (int l = 0; l < 8; l++)
        for (int i = 0; i < 4; i++)
            memcpy(out[l] + 8 * i, &w[i][l], 8);
}

static int mpcjf_avx512_ok(void) {
    static int ok = -1;
    if (ok < 0)
        ok = __builtin_cpu_supports("avx512f") ? 1 : 0;
    return ok;
}
#else
static int mpcjf_avx512_ok(void) { return 0; }
#endif

/* Solidity-transcript challenge chain (transcript/solidity.rs:53-77):
 *   state = 64 zero bytes;  for each segment seg_i:
 *     T += seg_i
 *     state = keccak(state||T||0x00) || keccak(state||T||0x01)
 *     out_i = state                    (caller samples state[..48] mod r)
 * challenge_chain([[seg,...], ...]) -> [bytes(64*nseg), ...] — one chain
 * per proof; chains hash in parallel (pthreads) with the GIL released. */

typedef struct {
    uint8_t *buf;      /* 64-byte state header + concatenated T + 1 spare */
    size_t *ends;      /* cumulative end offset (incl. header) per segment */
    int nseg;
    uint8_t *out;      /* nseg * 64 */
} cc_job;

typedef struct { cc_job *jobs; Py_ssize_t k; int tid, nthreads; } cc_task;

static void cc_run(cc_job *j) {
    uint8_t h0[32], h1[32];
    memset(j->buf, 0, 64);
    for (int i = 0; i < j->nseg; i++) {
        size_t pos = j->ends[i];
        uint8_t save = j->buf[pos];  /* first byte of the NEXT segment */
        j->buf[pos] = 0x00;
        keccak256_raw(j->buf, pos + 1, h0);
        j->buf[pos] = 0x01;
        keccak256_raw(j->buf, pos + 1, h1);
        j->buf[pos] = save;
        memcpy(j->buf, h0, 32);
        memcpy(j->buf + 32, h1, 32);
        memcpy(j->out + 64 * i, j->buf, 64);
    }
}

#ifdef MPCJF_HAVE_AVX512_BUILD
/* Eight chains with identical segment layouts, in AVX-512 lockstep. */
__attribute__((target("avx512f")))
static void cc_run_x8(cc_job *const j[8]) {
    uint8_t h0[8][32], h1[8][32];
    const uint8_t *bufs[8];
    for (int l = 0; l < 8; l++) {
        memset(j[l]->buf, 0, 64);
        bufs[l] = j[l]->buf;
    }
    int nseg = j[0]->nseg;
    for (int i = 0; i < nseg; i++) {
        size_t pos = j[0]->ends[i];
        uint8_t save[8];
        for (int l = 0; l < 8; l++) {
            save[l] = j[l]->buf[pos];
            j[l]->buf[pos] = 0x00;
        }
        keccak256_x8(bufs, pos + 1, h0);
        for (int l = 0; l < 8; l++)
            j[l]->buf[pos] = 0x01;
        keccak256_x8(bufs, pos + 1, h1);
        for (int l = 0; l < 8; l++) {
            j[l]->buf[pos] = save[l];
            memcpy(j[l]->buf, h0[l], 32);
            memcpy(j[l]->buf + 32, h1[l], 32);
            memcpy(j[l]->out + 64 * i, j[l]->buf, 64);
        }
    }
}
#endif

static int cc_same_layout(const cc_job *a, const cc_job *b) {
    if (a->nseg != b->nseg) return 0;
    for (int i = 0; i < a->nseg; i++)
        if (a->ends[i] != b->ends[i]) return 0;
    return 1;
}

static void *cc_worker(void *arg) {
    cc_task *t = (cc_task *)arg;
#ifdef MPCJF_HAVE_AVX512_BUILD
    if (mpcjf_avx512_ok()) {
        /* blocks of 8 consecutive jobs; lockstep when layouts match */
        for (Py_ssize_t i = (Py_ssize_t)t->tid * 8; i < t->k;
             i += (Py_ssize_t)t->nthreads * 8) {
            Py_ssize_t end = i + 8 <= t->k ? i + 8 : t->k;
            int same = (end - i == 8);
            for (Py_ssize_t v = i + 1; same && v < end; v++)
                same = cc_same_layout(&t->jobs[i], &t->jobs[v]);
            if (same) {
                cc_job *grp[8];
                for (int l = 0; l < 8; l++) grp[l] = &t->jobs[i + l];
                cc_run_x8(grp);
            } else {
                for (Py_ssize_t v = i; v < end; v++)
                    cc_run(&t->jobs[v]);
            }
        }
        return NULL;
    }
#endif
    for (Py_ssize_t i = t->tid; i < t->k; i += t->nthreads)
        cc_run(&t->jobs[i]);
    return NULL;
}

static PyObject *py_challenge_chain(PyObject *self, PyObject *args) {
    PyObject *batch;
    if (!PyArg_ParseTuple(args, "O!", &PyList_Type, &batch)) return NULL;
    Py_ssize_t k = PyList_GET_SIZE(batch);
    cc_job *jobs = (cc_job *)calloc(k > 0 ? k : 1, sizeof(cc_job));
    if (!jobs) return PyErr_NoMemory();
    for (Py_ssize_t j = 0; j < k; j++) {
        PyObject *segs = PyList_GET_ITEM(batch, j);
        if (!PyList_Check(segs)) {
            PyErr_SetString(PyExc_TypeError,
                            "challenge_chain: expected list of list of bytes");
            goto fail;
        }
        int nseg = (int)PyList_GET_SIZE(segs);
        size_t total = 0;
        for (int i = 0; i < nseg; i++) {
            PyObject *s = PyList_GET_ITEM(segs, i);
            if (!PyBytes_Check(s)) {
                PyErr_SetString(PyExc_TypeError,
                                "challenge_chain: segments must be bytes");
                goto fail;
            }
            total += (size_t)PyBytes_GET_SIZE(s);
        }
        cc_job *job = &jobs[j];
        job->nseg = nseg;
        job->buf = (uint8_t *)malloc(64 + total + 1);
        job->ends = (size_t *)malloc(sizeof(size_t) * (nseg > 0 ? nseg : 1));
        job->out = (uint8_t *)malloc((size_t)(nseg > 0 ? nseg : 1) * 64);
        if (!job->buf || !job->ends || !job->out) {
            PyErr_NoMemory();
            goto fail;
        }
        size_t pos = 64;
        for (int i = 0; i < nseg; i++) {
            PyObject *s = PyList_GET_ITEM(segs, i);
            size_t len = (size_t)PyBytes_GET_SIZE(s);
            memcpy(job->buf + pos, PyBytes_AS_STRING(s), len);
            pos += len;
            job->ends[i] = pos;
        }
    }
    {
        long nt = msm_nthreads();
        if (nt > k) nt = k > 0 ? k : 1;
        Py_BEGIN_ALLOW_THREADS
        if (nt > 1) {
            pthread_t th[16];
            cc_task tasks[16];
            long started = 0;
            for (long t = 0; t < nt; t++) {
                tasks[t] = (cc_task){jobs, k, (int)t, (int)nt};
                if (pthread_create(&th[t], NULL, cc_worker, &tasks[t]) != 0) {
                    cc_worker(&tasks[t]);
                    th[t] = pthread_self();
                }
                started++;
            }
            for (long t = 0; t < started; t++)
                if (!pthread_equal(th[t], pthread_self()))
                    pthread_join(th[t], NULL);
        } else {
            for (Py_ssize_t j = 0; j < k; j++) cc_run(&jobs[j]);
        }
        Py_END_ALLOW_THREADS
    }
    {
        PyObject *res = PyList_New(k);
        if (!res) goto fail;
        for (Py_ssize_t j = 0; j < k; j++) {
            PyObject *b = PyBytes_FromStringAndSize(
                (const char *)jobs[j].out, (Py_ssize_t)jobs[j].nseg * 64);
            if (!b) { Py_DECREF(res); goto fail; }
            PyList_SET_ITEM(res, j, b);
        }
        for (Py_ssize_t j = 0; j < k; j++) {
            free(jobs[j].buf); free(jobs[j].ends); free(jobs[j].out);
        }
        free(jobs);
        return res;
    }
fail:
    for (Py_ssize_t j = 0; j < k; j++) {
        free(jobs[j].buf); free(jobs[j].ends); free(jobs[j].out);
    }
    free(jobs);
    return NULL;
}


/* ---- fused batch-verify transcript assembly -------------------------
 * bv_assemble(ctx, tmpl, seg_ends, patches, blobs, pib, gen, two256,
 *             halfq, npi) -> (jobs, extras, bases)
 *
 * One call per batch: for every proof i it (a) copies the transcript
 * template and patches in the proof/public-input bytes (points emitted as
 * arkworks-0.4 compressed 32B, serialize.py:g1_to_bytes layout),
 * (b) runs the Solidity-transcript keccak chain (AVX-512 8-way lockstep
 * across proofs when available), (c) reduces the 7 challenge states
 * (48B LE mod r via lo + hi*2^256), and (d) packs the pcs_scalars job
 * rows [tau,beta,gamma,alpha,zeta,v,u | 10 evals | npi pi], the
 * extras rows [u, zeta, zeta*gen] and the 13x65B proof base rows that
 * pcs_scalars_batch / batch_opening_msm consume.  Replaces the per-proof
 * Python glue of verifier.py:batch_verify_native (verifier.rs:195-252).
 *
 *  tmpl:     transcript bytes T of a canonical proof (patch targets)
 *  seg_ends: nseg x u64 LE, transcript length at each challenge (== 7)
 *  patches:  n x 4 u32 LE (t_off, kind, src, len); kind 0 = proof-blob
 *            byte copy, 1 = public-input row copy, 2 = compressed point
 *            (src = point index, blob holds x32|y32|inf1 at src*65)
 *  blobs:    list of k bytes, each 13*65 + 10*32 (points then evals)
 *  pib:      k * npi * 32 public-input bytes (LE, canonical)
 *  gen:      eval-domain generator (32B LE), two256: 2^256 mod r,
 *  halfq:    (q-1)/2 as 32B LE (y-sign compare for point compression)
 */
#define BV_NPT 13
#define BV_NEV 10
#define BV_BLOB_PTS (BV_NPT * 65)
#define BV_BLOB_LEN (BV_BLOB_PTS + BV_NEV * 32)

typedef struct {
    const uint8_t *tmpl; size_t tlen;
    const uint64_t *ends; int nseg;
    const uint8_t *patches; Py_ssize_t npatch;
    const uint8_t **blobs;
    const uint8_t *pib; int npi;
    const fctx *c;
    fe gen, two256;
    const uint8_t *halfq;
    uint8_t *jobs, *extras, *bases;
    size_t jrow;
    Py_ssize_t k;
    int tid, nthreads;
    int err;
} bv_task;

/* y > (q-1)/2 on 32B LE integers */
static int bv_y_is_high(const uint8_t *y, const uint8_t *halfq) {
    for (int i = 31; i >= 0; i--) {
        if (y[i] != halfq[i])
            return y[i] > halfq[i];
    }
    return 0;
}

static void bv_patch_lane(const bv_task *t, Py_ssize_t i, uint8_t *buf) {
    memcpy(buf + 64, t->tmpl, t->tlen);
    const uint8_t *blob = t->blobs[i];
    const uint8_t *pirow = t->pib + (size_t)i * t->npi * 32;
    for (Py_ssize_t pjj = 0; pjj < t->npatch; pjj++) {
        const uint8_t *pd = t->patches + pjj * 16;
        uint32_t t_off, kind, src, len;
        memcpy(&t_off, pd, 4); memcpy(&kind, pd + 4, 4);
        memcpy(&src, pd + 8, 4); memcpy(&len, pd + 12, 4);
        uint8_t *dst = buf + 64 + t_off;
        if (kind == 0) {
            memcpy(dst, blob + src, len);
        } else if (kind == 1) {
            memcpy(dst, pirow + src, len);
        } else { /* kind 2: compressed point */
            const uint8_t *pt = blob + (size_t)src * 65;
            if (pt[64]) {               /* infinity */
                memset(dst, 0, 32);
                dst[31] |= 0x40;
            } else {
                memcpy(dst, pt, 32);
                if (bv_y_is_high(pt + 32, t->halfq))
                    dst[31] |= 0x80;
            }
        }
    }
}

static void bv_post_lane(const bv_task *t, Py_ssize_t i,
                         const uint8_t *states /* nseg*64 */) {
    const fctx *c = t->c;
    fe ch[7];
    for (int j = 0; j < 7; j++) {
        uint8_t hi32[32];
        fe lo, hi;
        fe_from_bytes(c, &lo, states + j * 64);
        memset(hi32, 0, 32);
        memcpy(hi32, states + j * 64 + 32, 16);
        fe_from_bytes(c, &hi, hi32);
        fe_mul(c, &hi, &hi, &t->two256);
        fe_add(c, &ch[j], &lo, &hi);
    }
    uint8_t *jr = t->jobs + (size_t)i * t->jrow;
    for (int j = 0; j < 7; j++)
        fe_to_bytes(c, jr + j * 32, &ch[j]);
    const uint8_t *blob = t->blobs[i];
    memcpy(jr + 7 * 32, blob + BV_BLOB_PTS, BV_NEV * 32);
    memcpy(jr + 17 * 32, t->pib + (size_t)i * t->npi * 32,
           (size_t)t->npi * 32);
    /* extras: u, zeta, zeta*gen (zeta = ch[4], u = ch[6]) */
    uint8_t *ex = t->extras + (size_t)i * 96;
    fe zg;
    fe_to_bytes(c, ex, &ch[6]);
    fe_to_bytes(c, ex + 32, &ch[4]);
    fe_mul(c, &zg, &ch[4], &t->gen);
    fe_to_bytes(c, ex + 64, &zg);
    memcpy(t->bases + (size_t)i * BV_BLOB_PTS, blob, BV_BLOB_PTS);
}

static void *bv_worker(void *arg) {
    bv_task *t = (bv_task *)arg;
    size_t bufsz = 64 + t->tlen + 1;
    int nseg = t->nseg;
    uint8_t *arena = (uint8_t *)malloc(8 * bufsz);
    size_t *ends_abs = (size_t *)malloc(sizeof(size_t) * nseg);
    uint8_t *states = (uint8_t *)malloc((size_t)8 * nseg * 64);
    if (!arena || !ends_abs || !states) {
        free(arena); free(ends_abs); free(states);
        t->err = 1;
        return NULL;
    }
    for (int s = 0; s < nseg; s++)
        ends_abs[s] = 64 + (size_t)t->ends[s];
    cc_job grp[8];
    cc_job *gp[8];
    for (int l = 0; l < 8; l++) {
        grp[l].buf = arena + l * bufsz;
        grp[l].ends = ends_abs;
        grp[l].nseg = nseg;
        grp[l].out = states + (size_t)l * nseg * 64;
        gp[l] = &grp[l];
    }
    for (Py_ssize_t base = (Py_ssize_t)t->tid * 8; base < t->k;
         base += (Py_ssize_t)t->nthreads * 8) {
        Py_ssize_t m = t->k - base < 8 ? t->k - base : 8;
        for (Py_ssize_t l = 0; l < m; l++)
            bv_patch_lane(t, base + l, grp[l].buf);
#ifdef MPCJF_HAVE_AVX512_BUILD
        if (m == 8 && mpcjf_avx512_ok()) {
            cc_run_x8(gp);
        } else
#endif
        {
            for (Py_ssize_t l = 0; l < m; l++)
                cc_run(&grp[l]);
        }
        for (Py_ssize_t l = 0; l < m; l++)
            bv_post_lane(t, base + l, grp[l].out);
    }
    free(arena); free(ends_abs); free(states);
    return NULL;
}

static PyObject *py_bv_assemble(PyObject *self, PyObject *args) {
    PyObject *cap, *blobs_list;
    Py_buffer tmpl, ends, patches, pib, genb, two256b, halfqb;
    int npi;
    if (!PyArg_ParseTuple(args, "Oy*y*y*O!y*y*y*y*i", &cap, &tmpl, &ends,
                          &patches, &PyList_Type, &blobs_list, &pib, &genb,
                          &two256b, &halfqb, &npi))
        return NULL;
    fctx *c = get_ctx(cap);
    PyObject *ret = NULL;
    const uint8_t **blobs = NULL;
    PyObject *jobs_o = NULL, *extras_o = NULL, *bases_o = NULL;
    Py_ssize_t k = PyList_GET_SIZE(blobs_list);
    int nseg = (int)(ends.len / 8);
    if (!c || ends.len % 8 || nseg != 7 || patches.len % 16
        || genb.len != 32 || two256b.len != 32 || halfqb.len != 32
        || npi < 0 || pib.len != (Py_ssize_t)k * npi * 32) {
        PyErr_SetString(PyExc_ValueError, "bv_assemble: bad buffers");
        goto done;
    }
    blobs = (const uint8_t **)malloc(sizeof(void *) * (k > 0 ? k : 1));
    if (!blobs) { PyErr_NoMemory(); goto done; }
    for (Py_ssize_t i = 0; i < k; i++) {
        PyObject *b = PyList_GET_ITEM(blobs_list, i);
        if (!PyBytes_Check(b) || PyBytes_GET_SIZE(b) != BV_BLOB_LEN) {
            PyErr_SetString(PyExc_ValueError,
                            "bv_assemble: bad proof blob");
            goto done;
        }
        blobs[i] = (const uint8_t *)PyBytes_AS_STRING(b);
    }
    /* validate patches once */
    {
        const uint64_t *e = (const uint64_t *)ends.buf;
        uint64_t prev = 0;
        for (int s = 0; s < nseg; s++) {
            if (e[s] < prev || e[s] > (uint64_t)tmpl.len) {
                PyErr_SetString(PyExc_ValueError,
                                "bv_assemble: bad segment ends");
                goto done;
            }
            prev = e[s];
        }
        for (Py_ssize_t pjj = 0; pjj < patches.len / 16; pjj++) {
            const uint8_t *pd = (const uint8_t *)patches.buf + pjj * 16;
            uint32_t t_off, kind, src, len;
            memcpy(&t_off, pd, 4); memcpy(&kind, pd + 4, 4);
            memcpy(&src, pd + 8, 4); memcpy(&len, pd + 12, 4);
            int bad = (size_t)t_off + len > (size_t)tmpl.len;
            if (kind == 0) bad |= (size_t)src + len > BV_BLOB_LEN;
            else if (kind == 1) bad |= (size_t)src + len > (size_t)npi * 32;
            else if (kind == 2) bad |= src >= BV_NPT || len != 32;
            else bad = 1;
            if (bad) {
                PyErr_SetString(PyExc_ValueError,
                                "bv_assemble: bad patch");
                goto done;
            }
        }
    }
    {
        size_t jrow = (size_t)(17 + npi) * 32;
        jobs_o = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)(k * jrow));
        extras_o = PyBytes_FromStringAndSize(NULL, k * 96);
        bases_o = PyBytes_FromStringAndSize(NULL, k * BV_BLOB_PTS);
        if (!jobs_o || !extras_o || !bases_o) goto done;
        bv_task proto;
        memset(&proto, 0, sizeof proto);
        proto.tmpl = (const uint8_t *)tmpl.buf;
        proto.tlen = (size_t)tmpl.len;
        proto.ends = (const uint64_t *)ends.buf;
        proto.nseg = nseg;
        proto.patches = (const uint8_t *)patches.buf;
        proto.npatch = patches.len / 16;
        proto.blobs = blobs;
        proto.pib = (const uint8_t *)pib.buf;
        proto.npi = npi;
        proto.c = c;
        fe_from_bytes(c, &proto.gen, (const uint8_t *)genb.buf);
        fe_from_bytes(c, &proto.two256, (const uint8_t *)two256b.buf);
        proto.halfq = (const uint8_t *)halfqb.buf;
        proto.jobs = (uint8_t *)PyBytes_AS_STRING(jobs_o);
        proto.extras = (uint8_t *)PyBytes_AS_STRING(extras_o);
        proto.bases = (uint8_t *)PyBytes_AS_STRING(bases_o);
        proto.jrow = jrow;
        proto.k = k;
        long nt = msm_nthreads();
        if (nt > (k + 7) / 8) nt = (k + 7) / 8;
        if (nt < 1) nt = 1;
        int err = 0;
        Py_BEGIN_ALLOW_THREADS
        if (nt > 1) {
            pthread_t th[16];
            bv_task tasks[16];
            long started = 0;
            for (long t = 0; t < nt; t++) {
                tasks[t] = proto;
                tasks[t].tid = (int)t;
                tasks[t].nthreads = (int)nt;
                if (pthread_create(&th[t], NULL, bv_worker, &tasks[t]) != 0) {
                    bv_worker(&tasks[t]);
                    th[t] = pthread_self();
                }
                started++;
            }
            for (long t = 0; t < started; t++)
                if (!pthread_equal(th[t], pthread_self()))
                    pthread_join(th[t], NULL);
            for (long t = 0; t < started; t++)
                err |= tasks[t].err;
        } else {
            proto.tid = 0;
            proto.nthreads = 1;
            bv_worker(&proto);
            err = proto.err;
        }
        Py_END_ALLOW_THREADS
        if (err) { PyErr_NoMemory(); goto done; }
        ret = PyTuple_Pack(3, jobs_o, extras_o, bases_o);
    }
done:
    Py_XDECREF(jobs_o); Py_XDECREF(extras_o); Py_XDECREF(bases_o);
    free(blobs);
    PyBuffer_Release(&tmpl); PyBuffer_Release(&ends);
    PyBuffer_Release(&patches); PyBuffer_Release(&pib);
    PyBuffer_Release(&genb); PyBuffer_Release(&two256b);
    PyBuffer_Release(&halfqb);
    return ret;
}

/* fixed_base_powers(ctx, gx32, gy32, scalars n*32 raw LE)
 * -> bytes n*(32+32+1): affine x, y, inf per point (g * s_i each).
 * Used to generate KZG test SRSes (powers of beta) without the device:
 * an 8-bit comb table of g then 31 adds per point + one batch inversion. */
static PyObject *py_fixed_base_powers(PyObject *self, PyObject *args) {
    PyObject *cap;
    Py_buffer gxb, gyb, sb;
    if (!PyArg_ParseTuple(args, "Oy*y*y*", &cap, &gxb, &gyb, &sb))
        return NULL;
    fctx *c = get_ctx(cap);
    if (gxb.len != 32 || gyb.len != 32 || sb.len % 32 != 0) {
        PyErr_SetString(PyExc_ValueError, "bad buffer sizes");
        return NULL;
    }
    Py_ssize_t n = sb.len / 32;
    g1 G;
    fe_from_bytes(c, &G.x, (const uint8_t *)gxb.buf);
    fe_from_bytes(c, &G.y, (const uint8_t *)gyb.buf);
    G.z = c->one;

    /* comb table: T[w][d] = (d << 8w) * G for w < 32, d in 1..255 */
    g1 *table = (g1 *)malloc(sizeof(g1) * 32 * 256);
    g1 base = G;
    for (int w = 0; w < 32; w++) {
        g1_inf(c, &table[w * 256]);
        table[w * 256 + 1] = base;
        for (int d = 2; d < 256; d++)
            g1_add(c, &table[w * 256 + d], &table[w * 256 + d - 1], &base);
        if (w < 31)
            g1_add(c, &base, &table[w * 256 + 255], &base);
    }

    g1 *res = (g1 *)malloc(sizeof(g1) * n);
    const uint8_t *scal = (const uint8_t *)sb.buf;
    for (Py_ssize_t i = 0; i < n; i++) {
        g1 acc;
        g1_inf(c, &acc);
        for (int w = 0; w < 32; w++) {
            uint8_t d = scal[32 * i + w];
            if (d) g1_add(c, &acc, &acc, &table[w * 256 + d]);
        }
        res[i] = acc;
    }
    free(table);

    /* batch affine conversion (Montgomery inversion trick) */
    fe *pref = (fe *)malloc(sizeof(fe) * n);
    fe run = c->one;
    for (Py_ssize_t i = 0; i < n; i++) {
        pref[i] = run;
        if (!fe_is_zero(&res[i].z)) fe_mul(c, &run, &run, &res[i].z);
    }
    fe run_inv;
    fe_inv(c, &run_inv, &run);
    PyObject *out = PyBytes_FromStringAndSize(NULL, n * 65);
    uint8_t *ob = (uint8_t *)PyBytes_AsString(out);
    for (Py_ssize_t i = n - 1; i >= 0; i--) {
        uint8_t *o = ob + 65 * i;
        if (fe_is_zero(&res[i].z)) {
            memset(o, 0, 64);
            o[64] = 1;
            continue;
        }
        fe zi, zi2, ax, ay;
        fe_mul(c, &zi, &run_inv, &pref[i]);       /* 1 / z_i */
        fe_mul(c, &run_inv, &run_inv, &res[i].z); /* strip z_i */
        fe_sqr(c, &zi2, &zi);
        fe_mul(c, &ax, &res[i].x, &zi2);
        fe_mul(c, &zi2, &zi2, &zi);
        fe_mul(c, &ay, &res[i].y, &zi2);
        fe_to_bytes(c, o, &ax);
        fe_to_bytes(c, o + 32, &ay);
        o[64] = 0;
    }
    free(pref);
    free(res);
    PyBuffer_Release(&gxb);
    PyBuffer_Release(&gyb);
    PyBuffer_Release(&sb);
    return out;
}

/* ------------------------------------------------------------------ */
/* Rescue permutation (primitives/rescue.py host fallback is Python    */
/* bigint pow: the inverse S-box is a ~254-bit exponentiation PER      */
/* element per even round — a height-20 Merkle path verify spent       */
/* ~130ms there; this is ~20us per pow in C).                          */
/* ------------------------------------------------------------------ */

/* rescue_perm(ctx, rk (NK*4*32B), mds (16*32B), alpha, ainv 32B,
 * state 4*32B) -> 4*32B.  NK = 2*ROUNDS+1 from the buffer; EVEN rounds
 * apply the inverse S-box x^ainv, odd rounds x^alpha (mirror of
 * rescue/mod.rs:301-317 and primitives/rescue.py prp_with_keys). */
static PyObject *py_rescue_perm(PyObject *self, PyObject *args) {
    PyObject *cap;
    int alpha;
    Py_buffer rk, mds, ainv, st;
    if (!PyArg_ParseTuple(args, "Oy*y*iy*y*", &cap, &rk, &mds, &alpha,
                          &ainv, &st))
        return NULL;
    fctx *c = get_ctx(cap);
    if (rk.len % (4 * 32) || rk.len < 3 * 4 * 32 || mds.len != 16 * 32
        || ainv.len != 32 || st.len != 4 * 32 || alpha < 3
        || alpha > 0xFFFF) {
        PyErr_SetString(PyExc_ValueError, "rescue_perm: bad buffers");
        PyBuffer_Release(&rk); PyBuffer_Release(&mds);
        PyBuffer_Release(&ainv); PyBuffer_Release(&st);
        return NULL;
    }
    Py_ssize_t nk = rk.len / (4 * 32);
    fe M[16], s[4], t[4], k0;
    for (int i = 0; i < 16; i++)
        fe_from_bytes(c, &M[i], (const uint8_t *)mds.buf + i * 32);
    uint8_t ab[2] = {(uint8_t)(alpha & 0xFF), (uint8_t)(alpha >> 8)};
    PyObject *out = PyBytes_FromStringAndSize(NULL, 4 * 32);
    if (!out) {
        PyBuffer_Release(&rk); PyBuffer_Release(&mds);
        PyBuffer_Release(&ainv); PyBuffer_Release(&st);
        return NULL;
    }
    Py_BEGIN_ALLOW_THREADS
    for (int i = 0; i < 4; i++) {
        fe_from_bytes(c, &s[i], (const uint8_t *)st.buf + i * 32);
        fe_from_bytes(c, &k0, (const uint8_t *)rk.buf + i * 32);
        fe_add(c, &s[i], &s[i], &k0);
    }
    for (Py_ssize_t r = 0; r + 1 < nk; r++) {
        for (int i = 0; i < 4; i++) {
            if (r % 2 == 0)
                fe_pow_bytes(c, &s[i], &s[i], (const uint8_t *)ainv.buf, 32);
            else
                fe_pow_bytes(c, &s[i], &s[i], ab, 2);
        }
        for (int i = 0; i < 4; i++) {
            fe acc, pr;
            memset(&acc, 0, sizeof acc);
            for (int j = 0; j < 4; j++) {
                fe_mul(c, &pr, &M[i * 4 + j], &s[j]);
                fe_add(c, &acc, &acc, &pr);
            }
            fe_from_bytes(c, &k0,
                          (const uint8_t *)rk.buf + ((r + 1) * 4 + i) * 32);
            fe_add(c, &t[i], &acc, &k0);
        }
        memcpy(s, t, sizeof s);
    }
    for (int i = 0; i < 4; i++)
        fe_to_bytes(c, (uint8_t *)PyBytes_AS_STRING(out) + i * 32, &s[i]);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&rk); PyBuffer_Release(&mds);
    PyBuffer_Release(&ainv); PyBuffer_Release(&st);
    return out;
}

static PyMethodDef methods[] = {
    {"ctx_new", py_ctx_new, METH_VARARGS, "create field context"},
    {"msm", py_msm, METH_VARARGS, "G1 Pippenger MSM"},
    {"miller", py_miller, METH_VARARGS, "ate Miller loop (Fq12 affine)"},
    {"miller_twist", py_miller_twist, METH_VARARGS,
     "ate Miller loop (projective twist-side, no inversions)"},
    {"f12_mul", py_f12_mul, METH_VARARGS, "Fq12 multiply"},
    {"final_exp", py_final_exp, METH_VARARGS, "final exponentiation"},
    {"final_exp_bn", py_final_exp_bn, METH_VARARGS,
     "BN final exponentiation (x-chain hard part)"},
    {"pcs_scalars_batch", py_pcs_scalars_batch, METH_VARARGS,
     "batched TurboPlonk verifier scalars"},
    {"batch_opening_msm", py_batch_opening_msm, METH_VARARGS,
     "fused batch opening-proof aggregation (A,B MSMs)"},
    {"bv_assemble", py_bv_assemble, METH_VARARGS,
     "fused batch-verify transcript assembly + challenge chains"},
    {"f12_is_one", py_f12_is_one, METH_VARARGS, "Fq12 == 1"},
    {"rescue_perm", py_rescue_perm, METH_VARARGS,
     "Rescue permutation with explicit key schedule"},
    {"pair_lines", py_pair_lines, METH_VARARGS,
     "fixed-G2 Miller line precomputation"},
    {"pair_check2_pre", py_pair_check2_pre, METH_VARARGS,
     "2-pairing check over precomputed G2 lines"},
    {"pair_check2", py_pair_check2, METH_VARARGS,
     "e(P1,Q1)*e(P2,Q2) == 1 (threaded Millers + BN final exp)"},
    {"keccak256", py_keccak256, METH_VARARGS, "Keccak-256 (eth padding)"},
    {"challenge_chain", py_challenge_chain, METH_VARARGS,
     "Solidity-transcript challenge chains, batched + threaded"},
    {"fixed_base_powers", py_fixed_base_powers, METH_VARARGS, "g*s_i batch (SRS gen)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "mpcjf_native", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit_mpcjf_native(void) {
    return PyModule_Create(&moduledef);
}
