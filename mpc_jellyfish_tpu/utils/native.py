"""Loader + wrappers for the C host-runtime (native/mpcjf_native.c).

Builds the extension on first use (cc -O2 -shared, no pip), caches the .so
under native/, and exposes drop-in fast paths for the verifier's host math:

  - ``msm(p, points, scalars)``        - G1 Pippenger (ec_host.ec_msm_fast)
  - ``multi_pairing(curve, g1s, g2s)`` - optimal-ate product (pairing.py)

Scope: 4x64-limb fields (p < 2^256) - BN254 (Fq 254b) end-to-end and every
curve's Fr; BLS12-381's 381-bit Fq falls back to the exact Python path.
Every wrapper returns None when the native module is unavailable or the
parameters are out of scope; callers keep the Python result as oracle.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_MOD = None
_TRIED = False
_CTX: dict = {}


def _build_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load():
    global _MOD, _TRIED
    if _TRIED:
        return _MOD
    _TRIED = True
    if os.environ.get("MPC_JELLYFISH_NO_NATIVE", "") == "1":
        return None
    d = _build_dir()
    so = os.path.join(d, "mpcjf_native.so")
    src = os.path.join(d, "mpcjf_native.c")
    # prefer a -march=x86-64-v3 -madx build (mulx/adx roughly halve the
    # 4x64 Montgomery mul latency) when the CPU supports it; the baseline
    # -O3 build remains the fallback so the .so stays portable
    use_v3 = False
    try:
        with open("/proc/cpuinfo") as f:
            flags = f.read()
        use_v3 = all(fl in flags for fl in ("avx2", "bmi2", "adx", "fma"))
    except OSError:
        pass
    if use_v3:
        so = os.path.join(d, "mpcjf_native_v3.so")
    stamp = so + ".srchash"
    try:
        # Rebuild keyed on source CONTENT, not mtime: git checkouts give the
        # .c and a stale .so identical mtimes, which silently disabled every
        # native entry point added after the .so was built.
        import hashlib
        with open(src, "rb") as f:
            src_hash = hashlib.sha256(f.read()).hexdigest()
        built = None
        if os.path.exists(stamp):
            with open(stamp) as f:
                built = f.read().strip()
        if not os.path.exists(so) or built != src_hash:
            inc = sysconfig.get_paths()["include"]
            extra = ["-march=x86-64-v3", "-madx"] if use_v3 else []
            subprocess.run(
                ["cc", "-O3", "-pthread", "-shared", "-fPIC", f"-I{inc}",
                 *extra, src, "-o", so + ".tmp"],
                check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
            with open(stamp, "w") as f:
                f.write(src_hash)
        import importlib.util
        spec = importlib.util.spec_from_file_location("mpcjf_native", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _MOD = mod
    except Exception:
        _MOD = None
    return _MOD


def _i2b(x: int) -> bytes:
    return int(x % (1 << 256)).to_bytes(32, "little")


def _b2i(b: bytes) -> int:
    return int.from_bytes(b, "little")


def _get_ctx(curve):
    """Field context for the curve's Fq tower; None if out of scope."""
    mod = _load()
    if mod is None:
        return None
    key = curve.name
    if key in _CTX:
        return _CTX[key]
    p = curve.fq.p
    if p.bit_length() > 256:
        _CTX[key] = None
        return None
    from . import fq_tower as T
    from ..pairing import _xi
    xi = _xi(curve)
    beta = T._beta(p)
    gammas = T._frob_gammas(p, xi)
    gb = b"".join(_i2b(g[0]) + _i2b(g[1]) for g in gammas)
    ctx = mod.ctx_new(_i2b(p), _i2b(beta), _i2b(xi[0]) + _i2b(xi[1]), gb)
    _CTX[key] = (mod, ctx)
    return _CTX[key]


def _get_fr_ctx(p: int):
    """Bare-field context keyed by modulus (for G1 MSM over any base field)."""
    mod = _load()
    if mod is None or p.bit_length() > 256:
        return None
    key = ("fp", p)
    if key in _CTX:
        return _CTX[key]
    zeros = _i2b(0)
    ctx = mod.ctx_new(_i2b(p), _i2b(p - 1), zeros * 2, zeros * 12)
    _CTX[key] = (mod, ctx)
    return _CTX[key]


def msm(p: int, points, scalars):
    """G1 MSM over E/Fp (a=0).  Returns AffinePoint or None (fallback)."""
    got = _get_fr_ctx(p)
    if got is None:
        return None
    mod, ctx = got
    from .ec_host import AffinePoint
    xs, ys, infs, ss = [], [], [], []
    for pt, s in zip(points, scalars):
        if pt.inf:
            xs.append(_i2b(0)); ys.append(_i2b(0)); infs.append(1)
        else:
            xs.append(_i2b(pt.x)); ys.append(_i2b(pt.y)); infs.append(0)
        ss.append(_i2b(int(s)))
    out = mod.msm(ctx, b"".join(xs), b"".join(ys), bytes(infs),
                  b"".join(ss))
    if out[64]:
        return AffinePoint.infinity()
    return AffinePoint(_b2i(out[:32]), _b2i(out[32:64]))


def pcs_scalars_batch_raw(fr_p: int, k, log_n: int, gen: int, npi: int,
                          jobs_bytes: bytes):
    """Raw-bytes form of pcs_scalars_batch (30 x 32B LE per proof), or None."""
    got = _get_fr_ctx(fr_p)
    if got is None or not hasattr(got[0], "pcs_scalars_batch"):
        return None
    mod, ctx = got
    kb = b"".join(_i2b(int(x)) for x in k)
    return mod.pcs_scalars_batch(ctx, kb, log_n, _i2b(gen), npi, jobs_bytes)


def pcs_scalars_batch(fr_p: int, k, log_n: int, gen: int, npi: int,
                      jobs_bytes: bytes):
    """Batched TurboPlonk verifier scalars (C runtime), or None (fallback).

    jobs_bytes: per proof [tau, beta, gamma, alpha, zeta, v, u, w0..w4,
    s0..s3, perm_next, pi...] as 32B LE field elements.  Returns per proof
    30 ints: [prod_perm, last_sigma, q0..q12, quot0..quot4, v^1..v^9, eval].
    """
    out = pcs_scalars_batch_raw(fr_p, k, log_n, gen, npi, jobs_bytes)
    if out is None:
        return None
    n_f = len(out) // 32
    vals = [_b2i(out[i * 32:(i + 1) * 32]) for i in range(n_f)]
    return [vals[i * 30:(i + 1) * 30] for i in range(n_f // 30)]


def has_batch_opening_msm(fr_p: int, fq_p: int) -> bool:
    """Cheap availability probe for batch_opening_msm (no work computed)."""
    gr = _get_fr_ctx(fr_p)
    gq = _get_fr_ctx(fq_p)
    return gr is not None and gq is not None and hasattr(
        gr[0], "batch_opening_msm")


def batch_opening_msm(fr_p: int, fq_p: int, rows: bytes, extras: bytes,
                      r: int, vk_bases: bytes, proof_bases: bytes):
    """Fused batch opening-proof aggregation (verifier.rs:195-251) in C:
    r^i scaling, base dedup, and both MSMs.  Returns (A, B) AffinePoints or
    None (fallback)."""
    gr = _get_fr_ctx(fr_p)
    gq = _get_fr_ctx(fq_p)
    if gr is None or gq is None or not hasattr(gr[0], "batch_opening_msm"):
        return None
    mod, ctxr = gr
    _, ctxq = gq
    out = mod.batch_opening_msm(ctxr, ctxq, rows, extras, _i2b(r),
                                vk_bases, proof_bases)
    from .ec_host import AffinePoint

    def _pt(b):
        if b[64]:
            return AffinePoint.infinity()
        return AffinePoint(_b2i(b[:32]), _b2i(b[32:64]))
    return _pt(out[:65]), _pt(out[65:130])


def challenge_chain(batches):
    """Batched Solidity-transcript challenge chains.

    batches: list (one per proof) of list-of-bytes segments — the bytes
    appended between consecutive ``get_and_append_challenge`` calls.
    Returns a list of per-proof lists of 64-byte states (sample
    ``state[:48]`` little-endian mod r for the challenge), or None when the
    native module is unavailable (caller falls back to SolidityTranscript).
    """
    mod = _load()
    if mod is None:
        return None
    outs = mod.challenge_chain(batches)
    return [[blob[i * 64:(i + 1) * 64] for i in range(len(blob) // 64)]
            for blob in outs]


def _f12_bytes(a) -> bytes:
    """Python nested-tuple f12 -> C layout (c0.c0.c0, c0.c0.c1, c0.c1.c0...)"""
    (a0, a1) = a
    parts = []
    for f6 in (a0, a1):
        for f2 in f6:
            parts.append(_i2b(f2[0]))
            parts.append(_i2b(f2[1]))
    return b"".join(parts)


def _f12_from_bytes(b: bytes):
    vals = [_b2i(b[i * 32:(i + 1) * 32]) for i in range(12)]
    def f6(o):
        return ((vals[o], vals[o + 1]), (vals[o + 2], vals[o + 3]),
                (vals[o + 4], vals[o + 5]))
    return (f6(0), f6(6))


def _f2_pow(p: int, beta: int, base: tuple, e: int) -> tuple:
    """(c0 + c1 u)^e in Fq2 = Fq[u]/(u^2 - beta), host bigints."""
    def mul(a, b):
        a0, a1 = a
        b0, b1 = b
        return ((a0 * b0 + beta * a1 * b1) % p, (a0 * b1 + a1 * b0) % p)
    r = (1, 0)
    while e:
        if e & 1:
            r = mul(r, base)
        base = mul(base, base)
        e >>= 1
    return r


_PAIR_CONST: dict = {}


def _pairing_constants(curve, mod):
    """Per-curve Miller/final-exp constants (cached: the psi-map Frobenius
    constants cost two 254-bit Fq2 exponentiations in host Python — ~2.5 ms
    per multi_pairing call when recomputed)."""
    cached = _PAIR_CONST.get(curve.name)
    if cached is not None:
        return cached
    from .. import pairing as PR
    x = curve.x_param
    if curve.name == "bn254":
        kind, s = 2, 6 * x + 2
    elif curve.name.startswith("bls12"):
        kind, s = (1 if x < 0 else 0), abs(x)
    else:
        _PAIR_CONST[curve.name] = None
        return None
    sbits = bytes(int(b) for b in bin(s)[2:])
    use_twist = (hasattr(mod, "miller_twist")
                 and os.environ.get("MPC_JELLYFISH_OLD_MILLER", "") != "1")
    m_twist, b2b, frob = 0, b"", b""
    if use_twist:
        p = curve.fq.p
        m_twist = 1 if PR._twist_type(curve) == "M" else 0
        b2b = _i2b(curve.b2[0] % p) + _i2b(curve.b2[1] % p)
        if kind == 2:
            # psi-map Frobenius constants for the BN last two add steps:
            # pi(psi(x,y)) = psi(conj(x) A1, conj(y) B1), A1 = xi^((p-1)/3),
            # B1 = xi^((p-1)/2) in Fq2 (D-twist; u2 = w^2, u3 = w^3)
            xi = PR._xi(curve)
            beta = curve.fq2_nonresidue
            a1 = _f2_pow(p, beta, xi, (p - 1) // 3)
            b1 = _f2_pow(p, beta, xi, (p - 1) // 2)
            frob = _i2b(a1[0]) + _i2b(a1[1]) + _i2b(b1[0]) + _i2b(b1[1])
    db = b"".join(_i2b(d) for d in PR._hard_part_digits(curve))
    out = (kind, sbits, use_twist, m_twist, b2b, frob, db)
    _PAIR_CONST[curve.name] = out
    return out


def multi_pairing(curve, g1s, g2s):
    """prod_i e(P_i, Q_i) as a Python f12 tuple, or None (fallback)."""
    got = _get_ctx(curve)
    if got is None:
        return None
    mod, ctx = got
    from .. import pairing as PR
    from . import fq_tower as T
    consts = _pairing_constants(curve, mod)
    if consts is None:
        return None
    kind, sbits, use_twist, m_twist, b2b, frob, db = consts
    f_acc = None
    for P, Q in zip(g1s, g2s):
        if P.inf or Q.inf:
            continue
        if use_twist:
            qb = (_i2b(Q.x[0]) + _i2b(Q.x[1])
                  + _i2b(Q.y[0]) + _i2b(Q.y[1]))
            fb = mod.miller_twist(ctx, kind, m_twist, sbits, b2b,
                                  _i2b(P.x) + _i2b(P.y), qb, frob)
        else:
            Qx, Qy = PR.untwist(curve, Q)
            fb = mod.miller(ctx, kind, sbits, _i2b(P.x) + _i2b(P.y),
                            _f12_bytes(Qx), _f12_bytes(Qy))
        f_acc = fb if f_acc is None else mod.f12_mul(ctx, f_acc, fb)
    if f_acc is None:
        return T.F12_ONE
    if kind == 2 and hasattr(mod, "final_exp_bn"):
        # BN x-chain hard part (Devegili et al.; ~3x fewer f12 ops than the
        # base-p multi-exp) with cyclotomic squarings
        x = curve.x_param
        xb = bytes(int(b) for b in bin(abs(x))[2:])
        out = mod.final_exp_bn(ctx, f_acc, xb, 1 if x < 0 else 0)
    else:
        out = mod.final_exp(ctx, f_acc, db)
    return _f12_from_bytes(out)


def pairing_check(curve, g1s, g2s):
    """prod e(P_i, Q_i) == 1, or None (fallback).

    The 2-pair BN case (every single-proof verify, verifier.rs:195-252)
    routes through the fused C entry `pair_check2`: both Miller loops run
    on two threads and share one final exponentiation, with a single
    Python<->C crossing instead of four."""
    if len(g1s) == 2 and len(g2s) == 2:
        r = pair_check2(curve, g1s, g2s)
        if r is not None:
            return r
    from . import fq_tower as T
    r = multi_pairing(curve, g1s, g2s)
    if r is None:
        return None
    return r == T.F12_ONE


# (curve name, Q bytes) -> precomputed Miller line buffer.  The verifier
# always pairs against the same two fixed G2 points ([1]_2 and the SRS
# beta_h), so this stays tiny; entries are process-internal Montgomery
# blobs, never persisted.
_PAIR_LINES_CACHE: dict = {}


def _pair_lines(curve, mod, ctx, kind, sbits, b2b, frob, qbytes):
    key = (curve.name, qbytes)
    lines = _PAIR_LINES_CACHE.get(key)
    if lines is None:
        lines = mod.pair_lines(ctx, kind, sbits, b2b, qbytes, frob)
        _PAIR_LINES_CACHE[key] = lines
    return lines


def pair_check2(curve, g1s, g2s):
    """e(P1,Q1)*e(P2,Q2) == 1 via the fused threaded C path, or None.

    The G2 points are fixed per verifying key, so their Miller-loop line
    coefficients are precomputed once (`pair_lines`) and the per-verify
    loop only pays f12 squarings + line multiplications
    (`pair_check2_pre`); the Q-side point chain (~1/3 of each iteration)
    drops out of the hot path."""
    got = _get_ctx(curve)
    if got is None:
        return None
    mod, ctx = got
    if not hasattr(mod, "pair_check2"):
        return None
    consts = _pairing_constants(curve, mod)
    if consts is None:
        return None
    kind, sbits, use_twist, m_twist, b2b, frob, _db = consts
    if kind != 2 or not use_twist:
        return None                      # BN-only fast path
    if any(getattr(q, "inf", False) for q in g2s):
        return None                      # infinite G2: generic path
    def _p65(pt):
        if pt.inf:
            return b"\x00" * 64 + b"\x01"
        return _i2b(pt.x) + _i2b(pt.y) + b"\x00"
    pts = b"".join(_p65(p_) for p_ in g1s)
    x = curve.x_param
    xb = bytes(int(b) for b in bin(abs(x))[2:])
    if hasattr(mod, "pair_check2_pre"):
        ls = []
        for q in g2s:
            qb = (_i2b(q.x[0]) + _i2b(q.x[1]) + _i2b(q.y[0])
                  + _i2b(q.y[1]))
            ls.append(_pair_lines(curve, mod, ctx, kind, sbits, b2b, frob,
                                  qb))
        return bool(mod.pair_check2_pre(ctx, kind, m_twist, sbits, pts,
                                        ls[0], ls[1], xb,
                                        1 if x < 0 else 0))
    qs = b"".join(_i2b(q.x[0]) + _i2b(q.x[1]) + _i2b(q.y[0]) + _i2b(q.y[1])
                  for q in g2s)
    return bool(mod.pair_check2(ctx, kind, m_twist, sbits, b2b, pts, qs,
                                frob, xb, 1 if x < 0 else 0))


# id(round_keys) -> (round_keys ref, serialized bytes); the ref pins the
# list so id() reuse is impossible
_RESCUE_RK_CACHE: dict = {}


def rescue_perm(p: int, round_keys, mds, alpha: int, alpha_inv: int, state):
    """One Rescue permutation (explicit key schedule) in C, or None.

    The Python fallback's inverse S-box is a ~254-bit bigint pow per
    element per even round (~60us each); C does it in ~20us with 4x64
    Montgomery muls."""
    got = _get_fr_ctx(p)
    if got is None:
        return None
    mod, ctx = got
    if not hasattr(mod, "rescue_perm") or not (3 <= alpha <= 0xFFFF):
        return None
    key = id(round_keys)
    ent = _RESCUE_RK_CACHE.get(key)
    if ent is None or ent[0] is not round_keys:
        rkb = b"".join(_i2b(int(v)) for row in round_keys for v in row)
        mdsb = b"".join(_i2b(int(v)) for row in mds for v in row)
        ent = (round_keys, rkb, mdsb)
        _RESCUE_RK_CACHE[key] = ent
    _, rkb, mdsb = ent
    stb = b"".join(_i2b(int(v) % p) for v in state)
    out = mod.rescue_perm(ctx, rkb, mdsb, alpha, _i2b(alpha_inv), stb)
    return [_b2i(out[i * 32:(i + 1) * 32]) for i in range(4)]


def fixed_base_powers(p: int, g, scalars):
    """[s_i * g] as AffinePoints via the C comb (SRS generation), or None."""
    got = _get_fr_ctx(p)
    if got is None:
        return None
    mod, ctx = got
    if not hasattr(mod, "fixed_base_powers"):
        return None
    from .ec_host import AffinePoint
    sb = b"".join(_i2b(int(s)) for s in scalars)
    out = mod.fixed_base_powers(ctx, _i2b(g.x), _i2b(g.y), sb)
    pts = []
    for i in range(len(scalars)):
        o = out[65 * i:65 * (i + 1)]
        if o[64]:
            pts.append(AffinePoint.infinity())
        else:
            pts.append(AffinePoint(_b2i(o[:32]), _b2i(o[32:64])))
    return pts
