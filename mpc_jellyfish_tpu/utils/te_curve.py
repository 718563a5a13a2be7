"""Twisted Edwards curve arithmetic (host) - Baby Jubjub (ed-on-bn254).

Mirror of the arkworks TE configs the reference signs over
(`primitives/src/signatures/schnorr.rs` uses `Config: TECurveConfig`).
Complete Edwards addition formulas; exact Python ints.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TECurve:
    """a*x^2 + y^2 = 1 + d*x^2*y^2 over Fq; prime-order subgroup of size l."""
    name: str
    q: int          # base field modulus
    a: int
    d: int
    order: int      # prime subgroup order (scalar field)
    cofactor: int
    gen: tuple      # subgroup generator (x, y)

    def is_on_curve(self, pt) -> bool:
        x, y = pt
        return ((self.a * x * x + y * y) % self.q
                == (1 + self.d * x * x % self.q * y * y) % self.q)

    def add(self, p1, p2):
        q = self.q
        x1, y1 = p1
        x2, y2 = p2
        x1x2 = x1 * x2 % q
        y1y2 = y1 * y2 % q
        dxy = self.d * x1x2 % q * y1y2 % q
        x3 = (x1 * y2 + y1 * x2) * pow(1 + dxy, -1, q) % q
        y3 = (y1y2 - self.a * x1x2) * pow(1 - dxy, -1, q) % q
        return (x3, y3)

    def neg(self, p):
        return ((-p[0]) % self.q, p[1])

    def mul(self, p, k: int):
        k %= self.order * self.cofactor
        result, base = self.identity, p
        while k:
            if k & 1:
                result = self.add(result, base)
            base = self.add(base, base)
            k >>= 1
        return result

    @property
    def identity(self):
        return (0, 1)

    def is_identity(self, pt) -> bool:
        return pt == (0, 1)


# Baby Jubjub (arkworks ed_on_bn254): standard published parameters.
BABY_JUBJUB = TECurve(
    name="ed_on_bn254",
    q=21888242871839275222246405745257275088548364400416034343698204186575808495617,
    a=168700,
    d=168696,
    order=2736030358979909402780800718157159386076813972158567259200215660948447373041,
    cofactor=8,
    gen=(
        5299619240641551281634865583518297030282874472190772894086521144482721001553,
        16950150798460657717958625567821834550301663161624707787222815936182638968203,
    ),
)


# Bandersnatch (arkworks ed_on_bls12_381_bandersnatch): the GLV-endowed TE
# curve over BLS12-381's scalar field (eprint 2021/1152).  Used by the GLV
# gadget (relation/src/gadgets/ecc/glv.rs).
BANDERSNATCH = TECurve(
    name="ed_on_bls12_381_bandersnatch",
    q=52435875175126190479447740508185965837690552500527637822603658699938581184513,
    a=52435875175126190479447740508185965837690552500527637822603658699938581184508,
    d=45022363124591815672509500913686876175488063829319466900776701791074614335719,
    order=13108968793781547619861935127046491459309155893440570251786403306729687672801,
    cofactor=4,
    gen=(
        18886178867200960497001835917649091219057080094937609519140440539760939937304,
        19188667384257783945677642223292697773471335439753913231509108946878080696678,
    ),
)


# BLS12-377 G1 in twisted-Edwards form (a = -1): the recursion circuit's
# native curve — inner-curve commitments are converted SW->TE
# (relation/src/gadgets/ecc/conversion.rs:62-96) and all in-circuit point
# arithmetic runs on this curve.  (a, d) derived from the published
# (s, alpha, beta) conversion constants and verified homomorphic.
BLS12_377_G1_TE = TECurve(
    name="bls12_377_g1_te",
    q=258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458177,
    a=258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458176,
    d=122268283598675559488486339158635529096981886914877139579534153582033676785385790730042363341236035746924960903179,
    order=8444461749428370424248824938781546531375899335154063827935233455917409239041,
    cofactor=30631250834960419227450344600217059328,
    gen=(
        71222569531709137229370268896323705690285216175189308202338047559628438110820800641278662592954630774340654489393,
        6177051365529633638563236407038680211609544222665285371549726196884440490905471891908272386851767077598415378235,
    ),
)
