"""Curve and field constants for the supported pairing curves.

Reference parity: the arkworks curve configs consumed by the reference
(`ark-bn254`, `ark-bls12-381`; see `plonk/Cargo.toml:12-40`).  Constants are
standard published parameters for BN254 (alt_bn128) and BLS12-381.
"""

from __future__ import annotations

from dataclasses import dataclass

from .ops.field import FieldSpec

# ---------------------------------------------------------------------------
# BN254 (alt_bn128)
# ---------------------------------------------------------------------------

BN254_FR_MOD = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BN254_FQ_MOD = 21888242871839275222246405745257275088696311157297823662689037894645226208583

# arkworks ark-bn254 generators: Fr generator = 5, Fq generator = 3
BN254_FR = FieldSpec(name="bn254_fr", p=BN254_FR_MOD, num_limbs=16, generator=5)
BN254_FQ = FieldSpec(name="bn254_fq", p=BN254_FQ_MOD, num_limbs=16, generator=3)

# ---------------------------------------------------------------------------
# BLS12-381
# ---------------------------------------------------------------------------

BLS12_381_FR_MOD = 52435875175126190479447740508185965837690552500527637822603658699938581184513
BLS12_381_FQ_MOD = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

# arkworks ark-bls12-381 generators: Fr generator = 7, Fq generator = 2
BLS12_381_FR = FieldSpec(name="bls12_381_fr", p=BLS12_381_FR_MOD, num_limbs=16, generator=7)
BLS12_381_FQ = FieldSpec(name="bls12_381_fq", p=BLS12_381_FQ_MOD, num_limbs=24, generator=2)


@dataclass(frozen=True)
class CurveSpec:
    """Short-Weierstrass pairing curve: y^2 = x^3 + b over Fq, subgroup order r.

    G2 lives over Fq2 = Fq[u]/(u^2 - nonresidue); pairing runs host-side.
    """

    name: str
    fq: FieldSpec       # base field
    fr: FieldSpec       # scalar field
    b: int              # curve coefficient (G1)
    g1_gen: tuple       # (x, y) ints
    # G2: coefficients as Fq2 elements (c0, c1)
    b2: tuple
    g2_gen: tuple       # ((x0, x1), (y0, y1))
    fq2_nonresidue: int  # u^2 = nonresidue  (-1 for both curves here)
    x_param: int        # curve family parameter (for pairing loop)
    # embedding degree: 12 (BN/BLS12: G2 over Fq2, Fq12 pairing) or 6
    # (BW6: G2 is a sextic twist over Fq itself — stored with zero
    # imaginary parts so the generic G2 group ops apply — and the pairing
    # routes to pairing_bw6.py's Fq6 tower)
    k_embed: int = 12

    def __hash__(self):
        return hash(self.name)


BN254 = CurveSpec(
    name="bn254",
    fq=BN254_FQ,
    fr=BN254_FR,
    b=3,
    g1_gen=(1, 2),
    # G2 generator and b2 = 3/(9+u), standard alt_bn128 parameters
    b2=(
        19485874751759354771024239261021720505790618469301721065564631296452457478373,
        266929791119991161246907387137283842545076965332900288569378510910307636690,
    ),
    g2_gen=(
        (
            10857046999023057135944570762232829481370756359578518086990519993285655852781,
            11559732032986387107991004021392285783925812861821192530917403151452391805634,
        ),
        (
            8495653923123431417604973247489272438418190587263600148770280649306958101930,
            4082367875863433681332203403145435568316851327593401208105741076214120093531,
        ),
    ),
    fq2_nonresidue=BN254_FQ_MOD - 1,  # u^2 = -1
    x_param=4965661367192848881,
)

BLS12_381 = CurveSpec(
    name="bls12_381",
    fq=BLS12_381_FQ,
    fr=BLS12_381_FR,
    b=4,
    g1_gen=(
        0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
        0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
    ),
    b2=(4, 4),  # b2 = 4*(1+u)
    g2_gen=(
        (
            0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
            0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
        ),
        (
            0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
            0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
        ),
    ),
    fq2_nonresidue=BLS12_381_FQ_MOD - 1,  # u^2 = -1
    x_param=-0xD201000000010000,
)

# ---------------------------------------------------------------------------
# BLS12-377 (the recursion-friendly inner curve: G1 cofactor divisible by 4,
# so G1 has a twisted-Edwards form — reference `gadgets/ecc/conversion.rs:62`
# and the `plonk/src/circuit/plonk_verifier` tests run on it).
# All constants below derive from x = 0x8508c00000000001 via the BLS12 family
# formulas (r = x^4-x^2+1, q = (x-1)^2 r/3 + x) and are verified by
# subgroup-order checks in scripts/derive_bls377.py-style derivations.
# ---------------------------------------------------------------------------

BLS12_377_FR_MOD = 8444461749428370424248824938781546531375899335154063827935233455917409239041
BLS12_377_FQ_MOD = 258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458177

BLS12_377_FR = FieldSpec(name="bls12_377_fr", p=BLS12_377_FR_MOD,
                         num_limbs=16, generator=22)
BLS12_377_FQ = FieldSpec(name="bls12_377_fq", p=BLS12_377_FQ_MOD,
                         num_limbs=24, generator=15)

BLS12_377 = CurveSpec(
    name="bls12_377",
    fq=BLS12_377_FQ,
    fr=BLS12_377_FR,
    b=1,
    g1_gen=(
        81937999373150964239938255573465948239988671502647976594219695644855304257327692006745978603320413799295628339695,
        241266749859715473739788878240585681733927191168601896383759122102112907357779751001206799952863815012735208165030,
    ),
    # D-twist E': y^2 = x^3 + 1/u (u^2 = -5): b2 = (0, -1/5)
    b2=(0, 155198655607781456406391640216936120121836107652948796323930557600032281009004493664981332883744016074664192874906),
    g2_gen=(
        (
            67004216521362769139960304638241662463384504912045095543649118964167831559549275276665917802324363056069254155209,
            188039100033830534835560926333495938812099884491688240598849896699685545777288948680356069069856197422355451241144,
        ),
        (
            212961125199539672632481864692443889005842964580434572770814582520396590909323644956646137861647360575214633605398,
            67625758907332218457243685014278362134590189520408250963023412301547932120327362287218456798771752606845621278268,
        ),
    ),
    fq2_nonresidue=BLS12_377_FQ_MOD - 5,  # u^2 = -5
    x_param=0x8508C00000000001,
)

# register the non-default quadratic nonresidue for the host tower
from .utils import fq_tower as _T  # noqa: E402
_T.set_beta(BLS12_377_FQ_MOD, -5)

# ---------------------------------------------------------------------------
# BW6-761 (reference bench curve, bench.md:17,25; upstream dep ark-bw6-761):
# the one-layer-composition outer curve of BLS12-377 — its scalar field IS
# BLS12-377's base field, so BLS12-377 proofs can be verified in a BW6-761
# circuit natively.  E: y^2 = x^3 - 1 over a 761-bit prime; k = 6; G2 is the
# sextic M-twist y^2 = x^3 + 4 over Fq itself (twist scalar zeta = -4).
# Every constant below is derived from the shared seed x = 0x8508c00000000001
# and VERIFIED in-environment by scripts/derive_bw6_761.py: seed-polynomial
# cross-check against the pinned BLS12-377 moduli, 64-round Miller-Rabin on
# p, CM order derivation via Cornacchia (4p = t^2 + 3y^2) with random-point
# order validation, and exact-order-r generator checks.
# ---------------------------------------------------------------------------

BW6_761_FQ_MOD = 6891450384315732539396789682275657542479668912536150109513790160209623422243491736087683183289411687640864567753786613451161759120554247759349511699125301598951605099378508850372543631423596795951899700429969112842764913119068299
BW6_761_FR_MOD = BLS12_377_FQ_MOD   # outer-curve scalar field == inner Fq

BW6_761_FQ = FieldSpec(name="bw6_761_fq", p=BW6_761_FQ_MOD,
                       num_limbs=48, generator=2)
BW6_761_FR = BLS12_377_FQ           # same field object: kernels/caches shared

BW6_761 = CurveSpec(
    name="bw6_761",
    fq=BW6_761_FQ,
    fr=BW6_761_FR,
    b=BW6_761_FQ_MOD - 1,           # y^2 = x^3 - 1
    g1_gen=(
        5121082781502305659180673370797932802982723165543122975335209418297923345190975559367024470794567213188867624617939698818627134048004915564891369096213721202693630090148097888923493708182442885908076346607300083583163982163789167,
        3936891438836912583780051937508657570812555345221986954460153541952284123191322673907692687918062549220672207508016306900511821136915723707181225276750353973961376292016478674329987421847947883311993206004548631860683957877121757,
    ),
    # sextic M-twist over Fq: y^2 = x^3 + 4 (zeta = b2/b = -4); coords are
    # embedded as Fq2 values with zero imaginary parts
    b2=(4, 0),
    g2_gen=(
        (4299495046121976197967899669570453663523609133273326781652351086315825538613647196868186765217397067654540962955975840176693419657193486845273767814170238104346390446211356851381676719718477415944688400098442139983341339355564981, 0),
        (5390068907621955088169558704058566111636841949933812064258391788701969884935470780815806205108266591280868872340793447961301446566465351736303970166703756567269434202182284388197563290670801062112376259336491499915806321277334517, 0),
    ),
    fq2_nonresidue=BW6_761_FQ_MOD - 1,  # unused for k=6 (zero-imag coords)
    x_param=0x8508C00000000001,
    k_embed=6,
)

CURVES = {"bn254": BN254, "bls12_381": BLS12_381, "bls12_377": BLS12_377,
          "bw6_761": BW6_761}
