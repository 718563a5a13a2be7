"""Plonk gate definitions: a gate is one row of selector values.

Mirrors the reference `Gate<F>` trait and its implementations
(`relation/src/gates/mod.rs:27-60`, `gates/arithmetic.rs`, `gates/logic.rs`,
`gates/ecc.rs`, `gates/lookup.rs`).  Selector layout (13 TurboPlonk
selectors + lookup extras):
    q_lc[4], q_mul[2], q_hash[4], q_o, q_c, q_ecc, [q_lookup]
plus UltraPlonk per-gate table metadata (q_dom_sep, table_key, table_dom_sep).

Selector values are Python ints mod the scalar field (host side); the
arithmetization converts the 13 selector columns to device limb tensors.
"""

from __future__ import annotations

GATE_WIDTH = 4
N_MUL_SELECTORS = 2
N_TURBO_PLONK_SELECTORS = 13


class Gate:
    """One constraint row.  Immutable after construction."""

    __slots__ = ("name", "q_lc", "q_mul", "q_hash", "q_ecc", "q_c", "q_o",
                 "q_lookup", "q_dom_sep", "table_key", "table_dom_sep")

    def __init__(self, name, q_lc=(0, 0, 0, 0), q_mul=(0, 0), q_hash=(0, 0, 0, 0),
                 q_ecc=0, q_c=0, q_o=0, q_lookup=0, q_dom_sep=0,
                 table_key=0, table_dom_sep=0):
        self.name = name
        self.q_lc = tuple(q_lc)
        self.q_mul = tuple(q_mul)
        self.q_hash = tuple(q_hash)
        self.q_ecc = q_ecc
        self.q_c = q_c
        self.q_o = q_o
        self.q_lookup = q_lookup
        self.q_dom_sep = q_dom_sep
        self.table_key = table_key
        self.table_dom_sep = table_dom_sep

    def __repr__(self):
        return self.name


# -- arithmetic gates (reference gates/arithmetic.rs) ------------------------

def PaddingGate():
    return Gate("Padding Gate")


def ConstantGate(c):
    return Gate("Constant Gate", q_c=c, q_o=1)


def AdditionGate():
    return Gate("Addition Gate", q_lc=(1, 1, 0, 0), q_o=1)


def ConstantAdditionGate(c):
    return Gate("Constant addition Gate", q_lc=(1, 0, 0, 0), q_c=c, q_o=1)


def SubtractionGate(p):
    return Gate("Subtraction Gate", q_lc=(1, p - 1, 0, 0), q_o=1)


def MultiplicationGate():
    return Gate("Multiplication Gate", q_mul=(1, 0), q_o=1)


def ConstantMultiplicationGate(c):
    return Gate("Mul constant Gate", q_lc=(c, 0, 0, 0), q_o=1)


def BoolGate():
    return Gate("Check Boolean Gate", q_mul=(1, 0), q_o=1)


def EqualityGate(p):
    return Gate("Check Equality Gate", q_lc=(1, p - 1, 0, 0), q_o=1)


def IoGate():
    return Gate("Public I/O Gate", q_o=1)


def FifthRootGate():
    return Gate("Raise to the inverse of 5 power Gate", q_hash=(1, 0, 0, 0), q_o=1)


def QuadPolyGate(q_lc, q_mul, q_o, q_c):
    return Gate("Deg-2 Polynomial Gate", q_lc=q_lc, q_mul=q_mul, q_o=q_o, q_c=q_c)


def LinCombGate(coeffs):
    return Gate("Linear Combination Gate", q_lc=coeffs, q_o=1)


def MulAddGate(coeffs):
    return Gate("Multiplication-then-addition Gate", q_mul=coeffs, q_o=1)


def CondSelectGate(p):
    return Gate("Conditional Selection Gate", q_lc=(0, 1, 0, 0), q_mul=(p - 1, 1), q_o=1)


# -- logic gates (reference gates/logic.rs) ----------------------------------

def LogicOrGate(p):
    return Gate("Logic OR Gate", q_lc=(1, 1, 0, 0), q_mul=(p - 1, 0), q_c=p - 1)


def LogicOrOutputGate(p):
    return Gate("Logic OR Value Gate", q_lc=(1, 1, 0, 0), q_mul=(p - 1, 0), q_o=1)


def MuxGate(p):
    return Gate("Mux Gate", q_lc=(0, 0, 0, 1), q_mul=(1, p - 1), q_o=1)


# -- ECC gates (reference gates/ecc.rs) --------------------------------------

def EdwardsCurveEquationGate(p, a, d):
    """a x^2 + y^2 = 1 + d x^2 y^2 on wires (x, x, y, y, one).

    Gate eq: q_c + q_mul0 x^2 + q_mul1 y^2 + q_ecc x^2 y^2 * 1 = 0 with
    q_mul = (-a, -1), q_c = 1, q_ecc = d (reference gates/ecc.rs:27-51).
    """
    return Gate("Curve Equation Gate",
                q_mul=((p - a) % p, p - 1), q_ecc=d % p, q_c=1, q_o=0)


def CurvePointXAdditionGate(p, a, d):
    """TE addition x-coord on wires (x1, y2, x2, y1, x3):
    x1 y2 + x2 y1 - d x1 x2 y1 y2 x3 = x3 (reference gates/ecc.rs:54-78)."""
    del a
    return Gate("Point Addition X-coordinate Gate",
                q_mul=(1, 1), q_ecc=(p - d) % p, q_o=1)


def CurvePointYAdditionGate(p, a, d):
    """TE addition y-coord on wires (x1, x2, y1, y2, y3):
    -a x1 x2 + y1 y2 + d x1 x2 y1 y2 y3 = y3 (reference gates/ecc.rs:81-104)."""
    return Gate("Point Addition Y-coordinate Gate",
                q_mul=((p - a) % p, 1), q_ecc=d % p, q_o=1)


def QuaternaryPointSelectXGate(p, x1, x2, x3):
    """Reference gates/ecc.rs:107: 2-bit point-select x-coordinate."""
    return Gate("Quaternary Point Select X Gate",
                q_lc=(x1 % p, x2 % p, 0, 0),
                q_mul=((x3 - x2 - x1) % p, 0), q_o=1)


def QuaternaryPointSelectYGate(p, y1, y2, y3):
    """Reference gates/ecc.rs:133: 2-bit point-select y-coordinate."""
    return Gate("Quaternary Point Select Y Gate",
                q_lc=((y1 - 1) % p, (y2 - 1) % p, 0, 0),
                q_mul=((1 + y3 - y2 - y1) % p, 0), q_c=1, q_o=1)


# -- lookup / proof-linking gates --------------------------------------------

def LookupGate(p, q_dom_sep, table_dom_sep, table_key):
    """UltraPlonk lookup gate (reference gates/lookup.rs:14)."""
    return Gate("UltraPlonk Lookup Gate", q_lookup=1, q_dom_sep=q_dom_sep,
                table_dom_sep=table_dom_sep, table_key=table_key)


def ProofLinkingGate():
    """a * 0 = 0 (reference gates/mod.rs:88)."""
    return Gate("Proof Linking Gate", q_mul=(1, 0))


# -- Rescue gadget gates (reference primitives/src/circuit/rescue/native.rs) --

def RescueAffineGate(matrix_row, constant):
    """out = <matrix_row, w[0..4]> + constant (native.rs:60-82)."""
    return Gate("Affine gate", q_lc=tuple(matrix_row), q_c=constant, q_o=1)


def Power5NonLinearGate(matrix_row, constant):
    """out = <matrix_row, w[0..4]^5> + constant (native.rs:89-111)."""
    return Gate("Non linear gate", q_hash=tuple(matrix_row), q_c=constant,
                q_o=1)
