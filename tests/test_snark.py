"""SNARK layer: BLS12-381 tower/pairing and Groth16 prove/verify.

Covers the capability the reference gets from ark-groth16 + ark-bls12-381
(`/root/reference/falcon-r1cs/examples/pok_sig.rs:30-47`): completeness,
public-input binding, and tamper rejection, plus the algebraic
preconditions (group orders, pairing bilinearity) that make the proof
system sound.
"""

import random

import pytest

from falcon_r1cs_tpu.r1cs.coo import CompiledR1CS
from falcon_r1cs_tpu.r1cs.system import ConstraintSystem
from falcon_r1cs_tpu.snark import bls12_381 as bls
from falcon_r1cs_tpu.snark import fr
from falcon_r1cs_tpu.snark.groth16 import (
    Proof,
    SetupToxic,
    prove,
    setup,
    verify,
)
from falcon_r1cs_tpu.snark.qap import witness_map

rng = random.Random(1234)


# --- field tower ----------------------------------------------------------


def _rand_fq2():
    return (rng.randrange(bls.P), rng.randrange(bls.P))


def _rand_fq6():
    return (_rand_fq2(), _rand_fq2(), _rand_fq2())


def _rand_fq12():
    return (_rand_fq6(), _rand_fq6())


def test_fq2_field_axioms():
    for _ in range(20):
        a, b, c = _rand_fq2(), _rand_fq2(), _rand_fq2()
        assert bls.f2_mul(a, bls.f2_mul(b, c)) == bls.f2_mul(bls.f2_mul(a, b), c)
        assert bls.f2_mul(a, bls.f2_add(b, c)) == bls.f2_add(
            bls.f2_mul(a, b), bls.f2_mul(a, c)
        )
        assert bls.f2_sqr(a) == bls.f2_mul(a, a)
        if a != bls.FQ2_ZERO:
            assert bls.f2_mul(a, bls.f2_inv(a)) == bls.FQ2_ONE


def test_fq6_fq12_mul_inv():
    for _ in range(5):
        a, b = _rand_fq6(), _rand_fq6()
        assert bls.f6_mul(a, b) == bls.f6_mul(b, a)
        assert bls.f6_mul(a, bls.f6_inv(a)) == bls.FQ6_ONE
        x, y = _rand_fq12(), _rand_fq12()
        assert bls.f12_mul(x, y) == bls.f12_mul(y, x)
        assert bls.f12_mul(x, bls.f12_inv(x)) == bls.FQ12_ONE
        assert bls.f12_sqr(x) == bls.f12_mul(x, x)


def test_fq2_sqrt():
    for _ in range(10):
        a = _rand_fq2()
        sq = bls.f2_sqr(a)
        s = bls.f2_sqrt(sq)
        assert s is not None and bls.f2_sqr(s) == sq


# --- curve groups ---------------------------------------------------------


def test_generator_orders():
    g1 = bls.g1_from_affine(bls.G1_GEN)
    assert bls.g1_mul(g1, bls.R) is None
    g2 = bls.g2_from_affine(bls.G2_GEN)
    assert bls.g2_mul(g2, bls.R) is None


def test_group_law_consistency():
    g1 = bls.g1_from_affine(bls.G1_GEN)
    # (a+b)G == aG + bG, and affine stays on curve
    a, b = rng.randrange(bls.R), rng.randrange(bls.R)
    lhs = bls.g1_mul(g1, (a + b) % bls.R)
    rhs = bls.g1_add(bls.g1_mul(g1, a), bls.g1_mul(g1, b))
    assert bls.g1_to_affine(lhs) == bls.g1_to_affine(rhs)
    assert bls.g1_is_on_curve(bls.g1_to_affine(lhs))
    g2 = bls.g2_from_affine(bls.G2_GEN)
    lhs2 = bls.g2_mul(g2, (a + b) % bls.R)
    rhs2 = bls.g2_add(bls.g2_mul(g2, a), bls.g2_mul(g2, b))
    assert bls.g2_to_affine(lhs2) == bls.g2_to_affine(rhs2)
    assert bls.g2_is_on_curve(bls.g2_to_affine(lhs2))


# --- pairing --------------------------------------------------------------


def test_pairing_bilinear():
    a, b = 1234567, 7654321
    Pa = bls.g1_to_affine(bls.g1_mul(bls.g1_from_affine(bls.G1_GEN), a))
    Qb = bls.g2_to_affine(bls.g2_mul(bls.g2_from_affine(bls.G2_GEN), b))
    e = bls.pairing(bls.G1_GEN, bls.G2_GEN)
    assert e != bls.FQ12_ONE
    assert bls.f12_pow(e, bls.R) == bls.FQ12_ONE
    assert bls.pairing(Pa, Qb) == bls.f12_pow(e, a * b % bls.R)


def test_multi_pairing_cancellation():
    negg = bls.g1_to_affine(bls.g1_neg(bls.g1_from_affine(bls.G1_GEN)))
    out = bls.multi_pairing([(bls.G1_GEN, bls.G2_GEN), (negg, bls.G2_GEN)])
    assert out == bls.FQ12_ONE


def test_frobenius_is_q_power():
    a = _rand_fq12()
    assert bls.f12_frobenius(a) == bls.f12_pow(a, bls.P)
    assert bls.f12_frobenius(bls.f12_frobenius(a)) == bls.f12_pow(a, bls.P**2)


def test_cyclotomic_square_matches_generic():
    # easy part maps any element into the cyclotomic subgroup
    a = _rand_fq12()
    f = bls.f12_mul(bls.f12_conj(a), bls.f12_inv(a))
    f = bls.f12_mul(bls.f12_frobenius(bls.f12_frobenius(f)), f)
    assert bls.f12_pow(f, bls.P**4 - bls.P**2 + 1) == bls.FQ12_ONE
    assert bls.f12_cyclotomic_sqr(f) == bls.f12_sqr(f)


def test_final_exponentiation_matches_naive():
    a = _rand_fq12()
    assert bls.final_exponentiation(a) == bls.final_exponentiation_naive(a)


# --- Fr / FFT -------------------------------------------------------------


def test_fft_roundtrip_and_eval():
    dom = fr.Domain(13)  # size 16
    coeffs = [rng.randrange(bls.R) for _ in range(dom.size)]
    evals = dom.fft(coeffs)
    # spot-check against Horner at omega^3
    x = pow(dom.omega, 3, bls.R)
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % bls.R
    assert evals[3] == acc
    assert dom.ifft(evals) == coeffs


def test_coset_fft_vanishing():
    dom = fr.Domain(8)
    g = 5
    coeffs = [rng.randrange(bls.R) for _ in range(dom.size)]
    ce = dom.coset_fft(coeffs, g)
    x = g * pow(dom.omega, 2, bls.R) % bls.R
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % bls.R
    assert ce[2] == acc
    assert dom.coset_ifft(ce, g) == coeffs
    assert dom.vanishing_on_coset(g) == (pow(g, dom.size, bls.R) - 1) % bls.R


def test_lagrange_at_tau():
    dom = fr.Domain(7)  # size 8
    tau = rng.randrange(bls.R)
    lag = dom.lagrange_coeffs_at(tau)
    # sum L_j(tau) * f(omega^j) == f(tau) for a random poly f
    coeffs = [rng.randrange(bls.R) for _ in range(dom.size)]
    evals = dom.fft(coeffs)
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * tau + c) % bls.R
    assert sum(l * e for l, e in zip(lag, evals)) % bls.R == acc


# --- Groth16 end-to-end ---------------------------------------------------


def _toy_circuit():
    """x^3 + x + 5 = out, witness x = 3, public out = 35."""
    cs = ConstraintSystem(mode="prove")
    x = cs.new_witness_variable(3)
    out = cs.new_input_variable(35)
    x2 = cs.new_witness_variable(9)
    x3 = cs.new_witness_variable(27)
    one = 0
    cs.enforce_constraint({x: 1}, {x: 1}, {x2: 1})
    cs.enforce_constraint({x2: 1}, {x: 1}, {x3: 1})
    cs.enforce_constraint({x3: 1, x: 1, one: 5}, {one: 1}, {out: 1})
    assert cs.is_satisfied()
    return CompiledR1CS.from_cs(cs), [1, 35, 3, 9, 27]


def test_witness_map_top_coeff_zero():
    compiled, assignment = _toy_circuit()
    _h, top = witness_map(compiled, assignment)
    assert top == 0
    # unsatisfying assignment has nonzero top coefficient
    bad = list(assignment)
    bad[2] = 4
    _h, top = witness_map(compiled, bad)
    assert top != 0


@pytest.fixture(scope="module")
def toy_proof():
    compiled, assignment = _toy_circuit()
    tox = SetupToxic(tau=11, alpha=12, beta=13, gamma=14, delta=15)
    pk = setup(compiled, toxic=tox, use_native=False)
    proof = prove(pk, compiled, assignment, r=21, s=22, use_native=False)
    return pk, proof


def test_groth16_completeness(toy_proof):
    pk, proof = toy_proof
    assert verify(pk.vk, [1, 35], proof)


def test_groth16_rejects_wrong_public_input(toy_proof):
    pk, proof = toy_proof
    assert not verify(pk.vk, [1, 36], proof)
    assert not verify(pk.vk, [2, 35], proof)  # one-wire must be 1
    assert not verify(pk.vk, [1], proof)


def test_groth16_rejects_tampered_proof(toy_proof):
    pk, proof = toy_proof
    assert not verify(pk.vk, [1, 35], Proof(a=proof.c, b=proof.b, c=proof.a))
    twog = bls.g1_to_affine(bls.g1_mul(bls.g1_from_affine(proof.a), 2))
    assert not verify(pk.vk, [1, 35], Proof(a=twog, b=proof.b, c=proof.c))


def test_groth16_unsatisfying_assignment_raises(toy_proof):
    pk, _ = toy_proof
    compiled, assignment = _toy_circuit()
    bad = list(assignment)
    bad[3] = 10
    with pytest.raises(AssertionError):
        prove(pk, compiled, bad, r=1, s=2, use_native=False)


def test_groth16_proof_is_randomized():
    compiled, assignment = _toy_circuit()
    tox = SetupToxic(tau=31, alpha=32, beta=33, gamma=34, delta=35)
    pk = setup(compiled, toxic=tox, use_native=False)
    p1 = prove(pk, compiled, assignment, r=1, s=2, use_native=False)
    p2 = prove(pk, compiled, assignment, r=3, s=4, use_native=False)
    assert p1.a != p2.a and p1.c != p2.c
    assert verify(pk.vk, [1, 35], p1) and verify(pk.vk, [1, 35], p2)
