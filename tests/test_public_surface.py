"""Dead-but-exported API parity (SURVEY.md Appendix A item 4): the
reference exports gadgets never used by its circuits; they are part of the
public surface and must work."""

import numpy as np
import pytest

from falcon_r1cs_tpu import ConstraintSystem, FpVar, Q
from falcon_r1cs_tpu.circuits import const_q_power_vars
from falcon_r1cs_tpu.falcon import Polynomial
from falcon_r1cs_tpu.gadgets import NTTPolyVar, PolyVar, inv_ntt_param_var, ntt_param_var
from falcon_r1cs_tpu.params import FALCON_512


def _poly_vars(cs, rng, n=8, cls=PolyVar):
    vals = rng.integers(0, Q, size=n)
    return vals, cls.alloc_vars(cs, vals, "witness")


def test_elementwise_add_mul_no_reduction(rng):
    cs = ConstraintSystem(validate=False)
    a_vals, a = _poly_vars(cs, rng)
    b_vals, b = _poly_vars(cs, rng)
    c = a + b  # free LCs (`poly.rs:14-25`)
    assert cs.num_constraints == 0
    assert [x._val() for x in c.coeff()] == [
        int(x + y) for x, y in zip(a_vals, b_vals)
    ]
    d = a * b  # one mul wire per coeff (`poly.rs:27-38`)
    assert cs.num_constraints == len(a_vals)
    assert [x._val() for x in d.coeff()] == [
        int(x) * int(y) % cs.p for x, y in zip(a_vals, b_vals)
    ]


def test_enforce_product_and_sum(rng):
    cs = ConstraintSystem(validate=False)
    a_vals, a = _poly_vars(cs, rng)
    b_vals, b = _poly_vars(cs, rng)
    prod_vals = [int(x) * int(y) % cs.p for x, y in zip(a_vals, b_vals)]
    c = PolyVar([FpVar.new_witness(cs, v) for v in prod_vals])
    PolyVar.enforce_product(a, b, c)
    sum_vals = [int(x + y) for x, y in zip(a_vals, b_vals)]
    d = PolyVar([FpVar.new_witness(cs, v) for v in sum_vals])
    PolyVar.enforce_sum(a, b, d)
    assert cs.is_satisfied()
    # bad path
    cs.witness_values[-1] = (cs.witness_values[-1] + 1) % cs.p
    assert not cs.is_satisfied()


def test_nttpolyvar_mod_q(rng):
    """`NTTPolyVar::mod_q` (`poly.rs:83-90`): 30 constraints per coeff."""
    cs = ConstraintSystem(validate=False)
    vals = rng.integers(0, 1 << 30, size=4)
    v = NTTPolyVar([FpVar.new_witness(cs, int(x)) for x in vals])
    qv = FpVar.constant(cs, Q)
    before = cs.num_constraints
    reduced = v.mod_q(cs, qv)
    assert cs.num_constraints - before == 30 * 4
    assert [x._val() for x in reduced.coeff()] == [int(x) % Q for x in vals]
    assert cs.is_satisfied()


def test_inv_ntt_param_var_reproduces_reference_bug():
    """`inv_ntt_param_var` returns the FORWARD table in the reference
    (`misc.rs:80-90`, dead code); reproduced verbatim."""
    cs = ConstraintSystem()
    fwd = ntt_param_var(cs, FALCON_512)
    inv = inv_ntt_param_var(cs, FALCON_512)
    assert [v.const for v in inv] == [v.const for v in fwd]


def test_polynomial_rand(rng):
    p = Polynomial.rand(rng, 512)
    assert p.coeffs.shape == (512,)
    assert p.coeffs.min() >= 0 and p.coeffs.max() < Q
