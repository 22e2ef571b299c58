"""Per-gadget golden-count tests: the bit-exactness cost contract
(SURVEY.md section 2.2 / section 7 hard part 1, built before circuits).

Where the reference's doc-comment costs disagree with what its published
circuit totals force, the forced value is the golden one (see
falcon_r1cs_tpu/gadgets/range_proofs.py docstring)."""

import numpy as np
import pytest

from falcon_r1cs_tpu import (
    Boolean,
    ConstraintSystem,
    FpVar,
    Q,
)
from falcon_r1cs_tpu.gadgets import (
    add_mod,
    enforce_less_than_1024,
    enforce_less_than_norm_bound,
    enforce_less_than_q,
    inner_product_mod,
    is_less_than_6144,
    l2_norm_var,
    mod_q,
    mul_mod,
    ntt_param_var,
    sub_mod,
    vector_matrix_mul_mod,
)
from falcon_r1cs_tpu.params import FALCON_512, FALCON_1024


def _deltas(cs, fn):
    i0, w0, c0 = cs.counters()
    out = fn()
    i1, w1, c1 = cs.counters()
    return (i1 - i0, w1 - w0, c1 - c0), out


def _setup(value=5):
    cs = ConstraintSystem(validate=False)
    a = FpVar.new_witness(cs, value)
    qv = FpVar.constant(cs, Q)
    return cs, a, qv


def test_mod_q_cost():
    cs, a, qv = _setup(123456)
    d, _ = _deltas(cs, lambda: mod_q(cs, a, qv))
    assert d == (0, 29, 30)


def test_mul_mod_cost():
    # doc comment says 30 (`arithmetics.rs:155`) but the a*b product wire
    # makes it 31/30; no circuit calls mul_mod so no golden total pins it
    cs, a, qv = _setup()
    b = FpVar.new_witness(cs, 7)
    d, _ = _deltas(cs, lambda: mul_mod(cs, a, b, qv))
    assert d == (0, 30, 31)


def test_add_mod_cost():
    cs, a, qv = _setup()
    b = FpVar.new_witness(cs, 7)
    d, _ = _deltas(cs, lambda: add_mod(cs, a, b, qv))
    assert d == (0, 29, 30)


def test_sub_mod_cost():
    cs, a, qv = _setup()
    b = FpVar.new_witness(cs, 3)
    d, _ = _deltas(cs, lambda: sub_mod(cs, a, b, qv))
    assert d == (0, 30, 31)


@pytest.mark.parametrize("length", [2, 8, 512])
def test_inner_product_mod_cost(length):
    cs = ConstraintSystem(validate=False)
    a = [FpVar.new_witness(cs, i % Q) for i in range(length)]
    b = [FpVar.new_witness(cs, (i * 3) % Q) for i in range(length)]
    qv = FpVar.constant(cs, Q)
    d, _ = _deltas(cs, lambda: inner_product_mod(cs, a, b, qv))
    assert d == (0, 29 + length, 30 + length)


def test_vector_matrix_mul_mod_cost():
    cs = ConstraintSystem(validate=False)
    a = [FpVar.new_witness(cs, i) for i in range(4)]
    b = [[FpVar.new_witness(cs, (i + j) % Q) for i in range(4)] for j in range(3)]
    qv = FpVar.constant(cs, Q)
    d, _ = _deltas(cs, lambda: vector_matrix_mul_mod(cs, a, b, qv))
    assert d == (0, (29 + 4) * 3, (30 + 4) * 3)


def test_enforce_less_than_q_cost():
    cs, a, qv = _setup(42)
    d, _ = _deltas(cs, lambda: enforce_less_than_q(cs, a))
    assert d == (0, 27, 29)


def test_enforce_less_than_1024_cost():
    cs, a, qv = _setup(42)
    d, _ = _deltas(cs, lambda: enforce_less_than_1024(cs, a))
    assert d == (0, 10, 11)


def test_is_less_than_6144_cost():
    cs, a, qv = _setup(42)
    d, _ = _deltas(cs, lambda: is_less_than_6144(cs, a))
    assert d == (0, 16, 17)


def test_norm_bound_512_cost():
    cs, a, qv = _setup(42)
    d, _ = _deltas(cs, lambda: enforce_less_than_norm_bound(cs, a, FALCON_512))
    assert d == (0, 50, 52)


def test_norm_bound_1024_cost():
    cs, a, qv = _setup(42)
    d, _ = _deltas(cs, lambda: enforce_less_than_norm_bound(cs, a, FALCON_1024))
    assert d == (0, 52, 54)


def test_l2_norm_cost_per_coeff():
    cs = ConstraintSystem(validate=False)
    coeffs = [FpVar.new_witness(cs, v) for v in (5, 12000, 6143)]
    qv = FpVar.constant(cs, Q)
    d, _ = _deltas(cs, lambda: l2_norm_var(cs, coeffs, qv))
    assert d == (0, 18 * 3, 19 * 3)


def test_ntt_param_var_free():
    cs = ConstraintSystem()
    d, out = _deltas(cs, lambda: ntt_param_var(cs, FALCON_512))
    assert d == (0, 0, 0)  # constants allocate nothing
    assert len(out) == 512


def test_wire_ops_costs():
    """The Appendix C anchors: LC ops free; mul 1/1; is_eq 3 cns / 2 wit;
    select 1/1; boolean alloc 1/1."""
    cs = ConstraintSystem()
    a = FpVar.new_witness(cs, 3)
    b = FpVar.new_witness(cs, 4)
    k = FpVar.constant(cs, 9)
    d, _ = _deltas(cs, lambda: (a + b, a - b, a.double(), a * k, k * k))
    assert d == (0, 0, 0)
    d, _ = _deltas(cs, lambda: a * b)
    assert d == (0, 1, 1)
    d, _ = _deltas(cs, lambda: a.enforce_equal(b))
    assert d == (0, 0, 1)
    d, _ = _deltas(cs, lambda: a.is_eq(b))
    assert d == (0, 2, 3)
    d, _ = _deltas(cs, lambda: a.is_zero())
    assert d == (0, 2, 3)
    cond = Boolean.new_witness(cs, True)
    d, _ = _deltas(cs, lambda: FpVar.conditionally_select(cond, a, b))
    assert d == (0, 1, 1)
    x = Boolean.new_witness(cs, True)
    y = Boolean.new_witness(cs, False)
    d, _ = _deltas(cs, lambda: x.and_(y))
    assert d == (0, 1, 1)
    d, _ = _deltas(cs, lambda: x.or_(y))
    assert d == (0, 1, 1)
    d, _ = _deltas(cs, lambda: (x.not_(), x.is_eq(Boolean.FALSE(cs))))
    assert d == (0, 0, 0)
    d, _ = _deltas(cs, lambda: x.enforce_equal(Boolean.TRUE(cs)))
    assert d == (0, 0, 1)
    bits = [Boolean.new_witness(cs, i % 2 == 0) for i in range(12)]
    d, _ = _deltas(cs, lambda: Boolean.kary_or(bits))
    assert d == (0, 11, 11)
    d, _ = _deltas(cs, lambda: Boolean.kary_and(bits))
    assert d == (0, 11, 11)
