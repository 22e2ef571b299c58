"""Gadget good/bad/random-path tests, mirroring the reference's macro-driven
pattern (SURVEY.md section 4 item 1: satisfiable AND unsatisfiable witnesses
plus randomized sweeps, e.g.
`/root/reference/falcon-r1cs/src/gadgets/arithmetics.rs:311-590`,
`/root/reference/falcon-r1cs/src/gadgets/range_proofs.rs:359-648`)."""

import numpy as np
import pytest

from falcon_r1cs_tpu import Boolean, ConstraintSystem, FpVar, Q
from falcon_r1cs_tpu.gadgets import (
    add_mod,
    enforce_less_than_1024,
    enforce_less_than_norm_bound,
    enforce_less_than_q,
    inner_product_mod,
    is_less_than_6144,
    mod_q,
    mul_mod,
    sub_mod,
)
from falcon_r1cs_tpu.params import FALCON_512, FALCON_1024

import os

# the reference uses 1000 random trials per gadget; default trimmed for
# suite runtime, FALCON_TPU_TEST_TRIALS=1000 restores full density
N_RANDOM = int(os.environ.get("FALCON_TPU_TEST_TRIALS", "200"))


def check_mod_q(a, b, satisfied):
    cs = ConstraintSystem(validate=False)
    a_var = FpVar.new_witness(cs, a)
    qv = FpVar.constant(cs, Q)
    b_var = mod_q(cs, a_var, qv)
    b_var2 = FpVar.new_witness(cs, b)
    b_var.enforce_equal(b_var2)
    assert cs.is_satisfied() == satisfied
    assert (b_var._val() == b % cs.p) == satisfied


def test_mod_q_paths(rng):
    check_mod_q(6, 6, True)
    check_mod_q(0, 0, True)
    check_mod_q(Q, 0, True)
    check_mod_q(Q + 1, 1, True)
    check_mod_q(6, 7, False)
    check_mod_q(5, Q - 1, False)
    for _ in range(N_RANDOM):
        t = int(rng.integers(0, 1 << 30))
        check_mod_q(t, t % Q, True)
        check_mod_q(t, (t + 1) % Q, False)


def check_binop(op, a, b, c, satisfied):
    cs = ConstraintSystem(validate=False)
    a_var = FpVar.new_witness(cs, a)
    b_var = FpVar.new_witness(cs, b)
    qv = FpVar.constant(cs, Q)
    c_var = op(cs, a_var, b_var, qv)
    c_var2 = FpVar.new_witness(cs, c)
    c_var.enforce_equal(c_var2)
    assert cs.is_satisfied() == satisfied


def test_mul_mod_paths():
    test = lambda a, b, c, s: check_binop(mul_mod, a, b, c, s)
    test(6, 7, 42, True)
    test(0, 100, 0, True)
    test(100, 0, 0, True)
    test(5, 12288, 12284, True)
    test(6, 7, 41, False)
    test(5, 12288, 12283, False)


def test_add_mod_paths(rng):
    test = lambda a, b, c, s: check_binop(add_mod, a, b, c, s)
    test(6, 36, 42, True)
    test(0, 100, 100, True)
    test(5, Q - 1, 4, True)
    test(6, 7, 41, False)
    test(5, Q - 1, 3, False)
    for _ in range(N_RANDOM):
        t1 = int(rng.integers(0, 1 << 30))
        t2 = int(rng.integers(0, 1 << 30))
        test(t1, t2, (t1 + t2) % Q, True)
        test(t1, t2, (t1 + t2 + 1) % Q, False)


def test_sub_mod_paths(rng):
    test = lambda a, b, c, s: check_binop(sub_mod, a, b, c, s)
    test(78, 36, 42, True)
    test(0, 0, 0, True)
    test(100, 0, 100, True)
    test(0, 100, 12189, True)
    test(6, 7, 41, False)
    for _ in range(N_RANDOM):
        t1 = int(rng.integers(0, Q))
        t2 = int(rng.integers(0, 1 << 30))
        test(t1, t2, (t1 - t2) % Q, True)
        test(t1, t2, (t1 - t2 + 1) % Q, False)


@pytest.mark.parametrize("log_dim", range(1, 10))
def test_inner_product_mod_matches_clear(rng, log_dim):
    dim = 1 << log_dim
    cs = ConstraintSystem(validate=False)
    a = rng.integers(0, Q, size=dim)
    b = rng.integers(0, Q, size=dim)
    c = int(np.dot(a, b) % Q)
    a_var = [FpVar.new_witness(cs, int(x)) for x in a]
    b_var = [FpVar.new_witness(cs, int(x)) for x in b]
    qv = FpVar.constant(cs, Q)
    c_var = inner_product_mod(cs, a_var, b_var, qv)
    assert c_var._val() == c
    c_var.enforce_equal(FpVar.new_witness(cs, c))
    assert cs.is_satisfied()
    # bad path
    c_var.enforce_equal(FpVar.new_witness(cs, (c + 1) % Q))
    assert not cs.is_satisfied()


def check_range(fn, value, satisfied):
    cs = ConstraintSystem(validate=False)
    a_var = FpVar.new_witness(cs, value)
    fn(cs, a_var)
    assert cs.is_satisfied() == satisfied, value


def test_less_than_q_paths(rng):
    for v, s in [(42, True), (0, True), (1 << 12, True), (1 << 13, True),
                 (Q - 1, True), (Q, False), (Q + 1, False),
                 (Q * 10000, False)]:
        check_range(enforce_less_than_q, v, s)
    for _ in range(N_RANDOM):
        t = int(rng.integers(0, 1 << 15))
        check_range(enforce_less_than_q, t, t < Q)


def test_less_than_1024_paths(rng):
    for v, s in [(42, True), (0, True), (1023, True), (1024, False),
                 (1025, False), (Q, False)]:
        check_range(enforce_less_than_1024, v, s)
    for _ in range(N_RANDOM):
        t = int(rng.integers(0, 2048))
        check_range(enforce_less_than_1024, t, t < 1024)


@pytest.mark.parametrize(
    "params,extra",
    [
        (FALCON_512, [(1 << 26, False)]),
        (FALCON_1024, [(1 << 26, True)]),
    ],
)
def test_norm_bound_paths(rng, params, extra):
    bound = params.sig_l2_bound
    fn = lambda cs, a: enforce_less_than_norm_bound(cs, a, params)
    cases = [
        (42, True), (0, True), (1 << 25, True), (1 << 24, True),
        (bound - 1, True), (bound, False), (bound + 1, False),
        (1 << 27, False),
    ] + extra
    for v, s in cases:
        check_range(fn, v, s)
    for _ in range(N_RANDOM):
        t = int(rng.integers(0, 1 << 27))
        check_range(fn, t, t < bound)


def test_is_less_than_6144_paths(rng):
    def check(value, satisfied):
        cs = ConstraintSystem(validate=False)
        a_var = FpVar.new_witness(cs, value)
        flag = is_less_than_6144(cs, a_var)
        flag.enforce_equal(Boolean.TRUE(cs))
        assert cs.is_satisfied() == satisfied, value

    for v, s in [(42, True), (0, True), (6143, True), (6144, False),
                 (6145, False), (Q, False)]:
        check(v, s)
    for _ in range(N_RANDOM):
        t = int(rng.integers(0, 1 << 15))
        check(t, t < 6144)


def test_validate_flag_guards():
    """The runtime analog of the #[cfg(not(test))] panic guards."""
    cs = ConstraintSystem(validate=True)
    a_var = FpVar.new_witness(cs, Q + 5)
    with pytest.raises(ValueError):
        enforce_less_than_q(cs, a_var)
