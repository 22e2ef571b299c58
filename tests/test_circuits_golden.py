"""Golden-count regression + satisfiability for the three circuits.

The six published totals (`/root/reference/README.md:41-56`) are the
bit-exactness contract (BASELINE.md).  Dual-NTT counts are ours, captured
per SURVEY.md section 6 (the reference prints but never published them)."""

import numpy as np
import pytest

from falcon_r1cs_tpu import (
    ConstraintSystem,
    FalconDualNTTVerificationCircuit,
    FalconNTTVerificationCircuit,
    FalconSchoolBookVerificationCircuit,
    Q,
)
from falcon_r1cs_tpu.circuits import const_q_power_vars
from falcon_r1cs_tpu.falcon import ntt
from falcon_r1cs_tpu.gadgets import NTTPolyVar, PolyVar, ntt_param_var
from falcon_r1cs_tpu.params import FALCON_512, FALCON_1024

GOLDEN = {
    (512, "ntt_conversion"): (0, 14848, 15360),
    (512, "verify_ntt"): (1025, 78386, 81460),
    (512, "verify_schoolbook"): (1025, 312882, 315956),
    (1024, "ntt_conversion"): (0, 29696, 30720),
    (1024, "verify_ntt"): (2049, 156724, 162870),
    (1024, "verify_schoolbook"): (2049, 1150004, 1156150),
    # ours (unpublished upstream):
    (512, "verify_dual_ntt"): (1025, 95286, 96828),
    (1024, "verify_dual_ntt"): (2049, 190520, 193598),
}


@pytest.mark.parametrize("params", [FALCON_512, FALCON_1024])
def test_ntt_conversion_counts_and_values(rng, params):
    """The analog of count_ntt_conversion_constraints
    (`/root/reference/falcon-r1cs/examples/constraint_counts.rs:74-113`)."""
    cs = ConstraintSystem()
    param_vars = ntt_param_var(cs, params)
    poly = rng.integers(0, Q, size=params.n)
    poly_var = PolyVar.alloc_vars(cs, poly, "witness")
    const_vars = const_q_power_vars(cs, params)
    before = cs.counters()
    out_var = NTTPolyVar.ntt_circuit(cs, poly_var, const_vars, param_vars, params)
    after = cs.counters()
    deltas = tuple(a - b for a, b in zip(after, before))
    assert deltas == GOLDEN[(params.n, "ntt_conversion")]
    clear = ntt(poly)
    assert [v._val() for v in out_var.coeff()] == [int(x) for x in clear]
    assert cs.is_satisfied()


CIRCUITS = {
    "verify_ntt": FalconNTTVerificationCircuit,
    "verify_dual_ntt": FalconDualNTTVerificationCircuit,
    "verify_schoolbook": FalconSchoolBookVerificationCircuit,
}


@pytest.mark.parametrize("name", list(CIRCUITS))
def test_circuit_512(inst_512, name):
    cs = ConstraintSystem()
    CIRCUITS[name].build_circuit(inst_512).generate_constraints(cs)
    got = (cs.num_instance_variables, cs.num_witness_variables, cs.num_constraints)
    assert got == GOLDEN[(512, name)]
    assert cs.is_satisfied()


@pytest.mark.parametrize("name", list(CIRCUITS))
def test_circuit_1024(inst_1024, name):
    cs = ConstraintSystem()
    CIRCUITS[name].build_circuit(inst_1024).generate_constraints(cs)
    got = (cs.num_instance_variables, cs.num_witness_variables, cs.num_constraints)
    assert got == GOLDEN[(1024, name)]
    assert cs.is_satisfied()


def test_public_input_order(inst_512):
    """Public-input order contract: one wire, then pk_ntt then hm_ntt
    (`falcon_ntt.rs:63-67`, `pok_sig.rs:38-44`; SURVEY.md Appendix A 12)."""
    cs = ConstraintSystem()
    FalconNTTVerificationCircuit.build_circuit(inst_512).generate_constraints(cs)
    pk_ntt = ntt(inst_512.h)
    hm_ntt = ntt(inst_512.hm)
    inst_vals = cs.instance_values
    assert inst_vals[0] == 1
    assert inst_vals[1 : 513] == [int(x) for x in pk_ntt]
    assert inst_vals[513 : 1025] == [int(x) for x in hm_ntt]


def test_tampered_witness_unsatisfiable(inst_512):
    """Circuit integration negative path: corrupt one witness value."""
    cs = ConstraintSystem()
    FalconNTTVerificationCircuit.build_circuit(inst_512).generate_constraints(cs)
    assert cs.is_satisfied()
    cs.witness_values[0] = (cs.witness_values[0] + 1) % cs.p
    assert not cs.is_satisfied()


def test_setup_mode_shape_matches_prove_mode(inst_512):
    """The trace/compile split (SURVEY.md section 3.2): setup mode must
    produce the identical constraint skeleton without touching values."""
    cs_setup = ConstraintSystem(mode="setup")
    FalconNTTVerificationCircuit.build_circuit(inst_512).generate_constraints(cs_setup)
    cs_prove = ConstraintSystem()
    FalconNTTVerificationCircuit.build_circuit(inst_512).generate_constraints(cs_prove)
    assert cs_setup.counters() == cs_prove.counters()
    assert all(v is None for v in cs_setup.witness_values)
