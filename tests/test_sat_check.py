"""Device CRT satisfiability checker vs the exact host oracle."""

import numpy as np
import pytest

from falcon_r1cs_tpu import (
    ConstraintSystem,
    FalconDualNTTVerificationCircuit,
    FalconNTTVerificationCircuit,
)
from falcon_r1cs_tpu.parallel.sat_check import ResidueSystem, crt_primes
from falcon_r1cs_tpu.r1cs.coo import CompiledR1CS


def test_crt_primes_cover_bound():
    primes = crt_primes()
    prod = 1
    for p in primes:
        prod *= p
    # conservative integer-row bound (sat_check.py docstring)
    assert prod > 2**331
    assert all(p < 2**15 for p in primes)


def _compiled(inst, cls):
    cs = ConstraintSystem()
    cls.build_circuit(inst).generate_constraints(cs)
    return cs, CompiledR1CS.from_cs(cs)


def test_checker_matches_oracle_ntt(inst_512):
    cs, comp = _compiled(inst_512, FalconNTTVerificationCircuit)
    assert len(comp.field_rows) == 0  # flagship circuit is integer-exact
    rs = ResidueSystem(comp)
    assign = np.asarray([cs.full_assignment()], dtype=object)
    assert rs.is_satisfied(assign)[0]
    assert comp.is_satisfied_host(list(assign[0]))
    # corrupt a few positions; the checker must catch each
    for pos in (comp.num_instance, comp.num_instance + 5000, -1):
        bad = np.array(assign)
        bad[0, pos] = int(bad[0, pos]) + 1
        assert not rs.is_satisfied(bad)[0]
        assert not comp.is_satisfied_host(list(bad[0]))


def test_checker_field_rows_dual(inst_512):
    cs, comp = _compiled(inst_512, FalconDualNTTVerificationCircuit)
    assert len(comp.field_rows) == 2  # the two is_zero multiplier rows
    rs = ResidueSystem(comp)
    assign = np.asarray([cs.full_assignment()], dtype=object)
    assert rs.is_satisfied(assign)[0]
    # corrupt a multiplier-adjacent witness (the is_zero bit): field-row path
    bad = np.array(assign)
    # flip the pos*neg accumulated product's first mul wire
    bad[0, comp.num_instance + 2 * 512] = (
        int(bad[0, comp.num_instance + 2 * 512]) + 1
    )
    assert not rs.is_satisfied(bad)[0]


def test_compiled_roundtrip(tmp_path, inst_512):
    cs, comp = _compiled(inst_512, FalconNTTVerificationCircuit)
    path = tmp_path / "c.r1cs"
    comp.save(path)
    loaded = CompiledR1CS.load(path)
    assert loaded.num_constraints == comp.num_constraints
    assert loaded.nnz() == comp.nnz()
    assert np.array_equal(loaded.a[0], comp.a[0])
    assert list(loaded.a[2][:5]) == list(comp.a[2][:5])


def test_export_roundtrip(tmp_path, inst_512):
    """Standard-format (A, B, C, witness) export: numpy-native npz."""
    from falcon_r1cs_tpu.params import FIELD_MODULUS
    from falcon_r1cs_tpu.r1cs.export import (
        export_r1cs,
        export_witness,
        load_r1cs_arrays,
    )

    cs, comp = _compiled(inst_512, FalconNTTVerificationCircuit)
    path = export_r1cs(comp, tmp_path / "c512")
    z = load_r1cs_arrays(path)
    assert list(z["header"]) == [1025, 78386, 81460, 8]
    # field modulus reconstructs
    p = 0
    for k in range(7, -1, -1):
        p = (p << 32) + int(z["field_modulus_limbs"][k])
    assert p == FIELD_MODULUS
    # a random A value reconstructs mod p
    i = 1234
    v = 0
    for k in range(7, -1, -1):
        v = (v << 32) + int(z["a_vals"][i, k])
    assert v == int(comp.a[2][i]) % FIELD_MODULUS
    assert len(z["a_rows"]) == len(comp.a[0])

    wit = np.zeros((1, 4, 8), dtype=np.uint32)
    path2 = export_witness(np.zeros((1, 2, 8), dtype=np.uint32), wit,
                           tmp_path / "w512")
    loaded = np.load(path2)
    assert loaded["witness"].shape == (1, 4, 8)


def test_checker_catches_random_corruptions(rng, inst_512):
    """Soundness sweep: any single corrupted assignment entry must flip the
    verdict (50 random positions, random deltas)."""
    cs, comp = _compiled(inst_512, FalconNTTVerificationCircuit)
    rs = ResidueSystem(comp)
    assign = np.asarray([cs.full_assignment()], dtype=object)
    assert rs.is_satisfied(assign)[0]
    V = comp.num_variables
    for _ in range(50):
        pos = int(rng.integers(1, V))  # skip the one-wire
        delta = int(rng.integers(1, 1 << 20))
        bad = np.array(assign)
        bad[0, pos] = (int(bad[0, pos]) + delta) % comp.p
        assert not rs.is_satisfied(bad)[0], (pos, delta)


def test_export_interop_plain_numpy(tmp_path, inst_512):
    """An external consumer with ONLY numpy must be able to load the
    artifact and verify a constraint row mod p."""
    from falcon_r1cs_tpu.r1cs.export import export_r1cs

    cs, comp = _compiled(inst_512, FalconNTTVerificationCircuit)
    path = export_r1cs(comp, tmp_path / "x")

    # --- pure-numpy consumer (no falcon_r1cs_tpu imports below) ---------
    z = np.load(path)
    num_inst, num_wit, nc, L = (int(v) for v in z["header"])

    def limbs_to_int(limbs):
        v = 0
        for k in range(len(limbs) - 1, -1, -1):
            v = (v << 32) + int(limbs[k])
        return v

    p = limbs_to_int(z["field_modulus_limbs"])
    assignment = [v % p for v in cs.full_assignment()]  # from the prover

    row = 12345  # a mod_q equality row
    lhs = {}
    for name in ("a", "b", "c"):
        sel = z[f"{name}_rows"] == row
        acc = 0
        for col, limbs in zip(z[f"{name}_cols"][sel], z[f"{name}_vals"][sel]):
            acc += limbs_to_int(limbs) * assignment[int(col)]
        lhs[name] = acc % p
    assert lhs["a"] * lhs["b"] % p == lhs["c"]
