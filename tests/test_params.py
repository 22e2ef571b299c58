"""NTT table ground truth: our first-principles tables must equal the
Falcon C `vrfy.c` tables recorded (Montgomery form) in the reference's
codegen script `/root/reference/script/ntt_param.sage` after division by
R = 2^16 mod q = 4091 (`ntt_param.sage:132,263`)."""

import re

import pytest

from falcon_r1cs_tpu.params import (
    FALCON_512,
    FALCON_1024,
    FIELD_MODULUS,
    Q,
    bitrev,
    get_params,
    inv_ntt_table,
    ntt_table,
)

SAGE_PATH = "/root/reference/script/ntt_param.sage"


def _sage_table(name):
    src = open(SAGE_PATH).read()
    m = re.search(name + r"\s*=\s*\[(.*?)\]", src, re.S)
    return [int(x) for x in re.findall(r"\d+", m.group(1))]


def test_forward_table_matches_falcon_c():
    mont = _sage_table("forward")
    assert len(mont) == 1024
    r_inv = pow(4091, -1, Q)
    plain = [x * r_inv % Q for x in mont]
    assert list(ntt_table(1024)) == plain


def test_reverse_table_matches_falcon_c():
    """The C reverse table is the inverse-root table scaled by n^-1 folding
    conventions; at minimum each plain entry must be a power of psi^-1.  We
    check the exact relationship used by our intt: entry i of our table is
    psi^-bitrev(i)."""
    mont = _sage_table("reverse")
    assert len(mont) == 1024
    r_inv = pow(4091, -1, Q)
    plain = [x * r_inv % Q for x in mont]
    # Falcon's iGMb table: iGMb[i] = psi^-bitrev(i) (plain form after /R)
    assert list(inv_ntt_table(1024)) == plain


def test_table_512_is_prefix_of_1024():
    assert ntt_table(512) == ntt_table(1024)[:512]


def test_q_structure():
    assert Q == 12289 == (1 << 13) + (1 << 12) + 1
    assert (Q - 1) % 2048 == 0  # primitive 2048th roots exist


def test_params_lookup():
    assert get_params(512) is FALCON_512
    assert get_params(1024) is FALCON_1024
    with pytest.raises(ValueError):
        get_params(256)


def test_const_q_powers():
    p = FALCON_512
    cw = p.const_q_powers
    assert len(cw) == p.log_n + 1
    assert cw[0] == Q
    for x in range(1, p.log_n + 2):
        assert cw[x - 1] == (1 << (x - 1)) * Q**x
    # bound-tracking invariant: max intermediate far below the field modulus
    assert 2**FALCON_1024.log_n * Q ** (FALCON_1024.log_n + 1) < FIELD_MODULUS


def test_sig_l2_bounds():
    # Appendix A item 2: the 1024 bound is 70265242, not the stale 34034726
    assert FALCON_512.sig_l2_bound == 34034726
    assert FALCON_1024.sig_l2_bound == 70265242
    assert FALCON_512.sig_l2_bound == 0b10000001110101010000100110
    assert FALCON_1024.sig_l2_bound == 0b100001100000010100110011010


def test_bitrev():
    assert bitrev(1, 10) == 512
    assert bitrev(0b1100000000, 10) == 0b11
