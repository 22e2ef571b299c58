"""Falcon signing: Babai nearest-plane over the NTRU lattice basis.

Completes the capability the reference gets from falcon-rust's
`SecretKey::sign_with_seed` (FFI into Falcon C ffSampling; SURVEY.md
section 2.3).  Signatures here are produced with the DETERMINISTIC
fast-Babai nearest-plane against the full 2n-dimensional basis

    B = [[rot(g), rot(-f)], [rot(G), rot(-F)]],   target c = (hm | 0),

using one QR factorization per key (float64) and an O(n^2) reduction per
message.  Nearest-plane error is +-1/2 per Gram-Schmidt direction, so the
resulting norms are comfortably below beta^2 (empirically ~10x margin --
smaller than ffSampling's randomized norms; the randomization in real
Falcon exists for key privacy under signature exposure, not for validity).
SECURITY NOTE: deterministic nearest-plane signatures leak the lattice
Gram-Schmidt directions under many-signature exposure; these are test
vectors for the verification circuits, not a production signer.

Verification-side compatibility is exact: s1 + s2*h = hm (mod q) holds by
construction for any integer lattice point, so these signatures verify
under the standard Falcon verification equation and wire codecs.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from ..params import FalconParams, Q
from .hash_to_point import NONCE_LEN, hash_to_point
from .keygen import SecretKey


def _rot_matrix(p: list[int], n: int) -> np.ndarray:
    """Negacyclic rotation matrix: row i = coefficients of x^i * p."""
    out = np.zeros((n, n), dtype=np.float64)
    pa = np.asarray(p, dtype=np.float64)
    for i in range(n):
        out[i, i:] = pa[: n - i]
        if i:
            out[i, :i] = -pa[n - i :]
    return out


@dataclass
class Signature:
    s2: np.ndarray          # signed signature coefficients
    nonce: bytes

    def nonce_bytes(self) -> bytes:  # falcon-rust `Signature::nonce` parity
        return self.nonce


class Signer:
    """Per-key signing state: basis + QR, built once."""

    def __init__(self, sk: SecretKey):
        self.sk = sk
        self.params = sk.params
        n = self.params.n
        neg = lambda p: [-c for c in p]
        top = np.hstack([_rot_matrix(sk.g, n), _rot_matrix(neg(sk.f), n)])
        bot = np.hstack([_rot_matrix(sk.G, n), _rot_matrix(neg(sk.F), n)])
        self.basis = np.vstack([top, bot])          # (2n, 2n)
        # rows b_i = columns of basis.T = Q R
        self.q_mat, self.r_mat = np.linalg.qr(self.basis.T)
        if np.any(np.abs(np.diag(self.r_mat)) < 1e-9):
            raise ValueError("degenerate basis")

    def _nearest_plane(self, c: np.ndarray) -> np.ndarray:
        """Babai nearest-plane: lattice vector v = z B closest-ish to c."""
        dim = c.shape[0]
        tq = c @ self.q_mat
        z = np.zeros(dim)
        rdiag = np.diag(self.r_mat)
        for i in range(dim - 1, -1, -1):
            zi = np.rint(tq[i] / rdiag[i])
            if zi:
                z[i] = zi
                tq -= zi * self.r_mat[:, i]
        return z @ self.basis

    def sign(self, msg: bytes, nonce: bytes) -> Signature:
        n = self.params.n
        hm = hash_to_point(msg, nonce, n)
        c = np.concatenate([hm.astype(np.float64), np.zeros(n)])
        v = self._nearest_plane(c)
        s = np.rint(c - v).astype(np.int64)
        s1, s2 = s[:n], s[n:]
        norm = int(np.sum(s1 * s1) + np.sum(s2 * s2))
        if norm >= self.params.sig_l2_bound:
            raise ValueError(f"signature norm {norm} exceeds bound")
        return Signature(s2=s2, nonce=nonce)

    def sign_with_seed(self, seed: bytes, msg: bytes) -> Signature:
        """Deterministic signing (falcon-rust `sign_with_seed` parity,
        `/root/reference/falcon-r1cs/src/circuits/falcon_ntt.rs:136-138`):
        the nonce is derived as SHAKE256(seed || msg)[:40]."""
        nonce = hashlib.shake_256(seed + msg).digest(NONCE_LEN)
        return self.sign(msg, nonce)


@dataclass
class KeyPair:
    """falcon-rust `KeyPair` parity: keygen + secret/public halves."""

    secret_key: SecretKey
    signer: Signer
    h: np.ndarray

    @classmethod
    def generate(
        cls, rng: np.random.Generator, params: FalconParams
    ) -> "KeyPair":
        from .keygen import keygen

        sk = keygen(rng, params)
        signer = Signer(sk)
        return cls(secret_key=sk, signer=signer, h=sk.h())

    def verify(self, msg: bytes, sig: Signature) -> bool:
        from .instances import verify

        return verify(self.h, msg, sig.nonce, sig.s2, self.secret_key.params)
