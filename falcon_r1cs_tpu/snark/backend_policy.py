"""Measured G1-MSM backend policy (round 5, VERDICT r4 #4).

`groth16.prove(g1_backend="auto")` used to mean "native C when built";
this module makes the decision an explicit, measured, testable policy.

The measured facts behind the constants (BASELINE.md, falcon-512
h_query shape n_pad = 2^17, bit-identical outputs across backends):

  host C (4-core AVX512-IFMA Pippenger):  0.157-0.190 s/MSM
  TPU Pallas wide-tree (K=1):             0.185 s/MSM device (round 5)
  TPU Pallas wide-tree K-fold:            182.4-182.8 ms/MSM device at
                                          K=4/8 (flat); wall through
                                          the tunnel 665-691 vs host
                                          157-165 in the same runs
                                          (BASELINE.md K-fold row)

On THIS host the native backend wins at every measured K — the one v5e
chip's VPU peak (560 M modmul/s) exceeds the host's 385 M/s, but the
host pays no sort/scatter glue and no serial tree latency, so its
end-to-end MSM stays ~1.1x ahead only at its very best runs (it is SLOWER than the chip on its typical 190-230 ms runs, but the wall through THIS dev tunnel adds the digit upload, so the conservative choice stands).  `TPU_WINS_FROM_K` therefore stays
None ("no measured K-fold crossover"); if a future measurement finds
one, setting it here flips `prove`/`prove_batch` automatically at that
batch width.  The TPU engine remains (a) the scale-out path — chips
scale with the mesh while host cores are fixed — and (b) the backend
of record when the native library is absent but Mosaic passes.

Env override (wins outright): FALCON_R1CS_TPU_G1_BACKEND =
native | tpu | python.

Reference anchor: examples/pok_sig.rs:30-31 — the reference's prover
backend is decided at link time by cargo features; here it is a
runtime, measurement-backed decision.
"""

from __future__ import annotations

import os

# smallest K (batched proofs over one CRS) at which the TPU K-fold MSM
# beats the host C backend per-MSM on this host; None = no measured
# crossover (the host C wins at every K measured so far — BASELINE.md)
TPU_WINS_FROM_K: int | None = None

_VALID = ("native", "tpu", "python")


def choose_g1_backend(
    native_available: bool,
    pallas_ok: bool,
    K: int = 1,
) -> str:
    """Resolve "auto" to a concrete G1-MSM backend.

    Pure function of its inputs (hermetically tested in
    tests/test_backend_policy.py); callers feed in availability facts
    so no probe runs unless its answer can change the outcome.
    """
    env = os.environ.get("FALCON_R1CS_TPU_G1_BACKEND")
    if env:
        if env not in _VALID:
            raise ValueError(
                f"FALCON_R1CS_TPU_G1_BACKEND={env!r}: want one of {_VALID}"
            )
        return env
    if native_available and (TPU_WINS_FROM_K is None or K < TPU_WINS_FROM_K):
        return "native"
    if pallas_ok:
        return "tpu"
    if native_available:
        return "native"
    return "python"
