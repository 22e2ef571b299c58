"""Proof-of-knowledge-of-signature pipeline: the analog of the reference's
`examples/pok_sig.rs` (`/root/reference/falcon-r1cs/examples/pok_sig.rs`).

The reference runs Groth16 setup/prove/verify over arkworks; a SNARK prover
is out of scope for the TPU framework's north-star metric (SURVEY.md
section 2.3, ark-groth16 row), so this example exercises the equivalent
end-to-end pipeline with our components:

  keygen-free instance -> circuit synthesis (setup mode = Groth16 setup's
  synthesis pass) -> batched device witness generation -> public-input
  construction in the contract order (pk_ntt || hm_ntt) -> device CRT
  satisfiability check (the "verify" of the R1CS layer) -> artifact export
  of (A, B, C, witness) for an external prover.
"""

import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from falcon_r1cs_tpu import FalconNTTVerificationCircuit
from falcon_r1cs_tpu.falcon import ntt
from falcon_r1cs_tpu.params import FALCON_512
from falcon_r1cs_tpu.parallel.sat_check import ResidueSystem
from falcon_r1cs_tpu.r1cs.coo import compile_circuit
from falcon_r1cs_tpu.witness import interleave_witness, jitted_engine


def main():
    rng = np.random.default_rng(0)
    params = FALCON_512

    # real keygen + deterministic signing (the reference's pok_sig flow:
    # `pok_sig.rs:15-21`), then clear verification
    from falcon_r1cs_tpu.falcon import KeyPair, instance_from_signature

    t0 = time.time()
    keypair = KeyPair.generate(rng, params)
    msg = b"testing message"
    sig = keypair.signer.sign_with_seed(b"test seed", msg)
    assert keypair.verify(msg, sig)
    print(f"keygen+sign+verify: {time.time()-t0:.2f}s "
          f"(|s2|max={abs(sig.s2).max()})")
    inst = instance_from_signature(keypair.h, msg, sig.nonce, sig.s2, params)

    # circuit-specific "setup": shape-only synthesis -> compiled COO
    t0 = time.time()
    compiled = compile_circuit(FalconNTTVerificationCircuit, inst)
    print(f"setup (trace+compile, cached): {time.time()-t0:.2f}s; "
          f"{compiled.num_constraints} constraints, nnz={compiled.nnz()}")

    # "prove": generate the full witness on device
    sig = inst.sig_lifted[None].astype(np.int32)
    pk_ntt = ntt(inst.h)[None].astype(np.int32)
    hm_ntt = ntt(inst.hm)[None].astype(np.int32)
    run = jitted_engine(params.n)
    seg = {k: np.asarray(v) for k, v in run(sig, pk_ntt, hm_ntt).items()}
    wit = interleave_witness(seg, params)

    # public inputs in the contract order: one || pk_ntt || hm_ntt
    public_inputs = np.concatenate(
        [[1], seg["pk_ntt"][0], seg["hm_ntt"][0]]
    ).astype(object)
    assignment = np.concatenate([public_inputs, wit[0]])[None]

    # "verify": the R1CS satisfiability check on device
    rs = ResidueSystem(compiled)
    ok = rs.is_satisfied(assignment)
    print(f"R1CS satisfied: {bool(ok[0])}")
    assert ok[0]


if __name__ == "__main__":
    main()
