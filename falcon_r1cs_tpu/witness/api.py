"""Unified per-circuit witness API: engine + interleaver + packer lookup.

    from falcon_r1cs_tpu.witness import circuit_witness
    cw = circuit_witness(FalconNTTVerificationCircuit, 512)
    seg = cw.engine(sig, pk_ntt, hm_ntt)     # batched device engine
    packed = cw.pack(seg)                     # (B, W, limbs) u32 export
    flat = cw.interleave(seg)                 # host object-int parity view
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from ..circuits import (
    FalconDualNTTVerificationCircuit,
    FalconNTTVerificationCircuit,
    FalconSchoolBookVerificationCircuit,
)
from ..params import get_params


@dataclass(frozen=True)
class CircuitWitness:
    """Bundled witness machinery for one circuit family + parameter set.

    engine inputs (all (B, n) int32):
      verify-ntt:  (sig lifted to [0,q), pk_ntt, hm_ntt)
      dual-ntt:    (sig SIGNED, pk_ntt, hm_ntt)
      schoolbook:  (sig lifted, pk coefficients, hm coefficients)
    """

    n: int
    engine: Callable
    interleave: Callable
    pack: Callable
    export_limbs: int


def circuit_witness(circuit_cls, n: int | None = None) -> CircuitWitness:
    params = get_params(n)
    n = params.n
    if circuit_cls is FalconNTTVerificationCircuit:
        from .engine import jitted_engine
        from .export_device import packer_ntt
        from .layout import interleave_witness

        return CircuitWitness(
            n=n,
            engine=jitted_engine(n),
            interleave=lambda seg: interleave_witness(_np(seg), params),
            pack=packer_ntt(n),
            export_limbs=5,
        )
    if circuit_cls is FalconDualNTTVerificationCircuit:
        from .engine_dual import interleave_witness_dual, jitted_engine_dual
        from .export_device import packer_dual

        return CircuitWitness(
            n=n,
            engine=jitted_engine_dual(n),
            interleave=lambda seg: interleave_witness_dual(_np(seg), params),
            pack=packer_dual(n),
            export_limbs=5,
        )
    if circuit_cls is FalconSchoolBookVerificationCircuit:
        from .engine_schoolbook import (
            interleave_witness_schoolbook,
            jitted_engine_schoolbook,
        )
        from .export_device import packer_schoolbook

        return CircuitWitness(
            n=n,
            engine=jitted_engine_schoolbook(n),
            interleave=lambda seg: interleave_witness_schoolbook(
                _np(seg), params
            ),
            pack=packer_schoolbook(n),
            export_limbs=8,
        )
    raise TypeError(f"no witness machinery for {circuit_cls!r}")


def _np(seg: dict) -> dict:
    import numpy as np

    return {k: np.asarray(v) for k, v in seg.items()}
