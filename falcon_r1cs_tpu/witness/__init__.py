"""Batched witness engine: execute-phase twin of the trace layer."""

from .engine import WitnessBatch, generate_witness_ntt, jitted_engine
from .layout import (
    bound_width,
    export_witness_limbs,
    interleave_witness,
    num_witness,
)

__all__ = [
    "WitnessBatch",
    "bound_width",
    "export_witness_limbs",
    "generate_witness_ntt",
    "interleave_witness",
    "jitted_engine",
    "num_witness",
]

from .engine_dual import (
    generate_witness_dual,
    interleave_witness_dual,
    jitted_engine_dual,
)
from .engine_schoolbook import (
    generate_witness_schoolbook,
    interleave_witness_schoolbook,
    jitted_engine_schoolbook,
)

__all__ += [
    "generate_witness_dual",
    "generate_witness_schoolbook",
    "interleave_witness_dual",
    "interleave_witness_schoolbook",
    "jitted_engine_dual",
    "jitted_engine_schoolbook",
]

from .api import CircuitWitness, circuit_witness

__all__ += ["CircuitWitness", "circuit_witness"]
