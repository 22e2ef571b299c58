"""Parallelism stack: device meshes, sharded witness generation, and the
CRT-residue satisfiability checker (all new components vs the reference --
SURVEY.md section 2.4)."""

from .mesh import make_mesh, place_batch, sharded_engine
from .sat_check import ResidueSystem, crt_primes

__all__ = [
    "ResidueSystem",
    "crt_primes",
    "make_mesh",
    "place_batch",
    "sharded_engine",
]

from .distributed import (
    global_mesh,
    host_local_batch,
    maybe_init_distributed,
    scaling_sweep,
)
from .ntt_sharded import ntt_sharded

__all__ += [
    "global_mesh",
    "host_local_batch",
    "maybe_init_distributed",
    "ntt_sharded",
    "scaling_sweep",
]
