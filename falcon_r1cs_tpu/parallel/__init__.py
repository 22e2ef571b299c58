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
