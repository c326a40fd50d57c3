"""Spatial domain decomposition of the solver grid across the device mesh.

The reference's only grid parallelism is Numba `prange` shared-memory
threading (`LDV PyCFD given by sir.py:517-597`). The TPU-native equivalent
(SURVEY.md sections 5.7/5.8) shards the padded (nx+2, ny+2) fields along x
with `NamedSharding(P('x', None))` and jits the unchanged global-view solver:
XLA's SPMD partitioner turns every +-1/+-2 stencil shift into a neighbor
`collective-permute` (halo exchange over ICI) and every residual reduction
into a `psum` - the annotate-shardings-and-let-XLA-partition recipe. The
numerics are bit-identical to the single-device program by construction.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
from jax.sharding import Mesh

from ..config import CaseConfig
from ..solver.simple import jitted_run_chunk
from ..solver.state import SolverState, init_state, inlet_profile
from .mesh import grid_sharding, replicated


def shard_state(state: SolverState, mesh: Mesh, axis: str = "x") -> SolverState:
    """Place a SolverState on the mesh: the padded (nx+2, ny+2) fields are
    sharded along the grid x axis; interior-shaped leaves (nx rows, not
    divisible by the mesh) and scalars start replicated and pick up
    propagated shardings from the partitioner inside jit."""
    gs = grid_sharding(mesh, axis)
    rep = replicated(mesh)
    n_padded = state.u.shape[0]

    def put(leaf):
        if getattr(leaf, "ndim", 0) == 2 and leaf.shape[0] == n_padded:
            return jax.device_put(leaf, gs)
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map(put, state)


class ShardedSolver:
    """Domain-decomposed drop-in around the functional solver: same
    `run_chunk` program, state sharded over the mesh."""

    def __init__(self, case: CaseConfig, mesh: Mesh, axis: str = "x"):
        n_shards = mesh.devices.size
        if (case.mesh.nx + 2) % n_shards != 0:
            raise ValueError(
                f"nx+2 = {case.mesh.nx + 2} must divide evenly over "
                f"{n_shards} devices for the GSPMD x-axis decomposition "
                f"(NamedSharding requires divisibility). For reference "
                f"grid sizes (400/512/1024/2048, where nx but not nx+2 "
                f"divides), use parallel.spmd_step.SpmdSolver - the "
                f"explicit shard_map path over interior rows."
            )
        self.case = case
        self.mesh = mesh
        self.profile = inlet_profile(case)
        self.state = shard_state(init_state(case), mesh, axis)
        self._chunk_fn = partial(
            jitted_run_chunk, case=case, n_steps=case.settings.chunk_size
        )

    def run_chunk(self) -> SolverState:
        self.state = self._chunk_fn(self.state, self.profile)
        return self.state

    def solve(self, max_chunks: Optional[int] = None) -> SolverState:
        chunks = 0
        while True:
            self.run_chunk()
            chunks += 1
            done = bool(self.state.converged) or bool(self.state.diverged) or (
                int(self.state.count) >= self.case.settings.max_iterations
            )
            if done or (max_chunks is not None and chunks >= max_chunks):
                return self.state
