"""Device-mesh helpers.

The reference has no distributed backend (SURVEY.md section 5.8); the
TPU-native equivalents are built on `jax.sharding.Mesh` + NamedSharding:
'dp' for data parallelism (training batches, sweep cases) and 'x' for
spatial domain decomposition of the solver grid.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "dp"
) -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def ring_perms(n_dev: int):
    """(fwd, bwd) `lax.ppermute` pair lists for the 1-D ring used by every
    explicit halo exchange (spmd_step / spmd_mg / halo): fwd sends rank i's
    payload to rank i+1 (a rank RECEIVES its lower neighbor's rows), bwd
    the reverse. One definition so the step, MG, and pressure paths can
    never desynchronize on ring topology."""
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    return fwd, bwd


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch/case) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def grid_sharding(mesh: Mesh, axis_name: str = "x") -> NamedSharding:
    """Shard a padded (nx+2, ny+2) solver field along x. XLA's SPMD
    partitioner turns the +-1/+-2 stencil shifts into neighbor
    collective-permutes over ICI automatically (halo exchange), per the
    annotate-and-let-XLA-partition recipe."""
    return NamedSharding(mesh, P(axis_name, None))
