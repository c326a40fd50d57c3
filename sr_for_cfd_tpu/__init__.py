"""sr_for_cfd_tpu: TPU-native ML-accelerated steady-state CFD framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
bitseal02/SR-for-CFD (reference snapshot at /root/reference): a 2-D
finite-volume incompressible Navier-Stokes solver (SIMPLE projection,
QUICK/UPWIND), lid-driven-cavity and backward-facing-step cases, a
convolutional super-resolution autoencoder (Flax), and the hybrid
coarse-solve -> super-resolve -> warm-started-fine-solve workflow, plus
data-generation sweeps and training - all designed TPU-first (vectorized
stencils, `lax.while_loop` solves, `shard_map` domain decomposition,
fused Pallas outer-step kernels).
"""

__version__ = "0.1.0"

# Persistent compilation cache: solver-step executables take minutes to
# build via the remote TPU compiler; cache them across processes. Opt out
# with SRCFD_COMPILATION_CACHE=0.
import os as _os

import jax as _jax

if _os.environ.get("SRCFD_COMPILATION_CACHE", "1") == "1":
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                _os.path.expanduser("~/.cache/srcfd_jax_cache"),
            ),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .config import (  # noqa: F401
    BFSGeometry,
    BoundaryCondition,
    BoundaryConditions,
    CaseConfig,
    FluidProperties,
    MeshParameters,
    SolverSettings,
)
from .solver.cases import (  # noqa: F401
    create_bfs_case,
    create_custom_case,
    create_lid_driven_cavity,
    make_bfs_solver,
    make_cavity_solver,
)
from .solver.simple import CFDSolver, DivergenceError  # noqa: F401
from .solver.state import SolverState, init_state, warm_start_state  # noqa: F401


def __getattr__(name):
    # lazy re-exports of the heavier subsystems
    if name == "SRModel":
        from .sr.inference import SRModel

        return SRModel
    if name == "ml_super_resolution":
        from .sr.inference import ml_super_resolution

        return ml_super_resolution
    if name == "run_hybrid_experiment":
        from .workflow.hybrid import run_hybrid_experiment

        return run_hybrid_experiment
    if name == "SpmdSolver":
        # explicit-SPMD domain decomposition at reference grid sizes
        # (full step under shard_map; sweeps / sharded-multigrid /
        # per-shard-Pallas pressure)
        from .parallel.spmd_step import SpmdSolver

        return SpmdSolver
    if name == "ShardedSolver":
        # GSPMD decomposition (bit-identical; needs nx+2 % n_devices == 0)
        from .parallel.domain import ShardedSolver

        return ShardedSolver
    if name == "batched_spmd_cavity_solve":
        # case-parallel x domain-decomposed sweeps on a 2-D mesh
        from .parallel.spmd_batch import batched_spmd_cavity_solve

        return batched_spmd_cavity_solve
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
