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
