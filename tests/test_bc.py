"""BC ghost-fill tests vs the oracle, incl. the BFS inlet profile."""

import jax.numpy as jnp
import numpy as np
import pytest

from sr_for_cfd_tpu.config import (
    BFSGeometry,
    BoundaryCondition,
    MeshParameters,
    VariableBCs,
)
from sr_for_cfd_tpu.ops.bc import apply_bc, apply_bfs_inlet, bfs_inlet_profile

from oracle import apply_bc as oracle_apply_bc

NX, NY = 6, 9


def test_apply_bc_mixed(rng):
    a = rng.standard_normal((NX + 2, NY + 2))
    bc = VariableBCs(
        left=BoundaryCondition("dirichlet", 0.7),
        right=BoundaryCondition("neumann", 0.0),
        top=BoundaryCondition("dirichlet", 1.0),
        bottom=BoundaryCondition("neumann", 0.0),
    )
    got = np.asarray(apply_bc(jnp.asarray(a), bc))
    want = oracle_apply_bc(
        a,
        {"left": "dirichlet", "right": "neumann", "top": "dirichlet", "bottom": "neumann"},
        {"left": 0.7, "right": 0.0, "top": 1.0, "bottom": 0.0},
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # corners untouched (reference writes only the non-corner ghost lines)
    for ci, cj in ((0, 0), (0, NY + 1), (NX + 1, 0), (NX + 1, NY + 1)):
        assert got[ci, cj] == a[ci, cj]


def test_bfs_inlet(rng):
    mesh = MeshParameters(nx=NX, ny=NY, lx=10.0, ly=3.0)
    geom = BFSGeometry(step_height=1.0, h=2.0, Ub=1.0)
    prof = bfs_inlet_profile(mesh, geom, dtype=jnp.float64)
    a = rng.standard_normal((NX + 2, NY + 2))

    # u component: wall below step, parabolic above
    got_u = np.asarray(apply_bfs_inlet(jnp.asarray(a), 0, prof))
    for j in range(1, NY + 1):
        y = (j - 0.5) * mesh.dy
        if y < geom.step_height:
            expected = -a[1, j]
        else:
            yp = min(max(y - geom.step_height, 0.0), geom.h)
            u_in = 6.0 * geom.Ub * (yp / geom.h) * (1 - yp / geom.h)
            expected = 2 * u_in - a[1, j]
        assert got_u[0, j] == pytest.approx(expected, rel=1e-12)

    # v component: ghost = -interior across the whole inlet
    got_v = np.asarray(apply_bfs_inlet(jnp.asarray(a), 1, prof))
    np.testing.assert_allclose(got_v[0, 1:-1], -a[1, 1:-1], rtol=1e-12)

    # pressure untouched
    got_p = np.asarray(apply_bfs_inlet(jnp.asarray(a), 2, prof))
    np.testing.assert_array_equal(got_p, a)

    # no profile -> no-op
    got_none = np.asarray(apply_bfs_inlet(jnp.asarray(a), 0, None))
    np.testing.assert_array_equal(got_none, a)
