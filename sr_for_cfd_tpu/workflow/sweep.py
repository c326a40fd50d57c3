"""Data-generation sweep: cavity solves over Re x mesh-size -> HDF5.

The reference runs the sweep strictly sequentially (hours of wall-clock,
`sr-simulation-data-creation.ipynb` cell 2 main loop); each (Re, mesh) case
is independent, so here the Reynolds axis is **vmapped** into one batched
on-device solve per mesh size, and the batch axis can be sharded across the
device mesh (one case per device) - the TPU-native replacement identified
in SURVEY.md sections 3.4 / 5.8. A sequential host-loop mode with per-case
error isolation (the reference's try/except behavior) is also provided.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.hdf5 import save_fields_hdf5
from ..parallel.mesh import batch_sharding, make_mesh
from ..solver.cases import make_cavity_solver
from ..solver.simple import simple_step
from ..solver.state import init_state, inlet_profile
from ..utils.naming import fmt_re

DEFAULT_REYNOLDS = tuple(range(100, 801, 100))
DEFAULT_MESH_SIZES = (10, 50, 400)


def batched_cavity_solve(
    reynolds: Sequence[float],
    nx: int,
    ny: int,
    dt: float = 1e-3,
    scheme: str = "QUICK",
    double_lid: bool = True,
    max_iterations: int = 100000,
    mesh_devices=None,
    verbose: bool = True,
    chunk_size: int = 1000,
    **settings_kw,
) -> Tuple[Dict[float, Dict[str, np.ndarray]], np.ndarray]:
    """Solve one cavity mesh size for all Reynolds numbers simultaneously.

    vmaps the SIMPLE step over a batched SolverState with per-case nu =
    1/Re; converged cases are frozen by masking (a vmapped while_loop would
    otherwise keep updating them). With `mesh_devices` (a jax Mesh), the
    case axis is sharded across devices.

    Returns ({Re: {u, v, p} interior (ny, nx) fields}, iterations[n]).
    """
    res = np.asarray(list(reynolds), dtype=np.float64)
    n = len(res)
    # mirror the sweep's own chunk size into the settings so options
    # validated against it (steps_per_kernel divisibility) line up
    settings_kw.setdefault("chunk_size", chunk_size)
    # a VMAPPED pallas dispatch costs ~ms of launch overhead, so fused
    # sweeps default to multi-step kernel launches (bit-exact; measured
    # 464 s -> 2.4 s for 3x20000 iterations at 10x10). Only auto-applied
    # when no detector options are in play (their cadences must divide K,
    # which an explicit caller should choose).
    detector_opts = ("cauchy_tol", "plateau_patience", "rre_every",
                     "convergence_hold", "steps_per_kernel")
    if settings_kw.get("fused_step") and not any(
            k in settings_kw for k in detector_opts):
        cs = settings_kw["chunk_size"]
        for k in (500, 250, 100, 50, 10):
            # K must divide the chunk AND the iteration budget: exit
            # checks fire every K iterations, so a K that doesn't divide
            # max_iterations would overrun the recorded budget by up to
            # K-1 iterations (and report counts in multiples of K)
            if cs % k == 0 and max_iterations % k == 0:
                settings_kw["steps_per_kernel"] = k
                if verbose:  # no silent behavior changes for callers
                    print(f"[sweep] fused sweeps: auto-enabled "
                          f"steps_per_kernel={k} (convergence checked "
                          f"every {k} iterations)")
                break
    solver = make_cavity_solver(
        Re=float(res[0]), nx=nx, ny=ny, dt=dt, scheme=scheme,
        double_lid=double_lid, max_iterations=max_iterations, **settings_kw,
    )
    case = solver.case
    profile = inlet_profile(case)
    state0 = init_state(case)
    dtype = state0.u.dtype
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy(), state0
    )
    nus = jnp.asarray(1.0 / res, dtype=dtype)

    step = jax.vmap(
        lambda s, nu: simple_step(s, case, profile, nu), in_axes=(0, 0)
    )

    def active_mask(s):
        return jnp.logical_and(
            jnp.logical_and(~s.converged, ~s.diverged),
            s.count < max_iterations,
        )

    def masked_step(states):
        active = active_mask(states)
        new = step(states, nus)

        def sel(old, new_):
            mask = active.reshape((n,) + (1,) * (new_.ndim - 1))
            return jnp.where(mask, new_, old)

        return jax.tree_util.tree_map(sel, states, new)

    # each fused multi-step call advances steps_per_kernel iterations;
    # count them so a chunk is chunk_size ITERATIONS (not calls) and the
    # host keeps its per-chunk progress line / dispatch bound
    k_per_call = (case.settings.steps_per_kernel
                  if case.settings.fused_step else 1)

    def chunk(states):
        def body(carry):
            s, i = carry
            return masked_step(s), i + k_per_call

        def cond(carry):
            s, i = carry
            return jnp.logical_and(i < chunk_size, jnp.any(active_mask(s)))

        states, _ = jax.lax.while_loop(
            cond, body, (states, jnp.asarray(0, jnp.int32))
        )
        return states

    chunk_fn = jax.jit(chunk)
    if mesh_devices is not None:
        sharding = batch_sharding(mesh_devices)
        states = jax.device_put(states, sharding)

    while True:
        states = chunk_fn(states)
        active = np.asarray(
            ~(np.asarray(states.converged) | np.asarray(states.diverged))
            & (np.asarray(states.count) < max_iterations)
        )
        if verbose:
            counts = np.asarray(states.count)
            print(f"  sweep {nx}x{ny}: iters {counts.min()}..{counts.max()}, "
                  f"{active.sum()}/{n} active")
        if not active.any():
            break

    u = np.asarray(states.u)
    v = np.asarray(states.v)
    p = np.asarray(states.p)
    diverged = np.asarray(states.diverged)
    # diverged cases hold frozen NaN fields: DROP them (announced) like
    # the reference's per-case try/except - one bad Re must not poison
    # the training HDF5 (NaN stats -> NaN loss downstream)
    fields = {
        float(re_val): {
            "u": u[i, 1:-1, 1:-1].T.copy(),
            "v": v[i, 1:-1, 1:-1].T.copy(),
            "p": p[i, 1:-1, 1:-1].T.copy(),
        }
        for i, re_val in enumerate(res)
        if not diverged[i]
    }
    if len(fields) < len(res):
        dropped = [float(r) for i, r in enumerate(res) if diverged[i]]
        print(f"  sweep {nx}x{ny}: DROPPED diverged cases Re={dropped}")
    return fields, np.asarray(states.count)


def generate_training_data(
    reynolds_numbers: Iterable[float] = DEFAULT_REYNOLDS,
    mesh_sizes: Iterable[int] = DEFAULT_MESH_SIZES,
    output_dir: str = "results",
    double_lid: bool = True,
    dt: float = 1e-3,
    scheme: str = "QUICK",
    combined_name: Optional[str] = None,
    use_device_mesh: bool = False,
    spmd_devices: int = 1,
    verbose: bool = True,
    **kw,
) -> str:
    """Full sweep -> per-Re HDF5 files + one combined file (the reference's
    `results/simulation_result_double_lid.h5` layout, data notebook cell 2).
    Returns the combined file path. Per-mesh-size batches are isolated so
    one diverging size doesn't kill the sweep (reference wraps each case in
    try/except).

    `spmd_devices=M > 1` decomposes EACH case's grid M ways while cases
    shard over the remaining devices (the 2-D ('case', 'x') composition,
    `parallel/spmd_batch.py`) - for fine-grid sweeps with fewer
    concurrent cases than chips. Mesh sizes not divisible by M fall back
    to the case-parallel path with a printed notice."""
    os.makedirs(output_dir, exist_ok=True)
    bc_label = (
        "double_lid(u_top=1,u_bottom=1)" if double_lid else "lid_driven_cavity"
    )
    case_name = (
        "double lid driven cavity" if double_lid else "lid driven cavity"
    )
    if combined_name is None:
        combined_name = (
            "simulation_result_double_lid.h5" if double_lid
            else "simulation_result_single_lid.h5"
        )
    combined_path = os.path.join(output_dir, combined_name)
    mesh_devices = make_mesh() if use_device_mesh else None

    res_list = list(reynolds_numbers)
    for size in mesh_sizes:
        try:
            fields = None
            if spmd_devices > 1 and size % spmd_devices == 0:
                from ..parallel.spmd_batch import (
                    batched_spmd_cavity_solve,
                    make_case_x_mesh,
                )

                n_case = max(1, len(jax.devices()) // spmd_devices)
                while len(res_list) % n_case != 0:
                    n_case -= 1
                try:
                    fields, iters = batched_spmd_cavity_solve(
                        res_list, size, size,
                        make_case_x_mesh(n_case, spmd_devices),
                        dt=dt, scheme=scheme, double_lid=double_lid,
                        verbose=verbose, **kw,
                    )
                except ValueError as e:
                    # precondition failures (too few devices, settings
                    # the batched path refuses) are raised before any
                    # solve runs - fall back rather than dropping the
                    # mesh size from the dataset
                    if verbose:
                        print(f"  mesh {size}x{size}: decomposed path "
                              f"unavailable ({e}) - running case-parallel")
                except Exception as e:  # noqa: BLE001
                    # runtime failures too (XLA runtime error, OOM on the
                    # 2-D mesh, collective abort): the case-parallel path
                    # can still produce this size's data, so never let a
                    # decomposed-path crash drop it from the dataset
                    fields = None
                    print(f"  mesh {size}x{size}: decomposed solve FAILED "
                          f"({type(e).__name__}: {e}) - retrying "
                          f"case-parallel")
            elif spmd_devices > 1 and verbose:
                print(f"  mesh {size}x{size}: nx % {spmd_devices} != 0"
                      " - running case-parallel (no decomposition)")
            if fields is None:
                fields, iters = batched_cavity_solve(
                    res_list, size, size, dt=dt, scheme=scheme,
                    double_lid=double_lid, mesh_devices=mesh_devices,
                    verbose=verbose, **kw,
                )
        except Exception as e:  # per-size error isolation
            print(f"  sweep error for mesh {size}x{size}: {e}")
            continue
        from ..config import MeshParameters

        mesh = MeshParameters(nx=size, ny=size, lx=1.0, ly=1.0)
        for re_val, f in fields.items():
            re_dir = os.path.join(output_dir, f"Re{fmt_re(re_val)}")
            per_case = os.path.join(
                re_dir, f"cavity_Re{fmt_re(re_val)}_mesh{size}x{size}.h5"
            )
            for path in (per_case, combined_path):
                save_fields_hdf5(
                    path, f, mesh, re_val, case_name=case_name,
                    bc_type=bc_label,
                )
        if verbose:
            print(f"  mesh {size}x{size}: saved {len(fields)} cases "
                  f"(iterations {iters.min()}..{iters.max()})")
    return combined_path
