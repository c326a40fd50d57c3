"""Pallas-under-shard_map: the per-shard red-black pressure sweep kernel
for the explicit-SPMD solver (VERDICT r2 missing #3 - "until these
compose, multi-chip and fast are disjoint feature sets").

One kernel call per rank per sweep, ppermute halo exchange between
sweeps (`parallel/spmd_step.py:assemble`). The composition inverts the
single-chip streaming problem: a 2048^2 grid over 8 ranks is a 256-row
local block (~2 MiB) - VMEM-RESIDENT per shard, no slab pipeline needed;
the domain decomposition IS the streaming.

Correctness layout (everything in GLOBAL padded coordinates, carried in
via the rank's first-row offset `row0` as a (1,1) scalar input):

  * ext: (rows+4, W) - own rows at k in [2, rows+2), two halo rows each
    side (neighbor rows via ppermute; frozen domain ghosts on boundary
    ranks, exactly `spmd_step.assemble(h=2)`).
  * RED half updates k in [1, rows+3): a red halo-row update needs only
    ORIGINAL neighbor values (all present in ext), and recomputing the
    neighbor's own red update locally saves a mid-sweep halo exchange -
    the same redundant-halo-compute trick as ops/pallas_stream.py.
  * BLACK half then updates own rows against correctly-red-updated
    k +- 1 neighbors. One exchange per sweep instead of two.
  * b arrives halo-EXTENDED ((rows+4, W), zeros outside valid rows): b
    is frozen during the pressure loop, so its halo travels ONCE per
    outer step, not per sweep (`extend_b_halo` below).
  * The RMS sum matches `spmd_step.sweep_solve` exactly: r1 on own red
    cells, r2 on own black cells, psum'd by the caller.

Reference semantics: the frozen-ghost pressure loop of `LDV PyCFD given
by sir.py:561-583`; SURVEY.md sections 5.7/5.8 (spatial decomposition +
distributed backend composing with the kernel layer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lap(f, inv_dx2, inv_dy2, volp):
    """5-point volp-scaled Laplacian with replicated edges (edge values
    only reach masked-off positions)."""
    e = jnp.concatenate([f[1:], f[-1:]], axis=0)
    w = jnp.concatenate([f[:1], f[:-1]], axis=0)
    n = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
    s = jnp.concatenate([f[:, :1], f[:, :-1]], axis=1)
    return volp * ((e - 2.0 * f + w) * inv_dx2
                   + (n - 2.0 * f + s) * inv_dy2)


def _shard_sweep_kernel(ext_ref, b_ref, row0_ref, out_ref, ss_ref, *,
                        nxg, rows, W, inv_dx2, inv_dy2, volp, sor):
    f = ext_ref[:]
    b = b_ref[:]
    row0 = row0_ref[0, 0]
    kk = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
    i_pad = row0 + kk - 1          # global padded row of local row k
    valid = ((i_pad >= 1) & (i_pad <= nxg)
             & (jj >= 1) & (jj <= W - 2))
    red = valid & (((i_pad + jj) % 2) == 0)
    black = valid & (((i_pad + jj) % 2) == 1)
    own = (kk >= 2) & (kk < rows + 2)
    ap = -volp * (2.0 * inv_dx2 + 2.0 * inv_dy2)
    inv_ap = sor / ap

    r1 = b - _lap(f, inv_dx2, inv_dy2, volp)
    f = f + jnp.where(red, r1 * inv_ap, 0.0)
    r2 = b - _lap(f, inv_dx2, inv_dy2, volp)
    f = f + jnp.where(black, r2 * inv_ap, 0.0)

    ss = jnp.sum(jnp.where(own & red, r1 * r1, 0.0)
                 + jnp.where(own & black, r2 * r2, 0.0))
    ss_ref[:, :] = ss.reshape(1, 1)
    out_ref[:] = f[2:rows + 2]


@functools.partial(
    jax.jit,
    static_argnames=("nxg", "inv_dx2", "inv_dy2", "volp", "sor",
                     "axis_name", "interpret"),
)
def shard_rb_sweep(ext, b_ext, row0, *, nxg, inv_dx2, inv_dy2, volp, sor,
                   axis_name=None, interpret=False):
    """One full red-black pressure sweep on a rank's halo-extended block.

    ext: (rows+4, W) field window, b_ext: matching frozen RHS, row0: this
    rank's first own row as a GLOBAL interior index ((1,1) int32). Returns
    (own_rows (rows, W), ss (scalar)) - ss is this rank's partial residual
    sum-of-squares (caller psums). `axis_name` marks the outputs as
    varying over that shard_map mesh axis (jax's vma check needs it for
    pallas_call results inside shard_map)."""
    rows, W = ext.shape[0] - 4, ext.shape[1]
    kernel = functools.partial(
        _shard_sweep_kernel, nxg=nxg, rows=rows, W=W, inv_dx2=inv_dx2,
        inv_dy2=inv_dy2, volp=volp, sor=sor,
    )
    space = pl.ANY if interpret else pltpu.VMEM
    vma = {"vma": frozenset((axis_name,))} if axis_name else {}
    out, ss = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((rows, W), ext.dtype, **vma),
            jax.ShapeDtypeStruct((1, 1), ext.dtype, **vma),
        ],
        in_specs=[pl.BlockSpec(memory_space=space)] * 3,
        out_specs=[pl.BlockSpec(memory_space=space)] * 2,
        interpret=interpret,
    )(ext, b_ext, row0)
    return out, ss[0, 0]


def extend_b_halo(b, axis, fwd, bwd, rank, n_dev):
    """(rows, ny) frozen pressure RHS -> (rows+4, ny+2) halo-extended,
    zero outside this rank's valid window. Runs ONCE per outer step (b is
    frozen for the whole pressure loop); only the field travels per sweep.
    """
    rows, ny = b.shape
    from_up = jax.lax.ppermute(b[-2:], axis, fwd)
    from_dn = jax.lax.ppermute(b[:2], axis, bwd)
    zero2 = jnp.zeros((2, ny), b.dtype)
    top = jnp.where(rank == 0, zero2, from_up)
    bot = jnp.where(rank == n_dev - 1, zero2, from_dn)
    bx = jnp.concatenate([top, b, bot], axis=0)
    zc = jnp.zeros((rows + 4, 1), b.dtype)
    return jnp.concatenate([zc, bx, zc], axis=1)
