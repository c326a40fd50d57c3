"""Pallas-under-shard_map: the per-shard red-black pressure sweep kernel
for the explicit-SPMD solver (VERDICT r2 missing #3 - "until these
compose, multi-chip and fast are disjoint feature sets").

One kernel call per rank per COMMUNICATION-AVOIDING block of kb sweeps:
a 2kb-row ppermute halo (`parallel/spmd_step.py:assemble`) buys kb full
red-black sweeps in one launch, with the halo rows' updates recomputed
redundantly (progressive erosion - invalid depth grows 2 rows per sweep
from the halo edge, so own rows stay EXACT iff h >= 2*kb; the same
accounting as `spmd_step.ca_sweep_solve`, here with d=1). The
composition inverts the single-chip streaming problem: a 2048^2 grid
over 8 ranks is a 256-row local block (~2 MiB) - VMEM-RESIDENT per
shard, no slab pipeline needed; the domain decomposition IS the
streaming.

Correctness layout (everything in GLOBAL padded coordinates, carried in
via the rank's first-row offset `row0` as a (1,1) scalar input):

  * ext: (rows+2h, W) - own rows at k in [h, rows+h), h halo rows each
    side (neighbor rows via ppermute; frozen domain ghosts on boundary
    ranks, exactly `spmd_step.assemble`).
  * each sweep updates every in-domain row of the block; rows the
    erosion has invalidated hold wrong values that never reach an own
    row within the block (h >= 2*kb).
  * b arrives halo-EXTENDED ((rows+2h, W), zeros outside valid rows): b
    is frozen during the pressure loop, so its halo travels ONCE per
    outer step, not per block (`extend_b_halo` below).
  * The RMS sum matches `spmd_step.ca_sweep_solve` exactly: the LAST
    sweep's r1 on own red cells + r2 on own black cells, psum'd by the
    caller (exact because the pre-last-sweep invalid depth 2kb-1 is
    inside the h-1 rows the own-row residual stencil never reaches).

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
                        nxg, rows, W, h, kb, inv_dx2, inv_dy2, volp, sor):
    f = ext_ref[:]
    b = b_ref[:]
    row0 = row0_ref[0, 0]
    kk = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
    i_pad = row0 + kk - (h - 1)    # global padded row of local row k
    valid = ((i_pad >= 1) & (i_pad <= nxg)
             & (jj >= 1) & (jj <= W - 2))
    red = valid & (((i_pad + jj) % 2) == 0)
    black = valid & (((i_pad + jj) % 2) == 1)
    own = (kk >= h) & (kk < rows + h)
    ap = -volp * (2.0 * inv_dx2 + 2.0 * inv_dy2)
    inv_ap = sor / ap

    r1 = r2 = None
    for _ in range(kb):            # kb sweeps per halo exchange
        r1 = b - _lap(f, inv_dx2, inv_dy2, volp)
        f = f + jnp.where(red, r1 * inv_ap, 0.0)
        r2 = b - _lap(f, inv_dx2, inv_dy2, volp)
        f = f + jnp.where(black, r2 * inv_ap, 0.0)

    ss = jnp.sum(jnp.where(own & red, r1 * r1, 0.0)
                 + jnp.where(own & black, r2 * r2, 0.0))
    ss_ref[:, :] = ss.reshape(1, 1)
    out_ref[:] = f[h:rows + h]


@functools.partial(
    jax.jit,
    static_argnames=("nxg", "h", "kb", "inv_dx2", "inv_dy2", "volp",
                     "sor", "axis_name", "interpret"),
)
def shard_rb_sweep(ext, b_ext, row0, *, nxg, inv_dx2, inv_dy2, volp, sor,
                   h=2, kb=1, axis_name=None, interpret=False):
    """`kb` full red-black pressure sweeps on a rank's halo-extended
    block (communication-avoiding: own rows are exact iff h >= 2*kb).

    ext: (rows+2h, W) field window, b_ext: matching frozen RHS, row0:
    this rank's first own row as a GLOBAL interior index ((1,1) int32).
    Returns (own_rows (rows, W), ss (scalar)) - ss is this rank's
    partial residual sum-of-squares from the LAST sweep (caller psums).
    `axis_name` marks the outputs as varying over that shard_map mesh
    axis (jax's vma check needs it for pallas_call results inside
    shard_map)."""
    if h < 2 * kb:
        raise ValueError(f"halo depth h={h} cannot buy kb={kb} sweeps "
                         f"(erosion needs h >= {2 * kb})")
    rows, W = ext.shape[0] - 2 * h, ext.shape[1]
    kernel = functools.partial(
        _shard_sweep_kernel, nxg=nxg, rows=rows, W=W, h=h, kb=kb,
        inv_dx2=inv_dx2, inv_dy2=inv_dy2, volp=volp, sor=sor,
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


def extend_b_halo(b, axis, fwd, bwd, rank, n_dev, h=2):
    """(rows, ny) frozen pressure RHS -> (rows+2h, ny+2) halo-extended,
    zero outside this rank's valid window. Runs ONCE per outer step (b is
    frozen for the whole pressure loop); only the field travels per
    block. Needs h <= rows (one-neighbor exchange)."""
    rows, ny = b.shape
    from_up = jax.lax.ppermute(b[-h:], axis, fwd)
    from_dn = jax.lax.ppermute(b[:h], axis, bwd)
    zeroh = jnp.zeros((h, ny), b.dtype)
    top = jnp.where(rank == 0, zeroh, from_up)
    bot = jnp.where(rank == n_dev - 1, zeroh, from_dn)
    bx = jnp.concatenate([top, b, bot], axis=0)
    zc = jnp.zeros((rows + 2 * h, 1), b.dtype)
    return jnp.concatenate([zc, bx, zc], axis=1)
