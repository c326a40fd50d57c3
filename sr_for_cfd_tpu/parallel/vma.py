"""shard_map varying-manual-axes (vma) helper shared by the SPMD modules.

jax's shard_map vma check requires loop carries and cond branches to keep
one vma type, but fresh device-invariant values (zeros, scalar constants)
are born 'replicated' while everything derived from sharded data is
'varying'. `vary` marks such values varying over the mesh axis.
"""

from __future__ import annotations

import jax


def vary(x, axis: str):
    """Mark a device-invariant value as varying over `axis`.

    No-op when already varying (pcast rejects that). Also safe when the
    enclosing shard_map runs with check_vma=False (the Pallas paths):
    pcast then simply passes the value through - verified by the
    use_pallas+multigrid decomposed tests on CPU and silicon.
    """
    if axis in getattr(jax.typeof(x), "vma", ()):
        return x
    return jax.lax.pcast(x, (axis,), to="varying")


def vary_over(x, axes):
    """pcast `x` to varying over whichever of `axes` it lacks.

    Loop-carry initializers must match the vma of the body's outputs
    EXACTLY (over-varying is as much a mismatch as under-varying), and
    the right set depends on the mesh: a scalar psum'd over 'x' is
    invariant on a 1-D 'x' mesh but still varies over 'case' on the 2-D
    ('case', 'x') mesh of `parallel/spmd_batch.py`. Callers compute the
    target set from the data's own vma at trace time (zero runtime
    cost); under check_vma=False both sides read as empty and this is a
    no-op."""
    have = getattr(jax.typeof(x), "vma", frozenset())
    missing = tuple(a for a in sorted(axes) if a not in have)
    if not missing:
        return x
    return jax.lax.pcast(x, missing, to="varying")
