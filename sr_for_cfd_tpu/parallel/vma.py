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
