"""Model and solver-state checkpointing.

Model checkpoints are Flax msgpack files following the reference's artifact
naming convention with a .msgpack extension
(`vanilla_encoder{lr}_to_{hr}_{suffix}.msgpack`, cf.
`PyCFD_ML_accelerated.py:1069-1074`); the reference's Keras .h5 encoders are
importable via `models.keras_import`. Solver states serialize to .npz for
first-class warm-start/restore (SURVEY.md section 5.4).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
from flax import serialization


def save_params(path: str, variables: Dict) -> None:
    out_dir = os.path.dirname(path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))


def load_params(path: str, template: Dict) -> Dict:
    """Deserialize against a template tree (e.g. `module.init(...)`)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _npz_path(path: str) -> str:
    """np.savez silently appends '.npz' but np.load uses the path
    verbatim; normalize so save/load round-trip for any input path."""
    return path if path.endswith(".npz") else path + ".npz"


def save_solver_state(path: str, state) -> None:
    """Snapshot a SolverState (fields + iteration counter) to .npz."""
    path = _npz_path(path)
    out_dir = os.path.dirname(path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    np.savez(
        path,
        u=np.asarray(state.u),
        v=np.asarray(state.v),
        p=np.asarray(state.p),
        count=np.asarray(state.count),
    )


def load_solver_fields(path: str) -> Dict[str, np.ndarray]:
    """Load a snapshot back as the (ny, nx) interior field dict accepted by
    `CFDSolver.warm_start` / `warm_start_state`."""
    with np.load(_npz_path(path)) as data:
        return {
            "u": data["u"][1:-1, 1:-1].T.copy(),
            "v": data["v"][1:-1, 1:-1].T.copy(),
            "p": data["p"][1:-1, 1:-1].T.copy(),
        }
