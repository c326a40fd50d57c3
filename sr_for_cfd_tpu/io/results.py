"""Per-run artifact suite dispatcher.

Reproduces the reference's `_save_results` behavior: .dat full field +
centerline (`LDV PyCFD given by sir.py:234-243`), HDF5 group
(`PyCFD_ML_accelerated.py:503-515`), and the plot set (centerlines,
contours, convergence when history exists).
"""

from __future__ import annotations

import os


def save_all_results(solver, output_base_name: str) -> None:
    from ..viz.plots import plot_centerlines, plot_contours, plot_convergence
    from .datfiles import save_centerline_data, save_full_field
    from .hdf5 import save_fields_hdf5

    out_dir = os.path.dirname(output_base_name)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    case = solver.case
    var = solver.Var
    re = case.fluid.Re

    save_full_field(
        f"{output_base_name}_full.dat", var, case.mesh, re, case.settings.dt
    )
    save_centerline_data(f"{output_base_name}_centerline.dat", var, case.mesh, re)
    save_fields_hdf5(
        f"{output_base_name}.h5",
        solver.interior_fields(),
        case.mesh,
        re,
        case_name=case.case_name,
        bc_type=case.bc_label,
        bfs=case.bfs,
    )
    plot_centerlines(f"{output_base_name}_centerlines.png", var, case.mesh, re)
    plot_contours(
        f"{output_base_name}_contours.png", var, case.mesh, re,
        title=case.case_name.title(),
    )
    plot_convergence(
        f"{output_base_name}_convergence.png", solver.residual_history, re
    )
