"""Case/configuration layer (L0).

TPU-native re-design of the reference's plain config objects
(`LDV PyCFD given by sir.py:9-73`, `bfs code given by sir.py:9-85`).
The four reference scripts each carry their own copy of these classes; here
they are unified once, with the BFS-only extras (relaxation factors, BFS
geometry) folded in as options (SURVEY.md section 2.4 "variant matrix").

Everything in this module is static (hashable) configuration: it selects the
traced program (scheme, BC types, grid shape) at `jax.jit` trace time.
Boundary *values* become traced scalars inside the kernels.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

SIDES = ("left", "right", "top", "bottom")

DIRICHLET = "dirichlet"
NEUMANN = "neumann"

QUICK = "QUICK"

# Auto-dispatch boundary between the VMEM-resident fused V-cycle kernel
# (ops/pallas_mg.py) and the slab-streamed one (ops/pallas_stream.py):
# ~1.35M interior cells (~1160^2) keeps the resident kernel under the
# 100 MiB scoped-VMEM budget with margin. Shared by the solver dispatch
# (solver/simple.py) and the config-time streamed-kernel validation.
STREAM_MG_CELL_THRESHOLD = 1_350_000
UPWIND = "UPWIND"


@dataclass(frozen=True)
class BoundaryCondition:
    """One side's boundary condition (reference `BoundaryCondition`,
    `LDV PyCFD given by sir.py:9-13`)."""

    type: str = DIRICHLET  # 'dirichlet' or 'neumann'
    value: float = 0.0

    def __post_init__(self):
        if self.type not in (DIRICHLET, NEUMANN):
            raise ValueError(f"Unknown BC type {self.type!r}")


def _bc_map(**kwargs: BoundaryCondition) -> Dict[str, BoundaryCondition]:
    out = {}
    for side in SIDES:
        out[side] = kwargs.get(side, BoundaryCondition(DIRICHLET, 0.0))
    return out


@dataclass(frozen=True)
class VariableBCs:
    """Per-variable BCs for the four sides. Frozen and hashable so that the
    BC *types* specialize the jitted program while values are closed over."""

    left: BoundaryCondition = BoundaryCondition()
    right: BoundaryCondition = BoundaryCondition()
    top: BoundaryCondition = BoundaryCondition()
    bottom: BoundaryCondition = BoundaryCondition()

    def __getitem__(self, side: str) -> BoundaryCondition:
        return getattr(self, side)

    def replace(self, **kw) -> "VariableBCs":
        return dataclasses.replace(self, **kw)


class BoundaryConditions:
    """Container for u/v/p boundary conditions.

    Mirrors the reference container (`LDV PyCFD given by sir.py:15-35`): the
    default is the single-lid-driven cavity (u_top = 1, everything else
    no-slip, pressure Neumann everywhere).
    """

    def __init__(self):
        self.u_boundaries: Dict[str, BoundaryCondition] = _bc_map(
            top=BoundaryCondition(DIRICHLET, 1.0)
        )
        self.v_boundaries: Dict[str, BoundaryCondition] = _bc_map()
        self.p_boundaries: Dict[str, BoundaryCondition] = {
            s: BoundaryCondition(NEUMANN, 0.0) for s in SIDES
        }

    # ---- presets -----------------------------------------------------
    @classmethod
    def lid_driven_cavity(cls, lid_velocity: float = 1.0) -> "BoundaryConditions":
        bc = cls()
        bc.u_boundaries["top"] = BoundaryCondition(DIRICHLET, lid_velocity)
        return bc

    @classmethod
    def double_lid_cavity(cls, lid_velocity: float = 1.0) -> "BoundaryConditions":
        """Double-lid cavity: u moving on both top and bottom (data-creation
        notebook default, sr-simulation-data-creation.ipynb cell 2)."""
        bc = cls()
        bc.u_boundaries["top"] = BoundaryCondition(DIRICHLET, lid_velocity)
        bc.u_boundaries["bottom"] = BoundaryCondition(DIRICHLET, lid_velocity)
        return bc

    @classmethod
    def bfs(cls) -> "BoundaryConditions":
        """Backward-facing-step base BCs (`bfs code given by sir.py:836-853`):
        velocity outlet Neumann on the right, walls top/bottom, placeholder
        left (overridden by the BFS inlet profile); pressure Dirichlet 0 at
        the outlet, Neumann elsewhere."""
        bc = cls()
        bc.u_boundaries = _bc_map(right=BoundaryCondition(NEUMANN, 0.0))
        bc.v_boundaries = _bc_map(right=BoundaryCondition(NEUMANN, 0.0))
        bc.p_boundaries = {
            "left": BoundaryCondition(NEUMANN, 0.0),
            "right": BoundaryCondition(DIRICHLET, 0.0),
            "top": BoundaryCondition(NEUMANN, 0.0),
            "bottom": BoundaryCondition(NEUMANN, 0.0),
        }
        return bc

    # ---- static/frozen views ----------------------------------------
    def frozen(self, var: str) -> VariableBCs:
        d = {"u": self.u_boundaries, "v": self.v_boundaries, "p": self.p_boundaries}[var]
        return VariableBCs(**{s: d[s] for s in SIDES})


@dataclass(frozen=True)
class MeshParameters:
    """Uniform collocated grid with one ghost ring
    (reference `MeshParameters`, `LDV PyCFD given by sir.py:37-46`)."""

    nx: int = 100
    ny: int = 100
    lx: float = 1.0
    ly: float = 1.0

    @property
    def dx(self) -> float:
        return self.lx / self.nx

    @property
    def dy(self) -> float:
        return self.ly / self.ny

    @property
    def volp(self) -> float:
        return self.dx * self.dy


@dataclass(frozen=True)
class FluidProperties:
    """Non-dimensionalized fluid (reference `FluidProperties`,
    `LDV PyCFD given by sir.py:48-54`): nu = 1/Re with U = L = 1."""

    Re: float = 100.0
    rho: float = 1.0

    @property
    def nu(self) -> float:
        return 1.0 / self.Re


@dataclass(frozen=True)
class BFSGeometry:
    """Backward-facing-step inlet geometry (`bfs code given by sir.py:146-184,
    856-862`): no-slip wall for cell centers below `step_height`, parabolic
    inlet u(y') = 6 Ub (y'/h)(1 - y'/h) over the opening of height `h`."""

    step_height: float = 1.0
    h: float = 2.0
    Ub: float = 1.0


_DEFAULT_CRITERIA = (("u", 1e-6), ("v", 1e-6), ("p", 1e-6), ("continuity", 1e-6))
_NO_RELAX = (("u", 1.0), ("v", 1.0), ("p", 1.0))
_BFS_RELAX = (("u", 0.5), ("v", 0.5), ("p", 0.2))


@dataclass(frozen=True)
class SolverSettings:
    """Unified solver settings: the reference's `SolverSettings`
    (`LDV PyCFD given by sir.py:56-73`) plus the BFS variant's relaxation
    factors (`bfs code given by sir.py:56-85`) and TPU-specific knobs.

    `inner_scheme` selects the deterministic replacement for the reference's
    racy asynchronous Gauss-Seidel sweeps (SURVEY.md section 5.2):
    'redblack' (default, GS-like convergence) or 'jacobi'.

    `relaxation_factors` of 1.0 disable under-relaxation, reproducing the
    cavity baselines; the BFS default is (0.5, 0.5, 0.2).
    """

    dt: float = 0.001
    max_iterations: int = 100000
    convergence_criteria: Tuple[Tuple[str, float], ...] = _DEFAULT_CRITERIA
    scheme: str = QUICK  # 'QUICK' or 'UPWIND'
    relaxation_factors: Tuple[Tuple[str, float], ...] = _NO_RELAX
    # Inner point-iteration sweeps (reference hard-codes 1e-6 / 1000,
    # `LDV PyCFD given by sir.py:519-520`).
    inner_tolerance: float = 1e-6
    inner_max_iter: int = 1000
    inner_scheme: str = "redblack"  # 'redblack' | 'jacobi'
    # Exit-check cadence: evaluate the inner-loop RMS reduction every K
    # sweeps (extra sweeps only tighten the solve; big TPU win on the
    # pressure-Poisson loop which dominates runtime).
    momentum_check_every: int = 1
    pressure_check_every: int = 8
    # Successive over-relaxation factor for the pressure-Poisson sweeps
    # (1.0 = plain red-black GS, reference semantics; ~1.9 converges the
    # Poisson solve an order of magnitude faster - same fixed point).
    pressure_sor: float = 1.0
    # Pressure inner solver: 'sweeps' (reference semantics: capped
    # point iteration), 'multigrid' (V-cycles; solves the same system to
    # the same tolerance in ~10x fewer sweep-equivalents - performance
    # mode, jnp path; see ops/multigrid.py), or 'tiled' (the sweeps
    # semantics via the slab-streamed Pallas kernel - one fused HBM pass
    # per red-black sweep, any grid size; f32; see ops/pallas_tiled.py).
    pressure_solver: str = "sweeps"
    # Outer-loop plateau stopping (0 = off): stop when the residual RMS has
    # not improved by plateau_rtol over plateau_patience consecutive checks
    # - "converged to working precision". Essential for f32 runs whose
    # residuals floor above the reference's f64-calibrated criteria.
    # Runs BOTH host-side (windowed chunk medians, robust for small chunks)
    # and device-side (inside the while_loop, every plateau_check_every
    # iterations vs the running best) - the device check lets a tiny-grid
    # solve run as ONE big dispatch and still exit early, with zero host
    # round trips (the relay's 30ms-3s latency makes small chunks
    # expensive here).
    # plateau_check_every sets the device-side check cadence (and thus the
    # improvement-rate threshold: rtol per check_every iterations). 2000
    # matches the host policy's chunk timescale; values as low as 100 make
    # the check demand a 1%-per-100-iteration rate, which a healthy
    # slowly-converging fine-grid solve fails long before its floor
    # (measured: a 400^2 cavity cold start "plateaued" at 5k of 36k).
    plateau_patience: int = 0
    plateau_rtol: float = 0.01
    plateau_check_every: int = 2000
    # Sustained-convergence requirement: declare convergence only after the
    # criteria hold for this many CONSECUTIVE outer iterations (1 =
    # reference semantics, first crossing). f32 residual traces dip
    # transiently below a loosened criterion long before the flow settles
    # (measured: a 400^2 cavity crossed u-rms 1.5e-3 at 20k iterations
    # with the centerline still 2.5% away from its converged shape);
    # requiring a hold makes loosened f32 criteria trustworthy. Evaluated
    # in the chunked device loop; the hold must fit within one chunk.
    convergence_hold: int = 1
    # Field-Cauchy steady-state detection (0 = off): every
    # cauchy_check_every iterations compare the velocity fields against
    # their values one window ago and declare convergence when
    # max|u(t)-u(t-K)| and max|v(t)-v(t-K)| both drop below cauchy_tol.
    # This is the robust "converged centerline" criterion: f32 residual
    # traces of these flows OSCILLATE (measured: u-rms swinging 2.6e-4 <->
    # 1.7e-3 on the 400^2 double-lid cavity while the field drifted
    # monotonically to its steady state), so rms criteria either flap or
    # demand unreachable levels, while the field drift is monotone.
    # Evaluated in the chunked device loop (window restarts per chunk).
    cauchy_tol: float = 0.0
    cauchy_check_every: int = 5000
    # Reduced-rank extrapolation steady-state accelerator (0 = off): every
    # rre_every iterations snapshot the full state (fields + face fluxes);
    # after rre_depth+1 snapshots, jump to the affine combination whose
    # successive differences cancel, then keep iterating (ops/extrapolate
    # .py). Cuts the 10x10 coarse solve's pseudo-time marching ~2x
    # (measured 83,493 -> ~40,000 iterations to the same fixed point);
    # beyond-reference addition - the reference's coarse solves burn their
    # full 100k budget (BASELINE.md). Runs inside the device loop; a chunk
    # must span rre_every*(rre_depth+1) iterations for a cycle to fire
    # (the snapshot buffer is chunk-local, like the plateau carry).
    # rre_min_count delays the first snapshot past the strongly nonlinear
    # startup transient where extrapolation can't help.
    rre_every: int = 0
    rre_depth: int = 6
    rre_min_count: int = 0
    # Multigrid V-cycle shape (pressure_solver='multigrid'). Defaults are
    # the conservative 4/4 smoother; 2/2 halves the per-cycle cost on
    # smooth problems. mg_min_size truncates the hierarchy (the sub-128^2
    # levels are latency-bound on TPU: tiny sequenced ops), trading a
    # deeper coarsest solve (mg_coarsest_sweeps) for fewer levels.
    mg_n_pre: int = 4
    mg_n_post: int = 4
    mg_min_size: int = 8
    mg_coarsest_sweeps: int = 40
    # Red-black smoother over-relaxation. 1.5 accelerates the STANDALONE
    # solve but is past the optimum for V-cycle SMOOTHING (which wants
    # the high-frequency error killed, not the overall iteration sped
    # up); on the BFS 10x3-domain semi-coarsened hierarchy lower values
    # with more sweeps cut cycles/step ~2x (docs/STATUS.md r4).
    mg_smoother_sor: float = 1.5
    # Slab-streamed Pallas multigrid (pressure_solver='multigrid' +
    # use_pallas, float32): 0 = automatic - the VMEM-resident fused
    # V-cycle kernel (ops/pallas_mg.py) when the hierarchy fits on-chip,
    # the slab-streamed kernel (ops/pallas_stream.py) past the VMEM wall
    # (>~1.35M interior cells, the TPU scaling axis). > 0 forces the
    # streamed kernel with that slab height (rows per grid step; multiple
    # of 16). The streamed kernel's exit check lags one V-cycle (it runs
    # one extra cycle past tolerance - same fixed point; see module doc).
    mg_slab_rows: int = 0
    # Explicit-SPMD decomposition factor (parallel/spmd_step.py): >1
    # declares the case will run sharded over that many devices, so the
    # per-rank VMEM working set of the Pallas kernels is the grid divided
    # by this. Scales the config-time VMEM gate; SpmdSolver validates it
    # against the actual mesh.
    spmd_devices: int = 1
    # TPU production runs in float32; float64 is the CPU validation mode.
    dtype: str = "float32"
    # Host round-trip cadence for logging / convergence checks.
    chunk_size: int = 100
    # Pallas acceleration: use_pallas fuses the pressure inner loop into a
    # single VMEM-resident kernel; fused_step fuses the ENTIRE outer SIMPLE
    # iteration into one kernel (fastest; float32, single-device).
    use_pallas: bool = False
    fused_step: bool = False
    # Multi-step fused kernel (fused_step only): run this many outer
    # iterations per kernel LAUNCH. On tiny grids the per-launch overhead
    # (~16 us measured on the 10x10 coarse phase) dwarfs the device work;
    # K launches' worth of stepping in one launch amortizes it K-fold.
    # Convergence flags and detector checks are evaluated every K
    # iterations, so K must divide the active detector cadences (enforced
    # below); a solve can overshoot its exact stopping iteration by < K.
    steps_per_kernel: int = 1

    def __post_init__(self):
        if self.scheme not in (QUICK, UPWIND):
            raise ValueError(f"Unknown scheme {self.scheme!r}")
        if self.inner_scheme not in ("redblack", "jacobi"):
            raise ValueError(f"Unknown inner scheme {self.inner_scheme!r}")
        if self.pressure_solver not in ("sweeps", "multigrid", "tiled"):
            raise ValueError(
                f"Unknown pressure solver {self.pressure_solver!r}"
            )
        if self.rre_every > 0 and self.rre_depth < 2:
            raise ValueError(
                "rre_depth must be >= 2 (scalar Aitken cannot cancel the "
                "oscillatory error modes these flows produce; see "
                "ops/extrapolate.py)"
            )
        if self.rre_every > 0:
            cycle = self.rre_every * (self.rre_depth + 1)
            if self.chunk_size < cycle:
                # the snapshot buffer is chunk-local (solver/simple.py
                # run_chunk, parallel/spmd_step.py _make_chunk): a chunk
                # shorter than one full cycle would silently never jump
                raise ValueError(
                    f"rre_every={self.rre_every} with rre_depth="
                    f"{self.rre_depth} needs rre_every*(rre_depth+1)="
                    f"{cycle} iterations per chunk to fire, but "
                    f"chunk_size={self.chunk_size}; raise chunk_size "
                    "(RRE targets long single-dispatch solves) or lower "
                    "rre_every/rre_depth"
                )
        if self.steps_per_kernel < 1:
            # 0 would freeze the chunk loop: count/i advance by this value
            raise ValueError("steps_per_kernel must be >= 1")
        if self.steps_per_kernel > 1:
            if not self.fused_step:
                raise ValueError(
                    "steps_per_kernel > 1 requires fused_step=True (it is "
                    "a property of the fused Pallas kernel)"
                )
            if self.convergence_hold > 1:
                raise ValueError(
                    "steps_per_kernel > 1 is incompatible with "
                    "convergence_hold > 1 (the hold counts per-iteration "
                    "crossings, which a multi-step kernel cannot observe)"
                )
            cadences = [("chunk_size", self.chunk_size)]
            if self.cauchy_tol > 0.0:
                cadences.append(("cauchy_check_every", self.cauchy_check_every))
            if self.plateau_patience > 0:
                cadences.append(
                    ("plateau_check_every", self.plateau_check_every))
            if self.rre_every > 0:
                cadences.append(("rre_every", self.rre_every))
            for name, v in cadences:
                if v % self.steps_per_kernel != 0:
                    raise ValueError(
                        f"steps_per_kernel={self.steps_per_kernel} must "
                        f"divide {name}={v} (detector checks run once per "
                        "kernel launch and fire on exact multiples)"
                    )
        if self.mg_slab_rows < 0 or self.mg_slab_rows % 16:
            raise ValueError(
                "mg_slab_rows must be 0 (auto) or a positive multiple of "
                "16 (keeps the streamed kernel's restrict/prolong slice "
                "offsets (i-1)*R/2 sublane-aligned for Mosaic)"
            )
        if self.mg_slab_rows > 0 and not (
                self.pressure_solver == "multigrid" and self.use_pallas):
            raise ValueError(
                "mg_slab_rows applies to the Pallas multigrid pressure "
                "path only (pressure_solver='multigrid', use_pallas=True)"
            )
        if self.mg_slab_rows > 0 and self.fused_step:
            raise ValueError(
                "mg_slab_rows (streamed multigrid) is incompatible with "
                "fused_step: the fused whole-step kernel is VMEM-resident"
            )
        if self.pressure_solver == "tiled" and self.dtype != "float32":
            raise ValueError(
                "pressure_solver='tiled' is float32-only (Pallas kernel); "
                "use 'sweeps' or 'multigrid' for float64"
            )
        # fused_step would previously fall back to the jnp path SILENTLY
        # when combined with incompatible options; fail at config time so
        # a user asking for the fused kernel either gets it or hears why.
        for flag in ("fused_step", "use_pallas"):
            if not getattr(self, flag):
                continue
            bad = []
            if self.dtype != "float32":
                bad.append(f"dtype={self.dtype!r} (Pallas kernels are float32)")
            # both flags compose with 'sweeps' (fused point-iteration
            # pressure loop: ops/pallas_kernels.py / the loop embedded in
            # ops/pallas_step.py) and with 'multigrid' (fused V-cycle:
            # ops/pallas_mg.py, also embedded in the fused step).
            allowed = ("sweeps", "multigrid")
            if self.pressure_solver not in allowed:
                bad.append(
                    f"pressure_solver={self.pressure_solver!r} (with "
                    f"{flag}, only {' / '.join(map(repr, allowed))} have "
                    "a fused Pallas kernel)"
                )
            if bad:
                raise ValueError(
                    f"{flag}=True is incompatible with "
                    + " and ".join(bad)
                    + f"; drop {flag} or the conflicting option"
                )

    @staticmethod
    def make(
        dt: float = 0.001,
        max_iterations: int = 100000,
        convergence_criteria: Optional[Dict[str, float]] = None,
        scheme: str = QUICK,
        relaxation_factors: Optional[Dict[str, float]] = None,
        **kw,
    ) -> "SolverSettings":
        """Dict-friendly constructor matching the reference's signature."""
        crit = dict(_DEFAULT_CRITERIA)
        if convergence_criteria:
            crit.update(convergence_criteria)
        relax = dict(_NO_RELAX)
        if relaxation_factors:
            relax.update(relaxation_factors)
        return SolverSettings(
            dt=dt,
            max_iterations=max_iterations,
            convergence_criteria=tuple(sorted(crit.items())),
            scheme=scheme,
            relaxation_factors=tuple(sorted(relax.items())),
            **kw,
        )

    def criterion(self, var: str) -> float:
        return dict(self.convergence_criteria)[var]

    def relax(self, var: str) -> float:
        return dict(self.relaxation_factors)[var]


@dataclass(frozen=True)
class CaseConfig:
    """One fully-specified flow case: the static trace key for the solver."""

    mesh: MeshParameters
    fluid: FluidProperties
    settings: SolverSettings
    u_bc: VariableBCs
    v_bc: VariableBCs
    p_bc: VariableBCs
    bfs: Optional[BFSGeometry] = None
    case_name: str = "lid driven cavity"
    bc_label: str = "lid_driven_cavity"

    @classmethod
    def build(
        cls,
        mesh: MeshParameters,
        fluid: FluidProperties,
        settings: SolverSettings,
        bc: BoundaryConditions,
        bfs: Optional[BFSGeometry] = None,
        case_name: str = "lid driven cavity",
        bc_label: str = "lid_driven_cavity",
    ) -> "CaseConfig":
        # VMEM-resident Pallas configurations: the whole working set
        # (state in/out + face fluxes + temps, ~30 f32 arrays) must fit
        # the v5e's 128 MiB VMEM. Measured ceiling ~900^2; beyond it,
        # Mosaic fails at compile time with an opaque allocation error,
        # so fail here with advice instead. use_pallas + multigrid is
        # EXEMPT: past the wall it auto-routes to the slab-streamed
        # V-cycle kernel (ops/pallas_stream.py), which holds only row
        # slabs + the coarse sub-hierarchy on-chip.
        vmem_resident = settings.fused_step or (
            settings.use_pallas and settings.pressure_solver != "multigrid"
        )
        if vmem_resident:
            est = (mesh.nx + 2) * (mesh.ny + 2) * 4 * 30
            if not settings.fused_step:
                # per-shard kernels under SpmdSolver hold 1/n of the rows
                est //= max(1, settings.spmd_devices)
            if est > 100 * 1024 * 1024:
                raise ValueError(
                    f"fused_step/use_pallas: {mesh.nx}x{mesh.ny} needs "
                    f"~{est / 2**20:.0f} MiB of VMEM (>100 MiB budget). Use "
                    "pressure_solver='multigrid' (use_pallas streams it "
                    "through VMEM at any size) for grids beyond ~900^2."
                )
        if settings.use_pallas and settings.pressure_solver == "multigrid":
            # the auto-routed slab-streamed V-cycle's own constraints,
            # surfaced at config time instead of the first pressure solve
            streams = (settings.mg_slab_rows > 0
                       or mesh.nx * mesh.ny > STREAM_MG_CELL_THRESHOLD)
            if streams and (mesh.nx % 2 or mesh.ny % 2):
                raise ValueError(
                    "use_pallas + multigrid past the VMEM wall streams "
                    f"the V-cycle, which needs even nx, ny (got {mesh.nx}"
                    f"x{mesh.ny}); drop use_pallas or use an even grid"
                )
            if streams and (settings.mg_n_pre < 1 or settings.mg_n_post < 1):
                raise ValueError(
                    "the slab-streamed V-cycle needs mg_n_pre >= 1 and "
                    "mg_n_post >= 1 (its entry-residual RMS and halo "
                    "widths are built from the smoothing sweeps)"
                )
        return cls(
            mesh=mesh,
            fluid=fluid,
            settings=settings,
            u_bc=bc.frozen("u"),
            v_bc=bc.frozen("v"),
            p_bc=bc.frozen("p"),
            bfs=bfs,
            case_name=case_name,
            bc_label=bc_label,
        )
