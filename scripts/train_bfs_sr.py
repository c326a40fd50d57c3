"""Generate BFS paired training data and train a BFS-specific 10->400 SR
model.

The reference trains its SR autoencoder on CAVITY sweeps only and reuses
it for BFS via aspect-ratio correction + adaptive normalization
(`bfs_ml_accelerated.py:979-1137`) - measured here, that warm start saves
only ~10-15% of the BFS fine iterations (consistent with the reference's
own ML-30000-vs-NORMAL-35000 budgets). Training on BFS pairs is the
capability the reference's pipeline was built for but never exercised;
this script does it end-to-end on TPU: coarse 10x10 + fine 400x400 BFS
solves over a Reynolds sweep (Re=400 held out), component-wise
standardization on the train split, 500-epoch training, artifact export
with the reference naming convention (suffix `swish_tpu_bfs`).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# coarse input resolution: 10 (the reference's BFS pairing) by default;
# LR_DIM=20 trains the 20->400 pair (4x richer SR input - the BFS ML
# fine phase is the whole-demo bottleneck and warm-start quality is
# what it pays for)
LR_DIM = int(os.environ.get("LR_DIM", 10))

# r3 (VERDICT r2 #4): widened from 7 to 13 train Reynolds numbers - the
# 21-sample r2 model's held-out U MAE (0.0102) was ~4x the cavity
# family's and made the BFS ML fine phase the whole-demo bottleneck
TRAIN_RE = [150, 200, 250, 300, 350, 450, 500, 550, 600, 650, 700, 750,
            800]
EVAL_RE = 400
# coarse-budget augmentation: the SR input at inference is a 30k-budget
# coarse field, but budgets vary across experiments (the reference's own
# marquee BFS run used a 100k coarse cap) - pairing SEVERAL coarse budgets
# to the same fine truth teaches robustness to the input's convergence
# level instead of memorizing one budget's transient
COARSE_BUDGETS = [20000, 30000]
# U-sample duplication: the U component carries the recirculation
# structure the warm start actually needs (and the r2 model's worst MAE);
# duplicating its samples weights the MSE toward it without touching the
# shared-weight architecture
U_DUP = 2
EPOCHS = 800
OUT = "artifacts"
SUFFIX = "swish_tpu_bfs"


def solve_bfs(re, n, max_iterations, **kw):
    from sr_for_cfd_tpu.workflow.hybrid import _make_solver

    solver = _make_solver("bfs", float(re), n, n, 2e-3, "UPWIND", None,
                          max_iterations, None, dtype="float32", **kw)
    t0 = time.time()
    solver.solve(f"/tmp/bfs_sweep_{n}_{re}", verbose=False,
                 save_results=False)
    fields = solver.interior_fields()
    print(f"  Re={re} {n}x{n}: {int(solver.state.count)} iters "
          f"{time.time()-t0:.1f}s", flush=True)
    return fields


def main():
    os.makedirs(OUT, exist_ok=True)
    res = sorted(TRAIN_RE + [EVAL_RE])
    pairs = {}
    for re in res:
        # fused kernel with inner cap 64 + 500 steps/launch: fields match
        # the jnp path to 1e-5 on a 1.5-scale field (measured at Re=400),
        # so the SR input distribution is preserved at ~100x the speed.
        # The demo's coarse phase mirrors these exact settings.
        budgets = COARSE_BUDGETS if re != EVAL_RE else [30000]
        coarses = [
            solve_bfs(re, LR_DIM, budget, chunk_size=budget,
                      pressure_sor=1.5, plateau_patience=5,
                      fused_step=True, inner_max_iter=64,
                      steps_per_kernel=500)
            for budget in budgets
        ]
        fine = solve_bfs(re, 400, 100000, chunk_size=10000,
                         pressure_solver="multigrid", fused_step=True)
        pairs[re] = (coarses, fine)

    # assemble per-(Re, budget, component) samples like the cavity loader;
    # every coarse budget pairs to the same fine truth
    import jax.numpy as jnp

    comps = ("u", "v", "p")
    x_lr, x_hr, keys = [], [], []
    for re in res:
        coarses, fine = pairs[re]
        for bi, coarse in enumerate(coarses):
            for c in comps:
                x_lr.append(np.asarray(coarse[c], np.float32))
                x_hr.append(np.asarray(fine[c], np.float32))
                keys.append((re, bi, c))
    x_lr = np.stack(x_lr)[..., None]
    x_hr = np.stack(x_hr)[..., None]
    train_mask = np.asarray([re != EVAL_RE for re, _, _ in keys])

    # component-wise standardization on the train split (reference
    # convention: per component x resolution stats)
    stats = {}
    for ci, c in enumerate(comps):
        sel = train_mask & np.asarray([k[2] == c for k in keys])
        for dim, arr in ((LR_DIM, x_lr), (400, x_hr)):
            vals = arr[sel]
            stats[f"mean{dim}_{c}"] = float(vals.mean())
            stats[f"std{dim}_{c}"] = float(max(vals.std(), 1e-8))

    def standardized(arr, dim):
        out = np.empty_like(arr)
        for i, (re, bi, c) in enumerate(keys):
            out[i] = (arr[i] - stats[f"mean{dim}_{c}"]) / stats[f"std{dim}_{c}"]
        return out

    z_lr = standardized(x_lr, LR_DIM)
    z_hr = standardized(x_hr, 400)

    from sr_for_cfd_tpu.workflow.training import (
        export_models, train_sr_autoencoder)

    # U-duplication = loss weighting (see U_DUP above)
    dup = np.asarray([U_DUP if c == "u" else 1 for _, _, c in keys])
    train_idx = np.repeat(np.nonzero(train_mask)[0],
                          dup[train_mask])
    result = train_sr_autoencoder(
        jnp.asarray(z_lr[train_idx]), jnp.asarray(z_hr[train_idx]),
        lr_dim=LR_DIM, hr_dim=400, epochs=EPOCHS, batch_size=8, verbose=True,
    )
    paths = export_models(result, stats, LR_DIM, 400, SUFFIX, out_dir=OUT)

    # held-out evaluation at Re=400 (reference's MAE / NMAE% metrics)
    from sr_for_cfd_tpu.sr.inference import SRModel

    model = SRModel.create(LR_DIM, 400, params=result.params)
    report = {}
    maes, nmaes = [], []
    for i, (re, bi, c) in enumerate(keys):
        if re != EVAL_RE:
            continue
        pred_z = np.asarray(model.predict(jnp.asarray(z_lr[i][None])))[0, ..., 0]
        pred = pred_z * stats[f"std400_{c}"] + stats[f"mean400_{c}"]
        truth = x_hr[i, ..., 0]
        mae = float(np.abs(pred - truth).mean())
        rng_ = float(truth.max() - truth.min())
        nmae = 100.0 * mae / max(rng_, 1e-8)
        report[c] = {"mae": mae, "nmae_pct": nmae}
        maes.append(mae)
        nmaes.append(nmae)
    report["avg_mae"] = float(np.mean(maes))
    report["avg_nmae_pct"] = float(np.mean(nmaes))
    report["train_samples"] = int(train_mask.sum())
    report["final_loss"] = float(result.loss_history[-1])
    print("BFS_SR_EVAL " + json.dumps(report), flush=True)
    tag = f"_{LR_DIM}to400" if LR_DIM != 10 else ""
    with open(os.path.join(OUT, f"bfs_sr_eval_{SUFFIX}{tag}.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("artifacts:", json.dumps({k: v for k, v in paths.items()}),
          flush=True)


if __name__ == "__main__":
    main()
