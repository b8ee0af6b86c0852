#!/usr/bin/env python
"""Root-cause diagnostic for the late-training validation rre drift.

VERDICT r3 weak item 4 / next-round item 3: in the real-pair overfit run,
val success falls after ~epoch 49 while hit_ratio rises monotonically.
The per-epoch diagnostics (corr_inliers up 187->484, irls_resid_inlier
flat ~0.04, rte flat ~2 cm, irls_resid_med down 0.98->0.59, rre up to
~4.6 deg) say the pose degrades through ROTATION only, while wrong
matches get geometrically closer. This script separates the two
candidate mechanisms on actual checkpoints (epochs 30 / 49 / 64):

  a) "solver fragility on good matches": fit IRLS on the GT-consistent
     subset only -> if that rre also rises, the solver is the problem.
  b) "near-miss outlier contamination / match concentration": report the
     IRLS weight mass landing on non-GT matches (approximated at the
     final par=1/8 on the converged residuals), the unique-NN-target
     fraction (descriptor peaking collapses many sources onto few
     targets), and the weighted spatial spread of the correspondence set
     (thin support under-constrains rotation).

Mirrors `train/validate.py` exactly (same subsample keys PRNGKey(i) per
val iteration) so the numbers line up with the recorded curve.

Usage:
  python scripts_dev/diag_val_collapse.py --run /tmp/real_pair_run \
      [--epochs 30 49 64] [--out val_collapse_diag.json]
"""
import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def find_ckpt(run_dir, epoch):
    pats = [os.path.join(run_dir, f"checkpoint_epoch_{epoch}_*"),
            os.path.join(run_dir, f"best_val_checkpoint_epoch_{epoch}_*")]
    for p in pats:
        hits = glob.glob(p)
        if hits:
            return hits[0]
    raise FileNotFoundError(f"no checkpoint for epoch {epoch} in {run_dir}")


def make_diag_step(model, config):
    import jax
    import jax.numpy as jnp
    from imfnet_tpu.match.irls import est_rigid_irls
    from imfnet_tpu.match.metrics import apply_transform, registration_error
    from imfnet_tpu.match.nn import nn_auto
    from imfnet_tpu.train.step import forward_pair
    from imfnet_tpu.train.validate import _subsample

    nn_block = max(int(config.nn_max_n), 128)
    k_sub = config.val_subsample_size

    @jax.jit
    def step(params, batch_stats, batch, key):
        f0, f1, _ = forward_pair(model, params, batch_stats, batch,
                                 train=False, config=config)
        v0 = jnp.arange(f0.shape[0]) < batch.n0
        v1 = jnp.arange(f1.shape[0]) < batch.n1
        k0, k1 = jax.random.split(key)
        i0, ok0 = _subsample(k0, v0, k_sub)
        i1, ok1 = _subsample(k1, v1, k_sub)
        sf0, sx0 = jnp.take(f0, i0, 0), jnp.take(batch.xyz0, i0, 0)
        sf1, sx1 = jnp.take(f1, i1, 0), jnp.take(batch.xyz1, i1, 0)
        nn01 = nn_auto(sf0, sf1, ok1, block=nn_block)[0]
        x0c, x1c = sx0, jnp.take(sx1, nn01, 0)
        T_gt = batch.T_gt[0]
        wv = ok0.astype(jnp.float32)

        moved = apply_transform(x0c, T_gt)
        d = jnp.sqrt(jnp.sum((moved - x1c) ** 2, -1) + 1e-6)
        inl = (d < config.hit_ratio_thresh) * wv          # GT-consistent

        # full-set IRLS (the validation path)
        T_full = est_rigid_irls(x0c, x1c, valid=ok0)
        rre_f, rte_f = registration_error(T_gt, T_full)
        # GT-consistent-subset IRLS: "is the solver fine on good matches?"
        T_gtonly = est_rigid_irls(x0c, x1c, weight=inl)
        rre_g, rte_g = registration_error(T_gt, T_gtonly)

        # converged residuals + final-par Cauchy weights (par halves at
        # iters 5/10/15 of 20 -> final par = 1/8)
        r_est = jnp.sqrt(
            jnp.sum((apply_transform(x0c, T_full) - x1c) ** 2, -1) + 1e-12)
        par_f = jnp.float32(1.0 / 8.0)
        w_irls = wv * par_f / (r_est + par_f)
        w_gt_mass = jnp.sum(w_irls * inl) / jnp.maximum(jnp.sum(w_irls), 1e-9)

        # match concentration: unique NN targets among the valid rows
        t_sorted = jnp.sort(jnp.where(ok0, nn01, -1))
        uniq = jnp.sum((t_sorted[1:] != t_sorted[:-1]) & (t_sorted[1:] >= 0))
        n_ok = jnp.maximum(jnp.sum(wv), 1.0)

        # weighted spatial spread of the source support (sqrt eigvals of
        # the IRLS-weighted covariance): a thin min-axis means rotation is
        # observed through a short lever arm
        ws = w_irls / jnp.maximum(jnp.sum(w_irls), 1e-9)
        mu = jnp.sum(ws[:, None] * x0c, 0)
        xc = x0c - mu
        cov = (ws[:, None] * xc).T @ xc
        eig = jnp.linalg.eigvalsh(cov)
        # same spread over GT-consistent matches only
        wg = inl / jnp.maximum(jnp.sum(inl), 1e-9)
        mug = jnp.sum(wg[:, None] * x0c, 0)
        xg = x0c - mug
        eig_g = jnp.linalg.eigvalsh((wg[:, None] * xg).T @ xg)

        return {
            "rre_full": rre_f, "rte_full": rte_f,
            "rre_gtonly": rre_g, "rte_gtonly": rte_g,
            "hit_ratio": jnp.sum(inl) / n_ok,
            "w_gt_mass": w_gt_mass,
            "uniq_target_frac": uniq.astype(jnp.float32) / n_ok,
            "spread_w": jnp.sqrt(jnp.maximum(eig, 0.0)),
            "spread_gt": jnp.sqrt(jnp.maximum(eig_g, 0.0)),
            "resid_med_is": jnp.median(jnp.where(ok0, r_est, jnp.nan)),
        }

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="/tmp/real_pair_run")
    ap.add_argument("--epochs", type=int, nargs="+", default=[30, 49, 64])
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--out", default="val_collapse_diag.json")
    args = ap.parse_args()

    run_dir = os.path.join(args.run, "run")
    os.chdir(args.run)  # split lists are CWD-relative (reference contract)

    import jax
    from imfnet_tpu.cli import _load_model_and_vars
    from imfnet_tpu.data.datasets import make_data_loader

    rows = []
    for ep in args.epochs:
        ckpt = find_ckpt(run_dir, ep)
        model, variables, config = _load_model_and_vars(ckpt)
        loader = make_data_loader(config, "val", 1)
        step = make_diag_step(model, config)
        acc = {}
        it = iter(loader)
        n = min(args.iters, len(loader))
        for i in range(n):
            batch = next(it)
            out = step(variables["params"], variables.get("batch_stats", {}),
                       batch, jax.random.PRNGKey(i))
            for k, v in out.items():
                acc.setdefault(k, []).append(np.asarray(v))
        row = {"epoch": ep, "checkpoint": os.path.basename(ckpt)}
        for k, vs in acc.items():
            m = np.mean(np.stack(vs), axis=0)
            row[k] = m.tolist() if m.ndim else float(m)
        rows.append(row)
        print(json.dumps(row), flush=True)

    out_path = os.path.join(REPO, args.out)
    with open(out_path, "w") as f:
        json.dump({"iters_per_epoch": args.iters, "rows": rows,
                   "final_par": 0.125,
                   "note": "w_gt_mass = IRLS final-par Cauchy weight mass "
                           "on GT-consistent matches; spread_* = sqrt "
                           "eigvals of weighted source covariance (m)"},
                  f, indent=2)
    print("written to", out_path)


if __name__ == "__main__":
    main()
