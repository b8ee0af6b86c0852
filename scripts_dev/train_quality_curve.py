"""Train-to-registration quality curve on synthetic pairs (no dataset needed).

VERDICT r1 item 7: "training works" must be a number. Trains the small
config from scratch on synthetic fragment pairs and records the validation
hit-ratio / RTE / RRE / registration-success curve at checkpoints. The
output JSON is checked into STATUS.md's quality-evidence section and the
same recipe runs (shortened) as a slow regression test
(tests/test_train.py::test_training_improves_matching).

Usage:  python scripts_dev/train_quality_curve.py [--steps 300] [--out curve.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--n-points", type=int, default=4000)
    # dense surfaces: at the default 1.5 m extent most voxels are isolated
    # (no occupied k3 neighbors) and the metric-learning task is unlearnable
    ap.add_argument("--extent", type=float, default=0.8)
    ap.add_argument("--max-points", type=int, default=8192)
    ap.add_argument("--lr", type=float, default=0.1)
    # VERDICT r2 item 6: >=16 val pairs — with 4, one pair flipping moved
    # the success metric by 25 points
    ap.add_argument("--val-pairs", type=int, default=16)
    ap.add_argument("--out", default="quality_curve.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.data.collate import collate_pairs
    from imfnet_tpu.data.synthetic import synthetic_pair
    from imfnet_tpu.models import load_model
    from imfnet_tpu.sparse.coords import SparseVoxels
    from imfnet_tpu.train.state import create_train_state, make_optimizer
    from imfnet_tpu.train.step import make_pyramid_fn, make_train_step
    from imfnet_tpu.train.validate import make_val_step

    config = threedmatch_config(
        batch_size=2, conv1_kernel_size=3, model_n_out=16,
        num_pos_per_batch=256, num_hn_samples_per_batch=128,
        max_points=args.max_points, lr=args.lr,
        val_subsample_size=2048, grid_extent=(256, 256, 256),
    )
    model = load_model(config.model)(
        in_channels=1, out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=True, bn_momentum=config.bn_momentum,
    )

    def make_batch(rng):
        pairs = [synthetic_pair(rng, n_points=args.n_points,
                                voxel_size=config.voxel_size,
                                extent=args.extent,
                                image_hw=(config.image_H, config.image_W))
                 for _ in range(config.batch_size)]
        return collate_pairs(pairs, config.max_points)

    train_rng = np.random.RandomState(0)
    val_batches = [
        collate_pairs([synthetic_pair(np.random.RandomState(10_000 + i),
                                      n_points=args.n_points,
                                      voxel_size=config.voxel_size,
                                      extent=args.extent,
                                      image_hw=(config.image_H,
                                                config.image_W))],
                      config.max_points)
        for i in range(args.val_pairs)
    ]

    b0 = make_batch(np.random.RandomState(99))
    sv = SparseVoxels(b0.coords0, b0.feats0, b0.n0)
    pyr = make_pyramid_fn(config, config.max_points, config.batch_size)(
        b0.coords0, b0.n0)
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, b0.image0,
                           train=False)
    tx = make_optimizer(config, steps_per_epoch=100)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx, config))
    val_config = config.replace(batch_size=1)
    val_step = make_val_step(model, val_config)

    def evaluate(state):
        ms = [val_step(state.params, state.batch_stats, vb,
                       jax.random.PRNGKey(7)) for vb in val_batches]
        return {k: float(np.mean([float(m[k]) for m in ms]))
                for k in ("hit_ratio", "rte", "rre", "success",
                          "feat_match_ratio")}

    curve = [{"step": 0, **evaluate(state)}]
    print(json.dumps(curve[-1]))
    t0 = time.perf_counter()
    losses = []
    for i in range(1, args.steps + 1):
        batch = make_batch(train_rng)
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        if i % args.eval_every == 0 or i == args.steps:
            point = {"step": i, "loss": float(np.mean(losses[-20:])),
                     **evaluate(state)}
            curve.append(point)
            print(json.dumps(point), flush=True)
    wall = time.perf_counter() - t0

    # trend gate (VERDICT r2 item 6): instead of a 2-endpoint comparison,
    # require the hit-ratio to trend up over the WHOLE curve — positive
    # least-squares slope and bounded drawdown from the running max — plus a
    # final FMR over the (>=16-pair) validation set.
    hrs = np.array([c["hit_ratio"] for c in curve])
    xs = np.array([c["step"] for c in curve], dtype=np.float64)
    slope = float(np.polyfit(xs, hrs, 1)[0]) if len(hrs) > 1 else 0.0
    drawdown = float(np.max(np.maximum.accumulate(hrs) - hrs))
    gate = {
        "n_val_pairs": args.val_pairs,
        "hit_ratio_slope_per_step": slope,
        "max_drawdown": drawdown,
        "monotone_ok": bool(slope > 0 and drawdown <= 0.3 * max(hrs.max(), 1e-9)),
        "final_hit_ratio": float(hrs[-1]),
        "final_fmr": float(curve[-1]["feat_match_ratio"]),
        "final_success": float(curve[-1]["success"]),
    }
    out = {
        "curve": curve,
        "gate": gate,
        "steps": args.steps,
        "wall_s": wall,
        "steps_per_s": args.steps / wall,
        "config": {"n_points": args.n_points, "lr": args.lr,
                   "batch_size": config.batch_size,
                   "max_points": args.max_points,
                   "val_pairs": args.val_pairs},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(gate))
    print(f"curve written to {args.out}; "
          f"hit_ratio {curve[0]['hit_ratio']:.3f} -> {curve[-1]['hit_ratio']:.3f}")


if __name__ == "__main__":
    main()
