"""Command-line entry points.

Replaces the reference's script zoo: `train_3DMatch.py` / `train_Kitti.py`,
`scripts/generate_desc.py`, `scripts/evaluation_3dmatch.py`,
`scripts/evaluation_kitti.py`, `dam.py` — as subcommands of one CLI:

  python -m imfnet_tpu.cli train --dataset 3dmatch --threed-match-dir ...
  python -m imfnet_tpu.cli generate-desc --checkpoint ... --pcloud-root ...
  python -m imfnet_tpu.cli eval-3dmatch --desc-root ... --benchmark 3DMatch
  python -m imfnet_tpu.cli eval-kitti --checkpoint ... --kitti-root ...
  python -m imfnet_tpu.cli dam --checkpoint ... --ply ... --image ... --point 780
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np


def _base_config(args):
    from imfnet_tpu.config import Config, kitti_config, threedmatch_config

    # --resume-dir re-reads a previous run's config.json to reconstruct the
    # flags (`train_3DMatch.py:77-82` contract), then resumes from its last
    # checkpoint unless --resume names one explicitly
    over = {}
    if args.dataset == "synthetic":
        over["dataset"] = "SyntheticPairDataset"
    if getattr(args, "num_devices", None) is not None:
        over["data_parallel"] = args.num_devices
    for k in ("threed_match_dir", "overlap_path", "kitti_root", "out_dir",
              "max_epoch", "batch_size", "lr", "voxel_size", "trainer",
              "max_points", "seed", "resume",
              "model", "model_n_out", "conv1_kernel_size",
              "synthetic_length", "synthetic_n_points"):
        v = getattr(args, k, None)
        if v is not None:
            over[k] = v

    resume_dir = getattr(args, "resume_dir", None)
    if resume_dir:
        with open(os.path.join(resume_dir, "config.json")) as f:
            base = Config.from_json(f.read())
        if "resume" not in over:
            ckpts = sorted(
                d for d in os.listdir(resume_dir)
                if d.startswith("checkpoint") and
                os.path.isdir(os.path.join(resume_dir, d)))
            if ckpts:
                over["resume"] = os.path.join(resume_dir, ckpts[-1])
        over.pop("dataset", None)  # the resumed config's dataset wins
        return base.replace(**over)

    preset = kitti_config if args.dataset == "kitti" else threedmatch_config
    return preset(**over)


def _load_model_and_vars(checkpoint: str):
    """Rebuild the model from a checkpoint's embedded config
    (`scripts/generate_model.py:28-62` contract)."""
    import jax.numpy as jnp

    from imfnet_tpu.train.checkpoint import load_config_from_checkpoint
    from imfnet_tpu.train.trainer import build_model_from_config
    from flax import serialization

    config = load_config_from_checkpoint(checkpoint)
    model = build_model_from_config(config)
    with open(os.path.join(checkpoint, "state.msgpack"), "rb") as f:
        state = serialization.msgpack_restore(f.read())
    variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
    return model, variables, config


def cmd_train(args):
    from imfnet_tpu.data.datasets import make_data_loader
    from imfnet_tpu.parallel.mesh import initialize_distributed
    from imfnet_tpu.train.trainer import Trainer

    # multi-host (DCN) bring-up BEFORE any jax device query — new capability
    # vs the single-GPU reference (SURVEY.md §2.3)
    initialize_distributed(
        coordinator_address=getattr(args, "coordinator", None),
        num_processes=getattr(args, "num_processes", None),
        process_id=getattr(args, "process_id", None),
    )
    config = _base_config(args)
    train_loader = make_data_loader(config, "train", config.batch_size)
    val_loader = make_data_loader(config, "val", config.val_batch_size)
    trainer = Trainer(config, train_loader, val_loader)
    logging.info(
        "training on %d device(s) across %d process(es)%s",
        trainer.n_devices, __import__("jax").process_count(),
        " — data-parallel mesh over the pair axis"
        if trainer.n_devices > 1 else "")
    first = next(iter(train_loader))
    trainer.init_state(first)
    trainer.train()


def cmd_generate_desc(args):
    from imfnet_tpu.eval.threedmatch import generate_descriptors

    model, variables, config = _load_model_and_vars(args.checkpoint)
    stats = generate_descriptors(
        model, variables, config, args.pcloud_root, args.out_root,
        num_devices=args.num_devices)
    print(json.dumps(stats))


def cmd_eval_3dmatch(args):
    from imfnet_tpu.eval.threedmatch import evaluate

    if args.checkpoint:
        _, _, config = _load_model_and_vars(args.checkpoint)
    else:
        config = _base_config(args)
    summary = evaluate(
        config, args.desc_root, args.out_root, args.benchmark_dir,
        desc_type=args.desc_type,
        keypoints_root=args.keypoints_root,
        use_saved_keypoints=args.use_saved_keypoints or None,
        benchmark=args.benchmark,
    )
    print(json.dumps(summary))


def cmd_eval_kitti(args):
    from imfnet_tpu.data.datasets import make_data_loader
    from imfnet_tpu.eval.kitti import evaluate_kitti

    model, variables, config = _load_model_and_vars(args.checkpoint)
    if args.kitti_root:
        config = config.replace(kitti_root=args.kitti_root)
    loader = make_data_loader(config, "test", 1, shuffle=False)
    result = evaluate_kitti(model, variables, config, loader,
                            num_devices=args.num_devices)
    print(json.dumps(result))


def cmd_dam(args):
    import jax.numpy as jnp

    from imfnet_tpu.dam.dam import (
        descriptor_activation_map,
        image_activation_map,
        save_dam_image_overlay,
        save_dam_ply,
    )
    from imfnet_tpu.eval.extract import pad_points_bucketed
    from imfnet_tpu.geom.image import load_image, process_image
    from imfnet_tpu.geom.ply import read_ply
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
    from imfnet_tpu.train.step import make_pyramid_fn

    model, variables, config = _load_model_and_vars(args.checkpoint)
    points = read_ply(args.ply)["points"].astype(np.float32)
    image = process_image(load_image(args.image), config.image_H, config.image_W)
    n_pad = 1 << 15
    raw, n_raw = pad_points_bucketed(points)
    n_raw_pad = len(raw)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=1)
    sv, _, xyz_down = quantize_grid(
        jnp.asarray(raw), jnp.ones((n_raw_pad, 1), jnp.float32),
        jnp.arange(n_raw_pad) < n_raw, config.voxel_size, n_pad, spec)
    pyramid_fn = make_pyramid_fn(config, n_pad, 1)
    pyr = pyramid_fn(sv.coords, sv.num_valid)
    weights = descriptor_activation_map(
        model, variables, sv, pyr, jnp.asarray(image[None]), args.point)
    save_dam_ply(args.out, np.asarray(xyz_down), np.asarray(weights),
                 int(sv.num_valid))
    print(f"DAM written to {args.out}")
    if getattr(args, "image_out", None):
        sal = image_activation_map(
            model, variables, sv, pyr, jnp.asarray(image[None]), args.point)
        save_dam_image_overlay(args.image_out, image, np.asarray(sal))
        print(f"DAM image overlay written to {args.image_out}")


def cmd_convert_imfnet(args):
    """Released-weight parity, one command: reference .pth → our checkpoint
    directory (state.msgpack + meta.json with embedded config), loadable by
    every other subcommand via `--checkpoint`. Conversion contract:
    `scripts/generate_desc.py:160-175` (config embedded in the .pth drives
    model reconstruction) + `utils/torch_weights.convert_imfnet_torch`."""
    import torch
    from flax import serialization

    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.utils.torch_weights import convert_imfnet_torch

    ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    ref_cfg = ckpt.get("config", None)
    over = {}
    if ref_cfg is not None:
        ref = dict(ref_cfg)
        for k in ("trainer", "model", "model_n_out", "conv1_kernel_size",
                  "normalize_feature", "dist_type", "best_val_metric",
                  "voxel_size", "batch_size", "bn_momentum", "lr",
                  "max_epoch", "weight_decay"):
            if k in ref and ref[k] is not None:
                over[k] = ref[k]
    if args.voxel_size is not None:
        over["voxel_size"] = args.voxel_size
    config = threedmatch_config(**over)

    variables = convert_imfnet_torch(
        sd, conv1_kernel_size=config.conv1_kernel_size, depth=args.depth)
    n_params = sum(
        int(np.prod(np.shape(x)))
        for x in _tree_leaves(variables["params"]))

    os.makedirs(args.out, exist_ok=True)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    with open(os.path.join(args.out, "state.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    meta = dict(
        epoch=int(ckpt.get("epoch", 0) or 0),
        best_val=float(ckpt.get("best_val", 0.0) or 0.0),
        best_val_epoch=int(ckpt.get("best_val_epoch", 0) or 0),
        best_val_metric=str(ckpt.get("best_val_metric",
                                     config.best_val_metric)),
        config=json.loads(config.to_json()),
        format_version=1,
        converted_from=os.path.abspath(args.pth),
    )
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps({"out": args.out, "num_params": n_params,
                      "model": config.model,
                      "conv1_kernel_size": config.conv1_kernel_size}))


def _tree_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _tree_leaves(v)
        else:
            yield v


def cmd_compare(args):
    from imfnet_tpu.eval.compare import compare_methods

    roots = {}
    for spec in args.desc_roots:
        name, _, path = spec.partition("=")
        roots[name] = path
    config = _base_config(args)
    summary = compare_methods(
        roots, args.benchmark_dir, args.out_root, config,
        scenes=args.scenes or None, keypoints_root=args.keypoints_root)
    print(json.dumps({k: v for k, v in summary.items() if k != "views"}))


def cmd_convert_desc(args):
    from imfnet_tpu.eval.compare import convert_external_descriptors

    out = convert_external_descriptors(
        args.desc_root, args.keypoint_root, args.out_root,
        keypoint_replace=(args.desc_infix, args.keypoint_infix))
    print(json.dumps({"written": len(out)}))


def cmd_fuse_fragments(args):
    from imfnet_tpu.data.offline import fuse_scene

    written = fuse_scene(
        args.scene_dir, args.out_dir,
        frames_per_fragment=args.frames_per_fragment,
        frame_step=args.frame_step,
        dims=(args.resolution,) * 3, cubic_size=args.cubic_size,
        depth_scale=args.depth_scale, depth_trunc=args.depth_trunc)
    print(json.dumps({"fragments": written}))


def cmd_compute_overlap(args):
    from imfnet_tpu.data.offline import build_overlap_lists, voxel_down_sample_np
    from imfnet_tpu.geom.ply import read_ply

    plys = sorted(
        f for f in os.listdir(args.fragments_dir)
        if f.startswith("cloud_bin_") and f.endswith(".ply")
    )
    frags = []
    for f in plys:
        pts = read_ply(os.path.join(args.fragments_dir, f))["points"]
        # the reference caps inputs at ~300k points (`compute_overlap.py:101`)
        if len(pts) > args.max_points:
            pts = voxel_down_sample_np(pts, args.downsample_voxel)
        frags.append((f[: -len(".ply")], pts.astype(np.float32)))
    kept = build_overlap_lists(
        frags, args.out_dir, dist_thresh=args.dist_thresh,
        min_overlap=args.min_overlap)
    print(json.dumps({"pairs": [[a, b, r] for a, b, r in kept]}))


def cmd_compute_radius(args):
    from imfnet_tpu.data.offline import compute_radius
    from imfnet_tpu.geom.ply import read_ply

    outs = []
    for f in sorted(os.listdir(args.fragments_dir)):
        if not f.endswith(".ply"):
            continue
        path = os.path.join(args.fragments_dir, f)
        radii = compute_radius(read_ply(path)["points"],
                               nn_radius=args.nn_radius)
        out = path[: -len(".ply")] + ".radius.npy"
        np.save(out, radii)
        outs.append(out)
    print(json.dumps({"radius_files": outs}))


def cmd_visualize(args):
    from imfnet_tpu.utils.visualization import visualize_pair_registration

    model, variables, config = _load_model_and_vars(args.checkpoint)
    T, fitness = visualize_pair_registration(
        model, variables, config,
        args.ply0, args.image0, args.ply1, args.image1, args.out_dir)
    print(f"fitness {fitness:.4f}; views in {args.out_dir}")
    print(np.array_str(T, precision=4))


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(message)s",
        datefmt="%m/%d %H:%M:%S",
        stream=sys.stdout,
    )
    p = argparse.ArgumentParser(prog="imfnet-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train")
    pt.add_argument("--dataset", choices=["3dmatch", "kitti", "synthetic"],
                    default="3dmatch")
    for flag, typ in [("--threed-match-dir", str), ("--overlap-path", str),
                      ("--kitti-root", str), ("--out-dir", str),
                      ("--max-epoch", int), ("--batch-size", int),
                      ("--lr", float), ("--voxel-size", float),
                      ("--trainer", str), ("--max-points", int),
                      ("--seed", int), ("--resume", str),
                      ("--resume-dir", str),
                      # net group flags (`config_3dmatch.py:60-76`)
                      ("--model", str), ("--model-n-out", int),
                      ("--conv1-kernel-size", int),
                      ("--synthetic-length", int),
                      ("--synthetic-n-points", int)]:
        pt.add_argument(flag, type=typ, default=None,
                        dest=flag[2:].replace("-", "_"))
    pt.add_argument("--num-devices", type=int, default=None,
                    dest="num_devices",
                    help="data-parallel mesh size over the pair axis: "
                         "0 = auto (all devices), 1 = single device, "
                         "N = exactly N (default: 1 — DP is opt-in because "
                         "it changes effective batch size and steps/epoch)")
    # multi-host (DCN): one process per host, rendezvous at the coordinator
    pt.add_argument("--num-processes", type=int, default=None)
    pt.add_argument("--process-id", type=int, default=None)
    pt.add_argument("--coordinator", type=str, default=None,
                    help="host:port of process 0 for jax.distributed")
    pt.set_defaults(fn=cmd_train)

    pv = sub.add_parser("visualize")
    pv.add_argument("--checkpoint", required=True)
    pv.add_argument("--ply0", required=True)
    pv.add_argument("--image0", default="")
    pv.add_argument("--ply1", required=True)
    pv.add_argument("--image1", default="")
    pv.add_argument("--out-dir", default="views")
    pv.set_defaults(fn=cmd_visualize)

    pg = sub.add_parser("generate-desc")
    pg.add_argument("--checkpoint", required=True)
    pg.add_argument("--pcloud-root", required=True)
    pg.add_argument("--out-root", required=True)
    pg.add_argument("--num-devices", type=int, default=1,
                    help="fragments extracted concurrently over a device "
                         "mesh (0 = all devices)")
    pg.set_defaults(fn=cmd_generate_desc)

    pe = sub.add_parser("eval-3dmatch")
    pe.add_argument("--checkpoint", default=None)
    pe.add_argument("--dataset", default="3dmatch")
    pe.add_argument("--desc-root", required=True)
    pe.add_argument("--out-root", required=True)
    pe.add_argument("--benchmark-dir", required=True)
    pe.add_argument("--benchmark", choices=["3DMatch", "3DLoMatch"],
                    default=None,
                    help="fixture set; selects <benchmark-dir>/<benchmark> "
                         "when benchmark-dir is a fixtures root "
                         "(`evaluation_3dmatch.py:272,582`); default infers "
                         "the label from benchmark-dir itself")
    pe.add_argument("--desc-type", default="IMFNet")
    pe.add_argument("--keypoints-root", default=None,
                    help="folder of per-pair keypoint npz caches (default "
                         "<out-root>/<desc-type>_keypoints)")
    pe.add_argument("--use-saved-keypoints", action="store_true",
                    help="replay cached keypoint indices instead of sampling"
                         " (reference cfg.keypoints)")
    pe.set_defaults(fn=cmd_eval_3dmatch)

    pk = sub.add_parser("eval-kitti")
    pk.add_argument("--checkpoint", required=True)
    pk.add_argument("--kitti-root", default=None)
    pk.add_argument("--num-devices", type=int, default=1,
                    help="pairs registered concurrently over a device mesh "
                         "(0 = all devices)")
    pk.set_defaults(fn=cmd_eval_kitti)

    pc = sub.add_parser("compare")
    pc.add_argument("--dataset", default="3dmatch")
    pc.add_argument("--desc-roots", nargs="+", required=True,
                    metavar="NAME=PATH",
                    help="first entry is the primary method")
    pc.add_argument("--benchmark-dir", required=True)
    pc.add_argument("--out-root", required=True)
    pc.add_argument("--scenes", nargs="*", default=None)
    pc.add_argument("--keypoints-root", default=None,
                    help="externally-provided keypoint caches shared by all"
                         " methods (default: sampled by the primary method)")
    pc.set_defaults(fn=cmd_compare)

    pci = sub.add_parser("convert-imfnet")
    pci.add_argument("--pth", required=True,
                     help="released reference checkpoint (.pth)")
    pci.add_argument("--out", required=True,
                     help="output checkpoint directory")
    pci.add_argument("--voxel-size", type=float, default=None)
    pci.add_argument("--depth", type=int, default=0,
                     help="fusion self-attention depth (IMFNet ships 0)")
    pci.set_defaults(fn=cmd_convert_imfnet)

    pcd = sub.add_parser("convert-desc")
    pcd.add_argument("--desc-root", required=True)
    pcd.add_argument("--keypoint-root", required=True)
    pcd.add_argument("--out-root", required=True)
    pcd.add_argument("--desc-infix", default=".desc.SpinNet.bin")
    pcd.add_argument("--keypoint-infix", default="_keypts")
    pcd.set_defaults(fn=cmd_convert_desc)

    pf = sub.add_parser("fuse-fragments")
    pf.add_argument("--scene-dir", required=True)
    pf.add_argument("--out-dir", required=True)
    pf.add_argument("--frames-per-fragment", type=int, default=50)
    pf.add_argument("--frame-step", type=int, default=1)
    pf.add_argument("--resolution", type=int, default=256)
    pf.add_argument("--cubic-size", type=float, default=6.0)
    pf.add_argument("--depth-scale", type=float, default=1000.0)
    pf.add_argument("--depth-trunc", type=float, default=6.0)
    pf.set_defaults(fn=cmd_fuse_fragments)

    po = sub.add_parser("compute-overlap")
    po.add_argument("--fragments-dir", required=True)
    po.add_argument("--out-dir", required=True)
    po.add_argument("--dist-thresh", type=float, default=0.075)
    po.add_argument("--min-overlap", type=float, default=0.3)
    po.add_argument("--max-points", type=int, default=300000)
    po.add_argument("--downsample-voxel", type=float, default=0.01)
    po.set_defaults(fn=cmd_compute_overlap)

    pr = sub.add_parser("compute-radius")
    pr.add_argument("--fragments-dir", required=True)
    pr.add_argument("--nn-radius", type=float, default=0.1)
    pr.set_defaults(fn=cmd_compute_radius)

    pd = sub.add_parser("dam")
    pd.add_argument("--checkpoint", required=True)
    pd.add_argument("--ply", required=True)
    pd.add_argument("--image", required=True)
    pd.add_argument("--point", type=int, default=780)
    pd.add_argument("--out", default="3D_head_map.ply")
    pd.add_argument("--image-out", default=None,
                    help="also write the image-side attribution overlay PNG")
    pd.set_defaults(fn=cmd_dam)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
