"""Low-overlap (3DLoMatch-style) registration gate (slow).

Shortened CPU version of scripts_dev/low_overlap_gate.py (whose full
on-chip run with a converged checkpoint is recorded in
low_overlap_r04.json): plane-sweep crops of the reference redkitchen pair
to a target gt-aligned voxel overlap, then the FULL keypoint pipeline
(extract -> keypoint sample -> descriptor NN -> RANSAC) on the crops.
With a 2-epoch checkpoint the gate asserts the mechanics — the achieved
overlap hits the target and the registration path returns finite metrics
at 3DLoMatch-like overlap — not converged quality.
Reference parity target this rehearses: 3DLoMatch RR (assets/RR.png)."""
import glob
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts_dev"))

REF_FILES = "/root/reference/files"

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.exists(REF_FILES), reason="no reference data")
def test_low_overlap_crop_and_register(tmp_path):
    import jax
    import jax.numpy as jnp

    from low_overlap_gate import crop_to_overlap, voxel_overlap
    from train_real_pair import build_workdir, redkitchen_gt_pose
    from imfnet_tpu.cli import _load_model_and_vars, main
    from imfnet_tpu.eval.extract import make_extractor, pad_points
    from imfnet_tpu.eval.registration import make_pair_registration
    from imfnet_tpu.geom.image import load_image, process_image
    from imfnet_tpu.geom.ply import read_ply

    workdir = str(tmp_path)
    T_gt = build_workdir(workdir, pairs_per_epoch=2)
    run_dir = os.path.join(workdir, "run")
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        main(["train", "--dataset", "3dmatch",
              "--threed-match-dir", os.path.join(workdir, "root"),
              "--overlap-path", os.path.join(workdir, "overlaps"),
              "--out-dir", run_dir,
              "--batch-size", "1", "--max-epoch", "2", "--lr", "0.1",
              "--voxel-size", "0.05", "--max-points", "8192",
              "--model-n-out", "16", "--conv1-kernel-size", "3",
              "--num-devices", "1"])
    finally:
        os.chdir(cwd)
    ckpt = sorted(glob.glob(os.path.join(run_dir, "checkpoint*")))[-1]
    model, variables, config = _load_model_and_vars(ckpt)

    p0 = read_ply(os.path.join(REF_FILES, "cloud_bin_0.ply"))["points"]
    p1 = read_ply(os.path.join(REF_FILES, "cloud_bin_1.ply"))["points"]
    p1w = p1 @ T_gt[:3, :3].T + T_gt[:3, 3]
    c0, c1w, ov, _ = crop_to_overlap(p0.astype(np.float64),
                                     p1w.astype(np.float64),
                                     config.voxel_size, 0.3)
    assert abs(ov - 0.3) < 0.05, ov
    assert voxel_overlap(c0, c1w, config.voxel_size) == pytest.approx(ov)
    T_inv = np.linalg.inv(T_gt)
    c1 = c1w @ T_inv[:3, :3].T + T_inv[:3, 3]

    extract = make_extractor(model, variables, config=config, n_pad=8192)
    feats = []
    for pts, k in ((c0, 0), (c1, 1)):
        img = process_image(
            load_image(os.path.join(REF_FILES, f"cloud_bin_{k}_0.png")),
            config.image_H, config.image_W)
        raw, n_raw = pad_points(pts.astype(np.float32), 1 << 18)
        feats.append(extract(jnp.asarray(raw), n_raw, jnp.asarray(img)[None]))
    register = make_pair_registration(
        voxel_size=config.voxel_size, num_keypoints=1024,
        num_hypotheses=2048, hypo_block=1024)
    m = register(jax.random.PRNGKey(0),
                 feats[0][0], feats[0][1], feats[0][2],
                 feats[1][0], feats[1][1], feats[1][2],
                 jnp.asarray(T_gt, jnp.float32),
                 jnp.eye(6, dtype=jnp.float32))
    out = {k: float(np.asarray(v)) for k, v in m.items()
           if np.asarray(v).size == 1}
    assert np.isfinite(out["rre_raw"]) and np.isfinite(out["rte_raw"]), out
    assert 0.0 <= out["inlier_ratio_mutual"] <= 1.0, out
