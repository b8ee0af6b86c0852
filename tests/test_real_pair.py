"""Real-data train -> eval loop on the reference sample pair (slow).

Shortened CPU version of scripts_dev/train_real_pair.py (whose full on-chip
run is recorded in real_pair_r03.json): builds the reference-layout
training root from `files/cloud_bin_{0,1}.ply` aligned by the redkitchen
gt.log (0,1) pose, trains a tiny config through the ACTUAL CLI, and drives
registration of the original fragments with the trained checkpoint."""
import glob
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts_dev"))

REF_FILES = "/root/reference/files"

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.exists(REF_FILES), reason="no reference data")
def test_real_pair_cli_train_loop(tmp_path):
    import jax
    import jax.numpy as jnp

    from train_real_pair import REPO, build_workdir, redkitchen_gt_pose
    from imfnet_tpu.cli import _load_model_and_vars, main
    from imfnet_tpu.eval.extract import make_extractor, pad_points
    from imfnet_tpu.eval.registration import make_pair_registration
    from imfnet_tpu.geom.image import load_image, process_image
    from imfnet_tpu.geom.ply import read_ply

    workdir = str(tmp_path)
    T_gt = build_workdir(workdir, pairs_per_epoch=2)
    run_dir = os.path.join(workdir, "run")
    cwd = os.getcwd()
    os.chdir(workdir)  # CWD-relative config/*.txt (reference layout)
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

    # trainer artifacts: config snapshot, val scalars, checkpoints
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    vals = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for ln in f:
            rec = json.loads(ln)
            assert np.isfinite(rec["value"]), rec
            if rec["tag"].startswith("val/"):
                vals.append(rec)
    assert vals, "no validation scalars recorded"
    ckpts = sorted(glob.glob(os.path.join(run_dir, "checkpoint*")))
    assert ckpts, os.listdir(run_dir)

    # the trained checkpoint drives registration of the ORIGINAL fragments
    model, variables, config = _load_model_and_vars(ckpts[-1])
    assert config.model_n_out == 16 and config.voxel_size == 0.05
    extract = make_extractor(model, variables, config=config, n_pad=8192)
    feats = []
    for k in (0, 1):
        pts = read_ply(os.path.join(REF_FILES, f"cloud_bin_{k}.ply"))["points"]
        img = process_image(
            load_image(os.path.join(REF_FILES, f"cloud_bin_{k}_0.png")),
            config.image_H, config.image_W)
        raw, n_raw = pad_points(pts.astype(np.float32), 1 << 18)
        feats.append(extract(jnp.asarray(raw), n_raw, jnp.asarray(img)[None]))
    register = make_pair_registration(
        voxel_size=config.voxel_size, num_keypoints=1024,
        num_hypotheses=2048, hypo_block=1024)
    # register_kp convention: T_gt maps SIDE-1 -> SIDE-0 (fragment 0 is
    # side 0; the gt.log pose maps fragment 1 into fragment 0's frame)
    m = register(jax.random.PRNGKey(0),
                 feats[0][0], feats[0][1], feats[0][2],
                 feats[1][0], feats[1][1], feats[1][2],
                 jnp.asarray(redkitchen_gt_pose(), jnp.float32),
                 jnp.eye(6, dtype=jnp.float32))
    out = {k: float(np.asarray(v)) for k, v in m.items()
           if np.asarray(v).size == 1}
    # 2 epochs is not converged — gate on the loop being wired, not quality
    assert np.isfinite(out["rre"]) and np.isfinite(out["rte"]), out
    assert 0.0 <= out["ir"] <= 1.0, out
