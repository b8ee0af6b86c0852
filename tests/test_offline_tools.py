"""Offline data tools, visualization, weight conversion, metric aggregation."""
import numpy as np
import jax.numpy as jnp
import pytest

from imfnet_tpu.data.offline import (
    TSDFVolume,
    build_overlap_lists,
    compute_overlap_pair,
    compute_radius,
)


def test_tsdf_fusion_recovers_plane(rng):
    """Fuse synthetic depth frames of a flat wall; surface points must lie
    near the true plane."""
    h, w = 48, 64
    fx = fy = 50.0
    cx, cy = w / 2, h / 2
    intr = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    depth = np.full((h, w), 1.0, np.float32)  # wall at z=1m
    vol = TSDFVolume(origin=[-0.7, -0.6, 0.5], dims=(48, 40, 32), voxel=0.025,
                     trunc=0.075)
    for _ in range(3):
        vol.integrate(depth, intr, np.eye(4, dtype=np.float32))
    pts = vol.extract_point_cloud()
    assert len(pts) > 50
    assert np.abs(pts[:, 2] - 1.0).max() < 0.08  # within ~3 voxels of the wall


def test_overlap_pair_and_lists(tmp_path, rng):
    base = rng.rand(800, 3).astype(np.float32)
    a = base[:600]
    b = np.concatenate([base[200:800], rng.rand(100, 3).astype(np.float32) + 5])
    ratio, corr = compute_overlap_pair(a, b, dist_thresh=0.01)
    expect = 400 / 700  # 400 shared of max(600, 700)
    assert abs(ratio - expect) < 0.1
    assert (np.linalg.norm(a[corr[:, 0]] - b[corr[:, 1]], axis=1) <= 0.011).all()

    frags = [("cloud_bin_0", a), ("cloud_bin_1", b), ("cloud_bin_5", b)]
    kept = build_overlap_lists(frags, str(tmp_path), dist_thresh=0.01,
                               min_overlap=0.3)
    names = [(p, q) for p, q, _ in kept]
    assert ("cloud_bin_0", "cloud_bin_1") not in names  # adjacent skipped
    assert ("cloud_bin_0", "cloud_bin_5") in names
    assert (tmp_path / "cloud_bin_0-cloud_bin_5-overlap.txt").exists()
    assert (tmp_path / "cloud_bin_0-cloud_bin_5.npy").exists()


def test_compute_radius(rng):
    # regular grid with spacing 0.1: mean nn dist = 0.1 → radius 0.05
    g = np.stack(np.meshgrid(*[np.arange(5) * 0.1] * 3), -1).reshape(-1, 3)
    r = compute_radius(g, nn_radius=0.12, k=6)
    interior = r[(r > 0)]
    np.testing.assert_allclose(interior.mean(), 0.05, atol=0.01)


def test_prep_pipeline_cli(tmp_path, capsys):
    """fuse-fragments → compute-overlap → compute-radius through the CLI on a
    synthetic wall scene (the reference's offline data/ tool chain)."""
    import json
    from PIL import Image

    from imfnet_tpu.cli import main
    from imfnet_tpu.geom.ply import read_ply

    scene = tmp_path / "scene" / "seq-01"
    scene.mkdir(parents=True)
    h, w = 48, 64
    intr = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]])
    np.savetxt(tmp_path / "scene" / "camera-intrinsics.txt", intr)
    depth_mm = np.full((h, w), 1000, np.uint16)  # wall at z=1m
    for i in range(6):
        Image.fromarray(depth_mm).save(
            scene / f"frame-{i:06d}.depth.png")
        pose = np.eye(4)
        pose[0, 3] = 0.02 * i  # slight camera drift
        np.savetxt(scene / f"frame-{i:06d}.pose.txt", pose)

    frag_dir = tmp_path / "fragments"
    main(["fuse-fragments", "--scene-dir", str(tmp_path / "scene"),
          "--out-dir", str(frag_dir), "--frames-per-fragment", "2",
          "--resolution", "64", "--cubic-size", "3.0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["fragments"]) == 3
    pts = read_ply(out["fragments"][0])["points"]
    assert len(pts) > 50 and np.abs(pts[:, 2] - 1.0).max() < 0.15
    # fragment pose must be the base (first) frame's cam2world
    pose0 = np.load(frag_dir / "cloud_bin_0.pose.npy")
    np.testing.assert_allclose(pose0[0, 3], 0.0, atol=1e-9)
    pose1 = np.load(frag_dir / "cloud_bin_1.pose.npy")
    np.testing.assert_allclose(pose1[0, 3], 0.04, atol=1e-9)

    ov_dir = tmp_path / "overlaps"
    main(["compute-overlap", "--fragments-dir", str(frag_dir),
          "--out-dir", str(ov_dir), "--dist-thresh", "0.08"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    names = [(a, b) for a, b, _ in out["pairs"]]
    assert ("cloud_bin_0", "cloud_bin_2") in names  # same wall → high overlap
    assert ("cloud_bin_0", "cloud_bin_1") not in names  # adjacent skipped
    assert (ov_dir / "cloud_bin_0-cloud_bin_2-overlap.txt").exists()

    main(["compute-radius", "--fragments-dir", str(frag_dir)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["radius_files"]) == 3
    radii = np.load(out["radius_files"][0])
    assert len(radii) == len(pts) and (radii >= 0).all()


def test_visualization_outputs(tmp_path, rng):
    from imfnet_tpu.geom.ply import read_ply
    from imfnet_tpu.utils.visualization import (
        save_correspondence_view,
        save_registration_view,
    )

    xyz0 = rng.rand(50, 3)
    xyz1 = rng.rand(40, 3)
    T = np.eye(4)
    save_registration_view(str(tmp_path / "reg.ply"), xyz0, xyz1, T)
    d = read_ply(str(tmp_path / "reg.ply"))
    assert len(d["points"]) == 90 and "colors" in d

    pairs = np.stack([np.arange(10), np.arange(10)], 1)
    save_correspondence_view(str(tmp_path / "corr.ply"), xyz0, xyz1, pairs,
                             correct=np.arange(10) % 2 == 0)
    d2 = read_ply(str(tmp_path / "corr.ply"))
    assert len(d2["points"]) == 90 + 10 * 8


def test_resnet34_weight_conversion(rng):
    """Converted torchvision-shape weights must load into ResNetTrunk and
    change its output."""
    import jax
    from imfnet_tpu.models.resnet import ResNetTrunk
    from imfnet_tpu.utils.torch_weights import convert_resnet34_torch, _merge

    sd = {}

    def add_conv(name, cout, cin, k):
        sd[name + ".weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05

    def add_bn(name, c):
        sd[name + ".weight"] = np.abs(rng.randn(c).astype(np.float32))
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.01
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.01
        sd[name + ".running_var"] = np.abs(rng.randn(c).astype(np.float32)) + 1

    add_conv("conv1", 64, 3, 7)
    add_bn("bn1", 64)
    for b in range(3):
        add_conv(f"layer1.{b}.conv1", 64, 64, 3)
        add_bn(f"layer1.{b}.bn1", 64)
        add_conv(f"layer1.{b}.conv2", 64, 64, 3)
        add_bn(f"layer1.{b}.bn2", 64)
    for b in range(4):
        cin = 64 if b == 0 else 128
        add_conv(f"layer2.{b}.conv1", 128, cin, 3)
        add_bn(f"layer2.{b}.bn1", 128)
        add_conv(f"layer2.{b}.conv2", 128, 128, 3)
        add_bn(f"layer2.{b}.bn2", 128)
    add_conv("layer2.0.downsample.0", 128, 64, 1)
    add_bn("layer2.0.downsample.1", 128)

    converted = convert_resnet34_torch(sd)
    trunk = ResNetTrunk(compute_dtype=jnp.float32)
    x = jnp.asarray(rng.rand(1, 48, 64, 3).astype(np.float32))
    variables = trunk.init(jax.random.PRNGKey(0), x, train=False)
    out_before = trunk.apply(variables, x, train=False)
    merged = {
        "params": _merge(dict(variables["params"]), converted["params"]),
        "batch_stats": _merge(dict(variables["batch_stats"]),
                              converted["batch_stats"]),
    }
    out_after = trunk.apply(merged, x, train=False)
    assert out_after.shape == out_before.shape == (1, 6, 8, 128)
    assert np.abs(np.asarray(out_after) - np.asarray(out_before)).max() > 1e-3
    assert np.isfinite(np.asarray(out_after)).all()


def test_checkpoint_key_migration():
    from imfnet_tpu.utils.torch_weights import migrate_checkpoint_keys

    params = {"perceiver_io": {"w": 1}, "conv1": {"kernel": 2}}
    out = migrate_checkpoint_keys(params, {"perceiver_io": "attention_fusion"})
    assert "attention_fusion" in out and "perceiver_io" not in out
    assert out["conv1"]["kernel"] == 2


def test_compute_metrics_aggregation(tmp_path):
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.threedmatch import compute_metrics

    config = threedmatch_config()
    payloads = []
    for scene in ("sceneA", "sceneB"):
        rs = [
            {"frag1": "a", "frag2": "b", "num_inliers": 100,
             "inlier_ratio": ir, "gt_flag": 1, "rr": rr, "rre": 2.0 * rr,
             "rte": 0.1 * rr, "ir": 0.5}
            for ir, rr in [(0.5, 1), (0.01, 0), (0.3, 1), (0.25, 1)]
        ]
        payloads.append({"register_results": rs, "scene_name": scene,
                         "num_pairs": 4})
    s = compute_metrics(payloads, config, str(tmp_path))
    np.testing.assert_allclose(s["FMR"][0], 0.75)   # τ2=0.05 → 3/4
    np.testing.assert_allclose(s["FMR"][1], 0.75)   # τ2=0.20 → 3/4
    np.testing.assert_allclose(s["registration_recall"], 6 / 8)
    np.testing.assert_allclose(s["RRE"], 2.0)
    np.testing.assert_allclose(s["RTE"], 0.1)
