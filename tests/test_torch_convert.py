"""IMFNet torch-checkpoint conversion: structural + roundtrip validation.

Builds a reference-named state_dict (model/resunet.py key space) from our
model's own init variables via the inverse transforms, converts it with
convert_imfnet_torch, and requires the result to reproduce the init tree
exactly — pinning the key map, kernel-offset permutations, and transposes.
(Numerical parity against the *released* weights needs the .pth, which is
not available offline; the offset-order assumption is documented on
me_offset_permutation.)
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imfnet_tpu.models import load_model
from imfnet_tpu.sparse.build import from_numpy
from imfnet_tpu.sparse.kernel_map import build_pyramid
from imfnet_tpu.utils.torch_weights import (
    convert_imfnet_torch,
    me_offset_permutation,
)

from test_models import make_cloud


def test_offset_permutation_is_bijection():
    for ks in (3, 5):
        for rev in (False, True):
            p = me_offset_permutation(ks, reverse=rev)
            assert sorted(p) == list(range(ks ** 3))
    # center offset maps to center
    p = me_offset_permutation(3)
    assert p[13] == 13
    # reverse flips around the center
    pr = me_offset_permutation(3, reverse=True)
    assert pr[0] == me_offset_permutation(3)[26]


def _inv_perm(p):
    inv = np.empty_like(p)
    inv[p] = np.arange(len(p))
    return inv


def _emit_torch_dict(variables, conv1_k):
    """Inverse of convert_imfnet_torch: flax variables → reference-named
    numpy state_dict."""
    params = variables["params"]
    stats = variables["batch_stats"]
    sd = {}

    def put_bn(tkey, p, s):
        sd[tkey + ".bn.weight"] = np.asarray(p["MaskedBatchNorm_0"]["scale"])
        sd[tkey + ".bn.bias"] = np.asarray(p["MaskedBatchNorm_0"]["bias"])
        sd[tkey + ".bn.running_mean"] = np.asarray(s["MaskedBatchNorm_0"]["mean"])
        sd[tkey + ".bn.running_var"] = np.asarray(s["MaskedBatchNorm_0"]["var"])

    def put_sconv(tkey, p, ks, transpose=False):
        w = np.asarray(p["kernel"])
        if w.ndim == 2:
            sd[tkey + ".kernel"] = w
        else:
            perm = me_offset_permutation(ks, reverse=transpose)
            me = np.empty_like(w)
            me[perm] = w  # ours[k] = me[perm[k]]  ⇒  me[perm] = ours
            sd[tkey + ".kernel"] = me

    def put_block(tkey, p, s):
        put_sconv(tkey + ".conv1", p["SparseConv_0"], 3)
        put_bn(tkey + ".norm1", p["SparseNorm_0"], s["SparseNorm_0"])
        put_sconv(tkey + ".conv2", p["SparseConv_1"], 3)
        put_bn(tkey + ".norm2", p["SparseNorm_1"], s["SparseNorm_1"])

    put_sconv("conv1", params["conv1"], conv1_k)
    put_bn("norm1", params["norm1"], stats["norm1"])
    for i in (1, 2, 3, 4):
        if i > 1:
            put_sconv(f"conv{i}", params[f"conv{i}"], 3)
            put_bn(f"norm{i}", params[f"norm{i}"], stats[f"norm{i}"])
        put_block(f"block{i}", params[f"block{i}"], stats[f"block{i}"])
    for i in (4, 3, 2):
        put_sconv(f"conv{i}_tr", params[f"conv{i}_tr"], 3, transpose=True)
        put_bn(f"norm{i}_tr", params[f"norm{i}_tr"], stats[f"norm{i}_tr"])
        put_block(f"block{i}_tr", params[f"block{i}_tr"], stats[f"block{i}_tr"])
    put_sconv("conv1_tr", params["conv1_tr"], 1)
    sd["final.kernel"] = np.asarray(params["final"]["kernel"])
    sd["final.bias"] = np.asarray(params["final"]["bias"])

    # image trunk (flax HWIO → torch OIHW)
    tp = params["img_encoder"]
    ts = stats["img_encoder"]

    def put_tconv(tkey, p):
        sd[tkey + ".weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)

    def put_tbn(tkey, p, s):
        sd[tkey + ".weight"] = np.asarray(p["scale"])
        sd[tkey + ".bias"] = np.asarray(p["bias"])
        sd[tkey + ".running_mean"] = np.asarray(s["mean"])
        sd[tkey + ".running_var"] = np.asarray(s["var"])

    pre = "img_encoder.backbone"
    put_tconv(f"{pre}.conv1", tp["conv1"])
    put_tbn(f"{pre}.bn1", tp["bn1"], ts["bn1"])
    for li, nb in ((1, 3), (2, 4)):
        for b in range(nb):
            name = f"layer{li}_block{b}"
            put_tconv(f"{pre}.layer{li}.{b}.conv1", tp[name]["conv1"])
            put_tbn(f"{pre}.layer{li}.{b}.bn1", tp[name]["bn1"], ts[name]["bn1"])
            put_tconv(f"{pre}.layer{li}.{b}.conv2", tp[name]["conv2"])
            put_tbn(f"{pre}.layer{li}.{b}.bn2", tp[name]["bn2"], ts[name]["bn2"])
            if "down_conv" in tp[name]:
                put_tconv(f"{pre}.layer{li}.{b}.downsample.0", tp[name]["down_conv"])
                put_tbn(f"{pre}.layer{li}.{b}.downsample.1",
                        tp[name]["down_bn"], ts[name]["down_bn"])

    # attention fusion (flax Dense kernel [in,out] → torch Linear [out,in])
    fp = params["attention_fusion"]
    af = "attention_fusion"

    def put_lin(tkey, p, bias=True):
        sd[tkey + ".weight"] = np.asarray(p["kernel"]).T
        if bias:
            sd[tkey + ".bias"] = np.asarray(p["bias"])

    def put_ln(tkey, p):
        sd[tkey + ".weight"] = np.asarray(p["scale"])
        sd[tkey + ".bias"] = np.asarray(p["bias"])

    put_ln(f"{af}.cross_attend_blocks.0.norm", fp["cross_norm_q"])
    put_ln(f"{af}.cross_attend_blocks.0.norm_context", fp["cross_norm_ctx"])
    put_lin(f"{af}.cross_attend_blocks.0.fn.to_q", fp["cross_attn"]["to_q"], False)
    put_lin(f"{af}.cross_attend_blocks.0.fn.to_kv", fp["cross_attn"]["to_kv"], False)
    put_lin(f"{af}.cross_attend_blocks.0.fn.to_out", fp["cross_attn"]["to_out"])
    put_ln(f"{af}.cross_attend_blocks.1.norm", fp["cross_ff_norm"])
    put_lin(f"{af}.cross_attend_blocks.1.fn.net.0", fp["cross_ff"]["wi"])
    put_lin(f"{af}.cross_attend_blocks.1.fn.net.2", fp["cross_ff"]["wo"])
    return sd


def test_imfnet_checkpoint_roundtrip(rng):
    conv1_k = 3  # small kernel keeps the CPU test fast; same code path as 5
    model = load_model("ResUNetBN2C")(
        in_channels=1, out_channels=32, conv1_kernel_size=conv1_k,
        normalize_feature=True, compute_dtype=jnp.float32,
    )
    coords = make_cloud(rng, 150, 0, span=10)
    sv = from_numpy(coords, np.ones((len(coords), 1), np.float32), 256)
    pyr = build_pyramid(sv.coords, sv.num_valid, conv1_kernel_size=conv1_k,
                        level_capacity=(256, 128, 64, 64))
    image = jnp.asarray(rng.rand(1, 24, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, image, train=False)
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))

    sd = _emit_torch_dict(variables, conv1_k)
    converted = convert_imfnet_torch(sd, conv1_kernel_size=conv1_k)

    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(converted)
    paths_a = {jax.tree_util.keystr(p) for p, _ in flat_a}
    paths_b = {jax.tree_util.keystr(p) for p, _ in flat_b}
    assert paths_a == paths_b, paths_a ^ paths_b
    b_by_path = {jax.tree_util.keystr(p): v for p, v in flat_b}
    for p, v in flat_a:
        np.testing.assert_array_equal(
            v, b_by_path[jax.tree_util.keystr(p)], err_msg=jax.tree_util.keystr(p))

    # converted weights must drive the model
    out = model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        sv, pyr, image, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_imfnet_cli_roundtrip(rng, tmp_path):
    """`cli convert-imfnet --pth ... --out ...`: a reference-layout .pth
    (state_dict + embedded config, `lib/trainer.py:183-198`) becomes a
    checkpoint directory every other subcommand loads via --checkpoint —
    the one-command released-weight parity path."""
    import torch

    from imfnet_tpu.cli import _load_model_and_vars, main

    conv1_k = 3
    model = load_model("ResUNetBN2C")(
        in_channels=1, out_channels=32, conv1_kernel_size=conv1_k,
        normalize_feature=True, compute_dtype=jnp.float32,
    )
    coords = make_cloud(rng, 150, 0, span=10)
    sv = from_numpy(coords, np.ones((len(coords), 1), np.float32), 256)
    pyr = build_pyramid(sv.coords, sv.num_valid, conv1_kernel_size=conv1_k,
                        level_capacity=(256, 128, 64, 64))
    image = jnp.asarray(rng.rand(1, 24, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, image, train=False)
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    sd = {k: torch.from_numpy(v.copy())
          for k, v in _emit_torch_dict(variables, conv1_k).items()}

    pth = tmp_path / "imfnet_best.pth"
    torch.save({
        "state_dict": sd,
        "config": {"model": "ResUNetBN2C", "model_n_out": 32,
                   "conv1_kernel_size": conv1_k, "normalize_feature": True,
                   "voxel_size": 0.025, "best_val_metric": "feat_match_ratio"},
        "epoch": 17,
        "best_val": 0.95,
        "best_val_epoch": 15,
        "best_val_metric": "feat_match_ratio",
    }, str(pth))

    out_dir = tmp_path / "converted"
    main(["convert-imfnet", "--pth", str(pth), "--out", str(out_dir)])

    loaded_model, loaded_vars, config = _load_model_and_vars(str(out_dir))
    assert config.model == "ResUNetBN2C"
    assert config.conv1_kernel_size == conv1_k
    # weights survive the .pth → checkpoint-dir round trip bit-exactly
    flat_a = jax.tree_util.tree_leaves_with_path(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]})
    b_by_path = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_leaves_with_path(dict(loaded_vars))}
    assert {jax.tree_util.keystr(p) for p, _ in flat_a} == set(b_by_path)
    for p, v in flat_a:
        np.testing.assert_array_equal(v, b_by_path[jax.tree_util.keystr(p)],
                                      err_msg=jax.tree_util.keystr(p))
    # the checkpoint-built model runs at the config compute dtype (bf16) —
    # unit-norm descriptors must agree with the f32 reference to bf16 noise
    ref = np.asarray(model.apply(variables, sv, pyr, image, train=False))
    out = np.asarray(loaded_model.apply(loaded_vars, sv, pyr, image,
                                        train=False))
    n = int(sv.num_valid)
    cos = np.sum(ref[:n] * out[:n], axis=1)
    assert np.min(cos) > 0.995, float(np.min(cos))


def test_golden_descriptor_parity():
    """Released-weight golden-descriptor scaffold: when the .pth and a
    reference-generated .npz land (no egress here — they are not in this
    environment), this test converts the checkpoint, extracts descriptors on
    the reference's own sample fragment (`files/cloud_bin_0.ply` + image,
    the `generate_desc.py` contract), and compares row-for-row against the
    reference output. Point at them with IMFNET_PTH / IMFNET_GOLDEN_NPZ."""
    import os

    pth = os.environ.get("IMFNET_PTH")
    golden = os.environ.get("IMFNET_GOLDEN_NPZ")
    if not pth or not golden:
        pytest.skip("set IMFNET_PTH and IMFNET_GOLDEN_NPZ to run "
                    "released-weight parity")
    ply = "/root/reference/files/cloud_bin_0.ply"
    png = "/root/reference/files/cloud_bin_0_0.png"
    assert os.path.exists(ply) and os.path.exists(png)

    import tempfile

    from imfnet_tpu.cli import _load_model_and_vars, main
    from imfnet_tpu.eval.extract import make_bucketed_extractor, pad_points
    from imfnet_tpu.geom.image import load_image, process_image
    from imfnet_tpu.geom.ply import read_ply
    from imfnet_tpu.utils.hashing import voxel_key_rows

    with tempfile.TemporaryDirectory() as td:
        ckpt_dir = os.path.join(td, "ckpt")
        main(["convert-imfnet", "--pth", pth, "--out", ckpt_dir])
        model, variables, config = _load_model_and_vars(ckpt_dir)
        extract = make_bucketed_extractor(model, variables, config=config)
        pts = read_ply(ply)["points"].astype(np.float32)
        img = process_image(load_image(png), config.image_H, config.image_W)
        raw, n_raw = pad_points(pts, 1 << 18)
        xyz_down, feats = extract(raw, n_raw, jnp.asarray(img[None]))
        xyz_down, feats = np.asarray(xyz_down), np.asarray(feats)

    ref = np.load(golden)
    # row order may differ (ME hash order vs scan order): align by voxel key
    rows = voxel_key_rows(ref["xyz"], xyz_down, config.voxel_size)
    assert (rows >= 0).mean() > 0.999, "voxel sets diverge"
    ok = rows >= 0
    ours = feats[rows[ok]]
    theirs = np.asarray(ref["feature"])[ok]
    cos = np.sum(ours * theirs, axis=1) / (
        np.linalg.norm(ours, axis=1) * np.linalg.norm(theirs, axis=1) + 1e-12)
    assert np.median(cos) > 0.99, float(np.median(cos))
