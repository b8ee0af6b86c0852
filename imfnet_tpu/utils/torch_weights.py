"""Torch-weight conversion utilities.

Two capabilities mirrored from the reference:
- ImageNet-pretrained ResNet-34 initialization of the image trunk
  (`model/resnet.py:219-224` loads torchvision's resnet34 weights). No
  network egress here, so conversion is gated on a local .pth file.
- Checkpoint key migration (`lib/Test.py:5-26` renames
  `perceiver_io.*` → `attention_fusion.*` in a state dict).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def convert_resnet34_torch(state_dict: Dict[str, "object"]) -> Dict:
    """torchvision resnet34 state_dict (tensors or numpy) → flax param/stat
    trees for models.resnet.ResNetTrunk (conv1/bn1 + layer1 (3 blocks) +
    layer2 (4 blocks); deeper layers are dropped at the truncation point,
    `model/resnet.py:195-216`).

    Returns {"params": ..., "batch_stats": ...} subtrees to merge under the
    trunk's scope.
    """
    def np_(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def conv(prefix):
        # torch OIHW → flax HWIO
        return {"kernel": np_(state_dict[prefix + ".weight"]).transpose(2, 3, 1, 0)}

    def bn(prefix):
        return (
            {
                "scale": np_(state_dict[prefix + ".weight"]),
                "bias": np_(state_dict[prefix + ".bias"]),
            },
            {
                "mean": np_(state_dict[prefix + ".running_mean"]),
                "var": np_(state_dict[prefix + ".running_var"]),
            },
        )

    params, stats = {}, {}
    params["conv1"] = conv("conv1")
    params["bn1"], stats["bn1"] = bn("bn1")
    for li, n_blocks in ((1, 3), (2, 4)):
        for b in range(n_blocks):
            name = f"layer{li}_block{b}"
            p, s = {}, {}
            p["conv1"] = conv(f"layer{li}.{b}.conv1")
            p["bn1"], s["bn1"] = bn(f"layer{li}.{b}.bn1")
            p["conv2"] = conv(f"layer{li}.{b}.conv2")
            p["bn2"], s["bn2"] = bn(f"layer{li}.{b}.bn2")
            if f"layer{li}.{b}.downsample.0.weight" in state_dict:
                p["down_conv"] = conv(f"layer{li}.{b}.downsample.0")
                p["down_bn"], s["down_bn"] = bn(f"layer{li}.{b}.downsample.1")
            params[name] = p
            stats[name] = s
    return {"params": params, "batch_stats": stats}


def load_pretrained_resnet34(variables: Dict, pth_path: str,
                             trunk_name: str = "img_encoder") -> Dict:
    """Merge converted torchvision weights into a model's variables. Requires
    torch (CPU) to unpickle the .pth."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    converted = convert_resnet34_torch(sd)
    import jax.numpy as jnp

    def as_f32(tree):
        import jax

        return jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), tree)

    variables = dict(variables)
    params = dict(variables["params"])
    params[trunk_name] = _merge(params.get(trunk_name, {}), as_f32(converted["params"]))
    stats = dict(variables.get("batch_stats", {}))
    stats[trunk_name] = _merge(stats.get(trunk_name, {}), as_f32(converted["batch_stats"]))
    variables["params"] = params
    variables["batch_stats"] = stats
    return variables


def _merge(dst, src):
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def migrate_checkpoint_keys(params: Dict, rename: Dict[str, str]) -> Dict:
    """Prefix-rename module keys in a param tree (the `lib/Test.py:14-23`
    capability, e.g. {"perceiver_io": "attention_fusion"})."""
    out = {}
    for k, v in params.items():
        nk = rename.get(k, k)
        out[nk] = migrate_checkpoint_keys(v, rename) if isinstance(v, dict) else v
    return out


# ---------------------------------------------------------------------------
# Full IMFNet checkpoint conversion (released .pth → flax variables)
# ---------------------------------------------------------------------------

def me_kernel_region_offsets(kernel_size: int, dimension: int = 3) -> np.ndarray:
    """int64[K, dimension] kernel offsets in MinkowskiEngine 0.5.4's
    enumeration order — an executable port of the `kernel_region` HYPER_CUBE
    iterator (ME `src/kernel_region.hpp`).

    ME's region iterator is an odometer over the spatial axes of the
    coordinate (layout [batch, x, y, ...]): it starts every axis at the
    region's lower bound and on each step increments the FIRST spatial axis,
    carrying into the next axis on overflow — so x varies fastest, the last
    axis slowest. For an odd kernel size k at dilation 1 the region is the
    centered cube [-(k//2), k//2]^d (`kernel_region` constructor: lower
    bound = -(k-1)/2 · dilation · tensor_stride per axis). IMFNet uses only
    odd sizes (1/3/5, `model/resunet.py:42-158`).

    MinkowskiConvolution consumes these as `out[u] = Σ_k W[k] · in[u + δ_k]`
    (the region is centered on each *output* coordinate and enumerates the
    input coordinates it gathers); MinkowskiConvolutionTranspose centers the
    region on each *input* coordinate and scatters to `in + δ_k`, i.e.
    `out[u] = Σ_k W[k] · in[u − δ_k]`.

    This function is the single source of truth for the converter's kernel
    permutation; tests/test_me_oracle.py drives one-hot/random kernels
    through the real engine against a numpy oracle built on it.
    """
    r = (kernel_size - 1) // 2
    cur = [-r] * dimension
    out = []
    for _ in range(kernel_size ** dimension):
        out.append(tuple(cur))
        for axis in range(dimension):  # first axis fastest (odometer)
            cur[axis] += 1
            if cur[axis] <= r:
                break
            cur[axis] = -r
    return np.array(out, np.int64)


def me_offset_permutation(kernel_size: int, reverse: bool = False) -> np.ndarray:
    """perm[k_ours] = k_me mapping our kernel-offset enumeration
    (itertools.product: dx slowest, dz fastest — sparse.kernel_map) onto
    MinkowskiEngine's region order (me_kernel_region_offsets).
    ``reverse=True`` additionally maps δ→−δ: our transpose-conv maps index by
    the offset from the *output* (fine) coordinate, ME's
    ConvolutionTranspose kernels by the offset from the input — opposite
    sign (see me_kernel_region_offsets docstring)."""
    me = me_kernel_region_offsets(kernel_size)
    me_index = {tuple(o): i for i, o in enumerate(me)}
    ks = kernel_size
    r = ks // 2
    perm = np.zeros(ks ** 3, np.int64)
    i = 0
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            for dz in range(-r, r + 1):
                d = (-dx, -dy, -dz) if reverse else (dx, dy, dz)
                perm[i] = me_index[d]
                i += 1
    return perm


def convert_imfnet_torch(
    state_dict: Dict[str, "object"],
    *,
    conv1_kernel_size: int = 5,
    depth: int = 0,
) -> Dict:
    """Convert a reference IMFNet checkpoint `state_dict` (the `'state_dict'`
    entry of the released .pth, torch tensors or numpy arrays) into flax
    variables {params, batch_stats} for models.resunet.ResUNetIMF.

    Module map (reference `model/resunet.py:25-161`):
      convN / convN_tr   → SparseConv kernels [K,in,out], K-axis permuted
                           from ME's offset order; k=1 convs stay [in,out]
      normN(_tr), blocks → MaskedBatchNorm scale/bias + running stats
      img_encoder.backbone → ResNetTrunk (convert_resnet34_torch)
      attention_fusion   → PreNorm cross-attn + GEGLU FF (torch Linear
                           [out,in] → flax Dense kernel [in,out])
    """
    def np_(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def get(key):
        if key in state_dict:
            return np_(state_dict[key])
        raise KeyError(f"missing checkpoint key: {key}")

    def sconv(prefix, kernel_size, transpose=False):
        w = get(prefix + ".kernel")
        if w.ndim == 2:   # kernel_size 1
            return {"kernel": w}
        perm = me_offset_permutation(kernel_size, reverse=transpose)
        return {"kernel": w[perm]}

    def bn(prefix):
        # ME.MinkowskiBatchNorm wraps torch BatchNorm1d as `.bn`
        p = prefix + ".bn" if (prefix + ".bn.weight") in state_dict else prefix
        return (
            {"MaskedBatchNorm_0": {"scale": get(p + ".weight"),
                                   "bias": get(p + ".bias")}},
            {"MaskedBatchNorm_0": {"mean": get(p + ".running_mean"),
                                   "var": get(p + ".running_var")}},
        )

    def block(prefix):
        p, s = {}, {}
        p["SparseConv_0"] = sconv(prefix + ".conv1", 3)
        p["SparseNorm_0"], s["SparseNorm_0"] = bn(prefix + ".norm1")
        p["SparseConv_1"] = sconv(prefix + ".conv2", 3)
        p["SparseNorm_1"], s["SparseNorm_1"] = bn(prefix + ".norm2")
        return p, s

    def linear(prefix, bias=True):
        out = {"kernel": get(prefix + ".weight").T}
        if bias:
            out["bias"] = get(prefix + ".bias")
        return out

    def layernorm(prefix):
        return {"scale": get(prefix + ".weight"), "bias": get(prefix + ".bias")}

    params: Dict = {}
    stats: Dict = {}

    params["conv1"] = sconv("conv1", conv1_kernel_size)
    params["norm1"], stats["norm1"] = bn("norm1")
    for i in (1, 2, 3, 4):
        if i > 1:
            params[f"conv{i}"] = sconv(f"conv{i}", 3)
            params[f"norm{i}"], stats[f"norm{i}"] = bn(f"norm{i}")
        params[f"block{i}"], stats[f"block{i}"] = block(f"block{i}")
    for i in (4, 3, 2):
        params[f"conv{i}_tr"] = sconv(f"conv{i}_tr", 3, transpose=True)
        params[f"norm{i}_tr"], stats[f"norm{i}_tr"] = bn(f"norm{i}_tr")
        params[f"block{i}_tr"], stats[f"block{i}_tr"] = block(f"block{i}_tr")
    params["conv1_tr"] = sconv("conv1_tr", 1)
    params["final"] = {"kernel": get("final.kernel"), "bias": get("final.bias")}

    # image trunk
    trunk_sd = {
        k[len("img_encoder.backbone."):]: v
        for k, v in state_dict.items()
        if k.startswith("img_encoder.backbone.")
    }
    trunk = convert_resnet34_torch(trunk_sd)
    params["img_encoder"] = trunk["params"]
    stats["img_encoder"] = trunk["batch_stats"]

    # attention fusion (`model/attention_fusion.py:98-154`)
    af = "attention_fusion"
    fusion = {
        "cross_norm_q": layernorm(f"{af}.cross_attend_blocks.0.norm"),
        "cross_norm_ctx": layernorm(f"{af}.cross_attend_blocks.0.norm_context"),
        "cross_attn": {
            "to_q": linear(f"{af}.cross_attend_blocks.0.fn.to_q", bias=False),
            "to_kv": linear(f"{af}.cross_attend_blocks.0.fn.to_kv", bias=False),
            "to_out": linear(f"{af}.cross_attend_blocks.0.fn.to_out"),
        },
        "cross_ff_norm": layernorm(f"{af}.cross_attend_blocks.1.norm"),
        "cross_ff": {
            "wi": linear(f"{af}.cross_attend_blocks.1.fn.net.0"),
            "wo": linear(f"{af}.cross_attend_blocks.1.fn.net.2"),
        },
    }
    for i in range(depth):
        fusion[f"self_norm_{i}"] = layernorm(f"{af}.layers.{i}.0.norm")
        fusion[f"self_attn_{i}"] = {
            "to_q": linear(f"{af}.layers.{i}.0.fn.to_q", bias=False),
            "to_kv": linear(f"{af}.layers.{i}.0.fn.to_kv", bias=False),
            "to_out": linear(f"{af}.layers.{i}.0.fn.to_out"),
        }
        fusion[f"self_ff_norm_{i}"] = layernorm(f"{af}.layers.{i}.1.norm")
        fusion[f"self_ff_{i}"] = {
            "wi": linear(f"{af}.layers.{i}.1.fn.net.0"),
            "wo": linear(f"{af}.layers.{i}.1.fn.net.2"),
        }
    params["attention_fusion"] = fusion

    def as_f32(tree):
        return {
            k: as_f32(v) if isinstance(v, dict) else np.asarray(v, np.float32)
            for k, v in tree.items()
        }

    return {"params": as_f32(params), "batch_stats": as_f32(stats)}


def load_imfnet_checkpoint(pth_path: str, **kwargs) -> Dict:
    """Unpickle a released IMFNet .pth (torch CPU) and convert. The reference
    stores the model under 'state_dict' with config under 'config'
    (`lib/trainer.py:183-198`)."""
    import torch

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return convert_imfnet_torch(sd, **kwargs)
