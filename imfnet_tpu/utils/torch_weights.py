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
