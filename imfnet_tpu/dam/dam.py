"""DAM — Descriptor Activation Mapping (interpretability).

Functional re-derivation of `pytorch_dam/` (`base_dam.py:105-188`,
`dam.py:15-20`): attribute a chosen point's 32-d descriptor back to input
points through the final 1x1 conv.

Reference mechanism, per descriptor channel i:
  loss_i = F[target, i]  (post-normalization descriptor)
  g_i    = d loss_i / d final.kernel          ∈ [Cin, Cout]
  w_i    = mean over Cin of g_i               ∈ [Cout]
  dam_i  = Σ_c w_i[c] · final_output[:, c]    ∈ [N]
  DAM    = relu(Σ_i dam_i)

The torch version backpropagates 32 times with `retain_graph=True` without
zeroing grads between channels (`base_dam.py:141-160`), so channel i actually
sees the *cumulative* gradient Σ_{j≤i} g_j. ``cumulative=True`` (default)
reproduces that exactly via a cumulative sum over `jax.jacrev` channels;
``cumulative=False`` gives the per-channel version. Instead of 32 sequential
backward passes through hooks, one `jacrev` computes all channel gradients in
a single compiled program.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def descriptor_activation_map(
    model,
    variables,
    sv,
    pyramid,
    image,
    target_index: int,
    *,
    cumulative: bool = True,
) -> jax.Array:
    """Per-point attribution weights [N] for the descriptor at target_index."""
    params = variables["params"]
    kernel = params["final"]["kernel"]  # [Cin, Cout] (1x1 conv)

    def with_kernel(k):
        p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
        p = {**p, "final": {**p["final"], "kernel": k}}
        out, inter = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            sv, pyramid, image, train=False,
            capture_intermediates=lambda mdl, _: mdl.name == "final",
            mutable=["intermediates"],
        )
        final_out = inter["intermediates"]["final"]["__call__"][0]  # [N, Cout]
        return out[target_index], final_out

    # all 32 channel gradients w.r.t. the final kernel in one pass
    jac, final_out = jax.jacrev(with_kernel, has_aux=True)(kernel)
    # jac: [Cout_desc, Cin, Cout]
    if cumulative:
        jac = jnp.cumsum(jac, axis=0)
    weights = jnp.mean(jac, axis=1)              # [Cout_desc, Cout]
    dams = jnp.einsum("ic,nc->in", weights, final_out)  # [Cout_desc, N]
    return jnp.maximum(jnp.sum(dams, axis=0), 0.0)


def dam_colors(weights: np.ndarray, num_valid: int) -> np.ndarray:
    """HSV-style heat colors for the attribution map (the visualization at
    `pytorch_dam/utils/image.py:123-168` writes these into a PLY)."""
    w = np.asarray(weights[:num_valid], np.float64)
    rng = w.max() - w.min()
    t = (w - w.min()) / (rng if rng > 0 else 1.0)
    # blue (cold) → red (hot), matplotlib-free
    h = (1.0 - t) * (240.0 / 360.0)
    hh = h * 6.0
    i = np.floor(hh).astype(int) % 6
    f = hh - np.floor(hh)
    p = np.zeros_like(t)
    q = 1.0 - f
    tt = f
    one = np.ones_like(t)
    r = np.choose(i, [one, q, p, p, tt, one])
    g = np.choose(i, [tt, one, one, q, p, p])
    b = np.choose(i, [p, p, tt, one, one, q])
    return np.stack([r, g, b], axis=1)


def save_dam_ply(path: str, xyz: np.ndarray, weights: np.ndarray, num_valid: int):
    """Write the colored attribution cloud (reference output contract:
    `files/3D_head_map.ply`, `dam.py:84-100`)."""
    from imfnet_tpu.geom.ply import write_ply

    colors = dam_colors(weights, num_valid)
    write_ply(path, np.asarray(xyz[:num_valid], np.float32), colors=colors)


def image_activation_map(model, variables, sv, pyramid, image,
                         target_index: int) -> jax.Array:
    """Image-side attribution [H, W]: saliency of the target point's
    descriptor w.r.t. the input image (|∇_image ‖F[target]‖₁| summed over
    RGB, grad × input). The image reaches the descriptor only through the
    bottleneck cross-attention, so this shows WHERE in the frame the fusion
    looked — the image-side complement of the reference's point-cloud DAM
    (its `show_cam_on_image` helper, `pytorch_dam/utils/image.py:81-104`,
    ships unused)."""

    def score(img):
        out = model.apply(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            sv, pyramid, img, train=False,
        )
        return jnp.sum(jnp.abs(out[target_index]))

    g = jax.grad(score)(image)           # [1, H, W, 3]
    sal = jnp.sum(jnp.abs(g * image), axis=-1)[0]
    return sal


def save_dam_image_overlay(path: str, image: np.ndarray,
                           saliency: np.ndarray) -> None:
    """Blend a heat colormap of the image-side attribution over the RGB
    frame and save it as PNG (the overlay contract of
    `pytorch_dam/utils/image.py:81-104`: heatmap + img, renormalized)."""
    img = np.asarray(image, np.float64)
    if img.max() > 1.0:
        img = img / 255.0
    s = np.asarray(saliency, np.float64)
    rng = s.max() - s.min()
    t = (s - s.min()) / (rng if rng > 0 else 1.0)
    heat = dam_colors(t.reshape(-1), t.size).reshape(*t.shape, 3)
    cam = heat + img
    cam = cam / cam.max()
    from imfnet_tpu.geom.image import save_image

    save_image(path, (cam * 255.0).astype(np.uint8))
