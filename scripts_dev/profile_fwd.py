#!/usr/bin/env python
"""Micro-profile of forward-pass constituents at bench shapes."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from imfnet_tpu.sparse.ops import sparse_conv

ITERS = 10


def timeloop(name, body):
    @jax.jit
    def run():
        return jax.lax.fori_loop(
            0, ITERS, lambda i, c: body(c) * jnp.float32(1e-20), jnp.float32(0.0))

    _ = float(run())
    t0 = time.perf_counter()
    _ = float(run())
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def conv_case(rng, n_out, n_in, k, cin, cout, density=0.8):
    feats = jnp.asarray(rng.randn(n_in, cin).astype(np.float32))
    nbr = np.where(rng.rand(n_out, k) < density,
                   rng.randint(0, n_in, (n_out, k)), -1).astype(np.int32)
    nbrj = jnp.asarray(nbr)
    w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * 0.05)

    def body(c):
        out = sparse_conv(feats + c, nbrj, w, compute_dtype=jnp.bfloat16)
        return out[0, 0]

    return body


def main():
    rng = np.random.RandomState(0)
    # bench shapes: caps (40960, 13653, 5120, 2048)
    cases = [
        ("block1 conv 40960x27 32->32", 40960, 40960, 27, 32, 32),
        ("conv2 down 13653<-40960 32->64", 13653, 40960, 27, 32, 64),
        ("block2 conv 13653x27 64->64", 13653, 13653, 27, 64, 64),
        ("conv4_tr up 5120<-2048 256->128", 5120, 2048, 27, 256, 128),
        ("conv3_tr up 13653<-5120 256->64", 13653, 5120, 27, 256, 64),
        ("block3_tr conv 13653x27 64->64", 13653, 13653, 27, 64, 64),
        ("conv2_tr up 40960<-13653 128->64", 40960, 13653, 27, 128, 64),
        ("block2_tr conv 40960x27 64->64", 40960, 40960, 27, 64, 64),
    ]
    total = 0.0
    for name, n_out, n_in, k, cin, cout in cases:
        mult = 2 if name.startswith("block") else 1
        t = timeloop(name + (" x2" if mult == 2 else ""),
                     conv_case(rng, n_out, n_in, k, cin, cout))
        total += t * mult

    # conv1 occupancy path: exists matmul
    nbr5 = jnp.asarray(np.where(rng.rand(40960, 125) < 0.5,
                                rng.randint(0, 40960, (40960, 125)), -1).astype(np.int32))
    w5 = jnp.asarray(rng.randn(125, 32).astype(np.float32) * 0.05)

    def b_conv1(c):
        exists = (nbr5 >= 0).astype(jnp.bfloat16)
        out = jnp.dot(exists, w5.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) + c
        return out[0, 0]

    total += timeloop("conv1 occupancy 40960x125 @ 125x32", b_conv1)

    # image trunk at bench shape
    from imfnet_tpu.models.resnet import ResNetTrunk
    trunk = ResNetTrunk(compute_dtype=jnp.bfloat16)
    img = jnp.asarray(rng.rand(2, 120, 160, 3).astype(np.float32))
    tv = trunk.init(jax.random.PRNGKey(0), img, train=False)

    def b_trunk(c):
        out = trunk.apply(tv, img + c, train=False)
        return out[0, 0, 0, 0]

    total += timeloop("image trunk ResNet34 [2,120,160,3]", b_trunk)

    # attention fusion at bench shape
    from imfnet_tpu.models.fusion import AttentionFusion
    fus = AttentionFusion(dim=128, latent_dim=256, depth=0, cross_heads=1,
                          latent_heads=8, cross_dim_head=128,
                          latent_dim_head=128, compute_dtype=jnp.bfloat16)
    tokens = jnp.asarray(rng.rand(2, 300, 128).astype(np.float32))
    queries = jnp.asarray(rng.rand(2, 2048, 256).astype(np.float32))
    fv = fus.init(jax.random.PRNGKey(0), tokens, queries)

    def b_fus(c):
        out = fus.apply(fv, tokens + c, queries)
        return out[0, 0, 0]

    total += timeloop("attention fusion [2,2048,256]x[2,300,128]", b_fus)
    print(f"{'TOTAL (approx fwd)':44s} {total:8.2f} ms")


if __name__ == "__main__":
    main()
