"""Forward-pass attribution at real bench shapes with REAL kernel maps.

Times (a) the full model forward, (b) the image trunk + fusion in
isolation, (c) every sparse conv of the ResUNet plan with the strategy the
chooser picks, using the actual pyramid of the reference sample pair.
The conv-sum vs full-forward gap attributes the non-conv remainder
(norms, relus, concats, fusion scatter/gather, L2 normalize).

Numbers include ~2.4/ITERS ms of tunnel overhead each — compare deltas.

Usage: python scripts_dev/profile_fwd2.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 20


def timeloop(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(i, c):
            out = fn(c, *a)
            return jnp.max(out).astype(jnp.float32) * jnp.float32(1e-20)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    _ = float(run(*args))
    t0 = time.perf_counter()
    _ = float(run(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import pad_points
    from imfnet_tpu.models import load_model
    from imfnet_tpu.models.resnet import ResNetTrunk
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
    from imfnet_tpu.sparse.ops import sparse_conv
    from imfnet_tpu.train.step import make_pyramid_fn
    import bench

    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    xyz0, xyz1, im0, im1, src = bench.load_pair(config)
    N_RAW = 1 << 18
    xyz0_raw, n0 = pad_points(xyz0, N_RAW)
    xyz1_raw, n1 = pad_points(xyz1, N_RAW)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)
    xyz_cat = np.concatenate([xyz0_raw, xyz1_raw])
    bidx = np.repeat(np.array([0, 1], np.int32), N_RAW)
    okm = np.zeros(2 * N_RAW, bool)
    okm[:n0] = True
    okm[N_RAW:N_RAW + n1] = True
    sv, _, _ = quantize_grid(jnp.asarray(xyz_cat),
                             jnp.ones((2 * N_RAW, 1), jnp.float32),
                             jnp.asarray(okm), config.voxel_size, 40960, spec,
                             batch_index=jnp.asarray(bidx))
    pyr = make_pyramid_fn(config, 40960, num_batches=2)(sv.coords,
                                                        sv.num_valid)
    lv = pyr.levels
    images = jnp.concatenate([jnp.asarray(im0[None]), jnp.asarray(im1[None])])
    print(f"# voxels {int(sv.num_valid)}", flush=True)

    model = load_model(config.model)(
        in_channels=1, out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum, compute_dtype=jnp.bfloat16,
        conv1_occupancy=True)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), sv, pyr, images, train=False))()

    total = timeloop("FULL forward", lambda c: model.apply(
        variables, sv._replace(feats=sv.feats + c), pyr, images, train=False))

    # image trunk alone (bf16 NHWC resnet34 through layer2)
    trunk = ResNetTrunk(compute_dtype=jnp.bfloat16)
    tvars = jax.jit(lambda: trunk.init(jax.random.PRNGKey(0), images,
                                       train=False))()
    timeloop("image trunk (resnet34/8)", lambda c: trunk.apply(
        tvars, images + c.astype(images.dtype), train=False))

    # model without image (fusion + trunk removed)
    model_noimg = load_model(config.model)(
        in_channels=1, out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum, compute_dtype=jnp.bfloat16,
        conv1_occupancy=True, with_image=False)
    nvars = jax.jit(lambda: model_noimg.init(
        jax.random.PRNGKey(0), sv, pyr, None, train=False))()
    timeloop("forward w/o image+fusion", lambda c: model_noimg.apply(
        nvars, sv._replace(feats=sv.feats + c), pyr, None, train=False))

    # every sparse conv of the plan, real maps, chooser-picked strategy
    rng = np.random.RandomState(0)
    ch, tr = (32, 64, 128, 256), (64, 64, 64, 128)
    N = [lv[i].k3_same.shape[0] for i in range(4)]
    plan = [
        ("block1 a/b 32->32 x2", lv[0].k3_same, lv[0].k3_same, 32, 32, 2),
        ("conv2 down 32->64", lv[1].down, lv[0].up, 32, 64, 1),
        ("block2 64->64 x2", lv[1].k3_same, lv[1].k3_same, 64, 64, 2),
        ("conv3 down 64->128", lv[2].down, lv[1].up, 64, 128, 1),
        ("block3 128->128 x2", lv[2].k3_same, lv[2].k3_same, 128, 128, 2),
        ("conv4 down 128->256", lv[3].down, lv[2].up, 128, 256, 1),
        ("block4 256->256 x2", lv[3].k3_same, lv[3].k3_same, 256, 256, 2),
        ("conv4_tr up 256->128", lv[2].up, lv[3].down, 256, 128, 1),
        ("block4_tr 128->128 x2", lv[2].k3_same, lv[2].k3_same, 128, 128, 2),
        ("conv3_tr up 256->64", lv[1].up, lv[2].down, 256, 64, 1),
        ("block3_tr 64->64 x2", lv[1].k3_same, lv[1].k3_same, 64, 64, 2),
        ("conv2_tr up 128->64", lv[0].up, lv[1].down, 128, 64, 1),
        ("block2_tr 64->64 x2", lv[0].k3_same, lv[0].k3_same, 64, 64, 2),
    ]
    conv_sum = 0.0
    for name, nbr, inv, cin, cout, mult in plan:
        n_in = int(inv.shape[0])
        x = jnp.asarray(rng.randn(n_in, cin).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.05).astype(np.float32))

        def body(c, xx=x, nbrx=nbr, invx=inv, wx=w):
            return sparse_conv(xx + c.astype(xx.dtype), nbrx, wx,
                               compute_dtype=jnp.bfloat16, nbr_inv=invx,
                               z_adjacent=True)

        dt = timeloop(f"{name}", body)
        conv_sum += dt * mult
    print(f"{'sum of k3 convs (xmult)':44s} {conv_sum:8.3f} ms", flush=True)
    print(f"{'FULL - convs (occupancy conv1+1x1+norms+fusion)':44s} "
          f"{total - conv_sum:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
