"""Descriptor extraction: raw points + image → (xyz_down, descriptors).

The jit-side equivalent of `extract_features` (`util/misc.py:21-104`): inside
one XLA program it voxel-quantizes (occupancy-1 features), builds the UNet
coordinate pyramid, and runs the model in eval mode. The host only pads the
raw point array to a static bucket.

Fragments whose voxel span exceeds the static dense-grid extent
(config.grid_extent) are routed host-side to the exact binary-search
pyramid instead of being silently cropped — the dense grid is a fast path,
never a field-of-view limit.
"""
from __future__ import annotations

import logging
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imfnet_tpu.config import Config
from imfnet_tpu.sparse.coords import quantize
from imfnet_tpu.train.step import make_pyramid_fn


def pad_points(xyz: np.ndarray, n_raw_pad: int) -> Tuple[np.ndarray, int]:
    """Pad raw points to a static bucket.

    Subsampling on overflow is a LOUD last resort, never silent: the
    reference quantizes ALL raw points (`util/misc.py:82-87`), and on the
    published-benchmark path dropped points also orphan saved keypoints
    (drawn from the full raw array, then voxel-hash-mapped against
    descriptors). Benchmark callers should use :func:`pad_points_bucketed`
    so real 3DMatch fragments (commonly >2^18 points) keep every point."""
    n = len(xyz)
    if n > n_raw_pad:
        logging.warning(
            "pad_points: fragment has %d raw points but the static bucket "
            "holds %d — randomly subsampling %d points. Descriptors and "
            "keypoint voxel-hash mapping will NOT cover the dropped points; "
            "use pad_points_bucketed / a larger bucket for exact results.",
            n, n_raw_pad, n - n_raw_pad)
        sel = np.random.RandomState(0).choice(n, n_raw_pad, replace=False)
        xyz = xyz[sel]
        n = n_raw_pad
    out = np.zeros((n_raw_pad, 3), np.float32)
    out[:n] = xyz
    return out, n


# Raw-point shape buckets for published-benchmark extraction: fine 2^15
# steps through the 3DMatch range (fragments commonly land just above 2^18
# — the reference's own sample is 268,977 points), coarser above. Only
# buckets actually hit cost a quantize compile.
RAW_BUCKETS = (
    1 << 17, 1 << 18, 294912, 327680, 360448, 393216, 458752,
    1 << 19, 786432, 1 << 20,
)


def pad_points_bucketed(
    xyz: np.ndarray, raw_buckets=RAW_BUCKETS
) -> Tuple[np.ndarray, int]:
    """Pad raw points to the smallest bucket that holds them ALL — no
    subsampling unless the fragment exceeds the largest configured bucket
    (then :func:`pad_points` subsamples with a loud warning). This is the
    benchmark-path entry: `generate_descriptors` must quantize every raw
    point like the reference (`util/misc.py:82-87`)."""
    n = len(xyz)
    for b in sorted(raw_buckets):
        if n <= b:
            return pad_points(xyz, b)
    return pad_points(xyz, max(raw_buckets))


def _span_fits_grid(xyz_raw, n_raw, voxel_size: float, extent) -> bool:
    """Host-side check that the fragment's voxel span fits the static grid
    (sparse.grid.fits_grid on raw points, BEFORE any cropping can happen)."""
    pts = np.asarray(xyz_raw)[: int(n_raw)]
    if len(pts) == 0:
        return True
    v = np.floor(pts / voxel_size)
    span = v.max(0) - v.min(0) + 1
    return bool((span <= np.asarray(extent)).all())


def pick_extent(xyz_raw, n_raw, voxel_size: float, config: Config):
    """Smallest configured extent bucket that holds the fragment's voxel
    span (config.grid_extent_buckets, smallest-first), or None for the
    exact binary-search path. Smaller static extents mean smaller packed
    tables — a measured 12.8 vs 16.3 ms quantize+pyramid at 128³ vs 256³
    (scripts_dev/profile_pyr_chain.py) — and the probe is a host-side
    min/max over the raw points."""
    if not config.use_grid_maps:
        return None
    for ext in extent_buckets(config):
        if _span_fits_grid(xyz_raw, n_raw, voxel_size, ext):
            return ext
    logging.warning(
        "fragment voxel span exceeds grid_extent %s; using the exact"
        " binary-search pyramid (no points dropped)",
        tuple(config.grid_extent))
    return None


def extent_buckets(config: Config):
    """Effective extent buckets, smallest-first. config.grid_extent stays
    the authoritative ceiling (fragments beyond it go to the exact path);
    grid_extent_buckets only adds SMALLER fast-path extents — entries at
    or above grid_extent are dropped so configs that shrink grid_extent
    (tests, custom datasets) keep their fallback semantics."""
    ge = tuple(config.grid_extent)
    eff = [tuple(b) for b in (config.grid_extent_buckets or ())
           if all(x <= y for x, y in zip(b, ge)) and tuple(b) != ge]
    return eff + [ge]


def make_extractor(model, variables, *, config: Config, n_pad: int,
                   voxel_size: float | None = None):
    """Returns extract(xyz_raw[nraw,3], n_raw, image[1,H,W,3]) →
    (xyz_down[n_pad,3], feats[n_pad,C], num_valid).

    Host wrapper over jitted variants keyed by extent bucket: the
    dense-grid fast path at the smallest fitting extent, and the exact
    binary-search path for fragments that exceed every bucket."""
    vox = voxel_size if voxel_size is not None else config.voxel_size

    def build(extent):
        pyramid_fn = make_pyramid_fn(config, n_pad, num_batches=1,
                                     use_grid=extent is not None,
                                     extent=extent)
        if extent is not None:
            from imfnet_tpu.sparse.grid import GridSpec, quantize_grid

            spec = GridSpec(extent=extent, num_batches=1)

            def quantize_fn(x, f, valid):
                return quantize_grid(x, f, valid, vox, n_pad, spec)
        else:
            def quantize_fn(x, f, valid):
                return quantize(x, f, valid, vox, n_pad)

        @jax.jit
        def extract(xyz_raw, n_raw, image):
            valid = jnp.arange(xyz_raw.shape[0]) < n_raw
            feats_in = jnp.ones((xyz_raw.shape[0], 1), jnp.float32)
            sv, _, xyz_down = quantize_fn(xyz_raw, feats_in, valid)
            pyr = pyramid_fn(sv.coords, sv.num_valid)
            feats = model.apply(variables, sv, pyr, image, train=False)
            return xyz_down, feats, sv.num_valid

        return extract

    variants = {}

    def extract(xyz_raw, n_raw, image):
        extent = pick_extent(xyz_raw, n_raw, vox, config)
        if extent not in variants:
            variants[extent] = build(extent)
        return variants[extent](xyz_raw, n_raw, image)

    return extract


DEFAULT_BUCKETS = (8192, 12288, 16384, 20480, 24576, 28672, 32768,
                   40960, 49152, 65536)


def make_bucketed_extractor(model, variables, *, config: Config,
                            buckets=DEFAULT_BUCKETS,
                            voxel_size: float | None = None):
    """Shape-bucketed extraction: quantize once at the largest bucket, fetch
    the (scalar) voxel count, then run the pyramid + forward at the smallest
    bucket that holds it. Scan-ordered quantize output packs valid rows at
    the front, so bucketing is a row slice — ~25-40% less padded work for
    typical fragments (3DMatch ~19k voxels vs a fixed 32k pad; KITTI varies
    10k-120k). One compile per (bucket, pyramid-path) actually hit,
    persisted in the compile cache.

    Fragments that exceed config.grid_extent take the exact binary-search
    pyramid (host-side span check), losing zero voxels.

    Returns extract(xyz_raw, n_raw, image) → (xyz_down[n,3], feats[n,C])
    numpy arrays trimmed to the valid count.
    """
    vox = voxel_size if voxel_size is not None else config.voxel_size
    n_max = buckets[-1]

    def build_quantize(extent):
        if extent is not None:
            from imfnet_tpu.sparse.grid import GridSpec, quantize_grid

            spec = GridSpec(extent=extent, num_batches=1)

            @jax.jit
            def quantize_max(xyz_raw, n_raw):
                valid = jnp.arange(xyz_raw.shape[0]) < n_raw
                feats_in = jnp.ones((xyz_raw.shape[0], 1), jnp.float32)
                sv, _, xyz_down = quantize_grid(xyz_raw, feats_in, valid,
                                                vox, n_max, spec)
                return sv, xyz_down
        else:
            @jax.jit
            def quantize_max(xyz_raw, n_raw):
                valid = jnp.arange(xyz_raw.shape[0]) < n_raw
                feats_in = jnp.ones((xyz_raw.shape[0], 1), jnp.float32)
                sv, _, xyz_down = quantize(xyz_raw, feats_in, valid, vox,
                                           n_max)
                return sv, xyz_down

        return quantize_max

    quantize_by_path = {}
    forward_by_bucket = {}

    def forward_for(bucket: int, extent):
        key = (bucket, extent)
        if key not in forward_by_bucket:
            pyramid_fn = make_pyramid_fn(config, bucket, num_batches=1,
                                         use_grid=extent is not None,
                                         extent=extent)

            @jax.jit
            def fwd(coords, feats_in, n, image):
                from imfnet_tpu.sparse.coords import SparseVoxels
                from imfnet_tpu.sparse.kernel_map import coarse_levels_fit

                sv = SparseVoxels(coords, feats_in, n)
                pyr = pyramid_fn(coords, n)
                feats = model.apply(variables, sv, pyr, image, train=False)
                return feats, coarse_levels_fit(pyr)

            forward_by_bucket[key] = fwd
        return forward_by_bucket[key]

    def extract(xyz_raw, n_raw, image):
        extent = pick_extent(xyz_raw, n_raw, vox, config)
        if extent not in quantize_by_path:
            quantize_by_path[extent] = build_quantize(extent)
        sv, xyz_down = quantize_by_path[extent](jnp.asarray(xyz_raw), n_raw)
        n = int(sv.num_valid)
        # bucket by the level-0 count, then ESCALATE if a coarser level's
        # unique count overflows its capacity (bucket // divisor):
        # low-merge geometry (sparse/dispersed points) can need a larger
        # bucket than level 0 alone suggests — descriptors from a truncated
        # pyramid are silently wrong, so overflow re-runs, never returns
        start = next((i for i, b in enumerate(buckets) if b >= n),
                     len(buckets) - 1)
        for bucket in buckets[start:]:
            fwd = forward_for(bucket, extent)
            feats, fits = fwd(sv.coords[:bucket], sv.feats[:bucket],
                              jnp.minimum(sv.num_valid, bucket), image)
            if bool(fits):
                break
            logging.warning(
                "fragment's coarse pyramid levels overflow bucket %d "
                "capacities — escalating", bucket)
        else:
            logging.error(
                "coarse pyramid levels overflow even the largest bucket %d; "
                "descriptors computed on a truncated pyramid", buckets[-1])
        return np.asarray(xyz_down)[:n], np.asarray(feats)[:n]

    return extract
