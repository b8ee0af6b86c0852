"""Pure-numpy oracles for sparse ops (dense-grid reference implementations)."""
import itertools

import numpy as np


def offsets(kernel_size):
    r = kernel_size // 2
    return np.array(list(itertools.product(range(-r, r + 1), repeat=3)), dtype=np.int64)


def dense_sparse_conv(coords, feats, weight, kernel_size, tensor_stride=1,
                      out_coords=None, offset_scale=None):
    """Brute-force sparse conv oracle: out[y] = sum_k feats[y + off_k] @ W[k].

    coords: [N,4] (b,x,y,z); feats: [N,Cin]; weight: [K,Cin,Cout].
    out_coords defaults to coords (stride-1 conv).
    """
    if out_coords is None:
        out_coords = coords
    if offset_scale is None:
        offset_scale = tensor_stride
    offs = offsets(kernel_size) * offset_scale
    index = {tuple(c): i for i, c in enumerate(coords)}
    out = np.zeros((len(out_coords), weight.shape[2]), np.float64)
    for m, c in enumerate(out_coords):
        b = c[0]
        for k, off in enumerate(offs):
            key = (b, c[1] + off[0], c[2] + off[1], c[3] + off[2])
            i = index.get(key)
            if i is not None:
                out[m] += feats[i].astype(np.float64) @ weight[k].astype(np.float64)
    return out


def unique_first_occurrence(coords):
    """First-occurrence dedup of integer coord rows; returns (uniq, sel)."""
    seen = {}
    for i, c in enumerate(coords):
        seen.setdefault(tuple(c), i)
    items = sorted(seen.items())  # key-sorted like the engine
    uniq = np.array([k for k, _ in items], dtype=np.int64)
    sel = np.array([v for _, v in items], dtype=np.int64)
    return uniq, sel


def o3d_ransac_oracle(rng, src, dst, distance_threshold, *,
                      ransac_n=3, max_iteration=50000, max_validation=1000,
                      edge_length_ratio=0.9):
    """Sequential-semantics RANSAC oracle mirroring Open3D 0.12's
    `RegistrationRANSACBasedOnFeatureMatching` control flow as configured by
    the reference (`/root/reference/scripts/benchmark_util.py:16-34`):

    - up to `max_iteration` sampling iterations; each draws `ransac_n`
      correspondences uniformly at random (with replacement, as o3d's
      per-slot `UniformRandInt` does),
    - the edge-length checker (both directions, ratio 0.9) runs before the
      fit; the distance checker runs on the sampled correspondences after it,
    - only models passing ALL checkers are validated (fitness/rmse over the
      full correspondence set), and validation stops after `max_validation`
      models — o3d's (50000, 1000) criteria,
    - best model by (fitness, then lower rmse); the raw sample fit is
      returned (o3d 0.12 does not refit).

    Vectorized over hypotheses but statistically identical to the sequential
    loop: the validated set is the first `max_validation` checker-passing
    samples in iteration order.
    """
    C = src.shape[0]
    idx = rng.randint(0, C, size=(max_iteration, ransac_n))
    s = src[idx]                                     # [I,n,3]
    d = dst[idx]
    # edge-length checker (no transform needed)
    ok = np.ones(max_iteration, bool)
    r2 = edge_length_ratio ** 2
    for a in range(ransac_n):
        for b in range(a + 1, ransac_n):
            ls2 = np.sum((s[:, a] - s[:, b]) ** 2, axis=-1)
            ld2 = np.sum((d[:, a] - d[:, b]) ** 2, axis=-1)
            ok &= (ls2 > r2 * ld2) & (ld2 > r2 * ls2)
    cand = np.nonzero(ok)[0]
    if cand.size == 0:
        return np.eye(4), 0.0
    sc, dc = s[cand], d[cand]
    # batched 3-point Kabsch (point-to-point, no scaling)
    ms, md = sc.mean(axis=1, keepdims=True), dc.mean(axis=1, keepdims=True)
    H = np.einsum("bni,bnj->bij", sc - ms, dc - md)
    U, _, Vt = np.linalg.svd(H)
    det = np.linalg.det(np.einsum("bij,bjk->bik", np.transpose(Vt, (0, 2, 1)),
                                  np.transpose(U, (0, 2, 1))))
    S = np.tile(np.eye(3), (cand.size, 1, 1))
    S[:, 2, 2] = det
    R = np.einsum("bij,bjk,bkl->bil", np.transpose(Vt, (0, 2, 1)), S,
                  np.transpose(U, (0, 2, 1)))
    t = md[:, 0] - np.einsum("bij,bj->bi", R, ms[:, 0])
    # distance checker on the sampled correspondences (needs the transform)
    moved_s = np.einsum("bij,bnj->bni", R, sc) + t[:, None]
    ok2 = np.all(np.sum((moved_s - dc) ** 2, axis=-1)
                 <= distance_threshold ** 2, axis=1)
    passing = np.nonzero(ok2)[0][:max_validation]   # first 1000 in iter order
    if passing.size == 0:
        return np.eye(4), 0.0
    # full validation over the correspondence set, batched
    Rp, tp = R[passing], t[passing]
    moved = np.einsum("bij,nj->bni", Rp, src) + tp[:, None]
    d2 = np.sum((moved - dst[None]) ** 2, axis=-1)  # [V,C]
    inl = d2 <= distance_threshold ** 2
    counts = inl.sum(axis=1)
    rmse = np.sqrt(np.where(inl, d2, 0.0).sum(axis=1) / np.maximum(counts, 1))
    best = np.lexsort((rmse, -counts))[0]
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = Rp[best], tp[best]
    return T, counts[best] / C
