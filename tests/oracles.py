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
