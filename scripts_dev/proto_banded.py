"""Prototype: banded one-hot GEMM sparse conv vs current gather strategies.

Premise (measured by profile_band.py): kernel-map targets are rank-monotone
in scan order. Per (dx,dy) kernel COLUMN, a block of B=256 output rows reads
a contiguous input window of <~512 rows (per-offset spread p100 ~450 for
stride-1 maps, ~160 for up maps). Selection within the window is a 0/1
matmul on the MXU instead of XLA's ~3.4 ns/row gathers.

Variants (both use per-column dynamic windows):
  banded_col_direct : one-hot [B, ncol, kz, W] over plain Cin-wide windows
  banded_col_anchor : one-hot [B, ncol, W] over kz-widened windows + z-select

Checks numerics vs _flat_apply on the REAL bench-pair kernel maps, then
times all strategies chained on the TPU.
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

from imfnet_tpu.sparse import ops as sops

ITERS = 10
BIG = jnp.int32(1 << 30)


def _pad_rows(nbr, B):
    n_out = nbr.shape[0]
    nb = -(-n_out // B)
    pad = nb * B - n_out
    if pad:
        nbr = jnp.concatenate(
            [nbr, jnp.full((pad, nbr.shape[1]), -1, jnp.int32)], 0)
    return nbr, nb, n_out


def banded_col_direct(x, nbr, w, kz=3, B=256, W=512):
    n_in, cin = x.shape
    k = nbr.shape[1]
    ncol = k // kz
    cout = w.shape[2]
    nbr, nb, n_out = _pad_rows(nbr, B)

    xe = jnp.concatenate([x, jnp.zeros((W, cin), x.dtype)], 0)
    nbrw = nbr.reshape(nb, B, ncol, kz)
    valid = nbrw >= 0
    am = jnp.where(valid, nbrw, BIG)
    starts = jnp.min(am, axis=(1, 3))                       # [nb, ncol]
    starts = jnp.where(starts == BIG, 0, starts)
    hi = jnp.max(jnp.where(valid, nbrw, -1), axis=(1, 3))   # [nb, ncol]
    exact = jnp.all(hi - starts < W)
    local = nbrw - starts[:, None, :, None]                 # [nb,B,ncol,kz]

    def step(c, inp):
        st, loc, va = inp
        wins = jnp.stack([
            jax.lax.dynamic_slice(xe, (st[i], 0), (W, cin))
            for i in range(ncol)])                          # [ncol,W,cin]
        iota = jnp.arange(W, dtype=jnp.int32)
        oh = ((loc[..., None] == iota) & va[..., None]).astype(x.dtype)
        # [ncol, B*kz, W] @ [ncol, W, cin] -> [ncol, B*kz, cin]
        lhs = oh.transpose(1, 0, 2, 3).reshape(ncol, B * kz, W)
        g = jax.lax.dot_general(
            lhs, wins, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x.dtype)
        sel = g.reshape(ncol, B, kz, cin).transpose(1, 0, 2, 3)
        out = jax.lax.dot_general(
            sel.reshape(B, k * cin), w.reshape(k * cin, cout),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return c, out

    _, outs = jax.lax.scan(step, 0, (starts, local, valid))
    return outs.reshape(nb * B, cout)[:n_out], exact


def banded_col_anchor(x, nbr, w, kz=3, B=256, W=512):
    n_in, cin = x.shape
    k = nbr.shape[1]
    ncol = k // kz
    cout = w.shape[2]
    nbr, nb, n_out = _pad_rows(nbr, B)

    xp = jnp.concatenate([x, jnp.zeros((kz - 1, cin), x.dtype)], 0)
    xw = jnp.concatenate([xp[j:n_in + j] for j in range(kz)], 1)
    xe = jnp.concatenate([xw, jnp.zeros((W, kz * cin), x.dtype)], 0)

    nbrw = nbr.reshape(-1, ncol, kz)
    exists = nbrw >= 0
    anchor = jnp.full(nbrw.shape[:2], n_in, jnp.int32)
    for d in range(kz - 1, -1, -1):
        anchor = jnp.where(exists[..., d], nbrw[..., d], anchor)
    has = anchor < n_in
    pos = jnp.cumsum(exists.astype(jnp.int32), -1) - exists.astype(jnp.int32)

    anc = anchor.reshape(nb, B, ncol)
    hasb = has.reshape(nb, B, ncol)
    am = jnp.where(hasb, anc, BIG)
    starts = jnp.min(am, axis=1)                            # [nb, ncol]
    starts = jnp.where(starts == BIG, 0, starts)
    hi = jnp.max(jnp.where(hasb, anc, -1), axis=1)
    exact = jnp.all(hi - starts < W)
    local = anc - starts[:, None, :]                        # [nb,B,ncol]
    exb = exists.reshape(nb, B, ncol, kz)
    pob = pos.reshape(nb, B, ncol, kz)

    def step(c, inp):
        st, loc, hs, ex, po = inp
        wins = jnp.stack([
            jax.lax.dynamic_slice(xe, (st[i], 0), (W, kz * cin))
            for i in range(ncol)])                          # [ncol,W,kz*cin]
        iota = jnp.arange(W, dtype=jnp.int32)
        oh = ((loc[..., None] == iota) & hs[..., None]).astype(x.dtype)
        lhs = oh.transpose(1, 0, 2)                         # [ncol,B,W]
        g = jax.lax.dot_general(
            lhs, wins, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x.dtype)
        g = g.transpose(1, 0, 2).reshape(B, ncol, kz, cin)
        zero = jnp.zeros_like(g[:, :, 0, :])
        slots = []
        for d in range(kz):
            v = g[:, :, 0, :]
            for p in range(1, kz):
                v = jnp.where((po[..., d] == p)[..., None], g[:, :, p, :], v)
            slots.append(jnp.where(ex[..., d, None], v, zero))
        sel = jnp.stack(slots, 2).reshape(B, k * cin)
        out = jax.lax.dot_general(
            sel, w.reshape(k * cin, cout), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return c, out

    _, outs = jax.lax.scan(step, 0, (starts, local, hasb, exb, pob))
    return outs.reshape(nb * B, cout)[:n_out], exact


def timeloop(name, fn, x):
    @jax.jit
    def run(x0):
        def body(i, c):
            out = fn(x0 + c.astype(x0.dtype))
            return jnp.max(out) * jnp.asarray(1e-20, jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    _ = float(run(x))
    t0 = time.perf_counter()
    _ = float(run(x))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"  {name:32s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import pad_points
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
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
    pyr = make_pyramid_fn(config, 40960, num_batches=2)(sv.coords, sv.num_valid)
    lv = pyr.levels
    print(f"# voxels {int(sv.num_valid)}", flush=True)

    rng = np.random.RandomState(0)
    cases = [
        ("block1 L0 32->32", lv[0].k3_same, 32, 32, 512, 3),
        ("block2_tr L0 64->64", lv[0].k3_same, 64, 64, 512, 3),
        ("conv2_tr up L0<-L1 128->64", lv[0].up, 128, 64, 256, 3),
        ("block2 L1 64->64", lv[1].k3_same, 64, 64, 512, 3),
        ("block3 L2 128->128", lv[2].k3_same, 128, 128, 512, 3),
        ("conv1 k5 L0 32->32", pyr.k5_l0, 32, 32, 640, 5),
    ]
    for name, nbr, cin, cout, W, kz in cases:
        k = nbr.shape[1]
        n_in = int(np.asarray(nbr).max()) + 1
        caps = [c for c in (2048, 5120, 13653, 40960) if c >= n_in]
        n_in = caps[0]
        x = jnp.asarray(rng.randn(n_in, cin).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.randn(k, cin, cout) * 0.05).astype(np.float32)).astype(jnp.bfloat16)

        print(f"{name}: n_out={nbr.shape[0]} n_in={n_in} K={k}", flush=True)
        ref = np.asarray(sops._flat_apply(x, nbr, w))
        tol = 1e-2 * max(1.0, np.abs(ref).max())
        outd, exd = banded_col_direct(x, nbr, w, kz=kz, B=256, W=W)
        errd = np.abs(np.asarray(outd) - ref).max()
        print(f"  direct exact={bool(exd)} maxerr={errd:.3e}", flush=True)
        assert bool(exd) and errd < tol, (bool(exd), errd, tol)
        outa, exa = banded_col_anchor(x, nbr, w, kz=kz, B=256, W=W)
        erra = np.abs(np.asarray(outa) - ref).max()
        print(f"  anchor exact={bool(exa)} maxerr={erra:.3e}", flush=True)
        assert bool(exa) and erra < tol, (bool(exa), erra, tol)

        timeloop("flat", lambda xx: sops._flat_apply(xx, nbr, w), x)
        timeloop("zwin", lambda xx: sops._z3_apply(xx, nbr, w, kz), x)
        if cout < cin:
            timeloop("mul_first",
                     lambda xx: sops._mul_first_apply(xx, nbr, w), x)
        timeloop("banded_col_direct",
                 lambda xx: banded_col_direct(xx, nbr, w, kz=kz, B=256, W=W)[0], x)
        timeloop("banded_col_anchor",
                 lambda xx: banded_col_anchor(xx, nbr, w, kz=kz, B=256, W=W)[0], x)


if __name__ == "__main__":
    main()
