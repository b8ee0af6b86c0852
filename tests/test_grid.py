"""Grid-based coordinate index vs binary-search reference path."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from imfnet_tpu.models import load_model
from imfnet_tpu.sparse import grid as G
from imfnet_tpu.sparse import kernel_map as KM
from imfnet_tpu.sparse.build import from_numpy
from imfnet_tpu.sparse.coords import PAD_COORD

from test_models import make_cloud


def test_grid_lookup_exact(rng):
    c0 = make_cloud(rng, 150, 0, span=12)
    c1 = make_cloud(rng, 100, 1, span=12)
    coords = np.concatenate([c0, c1])
    sv = from_numpy(coords, np.ones((len(coords), 1), np.float32), 512)
    valid = np.arange(512) < len(coords)
    spec = G.GridSpec(extent=(64, 64, 64), num_batches=2)
    origins = G.batch_origins(sv.coords, jnp.asarray(valid), 2)
    g = G.build_grid(sv.coords, jnp.asarray(valid), origins, spec, 0)
    # every row must find itself
    hit = G.grid_lookup(g, origins, sv.coords, jnp.asarray(valid), spec, 0)
    np.testing.assert_array_equal(np.asarray(hit)[: len(coords)],
                                  np.arange(len(coords)))
    assert (np.asarray(hit)[len(coords):] == -1).all()
    # shifted queries must agree with a dict oracle
    shifted = np.asarray(sv.coords).copy()
    shifted[:, 3] += 1
    hit2 = np.asarray(
        G.grid_lookup(g, origins, jnp.asarray(shifted), jnp.asarray(valid), spec, 0)
    )
    table = {tuple(c): i for i, c in enumerate(np.asarray(sv.coords)[: len(coords)])}
    for i in range(len(coords)):
        assert hit2[i] == table.get(tuple(shifted[i]), -1)


@pytest.mark.slow
def test_grid_pyramid_matches_search_pyramid(rng):
    c0 = make_cloud(rng, 120, 0, span=10)
    c1 = make_cloud(rng, 90, 1, span=10)
    coords = np.concatenate([c0, c1])
    sv = from_numpy(coords, np.ones((len(coords), 1), np.float32), 512)
    caps = (512, 256, 128, 64)
    pyr_s = KM.build_pyramid(sv.coords, sv.num_valid, conv1_kernel_size=3,
                             level_capacity=caps)
    spec = G.GridSpec(extent=(64, 64, 64), num_batches=2)
    pyr_g = G.build_pyramid_grid(sv.coords, sv.num_valid, spec=spec,
                                 conv1_kernel_size=3, level_capacity=caps)

    for lvl in range(4):
        ns = int(pyr_s.levels[lvl].num_valid)
        ng = int(pyr_g.levels[lvl].num_valid)
        assert ns == ng, (lvl, ns, ng)
        cs = np.asarray(pyr_s.levels[lvl].coords)[:ns]
        cg = np.asarray(pyr_g.levels[lvl].coords)[:ng]
        # same coordinate SET (order may differ)
        assert {tuple(r) for r in cs} == {tuple(r) for r in cg}
        # neighbor structure: for each coord, the SET of neighbor coords per
        # offset index must agree
        def nbr_coords(pyr, lvl, which):
            lv = pyr.levels[lvl]
            nbr = np.asarray(getattr(lv, which))
            src_lvl = {"k3_same": lvl, "down": lvl - 1, "up": lvl + 1}[which]
            src = np.asarray(pyr.levels[src_lvl].coords)
            n = int(lv.num_valid)
            out = {}
            for i in range(n):
                key = tuple(np.asarray(lv.coords)[i])
                row = []
                for k in range(nbr.shape[1]):
                    j = nbr[i, k]
                    row.append(tuple(src[j]) if j >= 0 else None)
                out[key] = tuple(row)
            return out

        for which in ("k3_same", "down", "up"):
            if getattr(pyr_s.levels[lvl], which) is None:
                assert getattr(pyr_g.levels[lvl], which) is None
                continue
            a = nbr_coords(pyr_s, lvl, which)
            b = nbr_coords(pyr_g, lvl, which)
            assert a == b, (lvl, which)


def test_transpose_pyramid_matches_packed(rng):
    """map_impl='transpose' (scatter-derived up maps + half-probed same maps)
    must produce BIT-IDENTICAL maps to the all-probe packed path, including
    a k5 conv1 map and boundary-adjacent coordinates."""
    c0 = make_cloud(rng, 400, 0, span=15)
    c1 = make_cloud(rng, 300, 1, span=15)
    coords = np.concatenate([c0, c1])
    sv = from_numpy(coords, np.ones((len(coords), 1), np.float32), 1024)
    caps = (1024, 512, 256, 128)
    # span 15 → coords in [-15, 15), 30 cells: within the 32-cell extent
    # (in-extent is the pyramid precondition; see fits_grid) but touching
    # the base_ok margins on both sides
    spec = G.GridSpec(extent=(32, 32, 32), num_batches=2)
    pyr_p = G.build_pyramid_grid(sv.coords, sv.num_valid, spec=spec,
                                 conv1_kernel_size=5, level_capacity=caps,
                                 map_impl="packed")
    for impl in ("transpose", "ywide"):
        pyr_t = G.build_pyramid_grid(sv.coords, sv.num_valid, spec=spec,
                                     conv1_kernel_size=5, level_capacity=caps,
                                     map_impl=impl)
        np.testing.assert_array_equal(np.asarray(pyr_p.k5_l0),
                                      np.asarray(pyr_t.k5_l0),
                                      err_msg=f"{impl} k5")
        for lvl in range(4):
            lp, lt = pyr_p.levels[lvl], pyr_t.levels[lvl]
            assert int(lp.num_valid) == int(lt.num_valid)
            np.testing.assert_array_equal(np.asarray(lp.coords),
                                          np.asarray(lt.coords))
            for which in ("k3_same", "down", "up"):
                a, b = getattr(lp, which), getattr(lt, which)
                if a is None:
                    assert b is None
                    continue
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"{impl} level {lvl} {which}")


@pytest.mark.slow
def test_model_forward_same_with_grid_pyramid(rng):
    # compile-heavy (two full-model compiles, ~5 min on CPU): the per-map
    # equivalence is covered by test_banded_map + the pyramid structure
    # tests; this end-to-end variant runs under -m ""
    c0 = make_cloud(rng, 100, 0, span=10)
    c1 = make_cloud(rng, 80, 1, span=10)
    coords = np.concatenate([c0, c1])
    sv = from_numpy(coords, rng.randn(len(coords), 1).astype(np.float32), 512)
    caps = (512, 256, 128, 64)
    pyr_s = KM.build_pyramid(sv.coords, sv.num_valid, conv1_kernel_size=3,
                             level_capacity=caps)
    spec = G.GridSpec(extent=(64, 64, 64), num_batches=2)
    pyr_g = G.build_pyramid_grid(sv.coords, sv.num_valid, spec=spec,
                                 conv1_kernel_size=3, level_capacity=caps)
    model = load_model("ResUNetBN2C")(
        in_channels=1, out_channels=16, conv1_kernel_size=3,
        normalize_feature=True, compute_dtype=jnp.float32,
    )
    images = jnp.asarray(rng.rand(2, 24, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), sv, pyr_s, images, train=False)
    out_s = np.asarray(model.apply(variables, sv, pyr_s, images, train=False))
    out_g = np.asarray(model.apply(variables, sv, pyr_g, images, train=False))
    n = len(coords)
    np.testing.assert_allclose(out_g[:n], out_s[:n], rtol=1e-3, atol=1e-4)


def test_fits_grid():
    c = np.array([[0, 0, 0, 0], [0, 63, 63, 63]], np.int32)
    assert G.fits_grid(c, 2, G.GridSpec(extent=(64, 64, 64)))
    assert not G.fits_grid(c, 2, G.GridSpec(extent=(32, 64, 64)))


def test_quantize_grid_capacity_overflow(rng):
    """n_out smaller than the unique-cell count keeps exactly the scan-order
    prefix, with min-row (first-occurrence) winners."""
    xyz = (rng.rand(400, 3).astype(np.float32) - 0.5) * 2
    xyz = np.concatenate([xyz, xyz[:100]])  # guaranteed duplicates
    feats = np.arange(500, dtype=np.float32)[:, None]
    valid = jnp.ones(500, bool)
    spec = G.GridSpec(extent=(128, 128, 128), num_batches=1)
    n_out = 64
    sv, sel, xd = G.quantize_grid(jnp.asarray(xyz), jnp.asarray(feats),
                                  valid, 0.05, n_out, spec)
    assert int(sv.num_valid) == n_out
    coords = np.asarray(sv.coords)[:n_out]
    assert (coords != np.asarray(PAD_COORD)).any(axis=1).all()
    # scan order within the output
    keys = [tuple(c) for c in coords]
    assert keys == sorted(keys)
    # each representative is the min original row of its cell
    v = np.floor(xyz / 0.05).astype(np.int32)
    first = {}
    for i, cell in enumerate(map(tuple, v)):
        first.setdefault(cell, i)
    for c, s in zip(coords, np.asarray(sel)[:n_out]):
        assert first[tuple(c[1:])] == int(s)


def test_quantize_grid_matches_sort_quantize(rng):
    from imfnet_tpu.sparse.coords import quantize

    xyz = (rng.rand(500, 3).astype(np.float32) - 0.5) * 2
    feats = rng.randn(500, 1).astype(np.float32)
    valid = jnp.ones(500, bool)
    spec = G.GridSpec(extent=(128, 128, 128), num_batches=1)
    sv_g, sel_g, xd_g = G.quantize_grid(jnp.asarray(xyz), jnp.asarray(feats),
                                        valid, 0.05, 512, spec)
    sv_s, sel_s, xd_s = quantize(jnp.asarray(xyz), jnp.asarray(feats),
                                 valid, 0.05, 512)
    ng, ns = int(sv_g.num_valid), int(sv_s.num_valid)
    assert ng == ns
    # same (coord → representative row) mapping, order-insensitive
    mg = {tuple(c): int(s) for c, s in
          zip(np.asarray(sv_g.coords)[:ng], np.asarray(sel_g)[:ng])}
    ms = {tuple(c): int(s) for c, s in
          zip(np.asarray(sv_s.coords)[:ns], np.asarray(sel_s)[:ns])}
    assert mg == ms
