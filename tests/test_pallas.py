"""Pallas compositor vs the pure-JAX rasterizer (interpret mode on CPU).

The real-TPU parity run lives in the driver/verify flow; here the kernels
execute through the Pallas interpreter so CI (CPU) covers the kernel logic:
chunk-aligned binning layout, double-buffered DMA sequencing, prefix/suffix
scans, early-exit bookkeeping, and the custom VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu.render import (
    binning,
    pallas_rasterize as pr,
    pipeline,
    projection,
    rasterize,
)
from gaussiansplats3d_tpu.render.pipeline import chans_from_colors_logt


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pr.pl, "pallas_call", patched)


def build_inputs(n=800, sh_degree=0, width=96, height=96, seed=7):
    """Kernel-boundary inputs straight from the PRODUCTION fused path
    (bin_sort_records at f32 record precision for exactness)."""
    splats = gs.random_splats(jax.random.PRNGKey(seed), n, sh_degree=sh_degree)
    cam = gs.Camera.look_at((2.5, 1.5, 2.5), (0, 0, 0), fov_y_deg=60,
                            aspect=width / height)
    cfg = gs.RenderConfig(width=width, height=height, sh_degree=sh_degree,
                          record_precision="f32")
    proj = projection.project_splats(splats, cam, cfg)
    pairs = binning.bin_sort_records(proj, cfg)
    tile_ids = jnp.arange(cfg.num_tiles, dtype=jnp.int32)
    return cfg, pairs, tile_ids


def _flat_fields(pairs):
    return (pairs.xs, pairs.ys, pairs.cas, pairs.cbs, pairs.ccs,
            pairs.crs, pairs.cgs, pairs.cbs2, pairs.opas)


def _jax_args(xs, ys, cas, cbs, ccs, crs, cgs, cbs2, opas, rxs, rys):
    return (jnp.stack([xs, ys], axis=1), jnp.stack([cas, cbs, ccs], axis=1),
            jnp.stack([crs, cgs, cbs2], axis=1), opas,
            jnp.stack([rxs, rys], axis=1))


def test_forward_matches_jax_rasterizer():
    cfg, pairs, tile_ids = build_inputs()
    cap = pairs.capacity
    fields = _flat_fields(pairs)
    records = pr.pack_records_flat(*fields, pairs.rxs, pairs.rys)
    chans_p = pr.composite_tiles(cfg, cap, records, pairs.tile_starts,
                                 pairs.tile_counts, tile_ids)
    chans_j = chans_from_colors_logt(*rasterize.rasterize_pairs(
        cfg, cap, *_jax_args(*fields, pairs.rxs, pairs.rys),
        pairs.tile_starts, pairs.tile_counts, 0))
    # Early exit truncates contributions below T ~ 1/512.
    assert jnp.max(jnp.abs(chans_p - chans_j)) < 4e-3


def test_backward_matches_jax_rasterizer():
    cfg, pairs, tile_ids = build_inputs(n=400)
    cap = pairs.capacity
    fields = _flat_fields(pairs)
    gch = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0),
        (cfg.num_tiles, 4, cfg.tile_size ** 2), jnp.float32)

    def f_p(*fs):
        ch = pr.composite_tiles(
            cfg, cap, pr.pack_records_flat(*fs, pairs.rxs, pairs.rys),
            pairs.tile_starts, pairs.tile_counts, tile_ids)
        return jnp.sum(ch * gch)

    def f_j(*fs):
        ch = chans_from_colors_logt(*rasterize.rasterize_pairs(
            cfg, cap, *_jax_args(*fs, pairs.rxs, pairs.rys),
            pairs.tile_starts, pairs.tile_counts, 0))
        return jnp.sum(ch * gch)

    argnums = tuple(range(9))
    gp = jax.grad(f_p, argnums=argnums)(*fields)
    gj = jax.grad(f_j, argnums=argnums)(*fields)
    names = ("x", "y", "ca", "cb", "cc", "r", "g", "b", "opacity")
    for name, a, b in zip(names, gp, gj):
        scale = max(float(jnp.abs(b).max()), 1e-10)
        rel = float(jnp.abs(a - b).max()) / scale
        assert rel < 5e-3, (name, rel)


def test_full_pipeline_pallas_backend():
    splats = gs.random_splats(jax.random.PRNGKey(2), 500, sh_degree=1)
    cam = gs.Camera.look_at((2.0, 1.0, 2.2), (0, 0, 0), fov_y_deg=60)
    cfg_p = gs.RenderConfig(width=64, height=64, sh_degree=1,
                            backend="pallas")
    cfg_j = cfg_p.replace(backend="jax")
    out_p = gs.render(splats, cam, cfg_p)
    out_j = gs.render(splats, cam, cfg_j)
    assert jnp.max(jnp.abs(out_p["color"] - out_j["color"])) < 4e-3

    def loss(s, cfg):
        return jnp.mean(gs.render(s, cam, cfg)["color"] ** 2)

    gp = jax.grad(lambda s: loss(s, cfg_p))(splats)
    gj = jax.grad(lambda s: loss(s, cfg_j))(splats)
    for name in ("means", "scales", "quats", "colors", "sh"):
        a, b = getattr(gp, name), getattr(gj, name)
        scale = max(float(jnp.abs(b).max()), 1e-10)
        assert float(jnp.abs(a - b).max()) / scale < 1e-2, name


def test_binning_layout_invariants():
    cfg, pairs, _ = build_inputs(n=600)
    starts = np.asarray(pairs.tile_starts)
    counts = np.asarray(pairs.tile_counts)
    # Ranges are contiguous and ascending (CSR over the sorted pair list).
    assert (starts[1:] == starts[:-1] + counts[:-1]).all()
    n_valid = int(starts[-1] + counts[-1])
    assert n_valid == int(pairs.total_pairs) - int(pairs.overflow)
    # Sentinel (invalid) slots sort to the tail, outside every tile window,
    # and their opacity is zeroed so no compositor path can read them.
    opas = np.asarray(pairs.opas)
    assert (opas[n_valid:] == 0.0).all()
    assert (opas[:n_valid] > 0.0).any()


def test_depth_channel_pallas_matches_oracle():
    # 4-channel record layout (rgb + depth at rows 5-8, opacity/radius
    # shifted): forward depth map and gradients through it must match the
    # oracle / jax backend.
    splats = gs.random_splats(jax.random.PRNGKey(3), 500, sh_degree=0)
    cam = gs.Camera.look_at((2.5, 1.5, 2.5), (0, 0, 0), fov_y_deg=60,
                            aspect=1.0)
    cfg_p = gs.RenderConfig(width=96, height=96, return_depth=True,
                            backend="pallas")
    cfg_j = cfg_p.replace(backend="jax")
    ref = gs.reference_render(splats, cam, cfg_j)
    out = gs.render(splats, cam, cfg_p)
    assert jnp.max(jnp.abs(out["depth"] - ref["depth"])) < 1e-3
    assert jnp.max(jnp.abs(out["color"] - ref["color"])) < 4e-3

    def loss(s, cfg):
        o = gs.render(s, cam, cfg)
        return jnp.mean(o["depth"] ** 2) + jnp.mean(o["color"] ** 2)

    gp = jax.grad(lambda s: loss(s, cfg_p))(splats)
    gj = jax.grad(lambda s: loss(s, cfg_j))(splats)
    for name in ("means", "scales", "quats", "colors"):
        a, b = getattr(gp, name), getattr(gj, name)
        scale = max(float(jnp.abs(b).max()), 1e-10)
        assert float(jnp.abs(a - b).max()) / scale < 1e-2, name


def test_backward_many_tiles_share_one_chunk():
    """Boundary-RMW stress: tiny per-tile pair windows put MANY tiles'
    whole [start, start+count) ranges inside the SAME floor-aligned
    128-pair chunk, so consecutive grid steps read-modify-write one
    gradient chunk back to back (every chunk is simultaneously a first
    AND last chunk).  Gradients must still match the XLA rasterizer."""
    cfg, pairs, tile_ids = build_inputs(n=300, width=256, height=256,
                                        seed=13)
    counts = np.asarray(pairs.tile_counts)
    # the scenario must actually occur: several tiles within one chunk
    starts = np.asarray(pairs.tile_starts)
    same_chunk = (starts // 128 == (starts + np.maximum(counts - 1, 0))
                  // 128) & (counts > 0)
    assert same_chunk.sum() >= 8, (same_chunk.sum(), counts.max())

    cap = pairs.capacity
    fields = _flat_fields(pairs)
    gch = 0.1 * jax.random.normal(
        jax.random.PRNGKey(4),
        (cfg.num_tiles, 4, cfg.tile_size ** 2), jnp.float32)

    def f_p(*fs):
        ch = pr.composite_tiles(
            cfg, cap, pr.pack_records_flat(*fs, pairs.rxs, pairs.rys),
            pairs.tile_starts, pairs.tile_counts, tile_ids)
        return jnp.sum(ch * gch)

    def f_j(*fs):
        ch = chans_from_colors_logt(*rasterize.rasterize_pairs(
            cfg, cap, *_jax_args(*fs, pairs.rxs, pairs.rys),
            pairs.tile_starts, pairs.tile_counts, 0))
        return jnp.sum(ch * gch)

    argnums = tuple(range(9))
    gp = jax.grad(f_p, argnums=argnums)(*fields)
    gj = jax.grad(f_j, argnums=argnums)(*fields)
    for name, a, b in zip(("x", "y", "ca", "cb", "cc", "r", "g", "b",
                           "opacity"), gp, gj):
        scale = max(float(jnp.abs(b).max()), 1e-10)
        assert float(jnp.abs(a - b).max()) / scale < 5e-3, name
