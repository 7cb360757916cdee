"""Pallas surfel compositor vs the XLA tiled surfel compositor (interpret
mode on CPU).  Covers the 2D fragment chain (ray-plane intersection), the
hand-derived backward transpose, early-exit bookkeeping, and the aliased
gradient accumulation — the same contract tests test_pallas.py runs for the
3D kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu.render import pallas_surfel as ps
from gaussiansplats3d_tpu.render import rasterize_surfel as rs
from gaussiansplats3d_tpu.render.surfel import (
    bin_sort_surfels,
    project_surfels,
)


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(ps.pl, "pallas_call", patched)


def build_inputs(n=500, width=96, height=96, seed=5):
    splats = gs.random_splats(jax.random.PRNGKey(seed), n, sh_degree=0)
    cam = gs.Camera.look_at((2.5, 1.5, 2.5), (0, 0, 0), fov_y_deg=60,
                            aspect=width / height)
    cfg = gs.RenderConfig(width=width, height=height, sort_bits=20)
    sp = project_surfels(splats, cam, cfg)
    recs, starts, counts, total, ovf = bin_sort_surfels(sp, cfg)
    tile_ids = jnp.arange(cfg.num_tiles, dtype=jnp.int32)
    return cfg, recs, starts, counts, tile_ids


def test_surfel_forward_matches_xla_compositor():
    cfg, recs, starts, counts, tile_ids = build_inputs()
    packed = ps.pack_surfel_records(recs)
    col_p, logt_p = ps.composite_surfel_tiles_pallas(
        cfg, recs.shape[0], packed, starts, counts, tile_ids)
    col_j, logt_j = rs.composite_surfel_tiles(
        cfg, recs.shape[0], recs, starts, counts, 0)
    assert jnp.max(jnp.abs(col_p - col_j)) < 4e-3
    assert jnp.max(jnp.abs(jnp.exp(logt_p) - jnp.exp(logt_j))) < 4e-3


def test_surfel_backward_matches_xla_compositor():
    cfg, recs, starts, counts, tile_ids = build_inputs(n=300)
    gc = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0),
        (cfg.num_tiles, cfg.tile_size ** 2, 3), jnp.float32)
    gl = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1),
        (cfg.num_tiles, cfg.tile_size ** 2), jnp.float32)

    def f_p(r):
        c, l = ps.composite_surfel_tiles_pallas(
            cfg, r.shape[0], ps.pack_surfel_records(r), starts, counts,
            tile_ids)
        return jnp.sum(c * gc) + jnp.sum(l * gl)

    def f_j(r):
        c, l = rs.composite_surfel_tiles(cfg, r.shape[0], r, starts,
                                         counts, 0)
        return jnp.sum(c * gc) + jnp.sum(l * gl)

    gp = jax.grad(f_p)(recs)
    gj = jax.grad(f_j)(recs)
    # radius columns are gradient-free in both
    assert float(jnp.abs(gp[:, 15:]).max()) == 0.0
    for col in range(15):
        a, b = gp[:, col], gj[:, col]
        scale = max(float(jnp.abs(b).max()), 1e-8)
        rel = float(jnp.abs(a - b).max()) / scale
        assert rel < 5e-3, (col, rel)


def test_full_2d_pipeline_pallas_backend():
    splats = gs.random_splats(jax.random.PRNGKey(2), 400, sh_degree=1)
    cam = gs.Camera.look_at((2.0, 1.0, 2.2), (0, 0, 0), fov_y_deg=60)
    cfg_p = gs.RenderConfig(width=64, height=64, sh_degree=1,
                            render_mode_2d=True, sort_bits=20,
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


def test_surfel_depth_channel_matches_xla():
    # 4-channel record layout (rgb + depth, opacity/radius shifted by one
    # row): forward and gradients must agree between the Pallas kernel and
    # the XLA compositor.
    splats = gs.random_splats(jax.random.PRNGKey(9), 400, sh_degree=0)
    cam = gs.Camera.look_at((2.5, 1.5, 2.5), (0, 0, 0), fov_y_deg=60,
                            aspect=1.0)
    cfg_p = gs.RenderConfig(width=96, height=96, render_mode_2d=True,
                            return_depth=True, backend="pallas")
    cfg_j = cfg_p.replace(backend="jax")
    out_p = gs.render(splats, cam, cfg_p)
    out_j = gs.render(splats, cam, cfg_j)
    assert float(jnp.max(jnp.abs(out_p["depth"] - out_j["depth"]))) < 1e-3
    assert float(jnp.max(jnp.abs(out_p["color"] - out_j["color"]))) < 4e-3

    def loss(s, cfg):
        o = gs.render(s, cam, cfg)
        return jnp.mean(o["depth"] ** 2) + jnp.mean(o["color"] ** 2)

    gp = jax.grad(lambda s: loss(s, cfg_p))(splats)
    gj = jax.grad(lambda s: loss(s, cfg_j))(splats)
    for name in ("means", "scales", "quats", "colors"):
        a, b = getattr(gp, name), getattr(gj, name)
        scale = max(float(jnp.abs(b).max()), 1e-10)
        assert float(jnp.abs(a - b).max()) / scale < 2e-2, name
