"""Tiled fast path vs. the oracle renderer: forward images and gradients.

This is the core correctness contract (BASELINE.md acceptance config 1): the
tile-binned pipeline must reproduce the globally-sorted reference compositor.
Differences can only come from sort-order ties within a depth bucket, so we
use enough sort bits and a loose-but-tight-enough tolerance.
"""

import jax
import jax.numpy as jnp
import pytest

import gaussiansplats3d_tpu as gs


def make_scene(n=500, sh_degree=0, seed=0):
    return gs.random_splats(jax.random.PRNGKey(seed), n, sh_degree=sh_degree)


def make_camera(aspect=1.0, eye=(2.0, 1.2, 2.4)):
    return gs.Camera.look_at(eye, (0.0, 0.0, 0.0), fov_y_deg=60.0,
                             aspect=aspect)


@pytest.mark.parametrize("sh_degree", [0, 2])
def test_tiled_matches_oracle_forward(sh_degree):
    splats = make_scene(600, sh_degree=sh_degree)
    cfg = gs.RenderConfig(width=128, height=96, sh_degree=sh_degree,
                          sort_bits=20, background=(0.1, 0.2, 0.3))
    cam = make_camera(aspect=128 / 96)
    ref = gs.reference_render(splats, cam, cfg)
    out = gs.render(splats, cam, cfg, return_aux=True)
    assert int(out["overflow"]) == 0
    assert jnp.max(jnp.abs(out["color"] - ref["color"])) < 2e-3
    assert jnp.max(jnp.abs(out["alpha"] - ref["alpha"])) < 2e-3


def test_tiled_matches_oracle_nonsquare_offgrid():
    # width/height not multiples of tile_size exercise the crop path.
    splats = make_scene(400)
    cfg = gs.RenderConfig(width=100, height=75, sort_bits=20)
    cam = make_camera(aspect=100 / 75)
    ref = gs.reference_render(splats, cam, cfg)
    out = gs.render(splats, cam, cfg)
    assert jnp.max(jnp.abs(out["color"] - ref["color"])) < 2e-3


def test_tiled_gradients_match_oracle():
    splats = make_scene(300, sh_degree=1)
    cfg = gs.RenderConfig(width=64, height=64, sh_degree=1, sort_bits=20)
    cam = make_camera()
    target = jnp.zeros((64, 64, 3))

    def loss_tiled(s):
        return jnp.mean((gs.render(s, cam, cfg)["color"] - target) ** 2)

    def loss_oracle(s):
        return jnp.mean((gs.reference_render(s, cam, cfg)["color"]
                         - target) ** 2)

    g_t = jax.grad(loss_tiled)(splats)
    g_o = jax.grad(loss_oracle)(splats)
    for name in ("means", "scales", "quats", "colors", "sh"):
        gt = getattr(g_t, name)
        go = getattr(g_o, name)
        scale = jnp.maximum(jnp.max(jnp.abs(go)), 1e-8)
        rel = jnp.max(jnp.abs(gt - go)) / scale
        assert rel < 5e-3, (name, float(rel))
        assert jnp.all(jnp.isfinite(gt)), name
    assert float(jnp.max(jnp.abs(g_t.means))) > 0.0


def test_render_facing_away_is_background():
    splats = make_scene(200)
    cfg = gs.RenderConfig(width=64, height=64, background=(0.25, 0.5, 0.75))
    cam = gs.Camera.look_at((0.0, 0.0, 10.0), (0.0, 0.0, 20.0))
    out = gs.render(splats, cam, cfg)
    bg = jnp.asarray(cfg.background)
    assert jnp.allclose(out["color"], bg[None, None, :], atol=1e-6)
    assert jnp.allclose(out["alpha"], 0.0, atol=1e-6)


def test_overflow_reported_not_crashing():
    # Beyond-lane splats overflow an undersized aux budget; the render
    # must report the dropped pairs and stay finite.  lanes=1 routes every
    # multi-tile splat through aux; 3000 giant splats need far more pairs
    # than the 4096-slot aux floor (slot_layout_for) provides.
    splats = make_scene(3000)
    import dataclasses
    splats = dataclasses.replace(splats, scales=splats.scales * 12.0)
    cfg = gs.RenderConfig(width=64, height=64, lanes=1, aux_multiplier=1e-9)
    cam = make_camera()
    out = gs.render(splats, cam, cfg, return_aux=True)
    assert int(out["overflow"]) > 0
    assert jnp.all(jnp.isfinite(out["color"]))


def test_aux_disabled_drops_and_counts():
    # aux_multiplier=0 statically removes the aux path; beyond-lane pairs
    # are dropped and counted, small-splat scenes render exactly.
    splats = make_scene(400)
    cfg0 = gs.RenderConfig(width=64, height=64, sort_bits=20)
    cfg1 = cfg0.replace(aux_multiplier=0.0)
    cam = make_camera()
    a = gs.render(splats, cam, cfg0, return_aux=True)
    b = gs.render(splats, cam, cfg1, return_aux=True)
    if int(a["overflow"]) == 0 and int(b["overflow"]) == 0:
        assert jnp.max(jnp.abs(a["color"] - b["color"])) < 1e-5


def test_sort_bits_24_two_operand_keys():
    # At 512x512 / 16-px tiles there are 1024 tiles (10 tile bits), so a
    # fused 31-bit key cannot carry 24 depth bits; the sort must fall back
    # to two-operand (tile, depth) keys and still match the oracle
    # (splatSortDistanceMapPrecision=24 parity, Viewer.js:208-210).
    splats = make_scene(300)
    cfg = gs.RenderConfig(width=512, height=512, sort_bits=24)
    from gaussiansplats3d_tpu.render.binning import _SENTINEL  # noqa: F401
    tile_bits = max(1, (cfg.num_tiles - 1).bit_length())
    assert tile_bits + cfg.sort_bits > 31     # really the two-key path
    cam = make_camera()
    ref = gs.reference_render(splats, cam, cfg)
    out = gs.render(splats, cam, cfg)
    assert jnp.max(jnp.abs(out["color"] - ref["color"])) < 2e-3


def test_point_cloud_mode_tiled():
    splats = make_scene(200)
    cfg = gs.RenderConfig(width=64, height=64, point_cloud_mode=True,
                          sort_bits=20)
    cam = make_camera()
    ref = gs.reference_render(splats, cam, cfg)
    out = gs.render(splats, cam, cfg)
    assert jnp.max(jnp.abs(out["color"] - ref["color"])) < 2e-3


def test_depth_channel_matches_oracle():
    # cfg.return_depth adds a differentiable per-pixel expected-depth map
    # (SceneHelper.js:38-91 z-compositing parity, rendered as a 4th channel).
    splats = make_scene(400)
    cfg = gs.RenderConfig(width=96, height=80, return_depth=True)
    cam = make_camera()
    ref = gs.reference_render(splats, cam, cfg)
    out = gs.render(splats, cam, cfg)
    assert "depth" in out and out["depth"].shape == (80, 96)
    assert jnp.max(jnp.abs(out["depth"] - ref["depth"])) < 1e-3
    assert jnp.max(jnp.abs(out["color"] - ref["color"])) < 2e-3
    # hit pixels carry positive depth; empty pixels exactly 0
    assert float(jnp.max(out["depth"])) > 0.0
    empty = out["alpha"] <= 1e-6
    assert jnp.all(jnp.where(empty, out["depth"], 0.0) == 0.0)


def test_depth_channel_gradients():
    splats = make_scene(200)
    cfg = gs.RenderConfig(width=64, height=64, return_depth=True)
    cam = make_camera()

    def loss(s):
        return jnp.mean(gs.render(s, cam, cfg)["depth"] ** 2)

    g = jax.grad(loss)(splats)
    assert bool(jnp.all(jnp.isfinite(g.means)))
    assert float(jnp.max(jnp.abs(g.means))) > 0.0


def test_forward_only_matches_differentiable():
    """cfg.forward_only drops the sorted-slot operand (backward-alignment
    plumbing only) — the rendered image must match up to equal-key tie
    reordering (the view sort is unstable without the slot tiebreaker)."""
    splats = make_scene(500, sh_degree=1)
    cam = make_camera()
    for prec in ("mixed", "packed"):
        cfg = gs.RenderConfig(width=96, height=64, sh_degree=1,
                              record_precision=prec)
        a = gs.render(splats, cam, cfg)
        b = gs.render(splats, cam, cfg.replace(forward_only=True))
        # NOT bitwise: forward_only's 1-key unstable sort may order
        # equal-(tile, depth) ties differently from the slot-keyed
        # training sort, so compare within the tie-reorder tolerance
        # (compositing two same-quantized-depth splats in either order
        # moves a pixel by at most the quantization-scale difference).
        assert float(jnp.abs(a["color"] - b["color"]).max()) < 4e-3, prec
        assert float(jnp.abs(a["alpha"] - b["alpha"]).max()) < 4e-3, prec


@pytest.mark.parametrize("return_depth", [False, True])
def test_record_precision_modes(return_depth):
    """'mixed' (default) and 'packed' quantize sort operands, not semantics.

    mixed packs color/opacity as f16 pairs (error ~2.5e-4 — above the
    reference's u8 color texels); packed also quantizes positions to 1/8 px
    and conic to f16 (the view/serving mode).  Both must stay close to the
    exact f32 render, and gradients stay straight-through (finite, nonzero).
    """
    splats = make_scene(500, sh_degree=1, seed=9)
    cam = make_camera(aspect=128 / 96)
    base = dict(width=128, height=96, sh_degree=1, sort_bits=20,
                background=(0.1, 0.2, 0.3), return_depth=return_depth)
    exact = gs.render(splats, cam,
                      gs.RenderConfig(record_precision="f32", **base))
    mixed = gs.render(splats, cam,
                      gs.RenderConfig(record_precision="mixed", **base))
    packed = gs.render(splats, cam,
                       gs.RenderConfig(record_precision="packed", **base))
    assert jnp.max(jnp.abs(mixed["color"] - exact["color"])) < 2e-3
    assert jnp.max(jnp.abs(mixed["alpha"] - exact["alpha"])) < 2e-3
    # packed moves centers by up to 1/32 px and conic by 5e-4 relative:
    # tiny-splat edge pixels shift, so gate perceptually (PSNR) plus the
    # mean; measured ~50 dB / mean ~1e-3 on this scene.
    dc = jnp.abs(packed["color"] - exact["color"])
    psnr = -10.0 * jnp.log10(jnp.mean(dc ** 2) + 1e-12)
    assert float(psnr) > 45.0, float(psnr)
    assert float(jnp.mean(dc)) < 2e-3

    cfgp = gs.RenderConfig(record_precision="packed", **base)
    g = jax.grad(lambda s: jnp.mean(gs.render(s, cam, cfgp)["color"] ** 2))(
        splats)
    assert bool(jnp.all(jnp.isfinite(g.means)))
    assert float(jnp.max(jnp.abs(g.means))) > 0.0
    assert float(jnp.max(jnp.abs(g.colors))) > 0.0
