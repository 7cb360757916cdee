"""SceneHelper-parity helpers: depth compositing + focus-marker overlay
(/root/reference/src/SceneHelper.js:38-91, 146-197, 355-430)."""

import jax
import jax.numpy as jnp
import numpy as np

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu.viewer.helpers import (
    apply_overlay,
    composite_with_depth,
    focus_marker_overlay,
    project_to_screen,
)


def _scene(n=300):
    splats = gs.random_splats(jax.random.PRNGKey(4), n, sh_degree=0)
    cam = gs.Camera.look_at((2.2, 1.3, 2.4), (0, 0, 0), fov_y_deg=60.0)
    cfg = gs.RenderConfig(width=64, height=64, return_depth=True)
    return splats, cam, cfg


def test_composite_with_depth_occlusion():
    splats, cam, cfg = _scene()
    out = gs.render(splats, cam, cfg)
    h, w = cfg.height, cfg.width
    other_color = jnp.full((h, w, 3), 0.9)

    # Other content in FRONT of everything: occludes splats everywhere.
    front = composite_with_depth(out, other_color, jnp.zeros((h, w)))
    assert float(jnp.max(jnp.abs(front["color"] - other_color))) < 1e-6
    assert float(jnp.max(front["depth"])) == 0.0

    # Other content BEHIND everything: splats alpha-blend over it; empty
    # pixels show the content (not cfg.background).
    far = composite_with_depth(out, other_color,
                               jnp.full((h, w), 1e6))
    a = out["alpha"][..., None]
    expect = out["color"] + (1.0 - a) * other_color
    hit = out["alpha"] > 1e-6
    assert float(jnp.max(jnp.abs(
        jnp.where(hit[..., None], far["color"] - expect, 0.0)))) < 1e-5
    assert float(jnp.max(jnp.abs(
        jnp.where(~hit[..., None], far["color"] - other_color, 0.0)))) < 1e-6
    # merged depth: splat depth where hit, other depth where empty
    assert float(jnp.max(jnp.where(hit, jnp.abs(
        far["depth"] - out["depth"]), 0.0))) < 1e-6


def test_composite_with_depth_mixed_plane():
    # A mid-scene depth plane: nearer splat pixels stay, farther are hidden.
    splats, cam, cfg = _scene()
    out = gs.render(splats, cam, cfg)
    h, w = cfg.height, cfg.width
    hit = out["alpha"] > 1e-6
    mid = float(jnp.median(jnp.where(hit, out["depth"], jnp.nan)[hit]))
    other_color = jnp.zeros((h, w, 3))
    res = composite_with_depth(out, other_color, jnp.full((h, w), mid))
    nearer = hit & (out["depth"] <= mid)
    farther = hit & (out["depth"] > mid)
    assert int(nearer.sum()) > 0 and int(farther.sum()) > 0
    # hidden splat pixels show the plane color exactly
    assert float(jnp.max(jnp.abs(jnp.where(
        farther[..., None], res["color"] - other_color, 0.0)))) < 1e-6
    # visible splat pixels keep their blend
    a = out["alpha"][..., None]
    expect = out["color"] + (1.0 - a) * other_color
    assert float(jnp.max(jnp.abs(jnp.where(
        nearer[..., None], res["color"] - expect, 0.0)))) < 1e-5


def test_project_to_screen_center():
    cam = gs.Camera.look_at((0.0, 0.0, 3.0), (0, 0, 0), fov_y_deg=60.0)
    px, w = project_to_screen(cam, (0.0, 0.0, 0.0), 128, 96)
    assert float(w) > 0
    assert abs(float(px[0]) - 64.0) < 1e-3
    assert abs(float(px[1]) - 48.0) < 1e-3


def test_focus_marker_ring():
    cam = gs.Camera.look_at((0.0, 0.0, 3.0), (0, 0, 0), fov_y_deg=60.0)
    h, w = 200, 200
    ov = np.asarray(focus_marker_overlay(cam, (0.0, 0.0, 0.0), w, h,
                                         opacity=1.0))
    alpha = ov[..., 3]
    # ring radius 0.06 * h px around the screen center (SceneHelper.js:408)
    radius = 0.06 * h
    yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing="ij")
    r = np.sqrt((xx - 100.0) ** 2 + (yy - 100.0) ** 2)
    assert alpha[np.abs(r - radius) < 0.5].min() > 0.9   # on the ring
    assert alpha[r < radius - 8].max() == 0.0            # inside
    assert alpha[r > radius + 8].max() == 0.0            # outside
    # ~5 px anti-aliasing falloff band
    band = alpha[(np.abs(r - radius) > 2) & (np.abs(r - radius) < 5)]
    assert band.size and ((band > 0.0) & (band < 1.0)).any()

    # behind-camera focus: fully transparent
    ov2 = np.asarray(focus_marker_overlay(cam, (0.0, 0.0, 100.0), w, h))
    assert ov2[..., 3].max() == 0.0

    # opacity uniform scales the ring (the viewer's fade animation)
    ov3 = np.asarray(focus_marker_overlay(cam, (0.0, 0.0, 0.0), w, h,
                                          opacity=0.25))
    assert abs(ov3[..., 3].max() - 0.25) < 1e-6


def test_apply_overlay_blend():
    img = jnp.zeros((4, 4, 3))
    ov = jnp.concatenate([jnp.ones((4, 4, 3)) * 0.8,
                          jnp.full((4, 4, 1), 0.5)], axis=-1)
    out = apply_overlay(img, ov)
    assert float(jnp.max(jnp.abs(out - 0.4))) < 1e-6


def test_mesh_cursor_overlay():
    from gaussiansplats3d_tpu.viewer.helpers import mesh_cursor_overlay

    cam = gs.Camera.look_at((0.0, 0.0, 3.0), (0, 0, 0), fov_y_deg=60.0)
    ov = np.asarray(mesh_cursor_overlay(cam, (0.0, 0.0, 0.0), 200, 200))
    alpha = ov[..., 3]
    assert alpha.max() == 1.0
    # four-fold symmetric arrows around the center, tips pointing inward:
    # the exact center is empty (tips start at 0.25 r)
    assert alpha[100, 100] == 0.0
    # arms present on all four sides
    c = 100
    ys, xs = np.nonzero(alpha)
    assert (xs > c).any() and (xs < c).any()
    assert (ys > c).any() and (ys < c).any()
    # symmetric under 90-degree rotation (square image, centered hit)
    assert np.allclose(alpha, np.rot90(alpha), atol=1e-6)

    # behind the camera: transparent
    ov2 = np.asarray(mesh_cursor_overlay(cam, (0.0, 0.0, 99.0), 200, 200))
    assert ov2[..., 3].max() == 0.0


def test_control_plane_overlay():
    from gaussiansplats3d_tpu.viewer.helpers import control_plane_overlay

    cam = gs.Camera.look_at((0.0, 2.0, 3.0), (0, 0, 0), fov_y_deg=60.0)
    ov = np.asarray(control_plane_overlay(cam, (0.0, 0.0, 0.0),
                                          (0.0, 1.0, 0.0), 200, 200))
    alpha = ov[..., 3]
    # translucent plane at 0.6 + a fully opaque arrow core
    assert np.isclose(alpha.max(), 1.0)
    assert (np.isclose(alpha, 0.6, atol=1e-6)).sum() > 100
    # the arrow is green, the plane white
    green = (ov[..., 1] > 0.5) & (ov[..., 0] < 0.1) & (alpha > 0.9)
    assert green.sum() > 10
    # behind the camera: transparent
    cam2 = gs.Camera.look_at((0.0, 0.0, -3.0), (0, 0, -9.0))
    ov2 = np.asarray(control_plane_overlay(cam2, (0.0, 0.0, 5.0),
                                           (0.0, 1.0, 0.0), 100, 100))
    assert ov2[..., 3].max() == 0.0
