"""2DGS surfel render mode (SplatRenderMode.TwoD parity)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import gaussiansplats3d_tpu as gs


def surfel_scene(n=300, seed=4):
    s = gs.random_splats(jax.random.PRNGKey(seed), n, sh_degree=1)
    # flatten the third axis like real 2DGS assets
    scales = np.array(s.scales)
    scales[:, 2] = 1e-6
    return dataclasses.replace(s, scales=jnp.asarray(scales))


CAM = gs.Camera.look_at((2.4, 1.5, 2.2), (0, 0, 0), fov_y_deg=60)


def test_render_2d_produces_image_and_changes_with_view():
    s = surfel_scene()
    cfg = gs.RenderConfig(width=96, height=96, sh_degree=1,
                          render_mode_2d=True)
    out = gs.render(s, CAM, cfg)
    img = np.asarray(out["color"])
    assert img.shape == (96, 96, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.05                     # something rendered
    cam2 = gs.Camera.look_at((-2.4, 1.5, 2.2), (0, 0, 0), fov_y_deg=60)
    img2 = np.asarray(gs.render(s, cam2, cfg)["color"])
    assert np.abs(img2 - img).max() > 1e-2


def test_render_2d_resembles_3d_for_flat_splats():
    """For near-flat splats the 2D homography and the 3D EWA projection
    should produce similar images (they are alternate renderings of the
    same geometry)."""
    s = surfel_scene(200)
    cfg2 = gs.RenderConfig(width=80, height=80, sh_degree=1,
                           render_mode_2d=True)
    cfg3 = cfg2.replace(render_mode_2d=False, kernel_2d_size=0.0)
    img2 = np.asarray(gs.render(s, CAM, cfg2)["color"])
    img3 = np.asarray(gs.render(s, CAM, cfg3)["color"])
    # same silhouettes: correlation between the images is high
    a = img2.ravel() - img2.mean()
    b = img3.ravel() - img3.mean()
    corr = float((a @ b) / np.sqrt((a @ a) * (b @ b) + 1e-12))
    assert corr > 0.5, corr


def test_render_2d_gradients_finite_nonzero():
    s = surfel_scene(120)
    cfg = gs.RenderConfig(width=48, height=48, sh_degree=1,
                          render_mode_2d=True)

    def loss(sp):
        return jnp.mean(gs.render(sp, CAM, cfg)["color"] ** 2)

    g = jax.grad(loss)(s)
    for name in ("means", "scales", "quats", "colors", "sh"):
        arr = np.asarray(getattr(g, name))
        assert np.isfinite(arr).all(), name
    assert np.abs(np.asarray(g.means)).max() > 0
    assert np.abs(np.asarray(g.quats)).max() > 0


def test_viewer_two_d_mode():
    from gaussiansplats3d_tpu.viewer import SplatRenderMode, Viewer
    v = Viewer(width=64, height=64, max_spherical_harmonics_degree=1,
               splat_render_mode=SplatRenderMode.TwoD,
               initial_camera_position=(2.4, 1.5, 2.2))
    v.add_splat_scene(surfel_scene(100))
    img = np.asarray(v.render()["color"])
    assert np.isfinite(img).all()


def test_tiled_matches_global_surfel_path():
    """The tiled 2D fast path (fused expand+sort + per-tile ray-plane
    compositor) must match the global-sort oracle in image and gradients."""
    from gaussiansplats3d_tpu.render.surfel import render_2d, render_2d_tiled

    splats = gs.random_splats(jax.random.PRNGKey(11), 600, sh_degree=1)
    cam = gs.Camera.look_at((2.2, 1.4, 2.4), (0, 0, 0))
    # f32 records: this asserts TILING equivalence at 1e-4 — the global
    # path doesn't go through the record sort, so the default 'mixed' f16
    # color operands would show up as (expected) 2.5e-4 quantization.
    cfg = gs.RenderConfig(width=96, height=64, sh_degree=1, sort_bits=20,
                          record_precision="f32")
    a = render_2d(splats, cam, cfg)
    b = render_2d_tiled(splats, cam, cfg, return_aux=True)
    assert int(b["overflow"]) == 0
    assert float(jnp.max(jnp.abs(a["color"] - b["color"]))) < 1e-4
    assert float(jnp.max(jnp.abs(a["alpha"] - b["alpha"]))) < 1e-4

    def lt(s):
        return jnp.mean(render_2d_tiled(s, cam, cfg)["color"] ** 2)

    def lg(s):
        return jnp.mean(render_2d(s, cam, cfg)["color"] ** 2)

    gt, gg = jax.grad(lt)(splats), jax.grad(lg)(splats)
    for f in ("means", "scales", "quats", "colors", "sh"):
        d = float(jnp.max(jnp.abs(getattr(gt, f) - getattr(gg, f))))
        m = float(jnp.max(jnp.abs(getattr(gg, f)))) + 1e-8
        assert d < 1e-5 + 1e-3 * m, (f, d, m)


def test_tiled_surfel_multi_scene():
    from gaussiansplats3d_tpu.render.surfel import render_2d, render_2d_tiled

    a = gs.random_splats(jax.random.PRNGKey(1), 200, sh_degree=0)
    b = gs.random_splats(jax.random.PRNGKey(2), 200, sh_degree=0)
    splats = gs.SplatData.concatenate([a, b])
    idx = jnp.asarray(np.repeat(np.arange(2), [200, 200]), jnp.int32)
    tf = np.stack([np.eye(4), np.eye(4)]).astype(np.float32)
    tf[0, 0, 3], tf[1, 0, 3] = 0.4, -0.4
    tfs = jnp.asarray(tf)
    opac = jnp.asarray([1.0, 0.5], jnp.float32)
    vis = jnp.asarray([True, True])
    cam = gs.Camera.look_at((2.2, 1.4, 2.4), (0, 0, 0))
    # f32 records: tiling equivalence at 1e-4 (see note above).
    cfg = gs.RenderConfig(width=64, height=64, sort_bits=20,
                          record_precision="f32")
    ra = render_2d(splats, cam, cfg, tfs, idx, opac, vis)
    rb = render_2d_tiled(splats, cam, cfg, tfs, idx, opac, vis)
    assert float(jnp.max(jnp.abs(ra["color"] - rb["color"]))) < 1e-4


def test_surfel_fragment_math_vs_numpy():
    """Independent brute-force check of the tiled fragment evaluation:
    ray-plane intersection per SplatMaterial2D.js:289-344, re-derived in
    NumPy with no shared code."""
    from gaussiansplats3d_tpu.render.surfel import (
        bin_sort_surfels, project_surfels)
    from gaussiansplats3d_tpu.render.rasterize_surfel import (
        composite_surfel_tiles)

    splats = gs.random_splats(jax.random.PRNGKey(3), 150, sh_degree=0)
    cam = gs.Camera.look_at((2.2, 1.4, 2.4), (0, 0, 0))
    cfg = gs.RenderConfig(width=64, height=64, sort_bits=20)
    sp = project_surfels(splats, cam, cfg)
    recs, starts, counts, total, ovf = bin_sort_surfels(sp, cfg)
    tc, tl = composite_surfel_tiles(cfg, recs.shape[0], recs, starts,
                                    counts, 0)
    R, st, ct = np.asarray(recs), np.asarray(starts), np.asarray(counts)
    ts = cfg.tile_size
    t_id = int(np.argmax(ct))
    tx, ty = t_id % cfg.tiles_x, t_id // cfg.tiles_x
    rng = np.random.RandomState(0)
    for pid in rng.choice(ts * ts, size=24, replace=False):
        px = tx * ts + pid % ts + 0.5
        py = ty * ts + pid // ts + 0.5
        T_acc, c_acc = 1.0, np.zeros(3)
        for r in R[st[t_id]:st[t_id] + ct[t_id]]:
            t = r[:9]
            k = np.array([px * t[2] - t[0], px * t[5] - t[3],
                          px * t[8] - t[6]])
            l = np.array([py * t[2] - t[1], py * t[5] - t[4],
                          py * t[8] - t[7]])
            p = np.cross(k, l)
            if abs(p[2]) < 1e-12:
                continue
            su, sv = p[0] / p[2], p[1] / p[2]
            rho3d = su * su + sv * sv
            dx, dy = px - r[9], py - r[10]
            rho2d = 2.0 * (dx * dx + dy * dy)
            rho = min(rho3d, rho2d)
            depth = su * t[2] + sv * t[5] + t[8] if rho3d <= rho2d else t[8]
            a = min(r[14] * np.exp(-0.5 * rho), 0.99)
            if (depth < 0.2 or a < cfg.min_alpha
                    or abs(dx) > r[15] or abs(dy) > r[16]):
                continue
            c_acc = c_acc + T_acc * a * r[11:14]
            T_acc *= (1.0 - a)
        np.testing.assert_allclose(np.asarray(tc)[t_id, pid], c_acc,
                                   atol=1e-5)


def test_render_2d_depth_channel_matches_global():
    # cfg.return_depth in 2D surfel mode: the tiled fast path's depth map
    # (alpha-weighted mean per-splat depth, 0 where empty) must match the
    # globally-sorted oracle path's.
    s = surfel_scene(250)
    cfg = gs.RenderConfig(width=96, height=80, render_mode_2d=True,
                          sh_degree=1, return_depth=True)
    out = gs.render(s, CAM, cfg)
    from gaussiansplats3d_tpu.render.surfel import render_2d
    ref = render_2d(s, CAM, cfg)
    assert out["depth"].shape == (80, 96)
    assert float(jnp.max(jnp.abs(out["depth"] - ref["depth"]))) < 1e-3
    assert float(jnp.max(jnp.abs(out["color"] - ref["color"]))) < 2e-3
    assert float(jnp.max(out["depth"])) > 0.0
    empty = out["alpha"] <= 1e-6
    assert bool(jnp.all(jnp.where(empty, out["depth"], 0.0) == 0.0))


def test_render_2d_depth_gradients():
    s = surfel_scene(120)
    cfg = gs.RenderConfig(width=48, height=48, render_mode_2d=True,
                          return_depth=True)

    def loss(sp):
        return jnp.mean(gs.render(sp, CAM, cfg)["depth"] ** 2)

    g = jax.grad(loss)(s)
    assert bool(jnp.all(jnp.isfinite(g.means)))
    assert float(jnp.max(jnp.abs(g.means))) > 0.0
