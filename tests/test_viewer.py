"""Viewer API: scene lifecycle, dynamic transforms, picking, render gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu.viewer import (
    OrbitCamera,
    RenderMode,
    SceneRevealMode,
    SplatRenderMode,
    Viewer,
)


def small_scene(n=120, seed=0, sh_degree=0):
    return gs.random_splats(jax.random.PRNGKey(seed), n, sh_degree=sh_degree)


def make_viewer(**kw):
    kw.setdefault("width", 64)
    kw.setdefault("height", 64)
    kw.setdefault("initial_camera_position", (2.2, 1.4, 2.4))
    # parity tests compare against direct renders: disable the reveal fade
    # (tests for the fade itself pass scene_reveal_mode explicitly)
    kw.setdefault("scene_reveal_mode", SceneRevealMode.Instant)
    return Viewer(**kw)


def test_single_scene_matches_direct_render():
    v = make_viewer()
    splats = small_scene()
    v.add_splat_scene(splats)
    out = v.render()
    cam = v.camera.camera()
    direct = gs.render(splats, cam, v.config)
    # identity transform path must agree with the plain pipeline
    assert jnp.max(jnp.abs(out["color"] - direct["color"])) < 2e-3


def test_multi_scene_transforms_compose():
    v = make_viewer()
    a = small_scene(seed=1)
    v.add_splat_scene(a, position=(0.6, 0.0, 0.0))
    base = np.asarray(v.render()["color"])

    s2 = v.add_splat_scene(small_scene(seed=2), position=(-0.6, 0.0, 0.0))
    both = np.asarray(v.render()["color"])
    assert np.abs(both - base).max() > 1e-3      # second scene visible

    s2.visible = False
    hidden = np.asarray(v.render()["color"])
    assert np.allclose(hidden, base, atol=2e-3)  # matches single scene

    s2.visible = True
    s2.opacity = 0.2
    faded = np.asarray(v.render()["color"])
    assert np.abs(faded - both).max() > 1e-3


def test_dynamic_transform_updates():
    v = make_viewer()
    scene = v.add_splat_scene(small_scene(), position=(0, 0, 0))
    f0 = np.asarray(v.render()["color"])
    scene.position = (0.5, 0.0, 0.0)
    f1 = np.asarray(v.render()["color"])
    assert np.abs(f1 - f0).max() > 1e-2


def test_scene_removal_and_dispose():
    v = make_viewer()
    v.add_splat_scene(small_scene(seed=1))
    v.add_splat_scene(small_scene(seed=2))
    assert v.scene_count == 2
    v.remove_splat_scene(0)
    assert v.scene_count == 1
    v.dispose()
    with pytest.raises(RuntimeError):
        v.render()


def test_max_scenes_enforced():
    v = make_viewer()
    tiny = small_scene(8)
    for _ in range(gs.MAX_SCENES):
        v.add_splat_scene(tiny)
    with pytest.raises(ValueError):
        v.add_splat_scene(tiny)


def test_alpha_removal_threshold():
    splats = small_scene(100)
    colors = np.array(splats.colors)
    import dataclasses
    colors[:50, 3] = 0.05
    colors[50:, 3] = 1.0
    splats = dataclasses.replace(splats, colors=jnp.asarray(colors))
    v = make_viewer()
    scene = v.add_splat_scene(splats, splat_alpha_removal_threshold=100)
    assert scene.num_splats == 50


def test_render_mode_on_change_caching():
    v = make_viewer(render_mode=RenderMode.OnChange)
    v.add_splat_scene(small_scene())
    out1 = v.render()
    out2 = v.render()
    assert out2 is out1                    # cached
    v.camera.rotate(0.3, 0.0)
    out3 = v.render()
    assert out3 is not out1


def test_render_on_change_camera_epsilon():
    """Sub-epsilon camera jitter reuses the cached frame; a super-epsilon
    move re-renders (shouldRender changeEpsilon parity,
    /root/reference/src/Viewer.js:1561-1597)."""
    v = make_viewer(render_mode=RenderMode.OnChange)
    v.add_splat_scene(small_scene())
    out1 = v.render()
    # jitter each position component by well under 1e-4 world units
    base = np.asarray(v.camera.position, np.float64).copy()
    for k in range(4):
        v.camera.position = base + 2e-5 * np.array([1.0, -1.0, 1.0]) * (
            (-1.0) ** k)
        assert v.render() is out1, k       # cached through the wiggle
    # super-epsilon move re-renders
    v.camera.position = base + np.array([5e-4, 0.0, 0.0])
    out2 = v.render()
    assert out2 is not out1
    # forceRenderNextFrame bypasses the gate once
    out3 = v.render()
    assert out3 is out2
    v.force_render_next_frame()
    out4 = v.render()
    assert out4 is not out2
    assert v.render() is out4


def test_file_scene_load(tmp_path):
    splats = small_scene(60)
    path = str(tmp_path / "scene.ksplat")
    gs.save(splats, path)
    v = make_viewer()
    scene = v.add_splat_scene(path)
    assert scene.num_splats == 60
    assert np.isfinite(np.asarray(v.render()["color"])).all()


def test_raycast_hits_center_blob():
    # one big splat at the origin; ray through image center must hit it
    import dataclasses
    splats = gs.SplatData.zeros(1)
    splats = dataclasses.replace(
        splats,
        scales=jnp.full((1, 3), 0.3),
        colors=jnp.asarray([[1.0, 0.0, 0.0, 1.0]]))
    v = make_viewer()
    v.add_splat_scene(splats)
    hit = v.raycast(32, 32)
    assert hit is not None
    assert hit.splat_index == 0
    assert np.linalg.norm(hit.point) < 0.4
    # ray towards empty corner misses
    assert v.raycast(1, 1) is None


def test_orbit_camera_math():
    oc = OrbitCamera(position=(0, 0, 5), target=(0, 0, 0))
    assert np.allclose(oc.position, [0, 0, 5], atol=1e-6)
    oc.rotate(np.pi / 2, 0)
    assert np.allclose(oc.position, [5, 0, 0], atol=1e-6)
    oc.zoom(2.0)
    assert np.isclose(np.linalg.norm(oc.position - oc.target), 2.5)
    oc.pan(1.0, 0.0)
    assert np.isclose(np.linalg.norm(oc.position - oc.target), 2.5)


def test_orthographic_viewer():
    v = make_viewer(use_orthographic_camera=True)
    v.add_splat_scene(small_scene())
    img = np.asarray(v.render()["color"])
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_stereo_render():
    v = make_viewer()
    v.add_splat_scene(small_scene())
    pair = v.render_stereo(eye_separation=0.3)
    left = np.asarray(pair["left"]["color"])
    right = np.asarray(pair["right"]["color"])
    assert left.shape == right.shape
    assert np.abs(left - right).max() > 1e-3


def test_splat_tree():
    from gaussiansplats3d_tpu.viewer.splattree import SplatTree
    splats = small_scene(3000)
    tree = SplatTree(max_depth=4, max_centers_per_node=200)
    tree.process_splats(splats)
    total = sum(len(n.indices) for n in tree.nodes_with_indexes)
    assert total == 3000
    # every leaf's splats lie inside the leaf box
    means = np.asarray(splats.means)
    for node in tree.nodes_with_indexes:
        pts = means[node.indices]
        assert (pts >= node.min - 1e-5).all()
        assert (pts <= node.max + 1e-5).all()
    # box query returns a superset of the exact in-box splats
    lo, hi = np.array([-0.5] * 3), np.array([0.5] * 3)
    got = set(tree.query_box(lo, hi).tolist())
    exact = set(np.nonzero(((means >= lo) & (means <= hi)).all(1))[0]
                .tolist())
    assert exact <= got


def test_focal_adjustment_scales_footprint_not_centers():
    """focalAdjustment (Viewer.js:208): splat screen extents scale, the
    projected centers do not move."""
    from gaussiansplats3d_tpu.render.projection import project_splats

    splats = small_scene(64)
    cam = OrbitCamera(position=(2.2, 1.4, 2.4), target=(0, 0, 0),
                      fov_y_deg=60.0, aspect=1.0).camera()
    base = gs.RenderConfig(width=64, height=64, sh_degree=0)
    wide = gs.RenderConfig(width=64, height=64, sh_degree=0,
                           focal_adjustment=2.0)
    p0 = project_splats(splats, cam, base)
    p1 = project_splats(splats, cam, wide)
    assert jnp.max(jnp.abs(p0.mean2d - p1.mean2d)) < 1e-5
    # 2x focal -> 4x cov2d -> ~2x support radius for visible splats
    vis = np.asarray(p0.radius > 0)
    r0, r1 = np.asarray(p0.radius)[vis], np.asarray(p1.radius)[vis]
    unclamped = r0 < base.max_screen_space_splat_size / 2
    assert np.all(r1[unclamped] >= r0[unclamped])


def test_add_splat_scene_format_override_and_optimize(tmp_path):
    from gaussiansplats3d_tpu.io import SceneFormat, save_splat

    # a .splat payload under a misleading extension: format= must win
    path = tmp_path / "scene.bin.splat"
    splats = small_scene(100)
    save_splat(splats, str(path))
    odd = tmp_path / "scene.dat"
    odd.write_bytes(path.read_bytes())

    v = make_viewer()
    scene = v.add_splat_scene(str(odd), format=SceneFormat.Splat,
                              optimize_splat_data=True)
    assert scene.num_splats == 100
    out = v.render()
    assert np.isfinite(np.asarray(out["color"])).all()


def test_viewer_log_level_smoke():
    from gaussiansplats3d_tpu.viewer.enums import LogLevel

    make_viewer(log_level=LogLevel.WARNING)
    make_viewer(log_level=LogLevel.NONE)


def test_info_panel_rows():
    """Headless InfoPanel parity: the reference's debug rows as data
    (ui/InfoPanel.js:104-147 update fields)."""
    from gaussiansplats3d_tpu.utils.metrics import FrameStats
    from gaussiansplats3d_tpu.viewer import InfoPanel

    viewer = gs.Viewer(width=128, height=96,
                       max_spherical_harmonics_degree=0,
                       splat_scale=1.5, focal_adjustment=2.0)
    viewer.add_splat_scene(gs.random_splats(jax.random.PRNGKey(0), 100,
                                            sh_degree=0))
    panel = InfoPanel()
    stats = FrameStats(wall_ms=20.0, num_splats=100, num_pairs=250,
                       width=128, height=96)
    rows = panel.update(viewer, stats=stats,
                        cursor_position=(1.0, 2.0, 3.0))
    assert rows["renderWindow"] == "128 x 96"
    assert rows["fps"] == "50"
    assert "250 pairs over 100 splats" in rows["renderSplatCount"]
    assert rows["cursorPosition"].startswith("1.00000, 2.00000")
    assert rows["orthographicCamera"] == "Perspective"
    assert rows["splatScale"] == "1.500"
    assert rows["focalAdjustment"] == "2.000"
    text = panel.format_text()
    assert "Splat render count" in text and "FPS" in text
    # no stats -> N/A rows, no crash
    rows2 = panel.update(viewer)
    assert rows2["fps"] == "N/A" and "100 splats" in rows2["renderSplatCount"]
