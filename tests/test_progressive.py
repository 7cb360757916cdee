"""Progressive (streaming) load + scene-reveal fade-in.

VERDICT round-1 item 3: render at 25/50/100% of a streamed file; the 100%
snapshot must match the full (non-progressive) render; the fade is gated
by a unit test on the opacity ramp.  Parity surface:
/root/reference/src/loaders/ksplat/KSplatLoader.js:119-180,
SplatBuffer.updateLoadedCounts :1038-1048, SplatMaterial.js:347-363.
"""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu.io.formats import SceneFormat
from gaussiansplats3d_tpu.io.progressive import ProgressiveLoader
from gaussiansplats3d_tpu.viewer import SceneRevealMode, Viewer
from gaussiansplats3d_tpu.viewer.fade import (
    SCENE_FADEIN_RATE_FAST,
    VisibleRegion,
)


def scene(n=400, seed=0, sh_degree=1):
    return gs.random_splats(jax.random.PRNGKey(seed), n, sh_degree=sh_degree)


def _stream(loader, data, fractions):
    """Feed ``data`` up to each fraction, returning snapshots (or None)."""
    snaps, fed = [], 0
    for f in fractions:
        upto = int(len(data) * f)
        loader.feed(data[fed:upto])
        fed = upto
        snaps.append(loader.snapshot(force=True))
    return snaps


@pytest.mark.parametrize("ext", ["ksplat", "splat", "ply"])
def test_progressive_prefix_decodes_and_grows(tmp_path, ext):
    splats = scene(sh_degree=0 if ext == "splat" else 1)
    path = str(tmp_path / f"s.{ext}")
    gs.save(splats, path)
    data = open(path, "rb").read()

    loader = ProgressiveLoader.for_path(path, min_new_splats=1)
    assert loader.supports_incremental
    s25, s50, s100 = _stream(loader, data, [0.25, 0.5, 1.0])

    counts = [0 if s is None else s.num_splats for s in (s25, s50, s100)]
    assert counts == sorted(counts)           # monotone growth
    assert counts[2] == splats.num_splats     # complete at 100%
    assert counts[1] > 0                      # half the file renders

    # a decoded prefix IS a prefix of the full decode (same records)
    full = gs.load(path)
    if counts[1] > 0:
        np.testing.assert_allclose(np.asarray(s50.means),
                                   np.asarray(full.means)[:counts[1]],
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(s100.means),
                               np.asarray(full.means), atol=1e-5)


def test_progressive_render_matches_full(tmp_path):
    """Render at 25/50/100%: partial renders are finite, 100% == full."""
    splats = scene()
    path = str(tmp_path / "s.ksplat")
    gs.save(splats, path)
    data = open(path, "rb").read()
    cfg = gs.RenderConfig(width=64, height=64, sh_degree=1)
    cam = gs.Camera.look_at((2.2, 1.4, 2.4), (0, 0, 0))

    loader = ProgressiveLoader.for_path(path, min_new_splats=1)
    snaps = _stream(loader, data, [0.25, 0.5, 1.0])
    for snap in snaps:
        if snap is not None and snap.num_splats > 0:
            out = gs.render(snap, cam, cfg)
            assert bool(jnp.all(jnp.isfinite(out["color"])))

    full_out = gs.render(gs.load(path), cam, cfg)
    out100 = gs.render(snaps[-1], cam, cfg)
    assert float(jnp.max(jnp.abs(out100["color"] - full_out["color"]))) < 1e-5


def test_progressive_buffered_formats_finalize(tmp_path):
    # .spz is gzip-framed — no valid prefix: snapshots stay None and
    # finalize decodes the complete buffer (DirectLoadError downgrade).
    splats = scene(sh_degree=0)
    path = str(tmp_path / "s.spz")
    gs.save(splats, path)
    data = open(path, "rb").read()
    loader = ProgressiveLoader.for_path(path)
    assert not loader.supports_incremental
    assert _stream(loader, data, [0.5, 1.0]) == [None, None]
    final = loader.finalize()
    assert final.num_splats == splats.num_splats


def test_progressive_ply_ascii_buffers_up(tmp_path):
    # ascii PLY rows have no fixed stride: the loader must downgrade to
    # buffer-up instead of emitting partial snapshots.
    # minimal ascii point-cloud PLY (different dialect, same loader entry)
    n = 20
    rng = np.random.RandomState(0)
    pts = rng.randn(n, 3).astype(np.float32)
    header = ("ply\nformat ascii 1.0\n"
              f"element vertex {n}\n"
              "property float x\nproperty float y\nproperty float z\n"
              "end_header\n")
    body = "\n".join(" ".join(f"{v:.6f}" for v in row) for row in pts) + "\n"
    data = (header + body).encode("ascii")
    loader = ProgressiveLoader(SceneFormat.Ply, min_new_splats=1)
    assert _stream(loader, data, [0.5, 1.0]) == [None, None]
    final = loader.finalize()
    assert final.num_splats == n


def test_viewer_progressive_load(tmp_path):
    splats = scene()
    path = str(tmp_path / "s.ksplat")
    gs.save(splats, path)

    v = Viewer(width=64, height=64, initial_camera_position=(2.2, 1.4, 2.4),
               scene_reveal_mode=SceneRevealMode.Instant,
               max_spherical_harmonics_degree=1)
    fractions = []
    sc = v.add_splat_scene_progressive(
        path, on_update=lambda s, f: fractions.append(f))
    assert sc.num_splats == splats.num_splats
    assert np.isfinite(np.asarray(v.render()["color"])).all()

    # final render equals a plain (non-progressive) load of the same file
    v2 = Viewer(width=64, height=64,
                initial_camera_position=(2.2, 1.4, 2.4),
                scene_reveal_mode=SceneRevealMode.Instant,
                max_spherical_harmonics_degree=1)
    v2.add_splat_scene(path)
    a = np.asarray(v.render()["color"])
    b = np.asarray(v2.render()["color"])
    assert np.abs(a - b).max() < 1e-5


def test_fade_opacity_ramp():
    """The projection-side fade ramp: full opacity inside the radius,
    linear to 0 over 0.75 world units past it (SplatMaterial.js:352-358)."""
    import dataclasses
    base = gs.SplatData.zeros(3)
    # splats at distance 0, 1.0, 5.0 from origin along +x
    means = jnp.asarray([[0, 0, 0], [1.0, 0, 0], [5.0, 0, 0]], jnp.float32)
    splats = dataclasses.replace(
        base, means=means, scales=jnp.full((3, 3), 0.1),
        colors=jnp.asarray([[1, 1, 1, 1.0]] * 3))
    cfg = gs.RenderConfig(width=32, height=32)
    cam = gs.Camera.look_at((0, 0, 8.0), (0, 0, 0))
    from gaussiansplats3d_tpu.render.projection import project_splats

    radius = 0.625  # splat1 is 0.375 world units past -> ramp = 0.5
    proj = project_splats(splats, cam, cfg,
                          fade_params=(jnp.zeros(3), jnp.float32(radius)))
    ref = project_splats(splats, cam, cfg)
    ratio = np.asarray(proj.opacity) / np.maximum(np.asarray(ref.opacity),
                                                  1e-12)
    assert np.isclose(ratio[0], 1.0, atol=1e-6)   # inside: untouched
    assert np.isclose(ratio[1], 0.5, atol=1e-6)   # mid-ramp
    assert np.isclose(ratio[2], 0.0, atol=1e-6)   # far outside: gone


def test_visible_region_fade_converges():
    vr = VisibleRegion()
    pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    vr.update_region(pts, final_build=True)
    assert not vr.complete
    first = vr.tick(SceneRevealMode.Default)
    assert first is not None
    r0 = first[1]
    # radius grows monotonically toward the buffer radius, then completes
    last = r0
    for _ in range(2000):
        out = vr.tick(SceneRevealMode.Default)
        if out is None:
            break
        assert out[1] >= last
        last = out[1]
    assert vr.complete
    # Instant mode never fades
    vr2 = VisibleRegion()
    vr2.update_region(pts, final_build=True)
    assert vr2.tick(SceneRevealMode.Instant) is None


def test_viewer_fade_in_visible():
    """With reveal fade on, early frames are dimmer than the settled frame
    and the viewer converges to the no-fade image."""
    splats = scene(200, sh_degree=0)
    kw = dict(width=64, height=64, initial_camera_position=(2.2, 1.4, 2.4))
    v = Viewer(scene_reveal_mode=SceneRevealMode.Gradual, **kw)
    v.add_splat_scene(splats)
    early = np.asarray(v.render()["color"]).sum()
    # advance the host-side fade animation without paying a render per tick
    for _ in range(3000):
        if v.visible_region.complete:
            break
        v.visible_region.tick(SceneRevealMode.Gradual)
    settled = np.asarray(v.render()["color"])

    vi = Viewer(scene_reveal_mode=SceneRevealMode.Instant, **kw)
    vi.add_splat_scene(splats)
    instant = np.asarray(vi.render()["color"])
    assert early < instant.sum() * 0.99     # fade visibly dims the scene
    assert np.abs(settled - instant).max() < 2e-3
