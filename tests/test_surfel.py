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
