import jax
import jax.numpy as jnp
import numpy as np

from gaussiansplats3d_tpu import Camera, RenderConfig, SplatData, random_splats
from gaussiansplats3d_tpu.render import reference_render


def make_camera(w, h, eye=(0.0, 0.0, 5.0)):
    return Camera.look_at(eye, (0.0, 0.0, 0.0), fov_y_deg=60.0,
                          aspect=w / h, near=0.1, far=100.0)


def single_splat(color=(1.0, 0.0, 0.0), opacity=1.0, pos=(0.0, 0.0, 0.0),
                 scale=0.3):
    return SplatData(
        means=jnp.array([pos], jnp.float32),
        scales=jnp.full((1, 3), scale, jnp.float32),
        quats=jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32),
        colors=jnp.array([list(color) + [opacity]], jnp.float32),
        sh=jnp.zeros((1, 0, 3), jnp.float32),
    )


def test_single_splat_center_color():
    cfg = RenderConfig(width=64, height=64, chunk_size=8)
    cam = make_camera(64, 64)
    out = reference_render(single_splat(), cam, cfg)
    img = np.asarray(out["color"])
    # center pixel should be saturated red (alpha ~ 1 at the mean)
    c = img[32, 32]
    assert c[0] > 0.9 and c[1] < 1e-3 and c[2] < 1e-3
    # corners should be background (black)
    assert img[0, 0].max() < 1e-3
    assert float(out["alpha"][32, 32]) > 0.9


def test_depth_ordering_occlusion():
    cfg = RenderConfig(width=32, height=32, chunk_size=8)
    cam = make_camera(32, 32)
    near = single_splat(color=(0.0, 1.0, 0.0), pos=(0.0, 0.0, 1.0), scale=0.4)
    far = single_splat(color=(1.0, 0.0, 0.0), pos=(0.0, 0.0, -1.0), scale=0.4)
    both = SplatData.concatenate([far, near])
    out = reference_render(both, cam, cfg)
    c = np.asarray(out["color"])[16, 16]
    # near (green) splat should dominate regardless of input order
    assert c[1] > 0.9 and c[0] < 0.1
    both_swapped = SplatData.concatenate([near, far])
    out2 = reference_render(both_swapped, cam, cfg)
    np.testing.assert_allclose(out["color"], out2["color"], atol=1e-5)


def test_behind_camera_culled():
    cfg = RenderConfig(width=32, height=32, chunk_size=8)
    cam = make_camera(32, 32)
    behind = single_splat(pos=(0.0, 0.0, 10.0))  # behind the eye at z=5
    out = reference_render(behind, cam, cfg)
    assert float(np.asarray(out["color"]).max()) < 1e-6


def test_semi_transparent_blend():
    cfg = RenderConfig(width=32, height=32, chunk_size=8)
    cam = make_camera(32, 32)
    s = single_splat(color=(1.0, 1.0, 1.0), opacity=0.5, scale=1.0)
    out = reference_render(s, cam, cfg)
    c = float(np.asarray(out["color"])[16, 16, 0])
    # alpha at the mean is ~0.5 (kernel dilation makes it slightly less)
    assert 0.4 < c < 0.55


def test_background_color():
    cfg = RenderConfig(width=16, height=16, chunk_size=8,
                       background=(0.2, 0.4, 0.6))
    cam = make_camera(16, 16)
    empty = single_splat(opacity=0.0)
    out = reference_render(empty, cam, cfg)
    np.testing.assert_allclose(
        np.asarray(out["color"])[0, 0], [0.2, 0.4, 0.6], atol=1e-6)


def test_render_differentiable():
    cfg = RenderConfig(width=32, height=32, chunk_size=32, sh_degree=1)
    cam = make_camera(32, 32)
    splats = random_splats(jax.random.PRNGKey(0), 64, sh_degree=1)
    target = jnp.zeros((32, 32, 3))

    def loss(sp):
        out = reference_render(sp, cam, cfg)
        return jnp.mean((out["color"] - target) ** 2)

    grads = jax.grad(loss)(splats)
    for name in ("means", "scales", "quats", "colors", "sh"):
        g = np.asarray(getattr(grads, name))
        assert np.all(np.isfinite(g)), name
    # gradients must flow to at least some splats
    assert float(np.abs(np.asarray(grads.means)).max()) > 0.0
    assert float(np.abs(np.asarray(grads.colors)).max()) > 0.0
    assert float(np.abs(np.asarray(grads.sh)).max()) > 0.0


def test_sh_degree_changes_image():
    cfg0 = RenderConfig(width=32, height=32, chunk_size=32, sh_degree=0)
    cfg1 = RenderConfig(width=32, height=32, chunk_size=32, sh_degree=1)
    cam = make_camera(32, 32)
    splats = random_splats(jax.random.PRNGKey(1), 64, sh_degree=1)
    out0 = reference_render(splats, cam, cfg0)
    out1 = reference_render(splats, cam, cfg1)
    assert float(np.abs(out0["color"] - out1["color"]).max()) > 1e-4


def test_antialiased_compensation_reduces_alpha():
    cfg = RenderConfig(width=32, height=32, chunk_size=8)
    cfg_aa = cfg.replace(antialiased=True)
    cam = make_camera(32, 32)
    # Small splat: the 0.3 kernel dilation dominates its projected footprint.
    # (Even smaller splats are culled by the reference's eigenvalue guard:
    # term2 >= sqrt(0.1) makes lambda2 <= 0, SplatMaterial3D.js:180-188.)
    s = single_splat(scale=0.05)
    out = reference_render(s, cam, cfg)
    out_aa = reference_render(s, cam, cfg_aa)
    a = float(out["alpha"][16, 16])
    a_aa = float(out_aa["alpha"][16, 16])
    assert a_aa < a


def test_point_cloud_mode_fixed_size():
    cfg = RenderConfig(width=64, height=64, chunk_size=8,
                       point_cloud_mode=True)
    cam = make_camera(64, 64)
    big = single_splat(scale=1.0)
    small = single_splat(scale=0.01)
    out_big = reference_render(big, cam, cfg)
    out_small = reference_render(small, cam, cfg)
    np.testing.assert_allclose(out_big["alpha"], out_small["alpha"],
                               atol=1e-5)
