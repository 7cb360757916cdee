import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiansplats3d_tpu.core import math3d, sh, covariance
from gaussiansplats3d_tpu.constants import SH_C1


def test_quat_to_rotmat_identity():
    r = math3d.quat_to_rotmat(jnp.array([0.0, 0.0, 0.0, 1.0]))
    np.testing.assert_allclose(r, np.eye(3), atol=1e-6)


def test_quat_to_rotmat_orthonormal():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (32, 4))
    r = math3d.quat_to_rotmat(q)
    eye = jnp.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-5)


def test_quat_roundtrip():
    key = jax.random.PRNGKey(1)
    q = math3d.normalize(jax.random.normal(key, (16, 4)))
    for i in range(16):
        r = math3d.quat_to_rotmat(q[i])
        q2 = math3d.rotmat_to_quat(r)
        # q and -q encode the same rotation
        dot = abs(float(jnp.dot(q[i], q2)))
        assert dot > 1.0 - 1e-5


def test_quat_multiply_matches_matrix_product():
    key = jax.random.PRNGKey(2)
    qa, qb = math3d.normalize(jax.random.normal(key, (2, 4)))
    rab = math3d.quat_to_rotmat(math3d.quat_multiply(qa, qb))
    ra_rb = math3d.quat_to_rotmat(qa) @ math3d.quat_to_rotmat(qb)
    np.testing.assert_allclose(rab, ra_rb, atol=1e-5)


def test_look_at_points_down_negative_z():
    eye = jnp.array([0.0, 0.0, 5.0])
    target = jnp.zeros(3)
    view = math3d.look_at_view_matrix(eye, target)
    p = math3d.transform_points(view, target[None])[0]
    np.testing.assert_allclose(p, [0.0, 0.0, -5.0], atol=1e-6)


def test_perspective_projects_center():
    proj = math3d.perspective_projection(60.0, 1.0, 0.1, 100.0)
    v = proj @ jnp.array([0.0, 0.0, -10.0, 1.0])
    ndc = v[:3] / v[3]
    np.testing.assert_allclose(ndc[:2], [0.0, 0.0], atol=1e-6)
    assert -1.0 < float(ndc[2]) < 1.0


def test_covariance_isotropy_and_congruence():
    n = 8
    key = jax.random.PRNGKey(3)
    quats = math3d.normalize(jax.random.normal(key, (n, 4)))
    scales = jnp.full((n, 3), 0.5)
    cov = covariance.covariance_from_scale_quat(scales, quats)
    # isotropic scale: covariance = s^2 I regardless of rotation
    np.testing.assert_allclose(cov, np.tile(0.25 * np.eye(3), (n, 1, 1)),
                               atol=1e-5)
    t3 = jnp.array([[2.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    cov_t = covariance.covariance_from_scale_quat(scales, quats, t3)
    np.testing.assert_allclose(
        cov_t, np.tile(np.diag([1.0, 0.25, 0.25]), (n, 1, 1)), atol=1e-5)


def test_covariance6_order():
    scales = jnp.array([[1.0, 2.0, 3.0]])
    quats = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    c6 = covariance.covariance6(scales, quats)
    np.testing.assert_allclose(c6[0], [1.0, 0.0, 0.0, 4.0, 0.0, 9.0],
                               atol=1e-6)


def test_sh_degree1_matches_shader_formula():
    # one splat, sh coeffs chosen so the contribution is analytic
    base = jnp.array([[0.5, 0.5, 0.5]])
    shc = jnp.zeros((1, 3, 3)).at[0, 1, :].set(1.0)  # sh2 coefficient = 1
    d = jnp.array([[0.0, 0.0, 1.0]])                 # view dir +z
    out = sh.eval_sh_color(base, shc, d, degree=1)
    np.testing.assert_allclose(out[0], 0.5 + SH_C1, atol=1e-6)  # clamped to 1
    # SH_C1 ~ 0.489 so 0.5+0.489 < 1, no clamp
    assert float(out[0, 0]) == pytest.approx(0.5 + SH_C1, abs=1e-6)


def test_sh_rotation_consistency():
    """Rotating coefficients == evaluating at inversely-rotated directions."""
    key = jax.random.PRNGKey(4)
    coeffs = jax.random.normal(key, (5, 8, 3)) * 0.3
    base = jnp.full((5, 3), 0.5)
    rot = math3d.quat_to_rotmat(
        math3d.normalize(jax.random.normal(jax.random.PRNGKey(5), (4,))))
    dirs = math3d.normalize(jax.random.normal(jax.random.PRNGKey(6), (5, 3)))

    rotated = sh.rotate_sh(coeffs, rot, degree=2)
    lhs = sh.eval_sh_color(base, rotated, dirs, degree=2)
    rhs = sh.eval_sh_color(base, coeffs, dirs @ rot, degree=2)  # R^T d
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_bake_transform_matches_dynamic_render():
    """Baking a static TRS transform into the buffer (means + scale/rot
    decompose + SH rotation, SplatBuffer.js:349-440/766-817) must render
    identically to passing the transform dynamically — this is the
    consumer-side validation of rotate_sh."""
    import numpy as np

    import gaussiansplats3d_tpu as gs
    from gaussiansplats3d_tpu.core import math3d

    splats = gs.random_splats(jax.random.PRNGKey(9), 300, sh_degree=2)
    # rigid + uniform-scale transform
    axis = np.array([0.3, 0.8, 0.5])
    axis /= np.linalg.norm(axis)
    ang = 0.7
    qx, qy, qz = axis * np.sin(ang / 2)
    qw = np.cos(ang / 2)
    r = np.asarray(math3d.quat_to_rotmat(
        jnp.asarray([[qx, qy, qz, qw]], jnp.float32)))[0]
    tf = np.eye(4, dtype=np.float32)
    tf[:3, :3] = 1.3 * r
    tf[:3, 3] = [0.4, -0.2, 0.3]

    cam = gs.Camera.look_at((2.5, 1.5, 2.5), (0, 0, 0))
    cfg = gs.RenderConfig(width=64, height=64, sh_degree=2, sort_bits=20)
    dyn = gs.render(splats, cam, cfg,
                    transforms=jnp.asarray(tf)[None],
                    scene_indices=jnp.zeros((300,), jnp.int32))
    baked = gs.bake_transform(splats, tf)
    stat = gs.render(baked, cam, cfg)
    assert float(jnp.max(jnp.abs(dyn["color"] - stat["color"]))) < 3e-3
