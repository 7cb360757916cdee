"""Loader/writer round-trips for .splat / .ply / .ksplat / .spz.

The reference defines the formats (SplatBuffer.js writer, SplatParser.js,
INRIAV1PlyParser.js, SpzLoader.js); our writers produce files our readers
(and the reference) can decode, so write->read->compare is the oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu import io as gio


def scene(n=257, sh_degree=2, seed=5):
    # n deliberately not a multiple of bucket sizes
    s = gs.random_splats(jax.random.PRNGKey(seed), n, sh_degree=sh_degree,
                         extent=3.0)
    return s


def quat_close(a, b, atol):
    """Quaternions up to sign."""
    a = np.asarray(a)
    b = np.asarray(b)
    flip = np.sign(np.sum(a * b, axis=1, keepdims=True))
    return np.allclose(a, b * flip, atol=atol)


def test_splat_roundtrip(tmp_path):
    s = scene(sh_degree=0)
    p = str(tmp_path / "x.splat")
    gio.save_splat(s, p)
    r = gio.load_splat(p)
    assert np.allclose(r.means, s.means, atol=1e-6)
    assert np.allclose(r.scales, s.scales, atol=1e-6)
    assert np.allclose(r.colors, s.colors, atol=1 / 255 + 1e-6)
    assert quat_close(r.quats, s.quats, atol=1 / 64)


def test_writers_accept_noncontiguous_arrays(tmp_path):
    """np.asarray of a device array (or any strided host view) can carry
    non-contiguous strides; every writer's .view(uint8) reinterpretation
    requires contiguity — regression for the TPU-side bench_configs
    crash ('last axis must be contiguous')."""
    import dataclasses
    s = scene(sh_degree=2)

    def strided(a):
        # embed in a wider array and slice: non-contiguous last-axis
        # strides while values stay identical
        a = np.asarray(a)
        wide = np.zeros(a.shape[:-1] + (a.shape[-1] * 2,), a.dtype)
        wide[..., ::2] = a
        v = wide[..., ::2]
        assert not v.flags["C_CONTIGUOUS"]
        return v

    sv = dataclasses.replace(
        s, means=strided(s.means), scales=strided(s.scales),
        quats=strided(s.quats), colors=strided(s.colors))
    for name in ("a.splat", "a.ply", "a.ksplat", "a.spz"):
        p = str(tmp_path / name)
        gs.save(sv, p)
        r = gs.load(p)
        assert np.allclose(r.means, np.asarray(s.means), atol=2e-3)


def test_ply_roundtrip(tmp_path):
    s = scene(sh_degree=2)
    p = str(tmp_path / "x.ply")
    gio.save_ply(s, p)
    r = gio.load_ply(p)
    assert np.allclose(r.means, s.means, atol=1e-6)
    assert np.allclose(r.scales, s.scales, rtol=1e-5)
    assert np.allclose(r.colors, s.colors, atol=1 / 255 + 1e-5)
    assert np.allclose(r.sh, s.sh, atol=1e-6)
    assert quat_close(r.quats, s.quats, atol=1e-5)


@pytest.mark.parametrize("level", [0, 1, 2])
def test_ksplat_roundtrip(tmp_path, level):
    s = scene(sh_degree=2)
    p = str(tmp_path / "x.ksplat")
    gio.save_ksplat(s, p, compression_level=level)
    r = gio.load_ksplat(p)
    assert r.num_splats == s.num_splats
    if level == 0:
        # lossless apart from u8 color and splat ORDER (identity at level 0)
        assert np.allclose(r.means, s.means, atol=1e-6)
        assert np.allclose(r.scales, s.scales, atol=1e-6)
        assert np.allclose(r.sh, s.sh, atol=1e-6)
        mean_tol, scale_tol, sh_tol = 1e-6, 1e-6, 1e-6
    else:
        # bucketed u16 positions: block 5.0 / 65535 ~ 4e-5; f16 scales;
        # f16 (or u8-range) SH — and bucket ordering permutes splats.
        om = np.asarray(s.means)
        rm = np.asarray(r.means)
        # match up by nearest neighbour on means
        d = np.linalg.norm(om[:, None, :] - rm[None, :, :], axis=2)
        match = d.argmin(axis=1)
        assert len(np.unique(match)) == s.num_splats
        assert d[np.arange(s.num_splats), match].max() < 2e-4
        sh_tol = 2e-3 if level == 1 else 0.05
        assert np.allclose(np.asarray(r.scales)[match], s.scales, atol=2e-3)
        assert np.allclose(np.asarray(r.sh)[match], s.sh, atol=sh_tol)
        assert np.allclose(np.asarray(r.colors)[match], s.colors,
                           atol=1 / 255 + 1e-6)


def test_spz_roundtrip(tmp_path):
    s = scene(sh_degree=2)
    p = str(tmp_path / "x.spz")
    gio.save_spz(s, p)
    r = gio.load_spz(p)
    assert np.allclose(r.means, s.means, atol=1.5 / (1 << 12))
    assert np.allclose(np.log(np.asarray(r.scales)),
                       np.log(np.asarray(s.scales)), atol=1 / 16)
    # smallest-three encoding loses up to ~sqrt(2 eps) in w near w=0
    # (inherent to the format); check rotation angle instead of components
    dots = np.abs(np.sum(np.asarray(r.quats) * np.asarray(s.quats), axis=1))
    assert (dots > 0.995).all()
    assert np.allclose(r.sh, s.sh, atol=1 / 128 + 1e-6)
    # color goes through the 0.15 SPZ scale; tolerance is a few u8 steps
    assert np.allclose(r.colors, s.colors, atol=0.02)


def test_dispatch_and_sh_truncation(tmp_path):
    s = scene(sh_degree=2)
    for ext in ("splat", "ply", "ksplat", "spz"):
        p = str(tmp_path / f"y.{ext}")
        gio.save(s, p)
        r = gio.load(p)
        assert r.num_splats == s.num_splats
        r1 = gio.load(p, sh_degree=1)
        assert r1.sh.shape[1] in (0, 3)
    with pytest.raises(ValueError):
        gio.scene_format_from_path("scene.obj")


def test_formats_render_consistently(tmp_path):
    """A scene saved+loaded through each format must render ~identically."""
    s = scene(n=200, sh_degree=1)
    cam = gs.Camera.look_at((4.0, 2.5, 4.5), (0, 0, 0), fov_y_deg=60)
    cfg = gs.RenderConfig(width=64, height=64, sh_degree=1)
    base = gs.reference_render(s, cam, cfg)["color"]
    for ext, tol in (("ply", 0.02), ("ksplat", 0.02), ("spz", 0.1)):
        p = str(tmp_path / f"z.{ext}")
        gio.save(s, p)
        r = gio.load(p)
        img = gs.reference_render(r, cam, cfg)["color"]
        err = float(jnp.abs(img - base).mean())
        assert err < tol, (ext, err)


def test_ply_variant_detection():
    s = scene(n=16, sh_degree=1)
    from gaussiansplats3d_tpu.io.ply import detect_ply_variant, serialize_ply
    assert detect_ply_variant(serialize_ply(s)) == "inria_v1"
    bad = b"ply\nformat binary_little_endian 1.0\nelement chunk 1\n" \
          b"property float min_x\nelement vertex 1\n" \
          b"property uint packed_position\nend_header\n"
    assert detect_ply_variant(bad) == "playcanvas"


def test_ksplat_header_fields(tmp_path):
    s = scene(n=100, sh_degree=1)
    from gaussiansplats3d_tpu.io.ksplat import (
        parse_ksplat_header, serialize_ksplat)
    buf = serialize_ksplat(s, compression_level=1)
    h = parse_ksplat_header(buf)
    assert h.splat_count == 100
    assert h.compression_level == 1
    assert h.section_count == 1
