"""Cross-implementation format interchange (VERDICT round-1 item 7).

Self-roundtrips can hide symmetric encode/decode bugs; these tests pit our
reader/writer against an INDEPENDENT transcription of the reference's own
writer and header semantics (tests/reference_ksplat_writer.py, a 1:1 port
of SplatBuffer.js:1050-1326 / :819-963 sharing no code with io/ksplat.py).
"""

import numpy as np
import pytest

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu.io.ksplat import parse_ksplat, serialize_ksplat as our_write
from tests import reference_ksplat_writer as ref


def make_uncompressed(n, sh_degree, seed=0):
    """UncompressedSplatArray-convention rows (colors 0-255, quats wxyz)."""
    rng = np.random.RandomState(seed)
    rows = []
    n_sh = {0: 0, 1: 9, 2: 24}[sh_degree]
    for i in range(n):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        row = (list(rng.uniform(-2, 2, 3))          # x y z
               + list(rng.uniform(0.01, 0.3, 3))    # scales
               + list(q)                            # w x y z
               + list(rng.uniform(0, 255, 3))       # rgb
               + [rng.uniform(30, 255)]             # opacity
               + list(rng.uniform(-1.2, 1.2, n_sh)))
        rows.append(row)
    return rows


def expected_sh(row, sh_degree):
    """FRC ordering -> our [K, 3] coefficient-major layout (CLAUDE.md:
    channel-major per band in the file: R1R2R3 G1G2G3 B1B2B3 | R4..)."""
    frc = row[14:]
    if sh_degree == 0:
        return np.zeros((0, 3), np.float32)
    k = {1: 3, 2: 8}[sh_degree]
    out = np.zeros((k, 3), np.float32)
    for c in range(3):
        for j in range(3):
            out[j, c] = frc[c * 3 + j]
    if sh_degree >= 2:
        for c in range(3):
            for j in range(5):
                out[3 + j, c] = frc[9 + c * 5 + j]
    return out


@pytest.mark.parametrize("level,sh_degree,atol_pos,atol_sh", [
    (0, 0, 1e-6, 0),
    (0, 1, 1e-6, 1e-6),
    (0, 2, 1e-6, 1e-6),
    (1, 1, 5.0 / 65534 * 1.01, 2e-3),    # 16-bit bucket grid, f16 SH
    (2, 2, 5.0 / 65534 * 1.01, 2.4 / 255 * 1.01),  # 8-bit SH over range
])
def test_our_reader_decodes_reference_writer(level, sh_degree, atol_pos,
                                             atol_sh):
    rows = make_uncompressed(40, sh_degree, seed=level * 10 + sh_degree)
    data = ref.write_ksplat([rows], minimum_alpha=1,
                            compression_level=level)
    splats = parse_ksplat(data)
    assert splats.num_splats == 40

    # the reference writer reorders splats by bucket walk; match by
    # nearest-position assignment
    got_means = np.asarray(splats.means)
    want_means = np.array([r[0:3] for r in rows], np.float32)
    d2 = ((got_means[:, None, :] - want_means[None, :, :]) ** 2).sum(-1)
    perm = np.argmin(d2, axis=1)
    assert len(set(perm.tolist())) == 40        # a true permutation
    np.testing.assert_allclose(got_means, want_means[perm], atol=atol_pos)

    f16 = level >= 1
    scale_tol = 2e-3 if f16 else 1e-6
    np.testing.assert_allclose(
        np.asarray(splats.scales),
        np.array([rows[p][3:6] for p in perm], np.float32),
        rtol=scale_tol, atol=scale_tol)
    # file quats (w,x,y,z) -> our (x,y,z,w); sign-insensitive compare
    want_q = np.array([rows[p][7:10] + [rows[p][6]] for p in perm],
                      np.float32)
    got_q = np.asarray(splats.quats)
    sign = np.sign(np.sum(got_q * want_q, axis=1, keepdims=True))
    np.testing.assert_allclose(got_q, want_q * sign,
                               atol=2e-3 if f16 else 1e-6)
    np.testing.assert_allclose(
        np.asarray(splats.colors) * 255.0,
        np.array([[round(v) for v in rows[p][10:14]] for p in perm]),
        atol=0.51)
    if sh_degree > 0:
        want_sh = np.stack([expected_sh(rows[p], sh_degree) for p in perm])
        np.testing.assert_allclose(np.asarray(splats.sh), want_sh,
                                   atol=atol_sh)


@pytest.mark.parametrize("level,sh_degree", [(0, 0), (0, 2), (1, 1), (2, 2)])
def test_our_writer_passes_reference_header_checks(level, sh_degree,
                                                   tmp_path):
    import jax
    splats = gs.random_splats(jax.random.PRNGKey(5), 100,
                              sh_degree=sh_degree)
    data = our_write(splats, compression_level=level)

    h = ref.reference_parse_header(data)
    assert (h["version_major"], h["version_minor"]) == (0, 1)
    assert h["compression_level"] == level
    assert h["splat_count"] == 100
    assert h["section_count"] == h["max_section_count"] >= 1

    sections = ref.reference_parse_section_headers(data, h)
    assert sum(s["splat_count"] for s in sections) == 100
    total = ref.HEADER_SIZE + h["max_section_count"] * ref.SECTION_HEADER_SIZE
    for s in sections:
        assert s["sh_degree"] == sh_degree
        assert s["splat_count"] <= s["max_splat_count"]
        declared = s["storage_size_bytes"] or s["declared_storage"]
        assert declared == s["declared_storage"]
        if level >= 1:
            assert s["bucket_count"] >= 1
            assert s["compression_scale_range"] == 32767
            assert s["bucket_block_size"] > 0
        total += declared
    assert total == len(data)                   # sections tile the file


@pytest.mark.parametrize("level", [0, 1, 2])
def test_reference_writer_roundtrips_through_both(level, tmp_path):
    """ref-writer -> our reader -> our writer -> our reader: values stable
    (no drift through a full interchange cycle)."""
    rows = make_uncompressed(30, 1, seed=7)
    data = ref.write_ksplat([rows], compression_level=level)
    first = parse_ksplat(data)
    data2 = our_write(first, compression_level=0)   # lossless re-encode
    second = parse_ksplat(data2)
    np.testing.assert_allclose(np.asarray(first.means),
                               np.asarray(second.means), atol=1e-6)
    np.testing.assert_allclose(np.asarray(first.sh),
                               np.asarray(second.sh), atol=1e-6)
    np.testing.assert_allclose(np.asarray(first.colors),
                               np.asarray(second.colors), atol=1.0 / 255.0)


def test_our_reader_decodes_reference_splat_format():
    from gaussiansplats3d_tpu.io.splat import parse_splat

    rows = make_uncompressed(25, 0, seed=3)
    data = ref.write_splat(rows)
    splats = parse_splat(data)
    assert splats.num_splats == 25
    np.testing.assert_allclose(np.asarray(splats.means),
                               np.array([r[0:3] for r in rows], np.float32),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(splats.scales),
                               np.array([r[3:6] for r in rows], np.float32),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(splats.colors) * 255.0,
        np.array([[round(v) for v in r[10:14]] for r in rows]), atol=0.51)
    want_q = np.array([r[7:10] + [r[6]] for r in rows], np.float32)
    got_q = np.asarray(splats.quats)
    got_q = got_q / np.linalg.norm(got_q, axis=1, keepdims=True)
    sign = np.sign(np.sum(got_q * want_q, axis=1, keepdims=True))
    np.testing.assert_allclose(got_q, want_q * sign, atol=1.0 / 127.0)


@pytest.mark.parametrize("sh_degree", [0, 1, 2])
def test_our_reader_decodes_reference_spz_format(sh_degree):
    from gaussiansplats3d_tpu.io.spz import parse_spz

    rows = make_uncompressed(20, sh_degree, seed=sh_degree)
    # clamp SH into the u8-quantizable range [-1, 1)
    rows = [r[:14] + [min(max(v, -0.99), 0.99) for v in r[14:]]
            for r in rows]
    data = ref.write_spz(rows, sh_degree=sh_degree)
    splats = parse_spz(data)
    assert splats.num_splats == 20
    np.testing.assert_allclose(np.asarray(splats.means),
                               np.array([r[0:3] for r in rows], np.float32),
                               atol=1.5 / (1 << 12))
    np.testing.assert_allclose(np.asarray(splats.scales),
                               np.array([r[3:6] for r in rows], np.float32),
                               rtol=0.04, atol=1e-5)
    # alpha is stored verbatim u8; colors go through the SH_C0 transform
    np.testing.assert_allclose(np.asarray(splats.colors)[:, 3] * 255.0,
                               np.array([round(r[13]) for r in rows]),
                               atol=0.51)
    np.testing.assert_allclose(
        np.asarray(splats.colors)[:, :3] * 255.0,
        np.array([[round(v) for v in r[10:13]] for r in rows]),
        atol=3.0)                       # u8 color quantization + transform
    want_q = np.array([r[7:10] + [r[6]] for r in rows], np.float32)
    want_q = want_q * np.where(want_q[:, 3:4] < 0, -1.0, 1.0)
    got_q = np.asarray(splats.quats)
    # xyz carry the u8 payload; w = sqrt(1 - |xyz|^2) amplifies their
    # quantization arbitrarily as w -> 0, so compare rotation ANGLE
    dots = np.abs(np.sum(got_q * want_q, axis=1))
    assert (1.0 - dots < 5e-3).all(), (1.0 - dots).max()
    if sh_degree > 0:
        k = {1: 3, 2: 8}[sh_degree]
        want_sh = np.zeros((20, k, 3), np.float32)
        for i, r in enumerate(rows):
            for c in range(3):
                for j in range(k):
                    want_sh[i, j, c] = r[14 + c * k + j]
        np.testing.assert_allclose(np.asarray(splats.sh)[:, :k],
                                   want_sh, atol=1.01 / 128.0)
