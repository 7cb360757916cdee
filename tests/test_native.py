"""Native (C++) ingest vs the NumPy reference decoders.

Skipped when the toolchain can't build the library (GS_NATIVE=0 or no g++).
"""

import os

import numpy as np
import jax
import pytest

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu.io import ksplat as kio
from gaussiansplats3d_tpu.io import native as nio
from gaussiansplats3d_tpu.io import ply as pio
from gaussiansplats3d_tpu.io import splat as sio

pytestmark = pytest.mark.skipif(nio.get_lib() is None,
                                reason="native ingest lib unavailable")


def scene(n=500, sh_degree=2):
    return gs.random_splats(jax.random.PRNGKey(9), n, sh_degree=sh_degree,
                            extent=3.0)


def numpy_only():
    """Context manager forcing the NumPy path."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        os.environ["GS_NATIVE"] = "0"
        try:
            yield
        finally:
            os.environ["GS_NATIVE"] = "1"
    return cm()


def assert_trees_equal(a, b, atol=1e-6):
    for name in ("means", "scales", "quats", "colors", "sh"):
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        assert np.allclose(x, y, atol=atol), (
            name, float(np.abs(x - y).max()))


def test_splat_native_matches_numpy():
    buf = sio.serialize_splat(scene(sh_degree=0))
    nat = sio.parse_splat(buf)
    with numpy_only():
        ref = sio.parse_splat(buf)
    assert_trees_equal(nat, ref)


@pytest.mark.parametrize("level", [0, 1, 2])
def test_ksplat_native_matches_numpy(level):
    buf = kio.serialize_ksplat(scene(), compression_level=level)
    nat = kio.parse_ksplat(buf)
    with numpy_only():
        ref = kio.parse_ksplat(buf)
    assert_trees_equal(nat, ref, atol=1e-6)


def test_ply_native_matches_numpy():
    buf = pio.serialize_ply(scene())
    nat = pio.parse_ply(buf)
    with numpy_only():
        ref = pio.parse_ply(buf)
    assert_trees_equal(nat, ref, atol=1e-6)


def test_ply_native_sh_truncation():
    buf = pio.serialize_ply(scene(sh_degree=2))
    nat = pio.parse_ply(buf, sh_degree=1)
    assert nat.sh.shape[1] == 3
    with numpy_only():
        ref = pio.parse_ply(buf, sh_degree=1)
    assert_trees_equal(nat, ref)
