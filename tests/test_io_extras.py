"""Multi-section ksplat, optimize_splat_data, URL fetch with progress."""

import http.server
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu import io as gio
from gaussiansplats3d_tpu.io.fetch import AbortedError, fetch_with_progress
from gaussiansplats3d_tpu.io.ksplat import (
    parse_ksplat,
    parse_ksplat_header,
    serialize_ksplat,
    serialize_ksplat_sections,
)


def scene(n=400, sh_degree=1, seed=2):
    return gs.random_splats(jax.random.PRNGKey(seed), n, sh_degree=sh_degree,
                            extent=3.0)


def test_multi_section_ksplat_roundtrip():
    s = scene(500)
    buf = serialize_ksplat(s, compression_level=0, section_size=150)
    h = parse_ksplat_header(buf)
    assert h.section_count == 4            # 150*3 + 50
    assert h.splat_count == 500
    r = parse_ksplat(buf)
    assert r.num_splats == 500
    assert np.allclose(r.means, s.means, atol=1e-6)
    assert np.allclose(r.sh, s.sh, atol=1e-6)


def test_multi_section_compressed():
    s = scene(300)
    secs = gio.optimize_splat_data(s, section_size=100)
    buf = serialize_ksplat_sections(secs, compression_level=1)
    r = parse_ksplat(buf)
    assert r.num_splats == 300
    # nearest-neighbour match (bucket + section reorder)
    om = np.asarray(s.means)
    rm = np.asarray(r.means)
    d = np.linalg.norm(om[:, None, :] - rm[None, :, :], axis=2)
    assert d.min(axis=1).max() < 2e-4


def test_optimize_orders_by_center_distance():
    s = scene(200)
    out = gio.optimize_splat_data(s)[0]
    assert out.num_splats == 200
    clamped = np.floor(np.asarray(out.means) / 0.5) * 0.5
    d = np.sum(clamped * clamped, axis=1)
    assert (np.diff(d) >= -1e-5).all()     # non-decreasing


def test_optimize_alpha_filter():
    s = scene(100)
    import dataclasses
    colors = np.array(s.colors)
    colors[:, 3] = 1.0
    colors[:40, 3] = 0.001
    s = dataclasses.replace(s, colors=jnp.asarray(colors))
    out = gio.optimize_splat_data(s, alpha_removal_threshold=10)[0]
    assert out.num_splats == 60


@pytest.fixture()
def http_root(tmp_path):
    handler = type("H", (http.server.SimpleHTTPRequestHandler,), {
        "directory": str(tmp_path),
        "log_message": lambda *a, **k: None})
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    httpd.RequestHandlerClass = lambda *a, **kw: \
        http.server.SimpleHTTPRequestHandler(*a, directory=str(tmp_path),
                                             **kw)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield tmp_path, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_load_from_url_with_progress(http_root):
    tmp_path, base = http_root
    s = scene(120)
    gio.save(s, str(tmp_path / "scene.ksplat"))
    events = []
    r = gio.load(f"{base}/scene.ksplat",
                 on_progress=lambda pct, label, chunk, total:
                 events.append((pct, total)))
    assert r.num_splats == 120
    assert events and events[-1][0] == 100.0


def test_fetch_abort(tmp_path):
    big = tmp_path / "big.bin"
    big.write_bytes(b"x" * (4 << 20))
    ev = threading.Event()
    calls = []

    def cb(pct, label, chunk, total):
        calls.append(pct)
        ev.set()                    # abort after the first chunk

    with pytest.raises(AbortedError):
        fetch_with_progress(str(big), cb, ev, chunk_size=1 << 16)
    assert len(calls) >= 1


def test_file_progress_callback(tmp_path):
    s = scene(50)
    p = str(tmp_path / "x.splat")
    gio.save(s, p)
    seen = []
    r = gio.load(p, on_progress=lambda pct, *a: seen.append(pct))
    assert r.num_splats == 50
    assert seen[-1] == 100.0
