"""BASELINE.md acceptance-config runner.

Exercises the acceptance configs end-to-end — synthetic scenes written and
re-ingested through the REAL container formats, rendered through the public
API, with forward and forward+backward wall times printed as JSON lines:

    1. 10k splats, SH deg 0, 256x256      (.ply ingest, oracle-checked)
    2. truck-shaped: 1M, SH deg 1, 800x600  (.splat ingest)
    3. garden-shaped: 5M, SH deg 2, 1080p   (.ksplat ingest)

(The real truck/garden captures aren't redistributable; these match their
splat counts, SH degrees and resolutions — BASELINE.md "Acceptance
configs" 1-3.  Config 4/5 — multi-host sharding and multi-scene stereo —
are covered by tests/test_sharded.py and __graft_entry__.dryrun_multichip.)

Usage:  python -m gaussiansplats3d_tpu.tools.bench_configs [--small]

--small shrinks counts 100x for a CPU smoke run (CI / no-TPU validation).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

# this machine pins jax_platforms at import; honor the env var explicitly
# so --small CPU smoke runs never touch the real TPU (tests/conftest.py
# has the same workaround)
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")


def _scene(n, sh_degree, key=0):
    import gaussiansplats3d_tpu as gs

    splats = gs.random_splats(jax.random.PRNGKey(key), n,
                              sh_degree=sh_degree, extent=2.0)
    return dataclasses.replace(splats, scales=splats.scales * 0.15)


def _time(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def run_config(name, n, sh_degree, width, height, ext, tmpdir,
               check_oracle=False, backward=True):
    import gaussiansplats3d_tpu as gs

    splats = _scene(n, sh_degree)
    path = os.path.join(tmpdir, f"{name}.{ext}")
    gs.save(splats, path)
    loaded = gs.load(path)

    # clamp to what the container actually carries (.splat stores no SH) —
    # the reference clamps maxSphericalHarmonicsDegree the same way
    # (Viewer.js caps to the loaded buffer's degree).
    # sh holds [N, K, 3] REST coefficients: K = 3/8/15 for degree 1/2/3
    sh_avail = {0: 0, 3: 1, 8: 2, 15: 3}.get(loaded.sh.shape[1], 0)
    eff_degree = min(sh_degree, sh_avail)
    cfg = gs.RenderConfig(width=width, height=height, sh_degree=eff_degree,
                          sort_bits=16)
    camera = gs.Camera.look_at((4.5, 2.5, 4.5), (0.0, 0.0, 0.0),
                               fov_y_deg=60.0, aspect=width / height)

    fwd = jax.jit(lambda s: gs.render(s, camera, cfg)["color"])
    t_fwd = _time(fwd, loaded)
    rec = {"config": name, "splats": n, "sh_degree": eff_degree,
           "resolution": f"{width}x{height}", "format": ext,
           "fwd_ms": round(t_fwd, 1)}

    if backward:
        fb = jax.jit(jax.grad(
            lambda s: jnp.mean(gs.render(s, camera, cfg)["color"] ** 2)))
        t_fb = _time(fb, loaded)
        rec["fwd_bwd_ms"] = round(t_fb, 1)
        rec["fwd_bwd_msplats_per_s"] = round(n / t_fb / 1e3, 2)

    if check_oracle:
        ref = gs.reference_render(loaded, camera, cfg)
        err = float(jnp.max(jnp.abs(fwd(loaded) - ref["color"])))
        rec["max_err_vs_oracle"] = round(err, 6)
        rec["oracle_ok"] = err < 2e-3

    print(json.dumps(rec), flush=True)
    return rec


def run_reference_bytes(tmpdir, n, level, sh_degree=1):
    """Config-3 variant over REFERENCE-WRITTEN bytes at scale.

    Generates an n-splat `.ksplat` through the 1:1 transcription of the
    reference's writer (tests/reference_ksplat_writer, a port of
    /root/reference/src/loaders/SplatBuffer.js:1050-1326), ingests it with
    our reader, renders it, and PSNR-checks against the same splats
    round-tripped through OUR writer — so the acceptance run exercises
    reference-layout bytes at real scale, not 200-splat fixtures.
    """
    import gaussiansplats3d_tpu as gs
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "..", "tests"))
    import reference_ksplat_writer as ref

    rng = np.random.default_rng(level)
    k = {0: 0, 1: 9, 2: 24}[sh_degree]
    rows = np.zeros((n, 14 + k), np.float32)
    rows[:, 0:3] = rng.uniform(-2.0, 2.0, (n, 3))
    rows[:, 3:6] = rng.uniform(0.002, 0.02, (n, 3))
    q = rng.normal(size=(n, 4))
    rows[:, 6:10] = q / np.linalg.norm(q, axis=1, keepdims=True)
    rows[:, 10:13] = rng.uniform(0.0, 255.0, (n, 3))
    rows[:, 13] = rng.uniform(80.0, 255.0, n)
    if k:
        rows[:, 14:] = rng.normal(0.0, 0.2, (n, k))

    t0 = time.perf_counter()
    data = ref.write_ksplat([list(rows)], minimum_alpha=1,
                            compression_level=level)
    t_write = time.perf_counter() - t0
    path = os.path.join(tmpdir, f"refbytes_l{level}.ksplat")
    with open(path, "wb") as f:
        f.write(data)

    t0 = time.perf_counter()
    loaded = gs.load(path)
    t_load = time.perf_counter() - t0
    assert loaded.num_splats == n, (loaded.num_splats, n)

    ours_path = os.path.join(tmpdir, f"ourbytes_l{level}.ksplat")
    gs.save(loaded, ours_path, compression_level=level)
    reloaded = gs.load(ours_path)

    cfg = gs.RenderConfig(width=800, height=600, sh_degree=sh_degree,
                          sort_bits=16)
    camera = gs.Camera.look_at((4.5, 2.5, 4.5), (0.0, 0.0, 0.0),
                               fov_y_deg=60.0, aspect=800 / 600)
    fwd = jax.jit(lambda s: gs.render(s, camera, cfg)["color"])
    img_ref = np.asarray(fwd(loaded))
    img_ours = np.asarray(fwd(reloaded))
    mse = float(np.mean((img_ref - img_ours) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    rec = {"config": f"accept3_reference_bytes_l{level}", "splats": n,
           "compression_level": level, "sh_degree": sh_degree,
           "ref_write_s": round(t_write, 1), "load_s": round(t_load, 2),
           "psnr_vs_our_writer_db": round(psnr, 2),
           "ok": bool(psnr > 40.0)}
    print(json.dumps(rec), flush=True)
    assert rec["ok"], rec
    return rec


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    small = "--small" in argv
    div = 100 if small else 1
    with tempfile.TemporaryDirectory() as tmpdir:
        run_config("accept1_oracle", 10_000 // div, 0, 256, 256, "ply",
                   tmpdir, check_oracle=True)
        run_config("accept2_truck_shaped", 1_000_000 // div, 1, 800, 600,
                   "splat", tmpdir)
        run_config("accept3_garden_shaped", 5_000_000 // div, 2, 1920, 1080,
                   "ksplat", tmpdir)
        # reference-layout bytes at scale (>= 1M splats, levels 1 and 2)
        run_reference_bytes(tmpdir, 1_000_000 // div, 1)
        run_reference_bytes(tmpdir, 1_000_000 // div, 2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
