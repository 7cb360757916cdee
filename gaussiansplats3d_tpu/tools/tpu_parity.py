"""On-hardware Pallas kernel parity gate.

CI exercises the Pallas compositor only through interpret mode
(tests/test_pallas.py); this tool runs the REAL kernels on the local TPU
and asserts forward+backward numeric parity against the pure-JAX backend
at a shape that exercises the risky kernel paths:

- early exit (an opaque wall of splats drives transmittance under the
  exit threshold mid-tile, so the backward replay starts at exit_k);
- shared floor-aligned boundary chunks (tile ranges that straddle chunk
  boundaries, so adjacent grid steps read-modify-write the same gradient
  chunk through the aliased DMA pipeline);
- the depth channel's 4-wide record layout.

Usage:  python -m gaussiansplats3d_tpu.tools.tpu_parity
Exits nonzero (with a diff report) on divergence.  This is the round gate
the verify skill runs before committing kernel changes.
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

import gaussiansplats3d_tpu as gs


def build_scene():
    # 6k splats, some scaled way up so single splats span many tiles (aux
    # path + early exit), plus near-opaque colors for the exit threshold.
    splats = gs.random_splats(jax.random.PRNGKey(11), 6000, sh_degree=1)
    big = jax.random.uniform(jax.random.PRNGKey(12), (6000, 1)) < 0.02
    scales = jnp.where(big, splats.scales * 20.0, splats.scales)
    colors = splats.colors.at[:, 3].set(
        jnp.clip(splats.colors[:, 3] * 2.0, 0.0, 0.98))
    return dataclasses.replace(splats, scales=scales, colors=colors)


def run(cfg_kwargs, label):
    splats = build_scene()
    cam = gs.Camera.look_at((2.2, 1.4, 2.2), (0, 0, 0), fov_y_deg=60,
                            aspect=320 / 240)
    cfg_p = gs.RenderConfig(width=320, height=240, sh_degree=1,
                            backend="pallas", **cfg_kwargs)
    cfg_j = cfg_p.replace(backend="jax")

    def loss(s, cfg):
        out = gs.render(s, cam, cfg)
        l = jnp.mean(out["color"] ** 2) + jnp.mean(out["alpha"])
        if cfg.return_depth:
            l = l + 1e-3 * jnp.mean(out["depth"] ** 2)
        return l

    outs, grads = {}, {}
    for name, cfg in (("pallas", cfg_p), ("jax", cfg_j)):
        outs[name] = jax.jit(lambda s, cfg=cfg: gs.render(s, cam, cfg))(splats)
        grads[name] = jax.jit(jax.grad(lambda s, cfg=cfg: loss(s, cfg)))(splats)
        jax.block_until_ready(grads[name].means)

    failures = []
    for key in ("color", "alpha") + (("depth",) if cfg_p.return_depth else ()):
        a = np.asarray(outs["pallas"][key])
        b = np.asarray(outs["jax"][key])
        err = np.abs(a - b).max()
        print(f"[{label}] fwd {key:6s} max err {err:.3e}")
        if err > 5e-3:
            failures.append(f"{label}/fwd/{key}: {err:.3e}")
    for f in ("means", "scales", "quats", "colors", "sh"):
        a = np.asarray(getattr(grads["pallas"], f))
        b = np.asarray(getattr(grads["jax"], f))
        scale = max(np.abs(b).max(), 1e-10)
        rel = np.abs(a - b).max() / scale
        print(f"[{label}] bwd {f:6s} max rel err {rel:.3e}")
        if not np.isfinite(a).all():
            failures.append(f"{label}/bwd/{f}: non-finite")
        if rel > 2e-2:
            failures.append(f"{label}/bwd/{f}: rel {rel:.3e}")
    return failures


def main():
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        print(f"ERROR: default device is {platform!r}, not a TPU — this "
              "gate must run on hardware (CI covers interpret mode).")
        return 2
    failures = run({}, "rgb")
    failures += run({"return_depth": True}, "rgb+depth")
    if failures:
        print("PARITY FAILURES:\n  " + "\n  ".join(failures))
        return 1
    print("TPU kernel parity: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
