"""End-to-end training demo CLI: fit splats to multi-view renders.

The reference is view-only (no backward pass); this tool exercises the
framework's BASELINE north-star capability end to end on one command:

1. build a ground-truth synthetic scene (or load any supported file),
2. render K orbit views of it as training targets,
3. initialize a smaller random splat set,
4. run the sharded train step (``parallel.train``) with periodic
   densify/prune (``parallel.heuristics``),
5. report loss / PSNR / splat-count curves and optionally save the fitted
   scene as ``.ksplat``.

Usage:
    python -m gaussiansplats3d_tpu.tools.train_scene \
        [--scene file.(ply|splat|ksplat|spz)] [--views 8] [--iters 300] \
        [--init 5000] [--width 256] [--height 256] [--densify-every 100] \
        [--save fitted.ksplat]

Runs on whatever `jax.devices()` offers: the full (splat, tile) mesh on a
multi-chip slice, or a 1-device mesh on one chip / CPU.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

import gaussiansplats3d_tpu as gs
from ..parallel import make_mesh
from ..parallel.heuristics import (
    DensifyConfig,
    DensifyState,
    densify_and_prune,
    num_alive,
)
from ..parallel.train import (
    TrainState,
    image_to_tile_blocks,
    make_train_step,
)
from ..utils.image_metrics import psnr


def orbit_cameras(k: int, radius: float, height: float, aspect: float):
    cams = []
    for i in range(k):
        a = 2.0 * np.pi * i / k
        eye = (radius * np.cos(a), height, radius * np.sin(a))
        cams.append(gs.Camera.look_at(eye, (0.0, 0.0, 0.0),
                                      fov_y_deg=60.0, aspect=aspect))
    return cams


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--scene", default=None,
                    help="ground-truth scene file (default: synthetic)")
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--init", type=int, default=5000,
                    help="initial random splat count")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--sh-degree", type=int, default=0)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--densify-every", type=int, default=100)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--save", default=None, help="write fitted .ksplat")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (jax_platforms=cpu)")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.scene:
        truth = gs.load(args.scene).with_sh_degree(args.sh_degree)
    else:
        truth = gs.random_splats(jax.random.PRNGKey(0), 20000,
                                 sh_degree=args.sh_degree)
    cfg = gs.RenderConfig(width=args.width, height=args.height,
                          sh_degree=args.sh_degree)
    aspect = args.width / args.height
    cams = orbit_cameras(args.views, 2.6, 1.4, aspect)

    print(f"rendering {args.views} target views of "
          f"{truth.num_splats} ground-truth splats...", flush=True)
    render = jax.jit(lambda s, c: gs.render(s, c, cfg)["color"])
    targets = [np.asarray(render(truth, c)) for c in cams]

    mesh = make_mesh()
    print(f"mesh: {mesh.shape}", flush=True)
    init = gs.random_splats(jax.random.PRNGKey(1), args.init,
                            sh_degree=args.sh_degree)
    optimizer = optax.adam(args.lr)
    state = TrainState.create(init, optimizer)
    step = make_train_step(cfg, mesh, optimizer)

    tile_targets = [image_to_tile_blocks(jnp.asarray(t), cfg)
                    for t in targets]

    @jax.jit
    def mean_grads(params, cam, target):
        def loss(p):
            img = gs.render(p.to_splats(), cam, cfg)["color"]
            return jnp.mean((img - target) ** 2)
        return jax.grad(loss)(params).means

    for it in range(args.iters):
        cam = cams[it % args.views]
        tiles, mask = tile_targets[it % args.views]
        state, metrics = step(state, cam, tiles, mask)
        if args.densify_every and (it + 1) % args.densify_every == 0 \
                and it + 1 < args.iters:
            # 3DGS adaptive-density step: accumulate the positional
            # gradient of the photometric loss over the orbit views as the
            # densify signal, then clone/split into dead slots + prune
            # (static N, heuristics.densify_and_prune) and reset the
            # optimizer moments for the rewritten slots.
            dstate = DensifyState.create(state.params.means.shape[0])
            for v in range(args.views):
                g = mean_grads(state.params, cams[v],
                               jnp.asarray(targets[v]))
                dstate = dstate.update(g)
            params, dstate = densify_and_prune(
                state.params, dstate, jax.random.PRNGKey(it),
                DensifyConfig())
            state = TrainState(params=params,
                               opt_state=optimizer.init(params),
                               step=state.step)
        if (it + 1) % args.log_every == 0 or it == 0:
            img = render(state.params.to_splats(), cams[0])
            p = float(psnr(img, jnp.asarray(targets[0])))
            alive = int(num_alive(state.params))
            print(f"iter {it + 1:5d}  loss {float(metrics['loss']):.5f}  "
                  f"psnr(view0) {p:6.2f} dB  alive {alive}", flush=True)

    from ..utils.image_metrics import ssim
    img = render(state.params.to_splats(), cams[0])
    final_psnr = float(psnr(img, jnp.asarray(targets[0])))
    final_ssim = float(ssim(img, jnp.asarray(targets[0])))
    print(f"final psnr(view0): {final_psnr:.2f} dB  "
          f"ssim(view0): {final_ssim:.4f}", flush=True)
    if args.save:
        gs.save(state.params.to_splats(), args.save)
        print(f"saved {args.save}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
