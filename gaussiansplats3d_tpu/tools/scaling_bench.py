"""Scaling-efficiency harness (BASELINE.md metric 3: >= 80% splats/s from
1 chip to N hosts).

Runs the sharded forward+backward train step over every requested
``(splat_shards x tile_shards)`` mesh shape on the available devices and
reports, per shape:

- wall-clock ms/step and Msplats/s (meaningful on REAL multi-chip
  hardware; on a virtual CPU mesh the devices share one host, so only the
  work-volume columns mean anything),
- scaling efficiency vs the smallest mesh (throughput / (base * D)),
- per-device work volumes from the SAME sizing functions the pipeline
  uses: routed-exchange records/bytes per device
  (`sharded.default_exchange_capacity`), gathered record count, pair-sort
  slots (`binning.slot_layout_for`), and the measured per-slab pair
  counts + overflow.

``--assert-volumes`` checks the O(alpha * N / tile_shards) contract of
SURVEY.md section 5.7: per-device exchange and sort volumes must SHRINK
with the tile axis and never scale with the full N — the property that
makes the design capacity-sublinear (the reference's CPU sorter is O(N)
per frame on one core, /root/reference/src/worker/sorter.cpp).

Usage (virtual mesh):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m gaussiansplats3d_tpu.tools.scaling_bench 200000 \
        --meshes 1x1,2x2,4x2 --assert-volumes
On real hardware the same command (without the env forcing) uses the real
chips and the efficiency column is the BASELINE metric.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# This machine pins jax_platforms at import; the env var alone is ignored
# (tests/conftest.py has the same workaround) — honor it explicitly so the
# virtual-mesh invocation never touches the real TPU.
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf[(0,) * getattr(leaf, "ndim", 0)]))


def run_shape(splats, cfg, splat_shards, tile_shards, iters,
              route="gather", slab_mode="banded"):
    import optax

    from ..parallel.mesh import make_mesh
    from ..parallel.sharded import (
        default_exchange_capacity, device_put_sharded_splats,
        sharded_render_tiles)
    from ..parallel.train import (
        TrainState, image_to_tile_blocks, make_train_step)
    from ..render.binning import slot_layout_for

    n = splats.num_splats
    d = splat_shards * tile_shards
    mesh = make_mesh(jax.devices()[:d], splat_shards=splat_shards,
                     tile_shards=tile_shards)
    sharded = device_put_sharded_splats(splats, mesh, route=route)
    camera = _camera(cfg)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    target_tiles, tile_mask = image_to_tile_blocks(target, cfg)

    opt = optax.adam(1e-3)
    state = TrainState.create(sharded, opt)
    step = make_train_step(cfg, mesh, opt, route=route,
                           slab_mode=slab_mode)
    state, metrics = step(state, camera, target_tiles, tile_mask)
    jax.block_until_ready(metrics["loss"])
    _sync(metrics["loss"][None])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, camera, target_tiles, tile_mask)
    jax.block_until_ready(metrics["loss"])
    _sync(metrics["loss"][None])
    ms = (time.perf_counter() - t0) / iters * 1000.0

    # per-device work volumes (the pipeline's own sizing functions)
    n_local = -(-n // (d if route == "a2a" else splat_shards))
    ecap = default_exchange_capacity(cfg, n_local, tile_shards)
    _, stats = sharded_render_tiles(
        mesh, sharded, camera, cfg, return_stats=True, route=route,
        slab_mode=slab_mode)
    gathered = int(stats["gathered_records"])
    lanes, aux, pad = slot_layout_for(cfg, gathered)
    sort_slots = lanes * gathered + aux + pad
    slab_pairs = np.asarray(stats["slab_pairs"]).tolist()
    return {
        "mesh": f"{splat_shards}x{tile_shards}",
        "route": route,
        "slab_mode": slab_mode,
        "devices": d,
        "ms_per_step": round(ms, 1),
        "msplats_per_s": round(n / ms / 1e3, 2),
        "exchange_records_per_device": int(ecap),
        # ONE stacked int32 all_gather of exchange_wire_ops rows (the
        # record_precision pack plan) — not one collective per field
        "exchange_wire_ops": int(stats["exchange_wire_ops"]),
        "exchange_mb_per_device": round(
            stats["exchange_fwd_mb_per_device"], 2),
        "exchange_bwd_mb_per_device": round(
            stats["exchange_bwd_mb_per_device"], 2),
        "gathered_records_per_device": int(gathered),
        "sort_slots_per_device": int(sort_slots),
        "slab_pairs": slab_pairs,
        "overflow": int(np.asarray(stats["overflow"])),
    }


def predict_efficiency(results, n, t_proj_1, t_rest_1, gbps):
    """Analytic multi-host efficiency prediction (BASELINE metric 3 made
    falsifiable before pod hardware exists).

    Model, per (splat_shards s, tile_shards t) mesh of D = s*t devices:

        T_pred = t_proj_1 / s                      # splat-parallel stages
               + t_rest_1 / t                      # slab sort + composite
               + T_comm                            # collectives at `gbps`

        T_comm = (s-1)/s * (fwd_mb + bwd_mb) / gbps    # routed exchange:
                 # all_gather receives (s-1)/s of the stacked wire bytes;
                 # its transpose psum_scatter moves the same again
               + (t-1)/t * (12 * 4 * n/s / 1e6) / gbps # parameter-grad
                 # psum over the tile axis (12 f32 fields per local splat)

    t_proj_1 / t_rest_1 are the measured single-chip stage times (ms) for
    THIS scene (from the device trace; see PROFILE_r05.md) — the same
    numbers the roofline uses.  ``gbps`` is the effective per-device
    collective bandwidth (1 GB/s == 1 MB/ms): ~80-90 for v5p ICI within a
    slice, ~6 for 50 Gbit DCN across hosts.  Efficiency is throughput per
    device vs the single-chip baseline:

        eff(s, t) = (t_proj_1 + t_rest_1) / (D * T_pred)
    """
    t1 = t_proj_1 + t_rest_1
    for r in results:
        s, t = (int(x) for x in r["mesh"].split("x"))
        d = s * t
        a2a = r.get("route") == "a2a"
        out = {}
        for name, bw in gbps.items():
            wire = (r["exchange_mb_per_device"]
                    + r["exchange_bwd_mb_per_device"])
            if a2a:
                # projection fully sharded: no replicated-input psum;
                # the extra all_to_all hop moves ~1/s of the wire twice
                comm = ((s - 1) / s * wire + 2 * (t - 1) / t * wire / s) \
                    / bw
                t_pred = t_proj_1 / d + t_rest_1 / t + comm
            else:
                # projection replicated over the tile axis: pay the
                # parameter-grad psum for the N/s local splats
                comm = ((s - 1) / s * wire / bw
                        + (t - 1) / t * (12 * 4 * (n / s) / 1e6) / bw)
                t_pred = t_proj_1 / s + t_rest_1 / t + comm
            out[f"predicted_ms_{name}"] = round(t_pred, 2)
            out[f"predicted_eff_{name}"] = round(t1 / (d * t_pred), 3)
        r.update(out)
    return results


def _print_shape(r):
    print(f"  {r['mesh']:>5s}/{r['route']:<6s} {r['ms_per_step']:8.1f} "
          f"ms/step  {r['msplats_per_s']:8.2f} Msplats/s  "
          f"exch/dev {r['exchange_records_per_device']:>8d} rec "
          f"({r['exchange_mb_per_device']:.1f} MB)  "
          f"sort slots/dev {r['sort_slots_per_device']:>9d}  "
          f"overflow {r['overflow']}", flush=True)


def _camera(cfg):
    import gaussiansplats3d_tpu as gs
    return gs.Camera.look_at((4.5, 2.5, 4.5), (0.0, 0.0, 0.0),
                             fov_y_deg=60.0,
                             aspect=cfg.width / cfg.height)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=float, default=200_000)
    ap.add_argument("--meshes", default="1x1,2x1,2x2,4x2",
                    help="comma-separated SPLATxTILE shapes")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--sh", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--assert-volumes", action="store_true")
    ap.add_argument("--chip-ms-proj", type=float, default=None,
                    help="measured single-chip projection fwd+bwd ms for "
                         "this scene (enables predicted-efficiency columns)")
    ap.add_argument("--chip-ms-rest", type=float, default=None,
                    help="measured single-chip sort+composite+assemble "
                         "fwd+bwd ms for this scene")
    ap.add_argument("--gbps", default="ici:80,dcn:6.25",
                    help="effective per-device collective bandwidths "
                         "(GB/s) to predict at, name:value pairs")
    ap.add_argument("--route", default="gather",
                    choices=["gather", "a2a", "both"])
    ap.add_argument("--slab-mode", default="banded",
                    choices=["banded", "interleaved"])
    args = ap.parse_args()
    n = int(args.n)

    import gaussiansplats3d_tpu as gs

    shapes = []
    for tok in args.meshes.split(","):
        s, t = tok.strip().split("x")
        shapes.append((int(s), int(t)))
    avail = len(jax.devices())
    shapes = [st for st in shapes if st[0] * st[1] <= avail]

    cfg = gs.RenderConfig(width=args.width, height=args.height,
                          sh_degree=args.sh, tile_size=args.tile,
                          sort_bits=16)
    splats = gs.random_splats(jax.random.PRNGKey(0), n, sh_degree=args.sh,
                              extent=2.0)
    splats = dataclasses.replace(splats, scales=splats.scales * 0.15)

    platform = jax.devices()[0].platform
    print(f"N={n} {args.width}x{args.height} SH{args.sh} tile={args.tile} "
          f"platform={platform} devices={avail}", flush=True)
    if platform == "cpu":
        print("(virtual CPU mesh: wall-clock columns are NOT a scaling "
              "measurement; work-volume columns are)", flush=True)

    routes = (["gather", "a2a"] if args.route == "both"
              else [args.route])
    results = []
    for s, t in shapes:
        for route in routes:
            if route == "a2a" and t == 1 and len(routes) > 1:
                continue    # t=1 a2a == gather; skip only when gather runs
            r = run_shape(splats, cfg, s, t, args.iters, route=route,
                          slab_mode=args.slab_mode)
            results.append(r)
            _print_shape(r)

    base = results[0]
    for r in results:
        speedup = r["msplats_per_s"] / max(base["msplats_per_s"], 1e-9)
        r["efficiency_vs_base"] = round(
            speedup * base["devices"] / r["devices"], 3)
    model = None
    if args.chip_ms_proj is not None and args.chip_ms_rest is not None:
        gbps = {tok.split(":")[0]: float(tok.split(":")[1])
                for tok in args.gbps.split(",")}
        results = predict_efficiency(results, n, args.chip_ms_proj,
                                     args.chip_ms_rest, gbps)
        model = {"chip_ms_proj": args.chip_ms_proj,
                 "chip_ms_rest": args.chip_ms_rest, "gbps": gbps,
                 "formula": "see scaling_bench.predict_efficiency"}
        for r in results:
            pred = {k: v for k, v in r.items()
                    if k.startswith("predicted_")}
            print(f"  {r['mesh']:>5s}  {pred}", flush=True)
    print(json.dumps({"metric": "scaling_bench", "n": n,
                      "platform": platform, "model": model,
                      "results": results}), flush=True)

    if args.assert_volumes:
        # O(alpha * N / tile_shards) contract: per-device exchange/sort
        # volumes shrink with the tile axis and never track full N.
        by_tiles = {}
        for r in results:
            if r["route"] != "gather":
                continue        # a2a volumes are strictly smaller
            t = int(r["mesh"].split("x")[1])
            by_tiles.setdefault(t, []).append(r)
        for t, rs in by_tiles.items():
            for r in rs:
                assert r["gathered_records_per_device"] <= (
                    3.0 * n / t + 128 * (r["devices"] + 1)), r
        ts_sorted = sorted(by_tiles)
        for a, b in zip(ts_sorted, ts_sorted[1:]):
            ga = by_tiles[a][0]["gathered_records_per_device"]
            gb = by_tiles[b][0]["gathered_records_per_device"]
            ratio = ga / max(gb, 1)
            assert ratio > 0.8 * (b / a), (
                f"gathered records should shrink ~{b/a}x from tile_shards="
                f"{a} to {b}; got {ga} -> {gb}")
        # overflow-free at these shapes: drops would fake a speedup
        for r in results:
            assert r["overflow"] == 0, r
        print("volume asserts OK", flush=True)


if __name__ == "__main__":
    main()
