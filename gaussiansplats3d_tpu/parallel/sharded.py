"""The sharded render pipeline: shard_map over a (splat, tile) mesh.

Decomposition (SURVEY.md §5.7/§5.8, BASELINE.md config 4):

- **splat axis**: each device projects + SH-shades its contiguous shard of
  splats (embarrassingly parallel, the N-dominant compute).  Global depth
  bounds for the sort keys are a pmin/pmax over this axis — the multi-chip
  analogue of the WASM sorter's global min/max pass
  (/root/reference/src/worker/sorter.cpp:33-139).
- **exchange (splat -> tile-slab routing)**: each device keeps only the
  projected records whose screen AABB touches ITS tile slab (each device
  owns a fixed band of whole tile rows, so the filter is a per-splat
  elementwise test on the y-extent), compacts the survivors into a fixed
  per-edge capacity, and `all_gather`s the *compacted* buffers over the
  splat axis (rides ICI).  Per-device exchange volume and memory are
  O(splat_shards * capacity) = O(alpha * N / tile_shards) — sublinear in N
  for a growing mesh — instead of the O(N) full-world gather.  Records
  beyond capacity are dropped and counted in ``overflow`` (the same
  fixed-capacity + overflow contract as the single-chip pair list).
  The compaction is a stable sort whose operands carry the record fields,
  so its autodiff transpose is exact; the all_gather transposes to a
  psum_scatter, which distributes the parameter-gradient all-reduce
  across the backward sweep.
- **tile axis**: each device bins, sorts and composites only the gathered
  slab-local records through the fused expand+sort path
  (`binning.bin_sort_records`), so the per-device sort is over
  ~pairs/tile_shards keys and sort work scales out too.

The output is the global tile-block array, tile-sharded over the mesh; the
final image assembly (crop + y-flip) happens in the surrounding jit where
XLA inserts the (tiny) boundary exchanges.

Multi-scene dynamic mode (per-scene transforms / opacities / visibility —
the reference's dynamicScene path, SplatMaterial.js:140-147) shards
``scene_indices`` with the splats and replicates the tiny per-scene arrays.

2DGS surfel mode (``cfg.render_mode_2d``, SplatMaterial2D parity) runs the
same decomposition with the surfel projection/records/compositor swapped
in: the routed exchange carries the 3x3 homography rows instead of the
conic, and the slab composite is the ray-plane fragment kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import Camera, RenderConfig, SplatData
from ..render.binning import bin_sort_records
from ..render.pipeline import assemble_image, composite_sorted
from ..render.projection import ProjectedSplats, project_splats
from .mesh import SPLAT_AXIS, TILE_AXIS

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _tile_rows_per_shard(cfg: RenderConfig, tile_shards: int) -> int:
    if cfg.tiles_y % tile_shards != 0:
        raise ValueError(
            f"tiles_y ({cfg.tiles_y}) must divide evenly across "
            f"{tile_shards} tile shards; pad the viewport height to a "
            f"multiple of {cfg.tile_size * tile_shards}")
    return cfg.tiles_y // tile_shards


def default_exchange_capacity(cfg: RenderConfig, n_local: int,
                              tile_shards: int, alpha: float = 3.0) -> int:
    """Per-(splat-shard, slab) record capacity for the routed exchange.

    A splat shard holds ~n_local/tile_shards of the records touching any
    one slab in a balanced scene; ``alpha`` is the imbalance margin
    (slab-straddling splats are counted once per touched slab).
    """
    cap = max(256, int(alpha * n_local / max(tile_shards, 1)))
    return -(-cap // 128) * 128


def interleave_tile_order(x: jnp.ndarray, t_shards: int, tiles_x: int
                          ) -> jnp.ndarray:
    """Global row-major tile blocks -> interleaved-slab order (slab j owns
    rows {j, j+t, ...}; order (j, r, tx)).  Applied to replicated targets
    so the loss can compare against slab-sharded chans elementwise."""
    rows = x.shape[0] // tiles_x
    rows_per = rows // t_shards
    y = x.reshape((rows_per, t_shards, tiles_x) + x.shape[1:])
    return y.swapaxes(0, 1).reshape(x.shape)


def deinterleave_tile_order(x: jnp.ndarray, t_shards: int, tiles_x: int
                            ) -> jnp.ndarray:
    """Inverse of :func:`interleave_tile_order` (chans -> global order)."""
    rows = x.shape[0] // tiles_x
    rows_per = rows // t_shards
    y = x.reshape((t_shards, rows_per, tiles_x) + x.shape[1:])
    return y.swapaxes(0, 1).reshape(x.shape)


def exchange_plan(cfg: RenderConfig, surfel: bool):
    """(field order, n_diff, pack plan, exact-cotangent rows) for the
    routed exchange, mirroring binning's record_precision plans.

    Field order (3DGS): [x, y, ca, cb, cc, cr, cg, cb2, op, depth, rx, ry]
    — the differentiable prefix is 9 fields (10 with cfg.return_depth:
    depth sits right after it), radii are stop-gradient plumbing.
    Surfel: [t0..t8, x, y, cr, cg, cb2, op, depth, rx, ry] (15/16 diff).

    The pack plan maps logical fields onto physical int32 wire operands
    (binning._pack_fields codecs): 'f32' rides everything exact (11 ops;
    the u16r radius pair is lossless — projection already quantized
    support radii to 1/16 px), 'mixed' packs color/opacity as f16 pairs
    (9 ops), 'packed' is the serving codec set (5 ops vs the 13 separate
    f32 operands the unpacked exchange shipped).  Binning applies the
    identical (idempotent) codecs after the exchange, so the sharded
    render still matches the single-chip one bit-for-bit per precision
    mode.  ``exact_rows``: cotangent rows that ride the backward wire in
    f32 (the mean2d densification signal — same policy as binning's
    alignment sort); every other cotangent row rides bf16.
    """
    if surfel:
        n_diff = 16 if cfg.return_depth else 15
        plan = tuple(("raw", i) for i in range(16)) + (("u16r", 16, 17),)
        return n_diff, plan, (9, 10)
    n_diff = 10 if cfg.return_depth else 9
    if cfg.record_precision == "f32":
        plan = tuple(("raw", i) for i in range(10)) + (("u16r", 10, 11),)
    elif cfg.record_precision == "mixed":
        plan = (("raw", 0), ("raw", 1), ("raw", 2), ("raw", 3), ("raw", 4),
                ("f16", 5, 6), ("f16", 7, 8), ("raw", 9), ("u16r", 10, 11))
    else:   # "packed"
        from ..render.binning import _px_scale_for
        plan = (("px", 0, 1, _px_scale_for(cfg)), ("f16", 2, 3),
                ("f16u8u8", 4, 10, 11), ("rgba8", 5, 6, 7, 8), ("raw", 9))
    return n_diff, plan, (0, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _routed_exchange(plan, ecap: int, n_diff: int, exact_rows,
                     keep, *fields):
    """Compact ``keep`` rows to ``ecap`` slots and all_gather them over the
    splat axis as ONE stacked int32 operand.

    Forward: pack fields per ``plan`` (straight-through quantization, the
    same codecs binning applies post-exchange), stable-compact (kept rows
    first, original order — one (key, iota) 2-key unstable sort), stack
    the physical operands [F, ecap] and issue a single tiled all_gather
    (rides ICI as one collective instead of one per field; 'packed' mode
    ships ~2.6x fewer bytes).  The valid mask is rebuilt elementwise from
    the gathered per-shard keep counts — no mask operand on the wire.

    Backward: the all_gather transposes to psum_scatter — cotangents ride
    TWO stacked collectives (f32 for ``exact_rows``, bf16 for the rest —
    same exact-mean2d policy as binning's alignment sort), then return to
    their source rows via unique sorted scatter-sets (bf16 pairs packed
    two-per-int32 to halve the scatter count).

    Returns (*gathered_logical_fields, gvalid, dropped).
    Supersedes the reference's zero-copy SharedArrayBuffer handoff
    (/root/reference/src/worker/SortWorker.js:180-196) at multi-chip
    scale.
    """
    out, _ = _routed_exchange_fwd(plan, ecap, n_diff, exact_rows,
                                  keep, *fields)
    return out


def _routed_exchange_fwd(plan, ecap, n_diff, exact_rows, keep, *fields):
    from ..render.binning import _pack_fields, _unpack_fields
    n = keep.shape[0]
    pack_plan, phys = _pack_fields(plan, list(fields))
    key = (~keep).astype(jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)
    # (key, iota) unique 2-key unstable == stable compaction (iota order
    # IS input order) minus the hidden tiebreaker pass.
    sorted_ops = jax.lax.sort((key, iota) + tuple(phys), dimension=0,
                              num_keys=2, is_stable=False)
    n_keep = jnp.sum(keep.astype(jnp.int32))

    def to_cap(op):
        return (jnp.pad(op, (0, ecap - n)) if ecap > n else op[:ecap])

    src = to_cap(sorted_ops[1])                       # [ecap] source rows
    ops_c = jnp.stack([to_cap(op) for op in sorted_ops[2:]])  # [F, ecap]
    gathered = jax.lax.all_gather(ops_c, SPLAT_AXIS, axis=1, tiled=True)
    nk_g = jax.lax.all_gather(n_keep[None], SPLAT_AXIS, axis=0, tiled=True)
    shards = nk_g.shape[0]
    gvalid = (jax.lax.broadcasted_iota(jnp.int32, (shards, ecap), 1)
              < nk_g[:, None]).reshape(-1)
    gfields = _unpack_fields(pack_plan, list(fields),
                             [gathered[i] for i in range(len(phys))])
    dropped = jnp.maximum(n_keep - ecap, 0)
    out = tuple(gfields) + (gvalid, dropped)
    return out, (src, n_keep, _SrcN(n))


class _SrcN(int):
    """Static int residual (survives custom_vjp as aux data)."""


jax.tree_util.register_pytree_node(
    _SrcN, lambda x: ((), int(x)), lambda aux, _: _SrcN(aux))


def _ct_wire_split(g, n_diff, exact_rows):
    """(exact idx list, rest idx list, f32 stack, bf16 stack) for the
    backward wire: f32 for ``exact_rows`` (the mean2d densification
    signal), bf16 (f32 exponent range — no gradient magnitude flushes)
    for the rest."""
    exact = [i for i in exact_rows if i < n_diff]
    rest = [i for i in range(n_diff) if i not in exact]
    ct_f32 = jnp.stack([g[i] for i in exact])
    ct_bf16 = jnp.stack([g[i].astype(jnp.bfloat16) for i in rest])
    return exact, rest, ct_f32, ct_bf16


def _ct_scatter_block(d, dst, my_f32, my_bf16, exact, rest, n):
    """Scatter one block of wire cotangents back to its source rows,
    ACCUMULATING into the per-field list ``d`` (None == zero so the
    single-block gather route pays no extra adds).  ``dst`` must be
    ascending with invalid slots mapped to ``n`` (drop); bf16 rows ride
    PAIRS packed two-per-int32 (exact — the values are already bf16) so
    two fields cost one scatter."""
    def acc(i, val):
        d[i] = val if d[i] is None else d[i] + val

    def scatter_f32(row):
        return jnp.zeros((n,), jnp.float32).at[dst].set(
            row, mode="drop", unique_indices=True, indices_are_sorted=True)

    for k, i in enumerate(exact):
        acc(i, scatter_f32(my_f32[k]))
    for k in range(0, len(rest) - 1, 2):
        u = (jax.lax.bitcast_convert_type(
                my_bf16[k], jnp.uint16).astype(jnp.uint32) << 16) | \
            jax.lax.bitcast_convert_type(
                my_bf16[k + 1], jnp.uint16).astype(jnp.uint32)
        full = jnp.zeros((n,), jnp.int32).at[dst].set(
            u.astype(jnp.int32), mode="drop", unique_indices=True,
            indices_are_sorted=True)
        fu = full.astype(jnp.uint32)
        acc(rest[k], jax.lax.bitcast_convert_type(
            (fu >> 16).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32))
        acc(rest[k + 1], jax.lax.bitcast_convert_type(
            (fu & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32))
    if len(rest) % 2:
        acc(rest[-1], scatter_f32(my_bf16[-1].astype(jnp.float32)))


def _routed_exchange_bwd(plan, ecap, n_diff, exact_rows, residuals, cots):
    src, n_keep, n = residuals
    n = int(n)
    nf = len(cots) - 2                    # trailing gvalid, dropped
    g = list(cots[:n_diff])               # cotangents of gathered fields
    exact, rest, ct_f32, ct_bf16 = _ct_wire_split(g, n_diff, exact_rows)
    # psum_scatter sums each device's contribution back onto the owning
    # shard's [ecap] block.
    my_f32 = jax.lax.psum_scatter(ct_f32, SPLAT_AXIS,
                                  scatter_dimension=1, tiled=True)
    my_bf16 = jax.lax.psum_scatter(ct_bf16, SPLAT_AXIS,
                                   scatter_dimension=1, tiled=True)
    # Invalid slots (beyond this shard's keep count) scatter nowhere.
    slot_ok = jnp.arange(ecap, dtype=jnp.int32) < n_keep
    dst = jnp.where(slot_ok, src, n)      # ascending + unique -> fast path

    d = [None] * nf
    _ct_scatter_block(d, dst, my_f32, my_bf16, exact, rest, n)
    return (None, *d)


_routed_exchange.defvjp(_routed_exchange_fwd, _routed_exchange_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _routed_exchange_a2a(plan, ecap: int, n_diff: int, exact_rows,
                         t_shards: int, touch_all, *fields):
    """all_to_all routed exchange: splats sharded over the FULL mesh.

    The all_gather exchange (:func:`_routed_exchange`) replicates
    projection across the tile axis (every tile shard projects the same
    N/splat_shards splats), capping balanced-mesh scaling efficiency near
    50% (see scaling_bench.predict_efficiency).  Here each device
    projects only N/(s*t) splats; records route to their tile-slab
    owners in two hops that both ride ICI:

      1. per-slab compaction: for each of the t slabs, compact the local
         records touching it into a fixed [ecap] block (t small static
         (key, iota) 2-key sorts over N/D rows — the same total row count
         as the gather path's single compaction over N/s);
      2. all_to_all over the TILE axis swaps blocks so device (i, j)
         holds the slab-j blocks built by every (i, j');
      3. all_gather over the SPLAT axis pools the s splat-rows.

    Per-device receive volume is unchanged (~alpha*N/t of packed wire
    rows); what changes is COMPUTE: projection work drops t-fold.  The
    backward retraces each hop with its transpose (psum_scatter,
    all_to_all, per-slab unique scatter-sets summed over slabs — a
    record straddling slabs accumulates cotangents from each).

    ``touch_all``: [t, n] bool — per slab, which local records touch it.
    Returns (*gathered_fields, gvalid, dropped), gathered length
    s * t * ecap.
    """
    out, _ = _routed_exchange_a2a_fwd(plan, ecap, n_diff, exact_rows,
                                      t_shards, touch_all, *fields)
    return out


def _routed_exchange_a2a_fwd(plan, ecap, n_diff, exact_rows, t_shards,
                             touch_all, *fields):
    from ..render.binning import _pack_fields, _unpack_fields
    n = touch_all.shape[1]
    pack_plan, phys = _pack_fields(plan, list(fields))
    iota = jnp.arange(n, dtype=jnp.int32)

    def to_cap(op):
        return (jnp.pad(op, (0, ecap - n)) if ecap > n else op[:ecap])

    blocks, srcs, n_keeps = [], [], []
    for j in range(t_shards):
        keep = touch_all[j]
        key = (~keep).astype(jnp.int32)
        sorted_ops = jax.lax.sort((key, iota) + tuple(phys), dimension=0,
                                  num_keys=2, is_stable=False)
        srcs.append(to_cap(sorted_ops[1]))
        blocks.append(jnp.stack([to_cap(op) for op in sorted_ops[2:]]))
        n_keeps.append(jnp.sum(keep.astype(jnp.int32)))
    ops_a = jnp.stack(blocks)                       # [t, F, ecap]
    nk = jnp.stack(n_keeps)                         # [t]

    recv = jax.lax.all_to_all(ops_a, TILE_AXIS, split_axis=0,
                              concat_axis=0)        # [t, F, ecap]
    nk_r = jax.lax.all_to_all(nk, TILE_AXIS, split_axis=0, concat_axis=0)
    g = jax.lax.all_gather(recv, SPLAT_AXIS, axis=0,
                           tiled=True)              # [s*t, F, ecap]
    nk_g = jax.lax.all_gather(nk_r, SPLAT_AXIS, axis=0, tiled=True)
    st = g.shape[0]
    flat = jnp.moveaxis(g, 1, 0).reshape(len(phys), st * ecap)
    gvalid = (jax.lax.broadcasted_iota(jnp.int32, (st, ecap), 1)
              < nk_g[:, None]).reshape(-1)
    gfields = _unpack_fields(pack_plan, list(fields),
                             [flat[i] for i in range(len(phys))])
    dropped = jnp.sum(jnp.maximum(nk - ecap, 0))
    out = tuple(gfields) + (gvalid, dropped)
    return out, (jnp.stack(srcs), nk, _SrcN(n))


def _routed_exchange_a2a_bwd(plan, ecap, n_diff, exact_rows, t_shards,
                             residuals, cots):
    srcs, nk, n = residuals
    n = int(n)
    nf = len(cots) - 2
    g = list(cots[:n_diff])
    exact, rest, ct_f32, ct_bf16 = _ct_wire_split(g, n_diff, exact_rows)
    my_f32 = jax.lax.psum_scatter(ct_f32, SPLAT_AXIS,
                                  scatter_dimension=1, tiled=True)
    my_bf16 = jax.lax.psum_scatter(ct_bf16, SPLAT_AXIS,
                                   scatter_dimension=1, tiled=True)
    # my splat-row's slice is [·, t*ecap] in slab-source-major order;
    # all_to_all (its own transpose) returns each slab block to the
    # device that built it.
    my_f32 = jax.lax.all_to_all(
        my_f32.reshape(-1, t_shards, ecap), TILE_AXIS,
        split_axis=1, concat_axis=1)               # [E, t, ecap]
    my_bf16 = jax.lax.all_to_all(
        my_bf16.reshape(-1, t_shards, ecap), TILE_AXIS,
        split_axis=1, concat_axis=1)

    # Per-slab scatter-sets ACCUMULATE over slabs (a record straddling
    # slabs receives cotangents from each).
    d = [None] * nf
    iota_e = jnp.arange(ecap, dtype=jnp.int32)
    for j in range(t_shards):
        dst = jnp.where(iota_e < nk[j], srcs[j], n)
        _ct_scatter_block(d, dst, my_f32[:, j], my_bf16[:, j],
                          exact, rest, n)
    return (None, *d)


_routed_exchange_a2a.defvjp(_routed_exchange_a2a_fwd,
                            _routed_exchange_a2a_bwd)


def sharded_render_tiles(mesh: Mesh, splats: SplatData, camera: Camera,
                         cfg: RenderConfig,
                         capacity: Optional[int] = None,
                         transforms: Optional[jnp.ndarray] = None,
                         scene_indices: Optional[jnp.ndarray] = None,
                         scene_opacities: Optional[jnp.ndarray] = None,
                         scene_visibility: Optional[jnp.ndarray] = None,
                         exchange_capacity: Optional[int] = None,
                         return_overflow: bool = False,
                         return_stats: bool = False,
                         route: str = "gather",
                         slab_mode: str = "banded"):
    """Render to tile blocks over the mesh.

    ``slab_mode``: 'banded' (default) gives each tile shard a contiguous
    band of tile rows; 'interleaved' assigns rows round-robin (shard j
    owns rows {j, j+t, ...}), which collapses the per-shard pair-count
    imbalance a scene's dense screen region causes (measured ~2.2x at 8
    banded slabs — SCALING_r05).  With 'interleaved' the returned chans
    are in slab-major order — :func:`deinterleave_tile_order` restores
    global row order (``sharded_render`` does this; training compares
    against :func:`interleave_tile_order`-permuted targets instead).

    ``route``: 'gather' (default) shards splats over the splat axis only
    and all_gathers slab records within each tile row — projection is
    replicated across the tile axis.  'a2a' shards splats over the FULL
    mesh and routes records with an all_to_all hop first
    (:func:`_routed_exchange_a2a`) — projection work drops tile_shards-
    fold, the receive volume is unchanged; place splats with
    ``device_put_sharded_splats(..., route='a2a')``.

    Args:
      splats: global splat pytree; leading axis must divide by the splat-axis
        size (pad with opacity-0 splats, :func:`pad_splats_for_mesh`).
      capacity: kept for API compatibility; the fused expand+sort path
        derives its slot layout from the gathered record count, so this is
        ignored (pass ``exchange_capacity`` to size the routed exchange).
      transforms / scene_indices / scene_opacities / scene_visibility:
        multi-scene dynamic mode; ``scene_indices`` is per-splat (sharded
        with the splats), the rest are tiny per-scene arrays (replicated).

    Returns ``chans [T, NC+1, P]`` (record channels then composited
    alpha; see ``pipeline.composite_sorted``) — one global logical array
    sharded over the TILE axis (dim 0) — plus a replicated overflow
    scalar (exchange drops + pair-list drops) when ``return_overflow``.
    """
    del capacity  # superseded by the fused expand+sort slot layout
    if route not in ("gather", "a2a"):
        raise ValueError(f"route must be 'gather' or 'a2a', got {route!r}")
    if slab_mode not in ("banded", "interleaved"):
        raise ValueError(
            f"slab_mode must be 'banded' or 'interleaved', got {slab_mode!r}")
    tile_shards = mesh.shape[TILE_AXIS]
    splat_shards = mesh.shape[SPLAT_AXIS]
    rows = _tile_rows_per_shard(cfg, tile_shards)
    local_tiles = rows * cfg.tiles_x
    if route == "a2a":
        n_local = -(-splats.num_splats // (splat_shards * tile_shards))
    else:
        n_local = -(-splats.num_splats // splat_shards)
    if exchange_capacity is None:
        # Interleaved slabs raise per-slab routed demand for MULTI-ROW
        # splats (a rect spanning r rows touches min(r, t) round-robin
        # slabs vs ~ceil(r/rows_per)+1 banded ones), so the default
        # margin grows; drops stay counted in overflow either way.
        alpha = 4.0 if slab_mode == "interleaved" else 3.0
        exchange_capacity = default_exchange_capacity(
            cfg, n_local, tile_shards, alpha=alpha)
    ecap = exchange_capacity
    ts = float(cfg.tile_size)
    has_scenes = transforms is not None

    def body(splats_l, camera_r, scene_idx_l, scene_args):
        tfs, sc_op, sc_vis = scene_args
        if cfg.render_mode_2d:
            from ..render.surfel import project_surfels
            proj = project_surfels(splats_l, camera_r, cfg,
                                   tfs, scene_idx_l, sc_op, sc_vis)
        else:
            proj = project_splats(splats_l, camera_r, cfg,
                                  tfs, scene_idx_l, sc_op, sc_vis)

        # Depth bounds feed integer sort keys only — non-differentiable
        # plumbing (pmin/pmax have no AD rule, and shouldn't need one here).
        big = jnp.float32(3.0e38)
        depth_ng = jax.lax.stop_gradient(proj.depth)
        # 'a2a' shards splats over BOTH axes -> global bounds need both.
        d_axes = ((SPLAT_AXIS, TILE_AXIS) if route == "a2a"
                  else SPLAT_AXIS)
        dmin = jax.lax.pmin(
            jnp.min(jnp.where(proj.mask, depth_ng, big)), d_axes)
        dmax = jax.lax.pmax(
            jnp.max(jnp.where(proj.mask, depth_ng, -big)), d_axes)

        # --- splat -> tile-slab routing -------------------------------
        t_idx = jax.lax.axis_index(TILE_AXIS)
        ty_lo = t_idx * rows
        ty_hi = ty_lo + rows
        if cfg.render_mode_2d:
            y, ry = proj.mean2d[:, 1], proj.radius[:, 1]
        else:
            y, ry = proj.ys, proj.ry
        if cfg.record_precision == "packed" and not cfg.render_mode_2d:
            # Route with the SAME u8-log-decoded radius AND u16-quantized
            # position binning will use: the radius codec only inflates
            # (ceil) and the position codec truncates by up to 1/scale
            # px, so filtering on the raw values could silently skip a
            # splat whose decoded box crosses into this slab's first
            # tile row (the compositor's hard cutoff is the decoded box
            # — box contract; binning quantizes identically).
            from ..render.binning import (
                _px_quantize, _px_scale_for, _rad_decode_u8,
                _rad_encode_u8)
            ry = _rad_decode_u8(_rad_encode_u8(ry))
            y = _px_quantize(jax.lax.stop_gradient(y), _px_scale_for(cfg))
        ty0 = jnp.floor((y - ry) / ts).astype(jnp.int32)
        ty1 = jnp.floor((y + ry) / ts).astype(jnp.int32)
        if slab_mode == "interleaved":
            # slab j owns rows {j, j+t, ...}: touched iff the rect's
            # [ty0, ty1] contains any such row (non-empty strided local
            # range — the SAME arithmetic binning's rects use, via the
            # shared helper; binning clips harder, so over-inclusion
            # here is safe)
            from ..render.binning import strided_row_range

            def touch_rows(j):
                lo, hi = strided_row_range(ty0, ty1, j, tile_shards)
                return proj.mask & (hi >= lo) & (hi >= 0) & (lo < rows)
            touch = touch_rows(t_idx)
            if route == "a2a":
                touch_all = jnp.stack(
                    [touch_rows(j) for j in range(tile_shards)])
        else:
            touch = proj.mask & (ty1 >= ty_lo) & (ty0 < ty_hi)
            if route == "a2a":
                touch_all = jnp.stack([
                    proj.mask & (ty1 >= j * rows) & (ty0 < (j + 1) * rows)
                    for j in range(tile_shards)])

        # depth is normally gradient-free plumbing (sort key only), but with
        # cfg.return_depth it also feeds the depth CHANNEL, which must stay
        # differentiable end-to-end (the quantized key path kills gradients
        # on its own via the int cast either way).
        depth_f = (proj.depth if cfg.return_depth
                   else jax.lax.stop_gradient(proj.depth))
        if cfg.render_mode_2d:
            # surfel records: the 3x3 homography rows replace the conic
            fields = list(proj.t) + [
                proj.mean2d[:, 0], proj.mean2d[:, 1],
                proj.color[:, 0], proj.color[:, 1], proj.color[:, 2],
                proj.opacity, depth_f,
                jax.lax.stop_gradient(proj.radius[:, 0]),
                jax.lax.stop_gradient(proj.radius[:, 1])]
        else:
            fields = [proj.xs, proj.ys,
                      proj.conic_a, proj.conic_b, proj.conic_c,
                      proj.col_r, proj.col_g, proj.col_b,
                      proj.opacity, depth_f,
                      jax.lax.stop_gradient(proj.rx),
                      jax.lax.stop_gradient(proj.ry)]
        n_diff, plan, exact_rows = exchange_plan(cfg, cfg.render_mode_2d)
        if route == "a2a":
            out_ex = _routed_exchange_a2a(plan, ecap, n_diff, exact_rows,
                                          tile_shards, touch_all, *fields)
        else:
            out_ex = _routed_exchange(plan, ecap, n_diff, exact_rows,
                                      touch, *fields)
        gathered, gmask, dropped = out_ex[:-2], out_ex[-2], out_ex[-1]
        if slab_mode == "interleaved":
            # local tile l -> global tile id (round-robin rows); binning
            # runs in local row units via row_window
            l = jnp.arange(local_tiles, dtype=jnp.int32)
            tile_arg = ((t_idx + (l // cfg.tiles_x) * tile_shards)
                        * cfg.tiles_x + l % cfg.tiles_x)
            bin_kwargs = dict(row_window=(t_idx, tile_shards, rows),
                              depth_bounds=(dmin, dmax))
        else:
            tile_arg = t_idx * local_tiles
            bin_kwargs = dict(
                tile_range=(t_idx * local_tiles, local_tiles),
                depth_bounds=(dmin, dmax))

        if cfg.render_mode_2d:
            from ..render.surfel import (
                SurfelProjection, bin_sort_surfels, composite_surfels_sorted)
            (gt0, gt1, gt2, gt3, gt4, gt5, gt6, gt7, gt8, gx, gy,
             gcr, gcg, gcb2, gop, gdepth, grx, gry) = gathered
            sp_g = SurfelProjection(
                t=(gt0, gt1, gt2, gt3, gt4, gt5, gt6, gt7, gt8),
                mean2d=jnp.stack([gx, gy], axis=1),
                radius=jnp.stack([grx, gry], axis=1),
                color=jnp.stack([gcr, gcg, gcb2], axis=1),
                opacity=jnp.where(gmask, gop, 0.0),
                depth=jnp.where(gmask, gdepth, big),
                mask=gmask)
            recs, starts, tcounts, _, pair_ovf = bin_sort_surfels(
                sp_g, cfg, **bin_kwargs)
            from ..render.pipeline import chans_from_colors_logt
            tile_colors, tile_logtrans = composite_surfels_sorted(
                cfg, recs, starts, tcounts, tile_arg, local_tiles)
            chans = chans_from_colors_logt(tile_colors, tile_logtrans)
        else:
            (gx, gy, gca, gcb, gcc, gcr, gcg, gcb2, gop, gdepth,
             grx, gry) = gathered
            proj_g = ProjectedSplats(
                xs=gx, ys=gy,
                conic_a=gca, conic_b=gcb, conic_c=gcc,
                col_r=gcr, col_g=gcg, col_b=gcb2,
                opacity=jnp.where(gmask, gop, 0.0),
                depth=jnp.where(gmask, gdepth, big),
                rx=grx, ry=gry,
                mask=gmask)

            # --- slab-local fused expand + sort + composite -----------
            pairs = bin_sort_records(proj_g, cfg, **bin_kwargs)
            chans = composite_sorted(cfg, pairs, tile_arg, local_tiles)
            pair_ovf = pairs.overflow
        # dropped (exchange) is per-(splat shard, slab) -> sum over BOTH
        # axes; pair_ovf is computed from the all_gathered records so it is
        # already identical across the splat axis — summing it over
        # SPLAT_AXIS too would over-report pair drops splat_shards-fold.
        overflow = jax.lax.psum(
            jax.lax.psum(dropped, SPLAT_AXIS) + pair_ovf, TILE_AXIS)
        # Per-slab pair demand (identical across the splat axis after the
        # all_gather): [tile_shards], replicated — the scaling harness's
        # per-device work-volume probe (tools/scaling_bench.py).
        if cfg.render_mode_2d:
            slab_pairs = jnp.zeros((), jnp.int32)  # surfel path: not probed
        else:
            slab_pairs = pairs.total_pairs - pairs.overflow
        slab_pairs = jax.lax.all_gather(slab_pairs[None], TILE_AXIS,
                                        axis=0, tiled=True)
        return chans, overflow, slab_pairs

    sp_axes = (SPLAT_AXIS, TILE_AXIS) if route == "a2a" else SPLAT_AXIS
    splat_spec = jax.tree.map(lambda _: P(sp_axes), splats)
    cam_spec = jax.tree.map(lambda _: P(), camera)
    if scene_indices is None:
        scene_indices = jnp.zeros((splats.num_splats,), jnp.int32)
    scene_args = (transforms if has_scenes else None,
                  scene_opacities, scene_visibility)
    scene_args_spec = jax.tree.map(lambda _: P(), scene_args)
    # chans is [T, NC+1, P]: the tile axis is dim 0
    out_spec = (P(TILE_AXIS), P(), P())
    fn = shard_map(body, mesh=mesh,
                   in_specs=(splat_spec, cam_spec, P(sp_axes),
                             scene_args_spec),
                   out_specs=out_spec, check_vma=False)
    chans, overflow, slab_pairs = fn(
        splats, camera, scene_indices, scene_args)
    if return_stats:
        n_diff_s, plan_s, exact_s = exchange_plan(cfg, cfg.render_mode_2d)
        nb_rest = len(
            [i for i in range(n_diff_s) if i not in exact_s])
        gathered_recs = (splat_shards * tile_shards * ecap
                         if route == "a2a" else splat_shards * ecap)
        stats = {"overflow": overflow, "slab_pairs": slab_pairs,
                 "exchange_capacity": ecap,
                 "gathered_records": gathered_recs,
                 # forward wire: ONE stacked int32 all_gather of
                 # len(plan) rows (route='a2a' adds an all_to_all hop of
                 # ~1/splat_shards of the same volume); backward: two
                 # psum_scatters (f32 exact rows + bf16 rest)
                 "exchange_wire_ops": len(plan_s),
                 "exchange_fwd_mb_per_device":
                     gathered_recs * 4 * len(plan_s) / 1e6,
                 "exchange_bwd_mb_per_device":
                     gathered_recs
                     * (4 * len(exact_s) + 2 * nb_rest) / 1e6}
        return chans, stats
    if return_overflow:
        return chans, overflow
    return chans


def sharded_render(mesh: Mesh, splats: SplatData, camera: Camera,
                   cfg: RenderConfig,
                   capacity: Optional[int] = None,
                   transforms: Optional[jnp.ndarray] = None,
                   scene_indices: Optional[jnp.ndarray] = None,
                   scene_opacities: Optional[jnp.ndarray] = None,
                   scene_visibility: Optional[jnp.ndarray] = None,
                   exchange_capacity: Optional[int] = None,
                   route: str = "gather",
                   slab_mode: str = "banded"):
    """Full sharded render returning the assembled image dict (with the
    exchange + pair-list ``overflow`` counter)."""
    chans, overflow = sharded_render_tiles(
        mesh, splats, camera, cfg, capacity,
        transforms=transforms, scene_indices=scene_indices,
        scene_opacities=scene_opacities, scene_visibility=scene_visibility,
        exchange_capacity=exchange_capacity, return_overflow=True,
        route=route, slab_mode=slab_mode)
    if slab_mode == "interleaved":
        chans = deinterleave_tile_order(
            chans, mesh.shape[TILE_AXIS], cfg.tiles_x)
    out = assemble_image(chans, cfg)
    out["overflow"] = overflow
    return out


def pad_splats_for_mesh(splats: SplatData, mesh: Mesh,
                        route: str = "gather") -> SplatData:
    """Pad the splat axis to a multiple of the splat-shard count (the
    full device count for route='a2a') with fully-transparent splats
    (opacity 0 => culled everywhere)."""
    ds = mesh.shape[SPLAT_AXIS]
    if route == "a2a":
        ds *= mesh.shape[TILE_AXIS]
    n = splats.num_splats
    pad = (-n) % ds
    if pad == 0:
        return splats
    import dataclasses

    def pad_leaf(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    padded = jax.tree.map(pad_leaf, splats)
    # padded colors are zero => opacity 0; quats zero-norm is guarded in
    # quat_to_rotmat; keep scales tiny to avoid inf covariances.
    return dataclasses.replace(
        padded,
        scales=padded.scales.at[n:].set(1e-6),
        quats=padded.quats.at[n:, 3].set(1.0))


def device_put_sharded_splats(splats: SplatData, mesh: Mesh,
                              route: str = "gather") -> SplatData:
    """Place splats on the mesh: sharded over the splat axis and
    replicated over the tile axis ('gather'), or sharded over the full
    mesh ('a2a')."""
    splats = pad_splats_for_mesh(splats, mesh, route)
    axes = (SPLAT_AXIS, TILE_AXIS) if route == "a2a" else SPLAT_AXIS
    sharding = NamedSharding(mesh, P(axes))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), splats)
