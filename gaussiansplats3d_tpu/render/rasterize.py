"""Tiled front-to-back compositor with a custom VJP (pure-JAX implementation).

This renders the per-tile depth-sorted pair lists produced by `binning` into
tile pixel blocks, and implements the backward pass by replaying chunks in
reverse — the same algorithm the Pallas kernels implement on-chip; this JAX
version is its readable reference and the CPU/interpret fallback.

Equivalent reference behavior: the per-fragment Gaussian falloff + NormalBlending
accumulation of /root/reference/src/splatmesh/SplatMaterial3D.js:234-252 over
the sorted instance order, expressed front-to-back with a running
transmittance.  The reference has no backward pass at all; the VJP here emits
pixel gradients w.r.t. 2D means, conics, colors and opacities, which the
projection step chains to means/scales/quats/opacities/SH.

Design notes (TPU-first):

- Splats are processed in chunks of `chunk_size`; the in-chunk prefix
  transmittance uses an exclusive cumulative sum of log(1 - alpha), and the
  per-pixel color update is a [G, P, C] x [G, C, 3] batched matmul (MXU).
- Transmittance is carried in LOG space throughout forward and backward.
  The backward pass reconstructs chunk-entry transmittance by *subtracting*
  the chunk's log(1 - alpha) sum — exact, no catastrophic division underflow
  when many near-opaque splats stack (the classic failure of the divide-by-
  (1-alpha) replay).
- Tiles are processed in groups of `group_size` sequentially (lax.scan), each
  group's chunk loop in lockstep (lax.while_loop), bounding peak memory to
  [G, C, P] temporaries.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..constants import ALPHA_CLAMP, GAUSSIAN_CUTOFF
from ..core.types import RenderConfig

# Log-transmittance floor: exp(-30) ~ 9e-14, far below any visible
# contribution; prevents -inf from alpha == ALPHA_CLAMP stacking.
_LOG_T_FLOOR = -80.0


def _tile_pixel_coords(tile_ids: jnp.ndarray, cfg: RenderConfig):
    """GL-oriented pixel-center coordinates for each tile. [G, P] each."""
    ts = cfg.tile_size
    tx = (tile_ids % cfg.tiles_x).astype(jnp.float32)
    ty = (tile_ids // cfg.tiles_x).astype(jnp.float32)
    p = jnp.arange(ts * ts, dtype=jnp.float32)
    ix = jnp.mod(p, ts)
    iy = jnp.floor(p / ts)
    px = tx[:, None] * ts + ix[None, :] + 0.5
    py = ty[:, None] * ts + iy[None, :] + 0.5
    return px, py


def _gather_chunk(records, starts, k, cfg, capacity):
    """Gather chunk k of each tile in the group. Returns (vals..., mask)."""
    c = cfg.chunk_size
    local = k * c + jnp.arange(c, dtype=jnp.int32)
    idx = jnp.clip(starts[:, None] + local[None, :], 0, capacity - 1)
    mean2d_s, conic_s, color_s, opacity_s, radius_s = records
    return (mean2d_s[idx], conic_s[idx], color_s[idx], opacity_s[idx],
            radius_s[idx], local)


def _chunk_alpha(m2, con, opa, rad, px, py, min_alpha):
    """Alpha evaluation for a [G, C] chunk over [G, P] pixels -> [G, C, P].

    Also returns (dx, dy, g) for the backward chain rule.
    """
    dx = px[:, None, :] - m2[..., 0:1]
    dy = py[:, None, :] - m2[..., 1:2]
    a, b, c = con[..., 0:1], con[..., 1:2], con[..., 2:3]
    g = a * dx * dx + 2.0 * b * dx * dy + c * dy * dy
    alpha = opa[..., None] * jnp.exp(-0.5 * g)
    outside = ((g > GAUSSIAN_CUTOFF) | (alpha < min_alpha)
               | (jnp.abs(dx) > rad[..., 0:1]) | (jnp.abs(dy) > rad[..., 1:2]))
    alpha = jnp.where(outside, 0.0, alpha)
    alpha = jnp.minimum(alpha, ALPHA_CLAMP)
    return alpha, dx, dy, g


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def rasterize_pairs(cfg: RenderConfig, capacity: int,
                    mean2d_s, conic_s, color_s, opacity_s, radius_s,
                    tile_starts, tile_counts, tile_base=0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite sorted pair records into tile blocks.

    Args:
      mean2d_s [cap, 2], conic_s [cap, 3], color_s [cap, K], opacity_s [cap],
      radius_s [cap, 2]:
        pair records in sorted order (invalid pairs must have opacity 0).
        radius_s is the hard support-box cutoff (no gradient flows through it).
      tile_starts / tile_counts: [num_tiles] ranges into the pair list.
      tile_base: global tile id of local tile 0 (the tile-sharded path passes
        its slab offset so pixel coordinates are screen-global).

    Returns (tile_colors [T, P, K], tile_logtrans [T, P]) with P = tile_size^2
    (K = color channel count: 3, or 4 when a depth channel rides along).
    """
    out, _ = _rasterize_fwd_impl(cfg, capacity, mean2d_s, conic_s, color_s,
                                 opacity_s, radius_s, tile_starts, tile_counts,
                                 tile_base)
    return out


# Tiles per sequential group; [G, C, P] f32 temporaries => 64*128*1024*4B = 32MB.
_GROUP_SIZE = 64


def tile_ids_from_base(t_total: int, tile_base) -> jnp.ndarray:
    """Global tile ids for a local tile range: ``tile_base`` is either the
    scalar global id of local tile 0 (contiguous banded slabs) or a [t]
    array of per-tile global ids (the interleaved round-robin slabs);
    padded entries reuse id 0 (their counts are 0)."""
    base = jnp.asarray(tile_base)
    if base.ndim == 1:
        ids = base.astype(jnp.int32)
        pad = t_total - ids.shape[0]
        return jnp.pad(ids, (0, pad)) if pad else ids
    return jnp.arange(t_total, dtype=jnp.int32) + base.astype(jnp.int32)


def _pad_tiles(cfg, tile_starts, tile_counts, tile_base):
    t = tile_starts.shape[0]
    g = _GROUP_SIZE
    pad = (-t) % g
    if pad:
        tile_starts = jnp.pad(tile_starts, (0, pad))
        tile_counts = jnp.pad(tile_counts, (0, pad))
    tile_ids = tile_ids_from_base(t + pad, tile_base)
    return tile_starts, tile_counts, tile_ids, t


def _rasterize_fwd_impl(cfg, capacity, mean2d_s, conic_s, color_s, opacity_s,
                        radius_s, tile_starts, tile_counts, tile_base):
    records = (mean2d_s, conic_s, color_s, opacity_s, radius_s)
    starts_p, counts_p, tile_ids, t = _pad_tiles(cfg, tile_starts, tile_counts,
                                                 tile_base)
    c = cfg.chunk_size
    p = cfg.tile_size * cfg.tile_size
    g = _GROUP_SIZE
    kc = color_s.shape[1]

    def render_group(_, group):
        starts, counts, ids = group
        px, py = _tile_pixel_coords(ids, cfg)

        def cond(state):
            k, _, _ = state
            return jnp.any(k * c < counts)

        def body(state):
            k, col, logt = state
            m2, con, cl, op, rad, local = _gather_chunk(records, starts, k,
                                                        cfg, capacity)
            op = op * (local[None, :] < counts[:, None])
            alpha, _, _, _ = _chunk_alpha(m2, con, op, rad, px, py,
                                          cfg.min_alpha)
            logw = jnp.log1p(-alpha)                       # [G, C, P]
            excl = jnp.cumsum(logw, axis=1) - logw
            w = alpha * jnp.exp(excl + logt[:, None, :])
            col = col + jnp.einsum("gcp,gck->gpk", w, cl,
                                   preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
            logt = jnp.maximum(logt + jnp.sum(logw, axis=1), _LOG_T_FLOOR)
            return k + 1, col, logt

        init = (jnp.int32(0), jnp.zeros((g, p, kc), jnp.float32),
                jnp.zeros((g, p), jnp.float32))
        _, col, logt = jax.lax.while_loop(cond, body, init)
        return None, (col, logt)

    groups = (starts_p.reshape(-1, g), counts_p.reshape(-1, g),
              tile_ids.reshape(-1, g))
    _, (cols, logts) = jax.lax.scan(render_group, None, groups)
    tile_colors = cols.reshape(-1, p, kc)[:t]
    tile_logtrans = logts.reshape(-1, p)[:t]
    residuals = (mean2d_s, conic_s, color_s, opacity_s, radius_s,
                 tile_starts, tile_counts, tile_base, tile_logtrans)
    return (tile_colors, tile_logtrans), residuals


def _rasterize_fwd(cfg, capacity, mean2d_s, conic_s, color_s, opacity_s,
                   radius_s, tile_starts, tile_counts, tile_base):
    return _rasterize_fwd_impl(cfg, capacity, mean2d_s, conic_s, color_s,
                               opacity_s, radius_s, tile_starts, tile_counts,
                               tile_base)


def _rasterize_bwd(cfg, capacity, residuals, cotangents):
    (mean2d_s, conic_s, color_s, opacity_s, radius_s, tile_starts,
     tile_counts, tile_base, tile_logtrans) = residuals
    g_col, g_logt = cotangents
    records = (mean2d_s, conic_s, color_s, opacity_s, radius_s)
    starts_p, counts_p, tile_ids, t = _pad_tiles(cfg, tile_starts, tile_counts,
                                                 tile_base)
    c = cfg.chunk_size
    p = cfg.tile_size * cfg.tile_size
    g = _GROUP_SIZE
    ngroups = starts_p.shape[0] // g

    pad_t = starts_p.shape[0] - t
    kc = color_s.shape[1]
    g_col_p = jnp.pad(g_col, ((0, pad_t), (0, 0), (0, 0)))
    g_logt_p = jnp.pad(g_logt, ((0, pad_t), (0, 0)))
    logt_final_p = jnp.pad(tile_logtrans, ((0, pad_t), (0, 0)))

    grad_mean2d = jnp.zeros_like(mean2d_s)
    grad_conic = jnp.zeros_like(conic_s)
    grad_color = jnp.zeros_like(color_s)
    grad_opacity = jnp.zeros_like(opacity_s)

    def bwd_group(carry, group):
        gm, gc, gcl, gop = carry
        starts, counts, ids, gcol_tile, glogt_tile, logt_fin = group
        px, py = _tile_pixel_coords(ids, cfg)
        kmax = jnp.max(jnp.ceil(counts / c)).astype(jnp.int32)
        t_fin = jnp.exp(logt_fin)                         # [G, P]
        # d L / d T_final  from the log-trans cotangent: dL/dlogT = T * ...
        # We receive g wrt logT directly; convert once:
        # dlogT_final/dalpha_i = -1/(1-alpha_i)
        # dC/dalpha_i        = T_i c_i - S_i/(1-alpha_i)

        def cond(state):
            k = state[0]
            return k > 0

        def body(state):
            k, logt_after, sg, gm, gc, gcl, gop = state
            k = k - 1
            m2, con, cl, op, rad, local = _gather_chunk(records, starts, k,
                                                        cfg, capacity)
            mask = (local[None, :] < counts[:, None])
            op_m = op * mask
            alpha, dx, dy, quad = _chunk_alpha(m2, con, op_m, rad, px, py,
                                               cfg.min_alpha)
            logw = jnp.log1p(-alpha)
            chunk_sum = jnp.sum(logw, axis=1)
            logt_before = logt_after - chunk_sum          # exact in log space
            excl = jnp.cumsum(logw, axis=1) - logw
            t_i = jnp.exp(excl + logt_before[:, None, :])  # [G, C, P]
            w = alpha * t_i

            # dL/dcolor_i = sum_p w_ip * g_col[p]
            d_cl = jnp.einsum("gcp,gpk->gck", w, gcol_tile,
                              preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)

            # u_j = alpha_j T_j (c_j . g_col)  — suffix-summed for S . g_col
            cg = jnp.einsum("gck,gpk->gcp", cl, gcol_tile,
                            preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
            u = w * cg
            # exclusive suffix sum over the chunk + carry from later chunks
            suffix = (jnp.cumsum(u[:, ::-1, :], axis=1)[:, ::-1, :] - u)
            sg_i = suffix + sg[:, None, :]

            one_minus = jnp.maximum(1.0 - alpha, 1e-6)
            d_alpha = (t_i * cg - sg_i / one_minus
                       - glogt_tile[:, None, :] / one_minus)
            # gate: no grad through the cutoff/min-alpha mask or alpha clamp
            gate = (alpha > 0.0) & (alpha < ALPHA_CLAMP)
            d_alpha = jnp.where(gate, d_alpha, 0.0)

            # chain rule: alpha = opa * exp(-G/2)
            d_opa_frag = d_alpha * jnp.exp(-0.5 * quad)
            d_quad = d_alpha * (-0.5 * alpha)
            a_, b_, c_ = con[..., 0:1], con[..., 1:2], con[..., 2:3]
            d_op = jnp.sum(d_opa_frag, axis=2) * mask
            d_con = jnp.stack([
                jnp.sum(d_quad * dx * dx, axis=2),
                jnp.sum(d_quad * 2.0 * dx * dy, axis=2),
                jnp.sum(d_quad * dy * dy, axis=2)], axis=-1)
            d_m2 = jnp.stack([
                jnp.sum(d_quad * (-2.0) * (a_ * dx + b_ * dy), axis=2),
                jnp.sum(d_quad * (-2.0) * (b_ * dx + c_ * dy), axis=2)],
                axis=-1)
            maskf = mask.astype(jnp.float32)
            d_con = d_con * maskf[..., None]
            d_m2 = d_m2 * maskf[..., None]
            d_cl = d_cl * maskf[..., None]

            idx = jnp.clip(starts[:, None] + local[None, :], 0, capacity - 1)
            safe_idx = jnp.where(mask, idx, capacity)  # out-of-range drops
            gm = gm.at[safe_idx].add(d_m2, mode="drop")
            gc = gc.at[safe_idx].add(d_con, mode="drop")
            gcl = gcl.at[safe_idx].add(d_cl, mode="drop")
            gop = gop.at[safe_idx].add(d_op, mode="drop")

            sg = sg + jnp.sum(u, axis=1)
            return k, logt_before, sg, gm, gc, gcl, gop

        init = (kmax, logt_fin, jnp.zeros((g, p), jnp.float32),
                gm, gc, gcl, gop)
        _, _, _, gm, gc, gcl, gop = jax.lax.while_loop(cond, body, init)
        return (gm, gc, gcl, gop), None

    groups = (starts_p.reshape(ngroups, g), counts_p.reshape(ngroups, g),
              tile_ids.reshape(ngroups, g),
              g_col_p.reshape(ngroups, g, p, kc),
              g_logt_p.reshape(ngroups, g, p),
              logt_final_p.reshape(ngroups, g, p))
    (gm, gc, gcl, gop), _ = jax.lax.scan(
        bwd_group, (grad_mean2d, grad_conic, grad_color, grad_opacity),
        groups)
    return (gm, gc, gcl, gop, jnp.zeros_like(radius_s), None, None, None)


rasterize_pairs.defvjp(_rasterize_fwd, _rasterize_bwd)
