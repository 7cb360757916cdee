"""Tiled front-to-back compositor for 2DGS surfels (custom VJP).

The surfel analogue of `rasterize.rasterize_pairs`: consumes per-tile
depth-sorted surfel records (from `surfel.bin_sort_surfels`) and composites
ray-plane-intersected Gaussians front-to-back per tile, with the same
log-space transmittance replay backward as the 3D path.

Fragment semantics are the reference's 2D fragment shader
(/root/reference/src/splatmesh/SplatMaterial2D.js:289-344): homogeneous
ray-plane intersection via k x l, min(rho3d, rho2d) low-pass pair, near-
plane depth test, alpha cutoff.  Unlike the 3D compositor the per-record
gradient chain (through the cross product and projective divide) is
machine-derived: the backward pass calls `jax.vjp` of the fragment
function per chunk, so the hand-written part is only the compositing
algebra (d_alpha from the replayed transmittance) shared with
`rasterize._rasterize_bwd`.

Record table layout ([capacity, 17] f32 — or [capacity, 18] with a depth
channel, cfg.return_depth):

    col 0-8      T row-major (t00 t01 t02 | t10 t11 t12 | t20 t21 t22)
                 where GLSL Tu = (t00, t10, t20) etc. (columns)
    col 9-10     center2d (x, y)
    col 11:-3    channels (rgb, or rgb + per-splat depth)
    col -3       opacity (0 on invalid slots)
    col -2,-1    support-box radius (rx, ry) — hard cutoff, no gradient
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import RenderConfig

_LOG_T_FLOOR = -80.0
_GROUP_SIZE = 64
_ALPHA_MAX = 0.99
_NEAR_N = 0.2
_FILTER_INV_SQUARE = 2.0

SURFEL_RECORD_WIDTH = 17   # 18 with a depth channel; last 2 cols = radius


def _tile_pixel_coords(tile_ids: jnp.ndarray, cfg: RenderConfig):
    ts = cfg.tile_size
    tx = (tile_ids % cfg.tiles_x).astype(jnp.float32)
    ty = (tile_ids // cfg.tiles_x).astype(jnp.float32)
    p = jnp.arange(ts * ts, dtype=jnp.float32)
    ix = jnp.mod(p, ts)
    iy = jnp.floor(p / ts)
    px = tx[:, None] * ts + ix[None, :] + 0.5
    py = ty[:, None] * ts + iy[None, :] + 0.5
    return px, py


def surfel_alpha(rec, px, py, min_alpha):
    """Fragment alpha for a [G, C, 17] record chunk over [G, P] pixels.

    Pure function of the record table (differentiable in cols 0-14; the
    radius cols act as a hard cutoff) — the backward pass takes its vjp.
    """
    t = rec[..., 0:9]                                   # [G, C, 9]
    cx, cy = rec[..., 9:10], rec[..., 10:11]
    opa = rec[..., -3:-2]
    rx, ry = rec[..., -2:-1], rec[..., -1:]
    pxb = px[:, None, :]                                # [G, 1, P]
    pyb = py[:, None, :]

    # k = px * Tw - Tu, l = py * Tw - Tv (Tu/Tv/Tw are COLUMNS of T)
    k0 = pxb * t[..., 2:3] - t[..., 0:1]
    k1 = pxb * t[..., 5:6] - t[..., 3:4]
    k2 = pxb * t[..., 8:9] - t[..., 6:7]
    l0 = pyb * t[..., 2:3] - t[..., 1:2]
    l1 = pyb * t[..., 5:6] - t[..., 4:5]
    l2 = pyb * t[..., 8:9] - t[..., 7:8]
    p0 = k1 * l2 - k2 * l1
    p1 = k2 * l0 - k0 * l2
    p2 = k0 * l1 - k1 * l0
    tiny = jnp.abs(p2) < 1e-12
    safe_p2 = jnp.where(tiny, 1e-12, p2)
    su = p0 / safe_p2
    sv = p1 / safe_p2
    rho3d = su * su + sv * sv
    dx = pxb - cx
    dy = pyb - cy
    rho2d = _FILTER_INV_SQUARE * (dx * dx + dy * dy)
    rho = jnp.minimum(rho3d, rho2d)
    depth = jnp.where(rho3d <= rho2d,
                      su * t[..., 2:3] + sv * t[..., 5:6] + t[..., 8:9],
                      t[..., 8:9])
    alpha = opa * jnp.exp(-0.5 * rho)
    alpha = jnp.minimum(alpha, _ALPHA_MAX)
    bad = (tiny | (depth < _NEAR_N) | (alpha < min_alpha)
           | (jnp.abs(dx) > rx) | (jnp.abs(dy) > ry))
    return jnp.where(bad, 0.0, alpha)


def _gather_chunk(recs, starts, k, cfg, capacity):
    c = cfg.chunk_size
    local = k * c + jnp.arange(c, dtype=jnp.int32)
    idx = jnp.clip(starts[:, None] + local[None, :], 0, capacity - 1)
    return recs[idx], local, idx


def _pad_tiles(cfg, tile_starts, tile_counts, tile_base):
    t = tile_starts.shape[0]
    g = _GROUP_SIZE
    pad = (-t) % g
    if pad:
        tile_starts = jnp.pad(tile_starts, (0, pad))
        tile_counts = jnp.pad(tile_counts, (0, pad))
    from .rasterize import tile_ids_from_base
    tile_ids = tile_ids_from_base(t + pad, tile_base)
    return tile_starts, tile_counts, tile_ids, t


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def composite_surfel_tiles(cfg: RenderConfig, capacity: int,
                           recs, tile_starts, tile_counts, tile_base=0
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite sorted surfel records into tile blocks.

    recs: [capacity, 17 or 18] record table (invalid slots: opacity 0).
    Returns (tile_colors [T, P, NC], tile_logtrans [T, P]) where NC is the
    channel count (3, or 4 with cfg.return_depth's depth column).
    """
    out, _ = _fwd_impl(cfg, capacity, recs, tile_starts, tile_counts,
                       tile_base)
    return out


def _fwd_impl(cfg, capacity, recs, tile_starts, tile_counts, tile_base):
    starts_p, counts_p, tile_ids, t = _pad_tiles(cfg, tile_starts,
                                                 tile_counts, tile_base)
    c = cfg.chunk_size
    p = cfg.tile_size * cfg.tile_size
    g = _GROUP_SIZE
    nc = recs.shape[1] - 14            # channel cols: 11 .. width-3

    def render_group(_, group):
        starts, counts, ids = group
        px, py = _tile_pixel_coords(ids, cfg)

        def cond(state):
            k = state[0]
            return jnp.any(k * c < counts)

        def body(state):
            k, col, logt = state
            rec, local, _ = _gather_chunk(recs, starts, k, cfg, capacity)
            mask = (local[None, :] < counts[:, None]).astype(jnp.float32)
            rec = rec.at[..., -3].multiply(mask)
            alpha = surfel_alpha(rec, px, py, cfg.min_alpha)   # [G, C, P]
            logw = jnp.log1p(-alpha)
            excl = jnp.cumsum(logw, axis=1) - logw
            w = alpha * jnp.exp(excl + logt[:, None, :])
            col = col + jnp.einsum(
                "gcp,gck->gpk", w, rec[..., 11:11 + nc],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            logt = jnp.maximum(logt + jnp.sum(logw, axis=1), _LOG_T_FLOOR)
            return k + 1, col, logt

        init = (jnp.int32(0), jnp.zeros((g, p, nc), jnp.float32),
                jnp.zeros((g, p), jnp.float32))
        _, col, logt = jax.lax.while_loop(cond, body, init)
        return None, (col, logt)

    groups = (starts_p.reshape(-1, g), counts_p.reshape(-1, g),
              tile_ids.reshape(-1, g))
    _, (cols, logts) = jax.lax.scan(render_group, None, groups)
    tile_colors = cols.reshape(-1, p, nc)[:t]
    tile_logtrans = logts.reshape(-1, p)[:t]
    residuals = (recs, tile_starts, tile_counts, tile_base, tile_logtrans)
    return (tile_colors, tile_logtrans), residuals


def _bwd_impl(cfg, capacity, residuals, cotangents):
    recs, tile_starts, tile_counts, tile_base, tile_logtrans = residuals
    g_col, g_logt = cotangents
    starts_p, counts_p, tile_ids, t = _pad_tiles(cfg, tile_starts,
                                                 tile_counts, tile_base)
    c = cfg.chunk_size
    p = cfg.tile_size * cfg.tile_size
    g = _GROUP_SIZE
    nc = recs.shape[1] - 14            # channel cols: 11 .. width-3
    ngroups = starts_p.shape[0] // g

    pad_t = starts_p.shape[0] - t
    g_col_p = jnp.pad(g_col, ((0, pad_t), (0, 0), (0, 0)))
    g_logt_p = jnp.pad(g_logt, ((0, pad_t), (0, 0)))
    logt_final_p = jnp.pad(tile_logtrans, ((0, pad_t), (0, 0)))

    grad_recs = jnp.zeros_like(recs)

    def bwd_group(carry, group):
        grecs = carry
        starts, counts, ids, gcol_tile, glogt_tile, logt_fin = group
        px, py = _tile_pixel_coords(ids, cfg)
        kmax = jnp.max(jnp.ceil(counts / c)).astype(jnp.int32)

        def cond(state):
            return state[0] > 0

        def body(state):
            k, logt_after, sg, grecs = state
            k = k - 1
            rec, local, _ = _gather_chunk(recs, starts, k, cfg, capacity)
            mask = (local[None, :] < counts[:, None]).astype(jnp.float32)
            rec = rec.at[..., -3].multiply(mask)

            # replay transmittance exactly in log space
            alpha, alpha_vjp = jax.vjp(
                lambda r: surfel_alpha(r, px, py, cfg.min_alpha), rec)
            logw = jnp.log1p(-alpha)
            chunk_sum = jnp.sum(logw, axis=1)
            logt_before = logt_after - chunk_sum
            excl = jnp.cumsum(logw, axis=1) - logw
            t_i = jnp.exp(excl + logt_before[:, None, :])     # [G, C, P]
            w = alpha * t_i
            cl = rec[..., 11:11 + nc]

            d_cl = jnp.einsum("gcp,gpk->gck", w, gcol_tile,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            cg = jnp.einsum("gck,gpk->gcp", cl, gcol_tile,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            u = w * cg
            suffix = (jnp.cumsum(u[:, ::-1, :], axis=1)[:, ::-1, :] - u)
            sg_i = suffix + sg[:, None, :]

            one_minus = jnp.maximum(1.0 - alpha, 1e-6)
            d_alpha = (t_i * cg - sg_i / one_minus
                       - glogt_tile[:, None, :] / one_minus)
            gate = (alpha > 0.0) & (alpha < _ALPHA_MAX)
            d_alpha = jnp.where(gate, d_alpha, 0.0)

            # machine-derived fragment chain: d_alpha -> d_record columns
            (d_rec,) = alpha_vjp(d_alpha)
            d_rec = d_rec.at[..., 11:11 + nc].add(d_cl)
            d_rec = d_rec * mask[..., None]
            # radius columns are a hard cutoff
            d_rec = d_rec.at[..., -2:].set(0.0)

            idx = jnp.clip(starts[:, None] + local[None, :], 0,
                           capacity - 1)
            safe_idx = jnp.where(mask > 0, idx, capacity)
            grecs = grecs.at[safe_idx].add(d_rec, mode="drop")

            sg = sg + jnp.sum(u, axis=1)
            return k, logt_before, sg, grecs

        init = (kmax, logt_fin, jnp.zeros((g, p), jnp.float32), grecs)
        _, _, _, grecs = jax.lax.while_loop(cond, body, init)
        return grecs, None

    groups = (starts_p.reshape(ngroups, g), counts_p.reshape(ngroups, g),
              tile_ids.reshape(ngroups, g),
              g_col_p.reshape(ngroups, g, p, nc),
              g_logt_p.reshape(ngroups, g, p),
              logt_final_p.reshape(ngroups, g, p))
    grad_recs, _ = jax.lax.scan(bwd_group, grad_recs, groups)
    return (grad_recs, None, None, None)


def _fwd(cfg, capacity, recs, tile_starts, tile_counts, tile_base):
    return _fwd_impl(cfg, capacity, recs, tile_starts, tile_counts,
                     tile_base)


composite_surfel_tiles.defvjp(_fwd, _bwd_impl)
