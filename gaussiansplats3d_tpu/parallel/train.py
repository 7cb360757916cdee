"""Differentiable splat optimization ("training") over the device mesh.

The reference renderer has no backward pass at all; this module supplies the
BASELINE.md north-star capability: fit splat parameters (means, scales,
rotations, colors, opacities, SH) to target images by gradient descent, with
the forward+backward render sharded over the (splat, tile) mesh and the
parameter-gradient reduction riding the shard_map collective transposes.

Parameterization (standard 3DGS training form):
  - ``log_scales``    — scales = exp(log_scales) (positivity)
  - ``logit_opacity`` — opacity = sigmoid(logit_opacity)
  - ``quats``         — unnormalized; the renderer normalizes internally
  - ``rgb``, ``sh``   — raw (rgb clipped in the loss image implicitly)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.types import Camera, RenderConfig, SplatData
from .sharded import sharded_render_tiles


@jax.tree_util.register_dataclass
@dataclass
class SplatParams:
    """Optimizable splat parameters (a JAX pytree)."""

    means: jnp.ndarray          # [N, 3]
    log_scales: jnp.ndarray     # [N, 3]
    quats: jnp.ndarray          # [N, 4]
    rgb: jnp.ndarray            # [N, 3]
    logit_opacity: jnp.ndarray  # [N]
    sh: jnp.ndarray             # [N, K, 3]

    @staticmethod
    def from_splats(splats: SplatData) -> "SplatParams":
        op = jnp.clip(splats.colors[:, 3], 1e-4, 1.0 - 1e-4)
        return SplatParams(
            means=splats.means,
            log_scales=jnp.log(jnp.maximum(splats.scales, 1e-12)),
            quats=splats.quats,
            rgb=splats.colors[:, :3],
            logit_opacity=jnp.log(op / (1.0 - op)),
            sh=splats.sh,
        )

    def to_splats(self) -> SplatData:
        opacity = jax.nn.sigmoid(self.logit_opacity)
        return SplatData(
            means=self.means,
            scales=jnp.exp(self.log_scales),
            quats=self.quats,
            colors=jnp.concatenate([self.rgb, opacity[:, None]], axis=-1),
            sh=self.sh,
        )


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: SplatParams
    opt_state: Any
    step: jnp.ndarray

    @staticmethod
    def create(splats: SplatData, optimizer) -> "TrainState":
        params = SplatParams.from_splats(splats)
        return TrainState(params=params,
                          opt_state=optimizer.init(params),
                          step=jnp.zeros((), jnp.int32))


def image_to_tile_blocks(img: jnp.ndarray, cfg: RenderConfig):
    """Raster image [H, W, C] -> GL-oriented tile blocks [T, P, C] + a
    validity mask [T, P] that zeroes padded pixels beyond the viewport."""
    ts = cfg.tile_size
    h, w = img.shape[:2]
    assert (h, w) == (cfg.height, cfg.width), (img.shape, cfg)
    ph, pw = cfg.tiles_y * ts, cfg.tiles_x * ts
    gl = img[::-1]                                   # row 0 at GL y=0
    gl = jnp.pad(gl, ((0, ph - h), (0, pw - w), (0, 0)))
    c = img.shape[2]
    tiles = gl.reshape(cfg.tiles_y, ts, cfg.tiles_x, ts, c)
    tiles = tiles.transpose(0, 2, 1, 3, 4).reshape(-1, ts * ts, c)

    ys = jnp.arange(ph) < h
    xs = jnp.arange(pw) < w
    m = (ys[:, None] & xs[None, :]).astype(jnp.float32)
    m = m.reshape(cfg.tiles_y, ts, cfg.tiles_x, ts)
    mask = m.transpose(0, 2, 1, 3).reshape(-1, ts * ts)
    return tiles, mask


def make_train_step(cfg: RenderConfig, mesh, optimizer,
                    capacity: Optional[int] = None,
                    exchange_capacity: Optional[int] = None,
                    route: str = "gather",
                    slab_mode: str = "banded"):
    """Build a jitted sharded train step.

    Returns ``step(state, camera, target_tiles, tile_mask) ->
    (new_state, metrics)`` where target_tiles/tile_mask come from
    :func:`image_to_tile_blocks`.  ``capacity`` is accepted for backward
    compatibility and ignored (the fused expand+sort path sizes its own
    slot layout); ``exchange_capacity`` sizes the routed splat->slab
    exchange (default: :func:`sharded.default_exchange_capacity`).
    """
    del capacity

    def loss_fn(params: SplatParams, camera: Camera, target_tiles, tile_mask):
        splats = params.to_splats()
        # chans is [T, NC+1, P] (alpha last); the moveaxis of the
        # [T, P, C] targets fuses into the elementwise error.
        chans = sharded_render_tiles(
            mesh, splats, camera, cfg,
            exchange_capacity=exchange_capacity, route=route,
            slab_mode=slab_mode)
        if slab_mode == "interleaved":
            # compare against slab-major-permuted targets rather than
            # reordering the tile-sharded chans (which would cost a
            # cross-device permute); the loss reduction is order-free.
            from .sharded import interleave_tile_order
            from .mesh import TILE_AXIS
            t_sh = mesh.shape[TILE_AXIS]
            target_tiles = interleave_tile_order(
                target_tiles, t_sh, cfg.tiles_x)
            tile_mask = interleave_tile_order(tile_mask, t_sh, cfg.tiles_x)
        bg = jnp.asarray(cfg.background, jnp.float32)
        trans = 1.0 - chans[:, -1]
        rendered = chans[:, :3] + trans[:, None] * bg[None, :, None]
        target = jnp.moveaxis(target_tiles, -1, 1)
        err = (rendered - target) ** 2 * tile_mask[:, None]
        loss = jnp.sum(err) / (jnp.sum(tile_mask) * 3.0)
        return loss

    def step(state: TrainState, camera: Camera, target_tiles, tile_mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, camera, target_tiles, tile_mask)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return jax.jit(step)
