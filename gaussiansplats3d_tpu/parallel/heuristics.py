"""Adaptive density control for splat training (densify + prune).

The reference renders pre-trained scenes and has no training machinery;
this module supplies the standard 3DGS adaptive-density heuristics
(clone small / split large high-gradient splats, prune transparent ones)
in a TPU-friendly STATIC-SHAPE formulation: the parameter arrays stay at
fixed capacity, dead splats are parked with opacity ~ 0 (they cull in
projection and bin nowhere), and each densify step fills dead slots from a
fixed-size budget of candidates — no dynamic reallocation, no recompiles.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import math3d
from .train import SplatParams

_DEAD_LOGIT = -12.0          # sigmoid ~ 6e-6: always culled


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    grad_threshold: float = 2e-4     # mean positional-grad norm trigger
    min_opacity: float = 0.005       # prune below
    percent_dense: float = 0.01      # split/clone size boundary (x extent)
    split_scale_factor: float = 1.6  # 3DGS split shrink
    budget_per_step: int = 2048      # max new splats per densify call
    scene_extent: float = 1.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DensifyState:
    """Accumulated positional-gradient statistics between densify calls."""

    grad_accum: jnp.ndarray    # [N] sum of ||dL/dmean||
    grad_vec: jnp.ndarray      # [N, 3] sum of dL/dmean (clone direction)
    count: jnp.ndarray         # [N] steps accumulated

    @staticmethod
    def create(n: int) -> "DensifyState":
        return DensifyState(grad_accum=jnp.zeros((n,), jnp.float32),
                            grad_vec=jnp.zeros((n, 3), jnp.float32),
                            count=jnp.zeros((n,), jnp.int32))

    def update(self, mean_grads: jnp.ndarray) -> "DensifyState":
        norms = jnp.linalg.norm(mean_grads, axis=-1)
        return DensifyState(grad_accum=self.grad_accum + norms,
                            grad_vec=self.grad_vec + mean_grads,
                            count=self.count + 1)


def densify_and_prune(params: SplatParams, state: DensifyState,
                      key: jax.Array, cfg: DensifyConfig
                      ) -> Tuple[SplatParams, DensifyState]:
    """One adaptive-density step (static shapes).

    1. prune:  opacity < min_opacity -> dead slot
    2. candidates: mean accumulated grad norm > grad_threshold
       - clone  (scale small): copy, nudged along the gradient direction
       - split  (scale large): resample within the Gaussian, shrink scales
    3. new splats fill the lowest-opacity dead slots, at most
       `budget_per_step` per call.
    """
    n = params.means.shape[0]
    opacity = jax.nn.sigmoid(params.logit_opacity)
    scales = jnp.exp(params.log_scales)
    max_scale = jnp.max(scales, axis=-1)

    avg_grad = state.grad_accum / jnp.maximum(state.count, 1)
    alive = opacity >= cfg.min_opacity
    hot = alive & (avg_grad > cfg.grad_threshold)
    big = max_scale > cfg.percent_dense * cfg.scene_extent
    split_mask = hot & big
    clone_mask = hot & ~big

    # --- choose up to budget candidates (highest accumulated gradient) ---
    budget = min(cfg.budget_per_step, n)
    cand_score = jnp.where(hot, avg_grad, -jnp.inf)
    cand_idx = jax.lax.top_k(cand_score, budget)[1]
    cand_ok = hot[cand_idx]

    # --- choose destination slots: the least-opaque (prefer dead) ---
    dest_idx = jax.lax.top_k(-opacity, budget)[1]
    # a destination is usable only if it is dead/prunable and not itself
    # a candidate source
    dest_dead = opacity[dest_idx] < cfg.min_opacity
    use = cand_ok & dest_dead

    src = cand_idx
    k1 = key
    src_scales = scales[src]
    src_rot = math3d.quat_to_rotmat(params.quats[src])
    is_split = split_mask[src]

    # split: sample a point from the source Gaussian; shrink both copies.
    noise = jax.random.normal(k1, (budget, 3)) * src_scales
    offset = jnp.einsum("nij,nj->ni", src_rot, noise)
    # clone: nudge the copy one step along the descent direction (the
    # average accumulated -grad), scaled to the source's extent, so the
    # pair separates immediately instead of waiting for the optimizer.
    gvec = state.grad_vec[src] / jnp.maximum(state.count[src], 1)[:, None]
    gnorm = jnp.linalg.norm(gvec, axis=-1, keepdims=True)
    gdir = gvec / jnp.maximum(gnorm, 1e-12)
    clone_nudge = -gdir * (0.5 * jnp.max(src_scales, axis=-1, keepdims=True))
    new_means = jnp.where(is_split[:, None],
                          params.means[src] + offset,
                          params.means[src] + clone_nudge)
    new_log_scales = jnp.where(
        is_split[:, None],
        params.log_scales[src] - jnp.log(cfg.split_scale_factor),
        params.log_scales[src])

    def scatter_rows(arr, rows):
        mask = use.reshape((budget,) + (1,) * (arr.ndim - 1))
        sel = jnp.where(mask, rows, arr[dest_idx])
        return arr.at[dest_idx].set(sel)

    # split sources shrink too (3DGS splits one Gaussian into two);
    # src and dest slots are disjoint (sources are alive, dests dead).
    log_scales = scatter_rows(params.log_scales, new_log_scales)
    log_scales = log_scales.at[src].add(
        jnp.where((use & is_split)[:, None],
                  -jnp.log(cfg.split_scale_factor), 0.0))

    new_params = SplatParams(
        means=scatter_rows(params.means, new_means),
        log_scales=log_scales,
        quats=scatter_rows(params.quats, params.quats[src]),
        rgb=scatter_rows(params.rgb, params.rgb[src]),
        logit_opacity=scatter_rows(params.logit_opacity,
                                   params.logit_opacity[src]),
        sh=scatter_rows(params.sh, params.sh[src]),
    )

    # --- prune: park transparent splats ---
    opacity_now = jax.nn.sigmoid(new_params.logit_opacity)
    dead = opacity_now < cfg.min_opacity
    new_params = dataclasses.replace(
        new_params,
        logit_opacity=jnp.where(dead, _DEAD_LOGIT,
                                new_params.logit_opacity))

    return new_params, DensifyState.create(n)


def num_alive(params: SplatParams, min_opacity: float = 0.005) -> jnp.ndarray:
    return jnp.sum(jax.nn.sigmoid(params.logit_opacity) >= min_opacity)
