"""Device-mesh construction for the (splat, tile) 2-D decomposition."""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

SPLAT_AXIS = "splat"
TILE_AXIS = "tile"


def make_mesh(devices: Optional[Sequence] = None,
              splat_shards: Optional[int] = None,
              tile_shards: Optional[int] = None) -> Mesh:
    """Build a 2-D ``(splat, tile)`` mesh over the given (or all) devices.

    Default factorization puts more devices on the splat axis (projection and
    sort dominate at large N) while keeping the tile axis >= 1.  On a
    multi-host slice, `jax.devices()` already enumerates all hosts' chips, so
    the same call shards over DCN+ICI transparently (collectives ride ICI
    within a slice — the mesh major axis follows device order).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if splat_shards is None and tile_shards is None:
        tile_shards = _largest_pow2_leq(int(math.sqrt(n)))
        splat_shards = n // tile_shards
    elif splat_shards is None:
        splat_shards = n // tile_shards
    elif tile_shards is None:
        tile_shards = n // splat_shards
    if splat_shards * tile_shards != n:
        raise ValueError(
            f"mesh {splat_shards}x{tile_shards} != {n} devices")
    import numpy as np
    arr = np.asarray(devices).reshape(splat_shards, tile_shards)
    return Mesh(arr, (SPLAT_AXIS, TILE_AXIS))


def _largest_pow2_leq(x: int) -> int:
    p = 1
    while p * 2 <= x:
        p *= 2
    return p
