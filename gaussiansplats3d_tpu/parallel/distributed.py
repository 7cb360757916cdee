"""Multi-host bootstrap + checkpointing for distributed training.

The reference's "distribution" is browser workers + SharedArrayBuffer
(SURVEY.md §5.8); the TPU equivalent is single-controller JAX: every host
calls :func:`initialize_distributed`, builds the same global mesh from
``jax.devices()`` (which then spans all hosts), and runs the same jitted
sharded program — XLA lowers the collectives onto ICI within a slice and
DCN across slices.

Checkpointing follows the reference's philosophy that the scene file IS the
checkpoint (SplatBuffer writer + progressive loads, SURVEY.md §5.4): splat
parameters are saved as a standard ``.ksplat`` (loadable by this framework
AND the reference viewer), optimizer state alongside as ``.npz``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed across hosts (no-op when single-process).

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS /
    NUM_PROCESSES / PROCESS_ID) or the TPU metadata autodetection built
    into jax.distributed.  Returns True when a multi-process runtime was
    started.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # single process, or TPU pod with full autodetection
        try:
            jax.distributed.initialize()
        except Exception:   # single-host without cluster env: fine
            return False
        return jax.process_count() > 1
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def save_checkpoint(state, path_prefix: str,
                    compression_level: int = 0) -> None:
    """Save a TrainState: splats as .ksplat + optimizer state as .npz."""
    from .. import io as gio
    from .train import TrainState

    assert isinstance(state, TrainState)
    splats = jax.device_get(state.params.to_splats())
    gio.save_ksplat(splats, path_prefix + ".ksplat",
                    compression_level=compression_level)
    flat, treedef = jax.tree.flatten(
        (state.params, state.opt_state, state.step))
    np.savez(path_prefix + ".opt.npz",
             *[np.asarray(x) for x in flat])


def load_checkpoint(path_prefix: str, optimizer):
    """Load a TrainState saved by :func:`save_checkpoint`.

    The .ksplat alone is enough to resume rendering anywhere (including
    the reference viewer); the .npz restores exact optimizer state.
    """
    from .. import io as gio
    from .train import SplatParams, TrainState

    splats = gio.load_ksplat(path_prefix + ".ksplat")
    state = TrainState.create(splats, optimizer)
    npz_path = path_prefix + ".opt.npz"
    if os.path.exists(npz_path):
        with np.load(npz_path) as data:
            arrays = [data[k] for k in data.files]
        template = jax.tree.structure(
            (state.params, state.opt_state, state.step))
        params, opt_state, step = jax.tree.unflatten(template, arrays)
        state = TrainState(params=params, opt_state=opt_state,
                           step=jax.numpy.asarray(step))
    return state
