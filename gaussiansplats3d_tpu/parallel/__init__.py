"""Multi-chip / multi-host sharding: device meshes, the sharded render
pipeline, and the distributed training step.

The reference is a single-browser renderer whose only concurrency is a sort
web-worker + SharedArrayBuffer (/root/reference/src/worker/SortWorker.js);
this package is the TPU-native replacement at datacenter scale: a 2-D
``(splat, tile)`` jax.sharding Mesh where projection/SH shard over splats,
binning/sort/compositing shard over image-tile rows, and the exchange
between the two phases is an all_gather of compact projected-splat records
over the splat axis (ICI), with gradient reduction handled by shard_map's
collective transposes.
"""

from .distributed import (  # noqa: F401
    initialize_distributed,
    load_checkpoint,
    save_checkpoint,
)
from .heuristics import (  # noqa: F401
    DensifyConfig,
    DensifyState,
    densify_and_prune,
)
from .mesh import make_mesh  # noqa: F401
from .sharded import (  # noqa: F401
    default_exchange_capacity,
    deinterleave_tile_order,
    device_put_sharded_splats,
    interleave_tile_order,
    pad_splats_for_mesh,
    sharded_render,
    sharded_render_tiles,
)
from .train import TrainState, make_train_step  # noqa: F401
