"""Worker for the true multi-process distributed test (SURVEY.md §4:
"multi-host tests run as multi-process on a single host").

Each process owns 4 virtual CPU devices; two processes form the 8-device
global mesh.  The worker bootstraps jax.distributed through the package's
initialize_distributed, builds the (splat, tile) mesh over the GLOBAL
device list, shards a deterministic scene, runs the sharded render, and
writes its addressable tile blocks + a checksum for the parent to verify
against the single-process reference.

Run by tests/test_multiprocess.py — not a test module itself.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gaussiansplats3d_tpu as gs  # noqa: E402
from gaussiansplats3d_tpu.parallel import make_mesh  # noqa: E402
from gaussiansplats3d_tpu.parallel.distributed import (  # noqa: E402
    initialize_distributed)
from gaussiansplats3d_tpu.parallel.sharded import (  # noqa: E402
    sharded_render_tiles)


def main():
    coord, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    started = initialize_distributed(coordinator_address=coord,
                                     num_processes=2, process_id=pid)
    assert started, "distributed runtime did not start"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    # same deterministic scene on every process
    splats = gs.random_splats(jax.random.PRNGKey(3), 512, sh_degree=1)
    cfg = gs.RenderConfig(width=128, height=128, sh_degree=1, sort_bits=20,
                          background=(0.05, 0.1, 0.15))
    cam = gs.Camera.look_at((2.2, 1.4, 2.0), (0, 0, 0), fov_y_deg=60,
                            aspect=1.0)

    mesh = make_mesh(splat_shards=2, tile_shards=4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gaussiansplats3d_tpu.parallel.mesh import SPLAT_AXIS

    def shard_global(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(SPLAT_AXIS))
        # every process holds the full host copy; build the global array
        # from each process's addressable shards
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    sp = jax.tree.map(shard_global, splats)
    chans = jax.jit(
        lambda s: sharded_render_tiles(mesh, s, cam, cfg))(sp)

    # collect this process's addressable tile blocks (chans is
    # [T, NC+1, P], tile-sharded along dim 0)
    local = {}
    for shard in chans.addressable_shards:
        t0 = shard.index[0].start or 0
        local[f"chans_{t0}"] = np.asarray(shard.data)
    np.savez(out_path, **local)
    print(f"worker {pid}: ok ({len(local)} shards)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
