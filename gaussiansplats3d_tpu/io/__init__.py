"""Scene ingest / export: .ply, .splat, .ksplat, .spz readers and writers.

Host-side, vectorized NumPy (the TPU equivalent of the reference's streaming
loaders at /root/reference/src/loaders/); everything decodes to the canonical
``SplatData`` pytree and `device_put` happens at the call site.
"""

from .formats import (  # noqa: F401
    SceneFormat,
    load,
    save,
    scene_format_from_path,
)
from .fetch import AbortedError, fetch_with_progress  # noqa: F401
from .ksplat import (  # noqa: F401
    load_ksplat,
    save_ksplat,
    serialize_ksplat_sections,
)
from .optimize import optimize_splat_data  # noqa: F401
from .ply import load_ply, save_ply  # noqa: F401
from .splat import load_splat, save_splat  # noqa: F401
from .spz import load_spz, save_spz  # noqa: F401
