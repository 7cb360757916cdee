"""Format detection + load/save dispatch (the PlyLoader/SceneFormat layer).

Mirrors /root/reference/src/loaders/Utils.js:3-9 (sceneFormatFromPath) and
the per-format loaders' entry points.
"""

from __future__ import annotations

import enum
import os

from ..core.types import SplatData


class SceneFormat(enum.Enum):
    Ply = "ply"
    Splat = "splat"
    KSplat = "ksplat"
    Spz = "spz"


def scene_format_from_path(path: str) -> SceneFormat:
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    try:
        return SceneFormat(ext)
    except ValueError:
        raise ValueError(f"unrecognized scene file extension '.{ext}' "
                         f"(supported: ply, splat, ksplat, spz)") from None


def load(path: str, sh_degree: int | None = None) -> SplatData:
    """Load any supported scene file into SplatData.

    ``sh_degree`` optionally truncates higher-order SH at load time (the
    reference's outSphericalHarmonicsDegree parameter).
    """
    fmt = scene_format_from_path(path)
    if fmt == SceneFormat.Ply:
        from .ply import load_ply
        return load_ply(path, sh_degree)
    if fmt == SceneFormat.Splat:
        from .splat import load_splat
        data = load_splat(path)
    elif fmt == SceneFormat.KSplat:
        from .ksplat import load_ksplat
        data = load_ksplat(path)
    else:
        from .spz import load_spz
        return load_spz(path, sh_degree)
    if sh_degree is not None and data.sh_degree > sh_degree:
        data = data.with_sh_degree(sh_degree)
    return data


def save(splats: SplatData, path: str, **kw) -> None:
    """Save SplatData in the format implied by the file extension."""
    fmt = scene_format_from_path(path)
    if fmt == SceneFormat.Ply:
        from .ply import save_ply
        save_ply(splats, path)
    elif fmt == SceneFormat.Splat:
        from .splat import save_splat
        save_splat(splats, path)
    elif fmt == SceneFormat.KSplat:
        from .ksplat import save_ksplat
        save_ksplat(splats, path, **kw)
    else:
        from .spz import save_spz
        save_spz(splats, path, **kw)
