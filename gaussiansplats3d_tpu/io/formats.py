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


def load(path: str, sh_degree: int | None = None,
         on_progress=None, abort_event=None,
         format: "SceneFormat | None" = None,
         headers: dict | None = None) -> SplatData:
    """Load any supported scene file or URL into SplatData.

    ``sh_degree`` optionally truncates higher-order SH at load time (the
    reference's outSphericalHarmonicsDegree parameter).  ``on_progress`` /
    ``abort_event`` stream download progress (io.fetch.fetch_with_progress,
    the fetchWithProgress parity surface) — used for URLs and large files.
    ``format`` overrides extension sniffing and ``headers`` adds HTTP
    request headers, like the reference's per-scene ``format``/``headers``
    options (Viewer.js addSplatScene options).
    """
    base = path.split("?")[0] if "://" in path else path
    fmt = format if format is not None else scene_format_from_path(base)
    if ("://" in path or on_progress is not None or abort_event is not None
            or headers is not None):
        from .fetch import fetch_with_progress
        data_bytes = fetch_with_progress(path, on_progress, abort_event,
                                         headers=headers)
        if fmt == SceneFormat.Ply:
            from .ply import parse_ply
            return parse_ply(data_bytes, sh_degree)
        if fmt == SceneFormat.Splat:
            from .splat import parse_splat
            data = parse_splat(data_bytes)
        elif fmt == SceneFormat.KSplat:
            from .ksplat import parse_ksplat
            data = parse_ksplat(data_bytes)
        else:
            from .spz import parse_spz
            return parse_spz(data_bytes, sh_degree)
        if sh_degree is not None and data.sh_degree > sh_degree:
            data = data.with_sh_degree(sh_degree)
        return data
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


def parse(data: bytes, fmt: SceneFormat,
          sh_degree: int | None = None) -> SplatData:
    """Decode a complete in-memory buffer of the given format."""
    if fmt == SceneFormat.Ply:
        from .ply import parse_ply
        return parse_ply(data, sh_degree)
    if fmt == SceneFormat.Splat:
        from .splat import parse_splat
        out = parse_splat(data)
    elif fmt == SceneFormat.KSplat:
        from .ksplat import parse_ksplat
        out = parse_ksplat(data)
    else:
        from .spz import parse_spz
        return parse_spz(data, sh_degree)
    if sh_degree is not None and out.sh_degree > sh_degree:
        out = out.with_sh_degree(sh_degree)
    return out


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
