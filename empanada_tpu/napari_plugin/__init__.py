"""Optional napari plugin shim over the headless api layer.

The reference IS a napari plugin (manifest at
``/root/reference/empanada_napari/napari.yaml:4-131``, 23 commands).  This
package exposes the same command surface as thin magicgui adapters over
``empanada_tpu.api`` / ``empanada_tpu.curation`` so napari users can swap
backends transparently — napari/magicgui are OPTIONAL dependencies: nothing
here imports them at module import time, and every widget factory raises an
informative error when they're absent.
"""

from __future__ import annotations

__all__ = ["napari_available", "manifest_path"]


def napari_available() -> bool:
    try:
        import magicgui  # noqa: F401
        import napari  # noqa: F401

        return True
    except ImportError:
        return False


def manifest_path() -> str:
    import os

    return os.path.join(os.path.dirname(__file__), "napari.yaml")
