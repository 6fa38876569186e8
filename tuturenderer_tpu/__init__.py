"""tuturenderer_tpu: a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference C++ CPU renderer (bobhansky/TutuRenderer); see SURVEY.md.
"""
import os as _os

import jax as _jax


def _setup_compilation_cache() -> None:
    """Persist compiled executables across processes.

    Remote-tunneled TPU backends compile slowly (minutes for the full
    wavefront megakernel), while execution is milliseconds; caching the
    executable makes every run after the first start instantly. Opt out
    with TUTU_NO_COMPILE_CACHE=1.
    """
    if _os.environ.get("TUTU_NO_COMPILE_CACHE"):
        return
    cache_dir = _os.environ.get(
        "TUTU_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags: cache is an optimization only


_setup_compilation_cache()

from .camera import Camera, make_camera
from .options import RenderOptions
from .scene.data import SceneBuilder, SceneData

__all__ = ["Camera", "make_camera", "RenderOptions", "SceneBuilder",
           "SceneData"]
__version__ = "0.1.0"
