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
    # existing user configuration always wins: never override a cache dir
    # set via JAX's own env var or configured programmatically
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        if _jax.config.jax_compilation_cache_dir is not None:
            return
    except AttributeError:
        pass
    cache_dir = _os.environ.get("TUTU_COMPILE_CACHE_DIR")
    if cache_dir is None:
        # repo-local cache only for an editable/dev checkout (the package's
        # parent directory is writable and not site-packages); otherwise a
        # per-user cache dir
        parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        if "site-packages" not in parent and _os.access(parent, _os.W_OK):
            cache_dir = _os.path.join(parent, ".jax_cache")
        else:
            cache_dir = _os.path.join(
                _os.path.expanduser("~"), ".cache", "tuturenderer_tpu",
                "jax_cache")
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
