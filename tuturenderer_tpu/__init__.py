"""tuturenderer_tpu: a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference C++ CPU renderer (bobhansky/TutuRenderer); see SURVEY.md.
"""
from .camera import Camera, make_camera
from .options import RenderOptions
from .scene.data import SceneBuilder, SceneData

__all__ = ["Camera", "make_camera", "RenderOptions", "SceneBuilder",
           "SceneData"]
__version__ = "0.1.0"
