"""Scene models: procedural mesh generators and large-scene presets.

The reference-mirroring scenes (Cornell box, Veach BDPT room) live in
``tuturenderer_tpu.scene.presets``; re-exported here for discoverability.
"""
from ..scene.presets import cornell_box, simple_box, veach_bdpt  # noqa: F401
from .meshes import heightfield, plane, quad, uv_sphere  # noqa: F401
from .scenes import sphere_showcase, terrain  # noqa: F401
