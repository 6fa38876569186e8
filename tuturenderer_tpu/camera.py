"""Pinhole camera: ray generation, world->raster projection, importance.

Re-derives the reference camera model (Camera.hpp:12-48, integrator plane
setup PathTracing.hpp:357-391) as host-side precomputation feeding pure
device functions. All per-pixel work is vectorized over flat lane arrays.

Conventions copied from the reference:
- image plane distance d = width / (2 tan(hfov/2)) so pixel area == 1
  (Camera.hpp:43-44);
- pixel grid walks from upper-left corner ``ul`` with steps
  delta_h = (ur-ul)/(w-1), delta_v = (ll-ul)/(h-1) and half-pixel offsets
  c_off = span/(2w) (PathTracing.hpp:377-391);
- pixel center = ul + x*delta_h + y*delta_v + c_off_h + c_off_v, the
  single-threaded variant (PathTracing.hpp:444). The threaded reference
  adds c_off_v twice and drops c_off_h (PathTracing.hpp:503) — that bug is
  deliberately not reproduced;
- world->raster chain world2Cam -> perspective(near=0.1, far=1e4) ->
  translate(1,1,0) -> scale(w/2, h/2) (Camera.hpp:32-40, Vector.hpp:352-373)
  used for light-tracing splats and the camera importance ``We``
  (IIntegrator.hpp:233-248).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from .utils.vec import Vec3, vec3


def _normalized(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def _perspective_matrix(hfov_deg: float, near: float, far: float,
                        aspect: float) -> np.ndarray:
    """Row-major 4x4 perspective; mirrors Vector.hpp:352-373 (incl. the
    y-flip in orth_scale row 1)."""
    p2o = np.zeros((4, 4), np.float64)
    p2o[0, 0] = near
    p2o[1, 1] = near
    p2o[2, 2] = near + far
    p2o[2, 3] = near * far
    p2o[3, 2] = -1.0
    r = math.tan(math.radians(hfov_deg / 2.0)) * near
    l = -r
    t = r / aspect
    b = -t
    orth_trans = np.array(
        [[1, 0, 0, -(r + l) / 2],
         [0, 1, 0, -(t + b) / 2],
         [0, 0, 1, -(near + far) / 2],
         [0, 0, 0, 1]], np.float64)
    orth_scale = np.array(
        [[2 / (r - l), 0, 0, 0],
         [0, 2 / -(t - b), 0, 0],
         [0, 0, 2 / (near - far), 0],
         [0, 0, 0, 1]], np.float64)
    return orth_scale @ orth_trans @ p2o


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    # device data (pytree leaves)
    position: Vec3
    fwd: Vec3
    up: Vec3
    right: Vec3
    ul: Vec3          # upper-left image-plane corner
    delta_h: Vec3
    delta_v: Vec3
    c_off: Vec3       # c_off_h + c_off_v combined
    world2raster: jnp.ndarray  # [4,4] f32
    image_plane_dist: jnp.ndarray
    film_area_inv: jnp.ndarray
    lens_area_inv: jnp.ndarray
    # static metadata
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    hfov: float = dataclasses.field(metadata=dict(static=True))
    parallel_projection: bool = dataclasses.field(metadata=dict(static=True))

    @property
    def n_pixels(self) -> int:
        return self.width * self.height


def make_camera(width: int, height: int, hfov: float, eye, viewdir, updir,
                parallel_projection: bool = False,
                ref_grid: bool = True) -> Camera:
    """Host-side camera construction (Camera.hpp:12-48 + plane setup
    PathTracing.hpp:357-391).

    ``ref_grid=True`` (default) reproduces the reference's pixel grid:
    eye-ray centers step (ur-ul)/(width-1) (PathTracing.hpp:381-383) while
    the raster/splat chain divides the same span into ``width`` pixels —
    two INCONSISTENT grids, so pixel-center rays project to raster
    x*(w/(w-1)) and splat-based estimators (light tracing, BDPT t=1) run
    ~(w/(w-1))^2 hot relative to eye-path estimators. Invisible at the
    reference's real resolutions (<=0.3% at 800x600), several percent at
    small test resolutions. ``ref_grid=False`` steps span/width so both
    grids agree exactly (pixel x center -> raster x + 0.5)."""
    eye = np.asarray(eye, np.float64)
    fwd = _normalized(np.asarray(viewdir, np.float64))
    up_in = np.asarray(updir, np.float64)
    right = _normalized(np.cross(fwd, up_in))
    up = _normalized(np.cross(right, fwd))

    # world2cam (Camera.hpp:20-35): rows right/up/-fwd with projected eye
    pos_cam = np.array([right @ eye, up @ eye, (-fwd) @ eye])
    world2cam = np.zeros((4, 4), np.float64)
    world2cam[0, :3] = right
    world2cam[0, 3] = -pos_cam[0]
    world2cam[1, :3] = up
    world2cam[1, 3] = -pos_cam[1]
    world2cam[2, :3] = -fwd
    world2cam[2, 3] = -pos_cam[2]
    world2cam[3, 3] = 1.0

    persp = _perspective_matrix(hfov, 0.1, 10000.0, width / height)
    world2ndc = persp @ world2cam
    translate = np.eye(4)
    translate[0, 3] = 1.0
    translate[1, 3] = 1.0
    scale = np.diag([width * 0.5, height * 0.5, 0.0, 1.0])
    world2raster = scale @ (translate @ world2ndc)

    tan_half = math.tan(math.radians(hfov * 0.5))
    d = width / (2.0 * tan_half)          # pixel area == 1 (Camera.hpp:43-44)
    if parallel_projection:
        d_plane = 4.0                      # PathTracing.hpp:368
    else:
        d_plane = d

    # image plane corners (PathTracing.hpp:373-391)
    width_half = abs(tan_half * d_plane)
    aspect = width / height
    height_half = width_half / aspect
    ul = eye + d_plane * fwd - width_half * right + height_half * up
    ur = eye + d_plane * fwd + width_half * right + height_half * up
    ll = eye + d_plane * fwd - width_half * right - height_half * up
    if ref_grid:
        dh = (ur - ul) / (width - 1) if width != 1 else np.zeros(3)
        dv = (ll - ul) / (height - 1) if height != 1 else np.zeros(3)
    else:
        dh = (ur - ul) / width
        dv = (ll - ul) / height
    c_off = (ur - ul) / (2.0 * width) + (ll - ul) / (2.0 * height)

    f32 = lambda a: vec3(*np.asarray(a, np.float32))
    return Camera(
        position=f32(eye), fwd=f32(fwd), up=f32(up), right=f32(right),
        ul=f32(ul), delta_h=f32(dh), delta_v=f32(dv), c_off=f32(c_off),
        world2raster=jnp.asarray(world2raster, jnp.float32),
        image_plane_dist=jnp.float32(d),
        film_area_inv=jnp.float32(1.0 / (width * height)),
        lens_area_inv=jnp.float32(1.0),
        width=width, height=height, hfov=float(hfov),
        parallel_projection=bool(parallel_projection),
    )


def pixel_position(cam: Camera, px, py, jx=None, jy=None) -> Vec3:
    """World-space point on the image plane for pixel (px, py).

    With jx/jy None this is the pixel center (reference semantics: every
    sample traces the identical primary ray, PathTracing.hpp:502-508).
    jx/jy in [0,1) enable sub-pixel jitter, an intentional improvement.
    """
    fx = px.astype(jnp.float32)
    fy = py.astype(jnp.float32)
    if jx is not None:
        fx = fx + (jx - 0.5)
        fy = fy + (jy - 0.5)
    return cam.ul + cam.delta_h * fx + cam.delta_v * fy + cam.c_off


def primary_ray(cam: Camera, px, py, jx=None, jy=None):
    """Returns (origin Vec3[N], dir Vec3[N], pixel_pos Vec3[N])."""
    p = pixel_position(cam, px, py, jx, jy)
    if cam.parallel_projection:
        d = cam.fwd
        zeros = jnp.zeros_like(p.x)
        rdir = Vec3(zeros + d.x, zeros + d.y, zeros + d.z)
        orig = p - rdir * 4.0              # PathTracing.hpp:455
        return orig, rdir, p
    rdir = (p - cam.position).normalized()
    zeros = jnp.zeros_like(p.x)
    orig = Vec3(zeros + cam.position.x, zeros + cam.position.y,
                zeros + cam.position.z)
    return orig, rdir, p


def world_to_raster(cam: Camera, pos: Vec3):
    """Project world point -> (raster_x, raster_y) after perspective divide,
    with the -0.5 shift from Camera.hpp:60-66."""
    m = cam.world2raster
    x = m[0, 0] * pos.x + m[0, 1] * pos.y + m[0, 2] * pos.z + m[0, 3]
    y = m[1, 0] * pos.x + m[1, 1] * pos.y + m[1, 2] * pos.z + m[1, 3]
    w = m[3, 0] * pos.x + m[3, 1] * pos.y + m[3, 2] * pos.z + m[3, 3]
    inv_w = 1.0 / w
    return x * inv_w - 0.5, y * inv_w - 0.5


def world_to_pixel_index(cam: Camera, pos: Vec3):
    """Flat pixel index for a world point; -1 when outside the frustum
    (Camera.hpp:51-78).

    Bounds are checked on the TRUNCATED ints, exactly like the C code
    (`int x = (int)raster.x; if (x < 0 ...)`, Camera.hpp:52-55): the C
    cast truncates toward zero, so raster values in (-1, 0) fold onto
    row/column 0 and are ACCEPTED. Checking the float against 0 instead
    rejected that band and turned the frame's top/left edge pixels dark
    in every We-weighted estimator (the one-row light-patch offset the
    mesh_bdpt oracle caught)."""
    rx, ry = world_to_raster(cam, pos)
    ix = rx.astype(jnp.int32)
    iy = ry.astype(jnp.int32)
    inside = (ix >= 0) & (ix < cam.width) & (iy >= 0) & (iy < cam.height)
    return jnp.where(inside, ix + cam.width * iy, -1)


def importance_we(cam: Camera, pos: Vec3):
    """Camera importance function We (IIntegrator.hpp:233-248): zero outside
    the frustum, else d_pixel^2 / (lensArea * filmArea * cos^2)."""
    idx = world_to_pixel_index(cam, pos)
    to_cam = (Vec3(cam.position.x - pos.x, cam.position.y - pos.y,
                   cam.position.z - pos.z)).normalized(1e-20)
    cos_cam = jnp.abs(cam.fwd.dot(-to_cam))
    dist = cam.image_plane_dist / jnp.maximum(cos_cam, 1e-20)
    we = dist * dist * cam.lens_area_inv * cam.film_area_inv / \
        jnp.maximum(cos_cam * cos_cam, 1e-20)
    return jnp.where(idx >= 0, we, 0.0), idx
