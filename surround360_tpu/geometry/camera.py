"""Vectorized FTHETA/RECTILINEAR camera model.

TPU-native rebuild of the reference camera
(surround360_render/source/render/Camera.{h,cpp}; format spec RIG_JSON.md):

- pose: position (cm, rig frame) + row-major rotation whose rows are
  (right, up, backward); +z is behind the camera (Camera.cpp:16-29).
- projection ``world_to_pixel``: rig -> camera -> distorted sensor -> pixel
  (Camera.h:133-140), with sensor mapping per lens type (Camera.h:250-261):
  FTHETA uses r = distort(atan2(|xy|, -z)); RECTILINEAR projects on z=-1 and
  scales by the distortion factor.
- distortion: distort(r) = r + d0 r^3 + d1 r^5 in sensor space
  (Camera.h:219-227); inverse by fixed-iteration Newton (Camera.h:229-248).
- fov gating via fov_threshold = cos(fov)|cos(fov)| (Camera.cpp:144-167).

Differences from the reference, by design:
- every function is array-polymorphic (numpy for host float64 precompute /
  calibration, jax.numpy for traced device code) and vectorized over
  arbitrary leading point dims; ``Camera`` is a NamedTuple pytree so rigs
  vmap/shard as struct-of-arrays.
- lens type is an int32 leaf, and both lens branches are computed and
  selected with ``where`` — no data-dependent control flow, so a mixed
  FTHETA+RECTILINEAR rig traces as a single program.
- Newton undistort always runs its fixed 10 iterations (the reference early
  exits) — static control flow for XLA; identical result to tolerance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

NEAR_INFINITY = 1.0e6  # Camera.cpp:14 kNearInfinity
FTHETA = 0
RECTILINEAR = 1

_TYPE_NAMES = {FTHETA: "FTHETA", RECTILINEAR: "RECTILINEAR"}
_TYPE_IDS = {v: k for k, v in _TYPE_NAMES.items()}


class Camera(NamedTuple):
    """Numeric camera parameters (a pytree; leading batch dims allowed)."""

    lens_type: np.ndarray  # () int32: 0=FTHETA, 1=RECTILINEAR
    position: np.ndarray  # (3,) rig-frame origin, cm
    rotation: np.ndarray  # (3,3) rows = right, up, backward
    resolution: np.ndarray  # (2,) pixels (w, h)
    principal: np.ndarray  # (2,) pixels
    focal: np.ndarray  # (2,) pixels/radian; focal[1] typically negative
    distortion: np.ndarray  # (2,) r^3, r^5 coefficients
    fov_threshold: np.ndarray  # () cos(fov)*|cos(fov)|; -1 or 0 = default

    @property
    def right(self):
        return self.rotation[..., 0, :]

    @property
    def up(self):
        return self.rotation[..., 1, :]

    @property
    def backward(self):
        return self.rotation[..., 2, :]

    @property
    def forward(self):
        return -self.rotation[..., 2, :]


def _xp(*arrays):
    """Pick numpy when all inputs are plain numpy, else jax.numpy."""
    for a in arrays:
        if not isinstance(a, (np.ndarray, np.generic, float, int, list, tuple)):
            return jnp
    return np


def orthonormalize_rotation(forward, up, right=None):
    """Build the (right, up, backward) rotation matrix from axes and snap it
    to the nearest orthonormal matrix via SVD (the reference re-unitarizes
    through Eigen::AngleAxis, Camera.cpp:24-28). Host-side (numpy)."""
    forward = np.asarray(forward, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    if right is None:
        right = np.cross(forward, up)
    right = np.asarray(right, dtype=np.float64)
    if np.dot(np.cross(right, up), forward) >= 0:
        raise ValueError("rotation must be right-handed")
    rot = np.stack([right, up, -forward], axis=0)
    u, _, vt = np.linalg.svd(rot)
    out = u @ vt
    if np.linalg.det(out) < 0:  # keep it a proper rotation
        u[:, -1] *= -1
        out = u @ vt
    return out


def make_camera(
    lens_type,
    position,
    forward,
    up,
    resolution,
    focal,
    principal=None,
    distortion=(0.0, 0.0),
    fov=None,
    right=None,
    dtype=np.float64,
):
    """Host-side constructor mirroring Camera::Camera(json) defaults
    (Camera.cpp:44-83): principal defaults to resolution/2, distortion to 0,
    fov to the lens-type default."""
    if isinstance(lens_type, str):
        lens_type = _TYPE_IDS[lens_type]
    resolution = np.asarray(resolution, dtype=dtype)
    cam = Camera(
        lens_type=np.asarray(lens_type, dtype=np.int32),
        position=np.asarray(position, dtype=dtype),
        rotation=orthonormalize_rotation(forward, up, right).astype(dtype),
        resolution=resolution,
        principal=np.asarray(
            principal if principal is not None else resolution / 2, dtype=dtype
        ),
        focal=np.asarray(focal, dtype=dtype),
        distortion=np.asarray(distortion, dtype=dtype),
        fov_threshold=np.asarray(0.0, dtype=dtype),
    )
    if fov is None:
        return set_default_fov(cam)
    return set_fov(cam, fov)


# ---------------------------------------------------------------------------
# fov handling (Camera.cpp:144-167)
# ---------------------------------------------------------------------------


def set_fov(cam: Camera, fov) -> Camera:
    cos_fov = np.cos(fov)
    return cam._replace(
        fov_threshold=np.asarray(cos_fov * abs(cos_fov), dtype=np.asarray(cam.position).dtype)
    )


def set_default_fov(cam: Camera) -> Camera:
    # FTHETA default: sees everything (-1); RECTILINEAR: front hemisphere (0)
    thresh = -1.0 if int(cam.lens_type) == FTHETA else 0.0
    return cam._replace(
        fov_threshold=np.asarray(thresh, dtype=np.asarray(cam.position).dtype)
    )


def get_fov(cam: Camera) -> float:
    t = float(cam.fov_threshold)
    return float(np.arccos(-np.sqrt(-t)) if t < 0 else np.arccos(np.sqrt(t)))


def is_default_fov(cam: Camera) -> bool:
    t = float(cam.fov_threshold)
    return t == -1.0 if int(cam.lens_type) == FTHETA else t == 0.0


# ---------------------------------------------------------------------------
# distortion (Camera.h:219-248)
# ---------------------------------------------------------------------------


def distort_factor(cam: Camera, r_squared):
    d0 = cam.distortion[..., 0]
    d1 = cam.distortion[..., 1]
    return 1.0 + r_squared * (d0 + r_squared * d1)


def distort(cam: Camera, r):
    return distort_factor(cam, r * r) * r


def undistort(cam: Camera, d, num_steps: int = 10):
    """Invert distort() by Newton iteration with numeric derivative
    (Camera.h:229-248). Fixed trip count; no-op when distortion is zero
    (each step subtracts exactly 0)."""
    smidgen = 1.0 / NEAR_INFINITY
    r = d
    for _ in range(num_steps):
        d0 = distort(cam, r)
        d1 = distort(cam, r + smidgen)
        derivative = (d1 - d0) / smidgen
        r = r - (d0 - d) / derivative
    return r


# ---------------------------------------------------------------------------
# projection (Camera.h:133-150, 250-284)
# ---------------------------------------------------------------------------


def _camera_to_sensor(cam: Camera, pts_cam, xp):
    """Camera-space point (..., 3) -> distorted sensor coords (..., 2).
    Computes both lens branches and selects (traceable for mixed rigs)."""
    xy = pts_cam[..., :2]
    z = pts_cam[..., 2]
    norm_xy = xp.sqrt(xp.sum(xy * xy, axis=-1))
    safe_norm = xp.where(norm_xy == 0, 1.0, norm_xy)

    # FTHETA: r = distort(atan2(|xy|, -z)); sensor = r * xy / |xy|
    theta = xp.arctan2(norm_xy, -z)
    ftheta_sensor = (distort(cam, theta) / safe_norm)[..., None] * xy

    # RECTILINEAR: planar = xy / -z ; sensor = distortFactor(|planar|^2)*planar
    safe_z = xp.where(z == 0, -1e-20, z)
    planar = xy / (-safe_z)[..., None]
    r2 = xp.sum(planar * planar, axis=-1)
    rect_sensor = distort_factor(cam, r2)[..., None] * planar

    is_ftheta = (cam.lens_type == FTHETA)[..., None]
    return xp.where(is_ftheta, ftheta_sensor, rect_sensor)


def _sensor_to_camera(cam: Camera, sensor, xp):
    """Distorted sensor coords (..., 2) -> unit camera-space direction
    (..., 3) (Camera.h:264-284)."""
    sq = xp.sum(sensor * sensor, axis=-1)
    norm = xp.sqrt(sq)
    safe_norm = xp.where(norm == 0, 1.0, norm)
    r = undistort(cam, norm)
    angle = xp.where(cam.lens_type == FTHETA, r, xp.arctan(r))
    head = (xp.sin(angle) / safe_norm)[..., None] * sensor
    z = -xp.cos(angle)
    unit = xp.concatenate([head, z[..., None]], axis=-1)
    # degenerate center pixel -> optical axis
    center = xp.asarray([0.0, 0.0, -1.0], dtype=unit.dtype)
    return xp.where((sq == 0)[..., None], center, unit)


def _rotate(rotation, v, xp, transpose=False):
    """Apply a (...,3,3) rotation to (...,3) vectors with explicit mul/add —
    keeps the 3x3 apply on the VPU at full f32 (a bf16 MXU einsum costs ~3px
    at 2k resolution)."""
    if transpose:
        rows = [xp.sum(rotation[..., :, i] * v, axis=-1) for i in range(3)]
    else:
        rows = [xp.sum(rotation[..., i, :] * v, axis=-1) for i in range(3)]
    return xp.stack(rows, axis=-1)


def world_to_pixel(cam: Camera, pts_rig):
    """Rig-frame points (..., 3) -> pixel coords (..., 2) (Camera.h:133-140)."""
    xp = _xp(cam.position, pts_rig)
    pts_rig = xp.asarray(pts_rig)
    rel = pts_rig - cam.position
    pts_cam = _rotate(cam.rotation, rel, xp)
    sensor = _camera_to_sensor(cam, pts_cam, xp)
    return cam.focal * sensor + cam.principal


def pixel_to_camera(cam: Camera, pixel):
    """Pixel coords (..., 2) -> unit direction in camera space (..., 3)."""
    xp = _xp(cam.position, pixel)
    sensor = (xp.asarray(pixel) - cam.principal) / cam.focal
    return _sensor_to_camera(cam, sensor, xp)


def pixel_to_rig_direction(cam: Camera, pixel):
    """Pixel coords (..., 2) -> unit ray direction in rig space (..., 3);
    ray origin is cam.position (Camera.h:143-150)."""
    xp = _xp(cam.position, pixel)
    unit = pixel_to_camera(cam, pixel)
    return _rotate(cam.rotation, unit, xp, transpose=True)


def pixel_to_rig_near_infinity(cam: Camera, pixel):
    """Point kNearInfinity along the back-projected ray (Camera.h:153-155)."""
    return cam.position + NEAR_INFINITY * pixel_to_rig_direction(cam, pixel)


# ---------------------------------------------------------------------------
# visibility (Camera.h:157-181)
# ---------------------------------------------------------------------------


def is_behind(cam: Camera, pts_rig):
    xp = _xp(cam.position, pts_rig)
    v = xp.asarray(pts_rig) - cam.position
    return xp.sum(cam.backward * v, axis=-1) >= 0


def is_outside_fov(cam: Camera, pts_rig):
    xp = _xp(cam.position, pts_rig)
    v = xp.asarray(pts_rig) - cam.position
    dot = -xp.sum(cam.backward * v, axis=-1)
    general = dot * xp.abs(dot) <= cam.fov_threshold * xp.sum(v * v, axis=-1)
    return xp.where(cam.fov_threshold == -1.0, False, general)


def sees(cam: Camera, pts_rig):
    xp = _xp(cam.position, pts_rig)
    p = world_to_pixel(cam, pts_rig)
    in_frame = (
        (0 <= p[..., 0])
        & (p[..., 0] < cam.resolution[..., 0])
        & (0 <= p[..., 1])
        & (p[..., 1] < cam.resolution[..., 1])
    )
    return in_frame & ~is_outside_fov(cam, pts_rig)


def overlap(cam: Camera, other: Camera, probe_count: int = 10) -> float:
    """Fraction of cam's frame visible from ``other``, probed on a
    probe_count x probe_count grid (Camera.h:184-198). Host-side."""
    ij = np.stack(
        np.meshgrid(np.arange(probe_count), np.arange(probe_count)), axis=-1
    ).reshape(-1, 2).astype(np.float64)
    pix = ij / (probe_count - 1) * np.asarray(cam.resolution)
    pts = pixel_to_rig_near_infinity(cam, pix)
    return float(np.mean(np.asarray(sees(other, pts))))


def approximate_usable_pixels_radius(cam: Camera) -> float:
    """Closest approach of the fov cone to the image center, in pixels
    (Camera.h:201-212). Host-side."""
    fov = get_fov(cam)
    angles = np.arange(10) * (2 * np.pi / 10.0)
    ortho = (
        np.cos(angles)[:, None] * np.asarray(cam.right)
        + np.sin(angles)[:, None] * np.asarray(cam.up)
    )
    direction = np.cos(fov) * np.asarray(cam.forward) + np.sin(fov) * ortho
    pix = world_to_pixel(cam, np.asarray(cam.position) + direction)
    d = np.linalg.norm(pix - np.asarray(cam.resolution) / 2.0, axis=-1)
    return float(min(np.linalg.norm(np.asarray(cam.resolution)), d.min()))


# ---------------------------------------------------------------------------
# rotation parameterization (Camera.cpp:114-133) — traceable for calibration
# ---------------------------------------------------------------------------


def rotation_from_angle_axis(angle_axis, xp=jnp):
    """Rodrigues formula, safe at angle -> 0 (differentiable). The guard
    must not underflow in f32: divide by a where-protected angle (at
    angle ~ 0 the axis is irrelevant since sin/1-cos both vanish)."""
    angle_axis = xp.asarray(angle_axis)
    angle = xp.sqrt(xp.sum(angle_axis * angle_axis, axis=-1))
    safe_angle = xp.where(angle < 1e-12, 1.0, angle)
    axis = angle_axis / safe_angle[..., None]
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c = xp.cos(angle)
    s = xp.sin(angle)
    C = 1.0 - c
    rot = xp.stack(
        [
            xp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s], -1),
            xp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s], -1),
            xp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C], -1),
        ],
        axis=-2,
    )
    return rot


def angle_axis_from_rotation(rotation, xp=jnp):
    """Inverse of rotation_from_angle_axis (principal branch, angle in
    [0, pi]). Quaternion-based (Shepperd's method, branchless), so it is
    well-conditioned at both angle -> 0 and angle -> pi (the naive
    skew-vector formula returns 0/0 for the rig's 180-degree cameras)."""
    R = xp.asarray(rotation)
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = r00 + r11 + r22

    # four quaternion candidates (w, x, y, z), each stable in its region
    def cand_w():
        s = xp.sqrt(xp.maximum(1.0 + tr, 1e-20)) * 2.0
        return xp.stack(
            [0.25 * s, (r21 - r12) / s, (r02 - r20) / s, (r10 - r01) / s], -1
        )

    def cand_x():
        s = xp.sqrt(xp.maximum(1.0 + r00 - r11 - r22, 1e-20)) * 2.0
        return xp.stack(
            [(r21 - r12) / s, 0.25 * s, (r01 + r10) / s, (r02 + r20) / s], -1
        )

    def cand_y():
        s = xp.sqrt(xp.maximum(1.0 + r11 - r00 - r22, 1e-20)) * 2.0
        return xp.stack(
            [(r02 - r20) / s, (r01 + r10) / s, 0.25 * s, (r12 + r21) / s], -1
        )

    def cand_z():
        s = xp.sqrt(xp.maximum(1.0 + r22 - r00 - r11, 1e-20)) * 2.0
        return xp.stack(
            [(r10 - r01) / s, (r02 + r20) / s, (r12 + r21) / s, 0.25 * s], -1
        )

    scores = xp.stack([tr, r00, r11, r22], -1)
    best = xp.argmax(scores, axis=-1)[..., None]
    q = xp.where(
        best == 0,
        cand_w(),
        xp.where(best == 1, cand_x(), xp.where(best == 2, cand_y(), cand_z())),
    )
    q = q / xp.sqrt(xp.sum(q * q, axis=-1, keepdims=True))
    w = q[..., 0]
    v = q[..., 1:]
    vnorm = xp.sqrt(xp.sum(v * v, axis=-1))
    angle = 2.0 * xp.arctan2(vnorm, xp.abs(w))
    sign = xp.where(w < 0, -1.0, 1.0)
    safe = xp.where(vnorm < 1e-20, 1.0, vnorm)
    # angle -> 0 limit: aa = 2 v (since v ~ axis * angle/2)
    scale = xp.where(vnorm < 1e-20, 2.0, angle / safe)
    return v * (sign * scale)[..., None]


# ---------------------------------------------------------------------------
# ray triangulation (Camera.cpp:169-226)
# ---------------------------------------------------------------------------


def ray_midpoint(origin_a, dir_a, origin_b, dir_b, force_in_front=False, xp=np):
    """Midpoint of the closest approach of two rays; parallel (or
    behind-camera when force_in_front) degenerates to kNearInfinity along
    both rays, matching the reference midpoint() semantics."""
    origin_a, dir_a = xp.asarray(origin_a), xp.asarray(dir_a)
    origin_b, dir_b = xp.asarray(origin_b), xp.asarray(dir_b)

    def cross2(a, b):
        return -a[..., 1] * b[..., 0] + a[..., 0] * b[..., 1]

    # project onto the 2D basis spanned by the two directions
    fa = xp.stack(
        [xp.sum(dir_a * dir_a, -1), xp.sum(dir_b * dir_a, -1)], axis=-1
    )
    fb = xp.stack(
        [xp.sum(dir_a * dir_b, -1), xp.sum(dir_b * dir_b, -1)], axis=-1
    )
    diff = origin_a - origin_b
    fc = xp.stack([xp.sum(dir_a * diff, -1), xp.sum(dir_b * diff, -1)], axis=-1)
    det = cross2(fa, fb)
    safe_det = xp.where(xp.abs(det) < 1e-30, 1.0, det)
    ta = cross2(fb, fc) / safe_det
    tb = cross2(fa, fc) / safe_det
    degenerate = xp.abs(det) < 1e-30
    if force_in_front:
        degenerate = degenerate | (ta < 0) | (tb < 0)
    ta = xp.where(degenerate, NEAR_INFINITY, ta)
    tb = xp.where(degenerate, NEAR_INFINITY, tb)
    pa = origin_a + ta[..., None] * dir_a
    pb = origin_b + tb[..., None] * dir_b
    return (pa + pb) / 2.0


# ---------------------------------------------------------------------------
# (de)serialization — rig JSON format (RIG_JSON.md; Camera.cpp:44-110)
# ---------------------------------------------------------------------------


def camera_from_json(obj: dict) -> tuple[Camera, str, str]:
    """Parse one camera dict. Returns (Camera, id, group)."""
    if float(obj["version"]) < 1.0:
        raise ValueError("camera version must be >= 1")
    cam = make_camera(
        lens_type=obj["type"],
        position=obj["origin"],
        forward=obj["forward"],
        up=obj["up"],
        right=obj.get("right"),
        resolution=obj["resolution"],
        focal=obj["focal"],
        principal=obj.get("principal"),
        distortion=obj.get("distortion", (0.0, 0.0)),
        fov=obj.get("fov"),
    )
    return cam, str(obj["id"]), str(obj.get("group", ""))


def camera_to_json(cam: Camera, cam_id: str, group: str = "") -> dict:
    out = {
        "version": 1,
        "type": _TYPE_NAMES[int(cam.lens_type)],
        "origin": np.asarray(cam.position, dtype=float).tolist(),
        "forward": np.asarray(cam.forward, dtype=float).tolist(),
        "up": np.asarray(cam.up, dtype=float).tolist(),
        "right": np.asarray(cam.right, dtype=float).tolist(),
        "resolution": np.asarray(cam.resolution, dtype=float).tolist(),
        "principal": np.asarray(cam.principal, dtype=float).tolist(),
        "focal": np.asarray(cam.focal, dtype=float).tolist(),
        "id": cam_id,
    }
    if np.any(np.asarray(cam.distortion) != 0):
        out["distortion"] = np.asarray(cam.distortion, dtype=float).tolist()
    if not is_default_fov(cam):
        out["fov"] = get_fov(cam)
    if group:
        out["group"] = group
    return out


def create_rescaled_camera(cam: Camera, scale: float) -> Camera:
    """Camera equivalent to resizing the sensor by ``scale``
    (Camera.cpp:273-289): integer-truncated resolution, principal/focal
    scaled by the achieved per-axis ratio."""
    res = np.asarray(cam.resolution, dtype=np.float64)
    new_res = np.floor(res * scale)
    ratio = new_res / res
    return cam._replace(
        resolution=new_res.astype(res.dtype),
        principal=np.asarray(cam.principal) * ratio,
        focal=np.asarray(cam.focal) * ratio,
    )


def to_device(cam: Camera, dtype=jnp.float32) -> Camera:
    """Convert all float leaves to device arrays of ``dtype``."""
    return Camera(
        lens_type=jnp.asarray(cam.lens_type, dtype=jnp.int32),
        position=jnp.asarray(cam.position, dtype=dtype),
        rotation=jnp.asarray(cam.rotation, dtype=dtype),
        resolution=jnp.asarray(cam.resolution, dtype=dtype),
        principal=jnp.asarray(cam.principal, dtype=dtype),
        focal=jnp.asarray(cam.focal, dtype=dtype),
        distortion=jnp.asarray(cam.distortion, dtype=dtype),
        fov_threshold=jnp.asarray(cam.fov_threshold, dtype=dtype),
    )
