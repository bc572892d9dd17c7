"""Rig description: load/save rig JSON, side/top/bottom camera selection.

TPU-native rebuild of surround360_render/source/render/RigDescription.{h,cpp}
plus a parametric rig generator (the reference ships a CAD-derived
res/config/camera_rig.json; we synthesize geometrically equivalent rigs from
first principles so tests and the capture simulator need no checked-in data).

For device code, ``stack_cameras`` turns a list of Camera pytrees into one
batched Camera (struct-of-arrays) that vmaps/shards across a mesh axis.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from .camera import (
    FTHETA,
    RECTILINEAR,
    Camera,
    camera_from_json,
    camera_to_json,
    make_camera,
)


def stack_cameras(cams: list[Camera], dtype=None) -> Camera:
    """Stack N cameras into one batched Camera pytree (leading dim N)."""
    arrs = [np.stack([np.asarray(getattr(c, f), dtype=dtype) for c in cams]) for f in Camera._fields]
    return Camera(*arrs)


@dataclass
class Rig:
    """A parsed rig: cameras plus ids/groups, with the same selection rules
    as RigDescription (RigDescription.cpp:18-78)."""

    cameras: list[Camera]
    ids: list[str]
    groups: list[str]
    filename: str = ""
    _side_idx: list[int] = field(default_factory=list)

    def __post_init__(self):
        self._side_idx = [
            i for i, g in enumerate(self.groups) if "side" in g
        ]
        if not self._side_idx:
            raise ValueError("rig has no side cameras")

    # -- selection (RigDescription.cpp:30-78) --------------------------------
    @property
    def side_cameras(self) -> list[Camera]:
        return [self.cameras[i] for i in self._side_idx]

    @property
    def side_ids(self) -> list[str]:
        return [self.ids[i] for i in self._side_idx]

    @property
    def side_camera_count(self) -> int:
        return len(self._side_idx)

    def _dist_cam_axis_to_rig_center(self, cam: Camera) -> float:
        # distance from the camera's optical-axis line to the rig center
        pos = np.asarray(cam.position, dtype=np.float64)
        fwd = np.asarray(cam.forward, dtype=np.float64)
        return float(np.linalg.norm(np.cross(pos, fwd)))

    def find_camera_by_direction(
        self, direction, dist_cam_axis_to_rig_center_max: float = 1.0
    ) -> int:
        direction = np.asarray(direction, dtype=np.float64)
        best = None
        best_dot = -np.inf
        for i, cam in enumerate(self.cameras):
            if self._dist_cam_axis_to_rig_center(cam) > dist_cam_axis_to_rig_center_max:
                continue
            dot = float(np.dot(np.asarray(cam.forward), direction))
            if best is None or dot > best_dot:
                best, best_dot = i, dot
        assert best is not None, "no camera matches direction constraint"
        return best

    @property
    def top_camera_index(self) -> int:
        return self.find_camera_by_direction([0.0, 0.0, 1.0])

    @property
    def bottom_camera_index(self) -> int:
        return self.find_camera_by_direction([0.0, 0.0, -1.0])

    @property
    def bottom_camera2_index(self) -> int:
        # secondary bottom camera = largest distance cam axis to rig center
        dists = [self._dist_cam_axis_to_rig_center(c) for c in self.cameras]
        return int(np.argmax(dists))

    @property
    def ring_radius(self) -> float:
        return float(np.linalg.norm(np.asarray(self.side_cameras[0].position)))

    def camera_by_id(self, cam_id: str) -> Camera:
        return self.cameras[self.ids.index(cam_id)]

    def stacked_side_cameras(self, dtype=np.float32) -> Camera:
        return stack_cameras(self.side_cameras, dtype=None)

    def rescaled(self, scale: float) -> "Rig":
        """Rig with every camera rescaled (createRescaledCamera,
        Camera.cpp:273-289) — e.g. for preview-resolution rendering."""
        from .camera import create_rescaled_camera

        return Rig(
            cameras=[create_rescaled_camera(c, scale) for c in self.cameras],
            ids=list(self.ids),
            groups=list(self.groups),
            filename=self.filename,
        )


def load_rig(filename: str) -> Rig:
    with open(filename) as f:
        obj = json.load(f)
    cams, ids, groups = [], [], []
    for c in obj["cameras"]:
        cam, cam_id, group = camera_from_json(c)
        cams.append(cam)
        ids.append(cam_id)
        groups.append(group)
    return Rig(cameras=cams, ids=ids, groups=groups, filename=filename)


def save_rig(filename: str, rig: Rig) -> None:
    out = {
        "cameras": [
            camera_to_json(c, i, g)
            for c, i, g in zip(rig.cameras, rig.ids, rig.groups)
        ]
    }
    with open(filename, "w") as f:
        json.dump(out, f, indent=2)


def make_ring_rig(
    num_side_cameras: int = 14,
    ring_radius_cm: float = 21.8,
    side_resolution=(2048, 2048),
    side_fov_degrees: float = 77.8,
    fisheye_resolution=(2048, 2048),
    fisheye_fov_degrees: float = 185.0,
    vertical_offset_cm: float = 13.1,
    bottom2_offset_cm: float = 9.8,
    distortion=(0.0, 0.0),
) -> Rig:
    """Generate a Surround360-style rig: ``num_side_cameras`` RECTILINEAR
    cameras evenly spaced on a horizontal ring facing outward (+z up,
    camera 'up' = world +z), one upward FTHETA top camera, one downward
    FTHETA primary bottom camera, and one downward FTHETA secondary bottom
    camera laterally offset for pole removal. Geometry parameterized after
    the layout described in RIG_JSON.md and res/config/camera_rig.json
    (17-camera reference rig), but computed, not copied.
    """
    cams, ids, groups = [], [], []

    # top camera: cam0, looking up
    half_fov = np.deg2rad(fisheye_fov_degrees) / 2.0
    f_fisheye = fisheye_resolution[0] / np.deg2rad(fisheye_fov_degrees)
    cams.append(
        make_camera(
            FTHETA,
            position=[0.0, 0.0, vertical_offset_cm],
            forward=[0.0, 0.0, 1.0],
            up=[0.0, 1.0, 0.0],
            resolution=fisheye_resolution,
            focal=[f_fisheye, -f_fisheye],
            fov=half_fov,
        )
    )
    ids.append("cam0")
    groups.append("")

    # side ring: cam1..camN, forward = radially outward, up = +z
    f_side = (side_resolution[0] / 2.0) / np.tan(np.deg2rad(side_fov_degrees) / 2.0)
    for i in range(num_side_cameras):
        angle = -2.0 * np.pi * i / num_side_cameras  # clockwise like reference
        fwd = np.array([np.cos(angle), np.sin(angle), 0.0])
        cams.append(
            make_camera(
                RECTILINEAR,
                position=ring_radius_cm * fwd,
                forward=fwd,
                up=[0.0, 0.0, 1.0],
                resolution=side_resolution,
                focal=[f_side, -f_side],
                distortion=distortion,
            )
        )
        ids.append(f"cam{i + 1}")
        groups.append("side camera")

    # primary bottom: looking down, centered
    cams.append(
        make_camera(
            FTHETA,
            position=[0.0, 0.0, -vertical_offset_cm],
            forward=[0.0, 0.0, -1.0],
            up=[0.0, 1.0, 0.0],
            resolution=fisheye_resolution,
            focal=[f_fisheye, -f_fisheye],
            fov=half_fov,
        )
    )
    ids.append(f"cam{num_side_cameras + 1}")
    groups.append("")

    # secondary bottom: looking down, offset from center (sees behind pole)
    cams.append(
        make_camera(
            FTHETA,
            position=[0.0, bottom2_offset_cm, -vertical_offset_cm],
            forward=[0.0, 0.0, -1.0],
            up=[0.0, -1.0, 0.0],
            resolution=fisheye_resolution,
            focal=[f_fisheye, -f_fisheye],
            fov=half_fov,
        )
    )
    ids.append(f"cam{num_side_cameras + 2}")
    groups.append("")

    return Rig(cameras=cams, ids=ids, groups=groups)
