"""Geometric rig calibration: bundle adjustment of the rig JSON.

Rebuild of surround360_render/source/calibration/GeometricCalibration.{h,cpp}
with Ceres replaced by a JAX-native Levenberg-Marquardt solver:

- residuals are the reference's ReprojectionFunctor
  (GeometricCalibration.h:31-102): project the world point through the
  parameterized camera and subtract the observed pixel; all residuals and
  their Jacobians come from one vmapped jacfwd evaluation;
- the normal equations use the standard bundle-adjustment Schur complement
  (3x3 point blocks eliminated), so the solve scales with camera count;
- pass structure matches refine() (GeometricCalibration.cpp:794-895):
  pass 0 locks position+focal+distortion, later passes optionally lock
  positions only; outliers are culled between passes at
  ``outlier_factor x median`` reprojection error
  (removeOutliers, GeometricCalibration.cpp:344-388);
- robustness via Huber IRLS (the --robust flag's loss);
- the synthetic self-test trio (generateArtificalPoints, perturbCameras,
  RMSE-vs-ground-truth report, GeometricCalibration.cpp:115-129, :235-268,
  :613-689) is reproduced for hardware-free validation.

Camera parameterization per camera (9 + 2 shared-able):
position(3), rotation angle-axis(3), principal(2), scalar focal(1),
distortion(2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import (
    Camera,
    NEAR_INFINITY,
    angle_axis_from_rotation,
    pixel_to_rig_direction,
    ray_midpoint,
    rotation_from_angle_axis,
    world_to_pixel,
)
from ..geometry.rig import Rig, stack_cameras

__all__ = [
    "CalibrationObservations",
    "GeometricCalibrationConfig",
    "calibrate_geometric",
    "generate_artificial_points",
    "perturb_rig",
    "reprojection_report",
]


@dataclass
class CalibrationObservations:
    """Flattened trace observations: observation k is (camera cam_idx[k]
    sees world point pt_idx[k] at pixel pixels[k])."""

    cam_idx: np.ndarray  # (M,) int32
    pt_idx: np.ndarray  # (M,) int32
    pixels: np.ndarray  # (M, 2) float64
    num_points: int

    def cull(self, keep: np.ndarray) -> "CalibrationObservations":
        # drop observations, re-index surviving points densely
        cam_idx = self.cam_idx[keep]
        pt_idx = self.pt_idx[keep]
        pixels = self.pixels[keep]
        # keep only points with >= 2 observations
        counts = np.bincount(pt_idx, minlength=self.num_points)
        ok_pts = counts >= 2
        keep2 = ok_pts[pt_idx]
        cam_idx, pt_idx, pixels = cam_idx[keep2], pt_idx[keep2], pixels[keep2]
        remap = -np.ones(self.num_points, dtype=np.int64)
        used = np.unique(pt_idx)
        remap[used] = np.arange(len(used))
        return CalibrationObservations(
            cam_idx, remap[pt_idx].astype(np.int32), pixels, len(used)
        )


@dataclass
class GeometricCalibrationConfig:
    passes: int = 10
    lock_positions: bool = True  # pass 0 always locks positions
    lock_focal: bool = False  # lock focal beyond pass 0
    lock_distortion: bool = False  # lock distortion beyond pass 0
    lock_principal: bool = False  # rotation/principal degenerate on sparse
    # overlap-only match graphs; lock when matches don't span the frame
    outlier_factor: float = 5.0
    robust: bool = True
    huber_delta: float = 1.0  # px
    lm_iterations: int = 20
    lm_lambda0: float = 1e-3
    shared_distortion: bool = True


# --------------------------------------------------------------------------
# parameter packing
# --------------------------------------------------------------------------


def _rig_to_params(rig: Rig) -> np.ndarray:
    """(N, 11) per-camera parameter rows."""
    rows = []
    for cam in rig.cameras:
        aa = angle_axis_from_rotation(np.asarray(cam.rotation), xp=np)
        focal = float(np.asarray(cam.focal)[0])
        rows.append(
            np.concatenate(
                [
                    np.asarray(cam.position, dtype=np.float64),
                    np.asarray(aa, dtype=np.float64),
                    np.asarray(cam.principal, dtype=np.float64),
                    [focal],
                    np.asarray(cam.distortion, dtype=np.float64),
                ]
            )
        )
    return np.stack(rows)


def _params_to_rig(rig: Rig, params: np.ndarray) -> Rig:
    cams = []
    for cam, row in zip(rig.cameras, params):
        rot = rotation_from_angle_axis(row[3:6], xp=np)
        cams.append(
            cam._replace(
                position=row[0:3],
                rotation=rot,
                principal=row[6:8],
                focal=np.array([row[8], -row[8]]),
                distortion=row[9:11],
            )
        )
    return Rig(cams, list(rig.ids), list(rig.groups), rig.filename)


def _project_params(row, lens_type, resolution, fov_threshold, point):
    """Differentiable projection of one world point through a camera
    parameter row (the ReprojectionFunctor's model)."""
    cam = Camera(
        lens_type=lens_type,
        position=row[0:3],
        rotation=rotation_from_angle_axis(row[3:6]),
        resolution=resolution,
        principal=row[6:8],
        focal=jnp.stack([row[8], -row[8]]),
        distortion=row[9:11],
        fov_threshold=fov_threshold,
    )
    return world_to_pixel(cam, point)


# --------------------------------------------------------------------------
# triangulation + outliers (GeometricCalibration.h:160-185, .cpp:344-388)
# --------------------------------------------------------------------------


def triangulate_points(rig: Rig, obs: CalibrationObservations) -> np.ndarray:
    """Initial world points: per trace, midpoint of the first two
    observation rays (the reference's nonlinear triangulation is then
    absorbed by the world-point blocks of the BA itself)."""
    pts = np.zeros((obs.num_points, 3))
    stacked = stack_cameras(rig.cameras)
    dirs = np.zeros((len(obs.cam_idx), 3))
    origins = np.zeros((len(obs.cam_idx), 3))
    for k in range(len(obs.cam_idx)):
        cam = rig.cameras[obs.cam_idx[k]]
        dirs[k] = pixel_to_rig_direction(cam, obs.pixels[k])
        origins[k] = np.asarray(cam.position)
    for p in range(obs.num_points):
        sel = np.nonzero(obs.pt_idx == p)[0]
        if len(sel) >= 2:
            a, b = sel[0], sel[1]
            pts[p] = ray_midpoint(
                origins[a], dirs[a], origins[b], dirs[b], force_in_front=True
            )
        else:
            pts[p] = origins[sel[0]] + dirs[sel[0]] * NEAR_INFINITY
    return pts


def _residuals_fn(rig: Rig, obs: CalibrationObservations):
    lens_types = jnp.asarray(
        [int(c.lens_type) for c in rig.cameras], jnp.int32
    )
    resolutions = jnp.asarray(
        np.stack([np.asarray(c.resolution) for c in rig.cameras])
    )
    fovs = jnp.asarray([float(c.fov_threshold) for c in rig.cameras])
    cam_idx = jnp.asarray(obs.cam_idx)
    pt_idx = jnp.asarray(obs.pt_idx)
    measured = jnp.asarray(obs.pixels)

    def per_obs(cam_row, point, k):
        return (
            _project_params(
                cam_row,
                lens_types[cam_idx[k]],
                resolutions[cam_idx[k]],
                fovs[cam_idx[k]],
                point,
            )
            - measured[k]
        )

    def residuals(cam_params, points):
        ks = jnp.arange(len(obs.cam_idx))
        return jax.vmap(
            lambda k: per_obs(cam_params[cam_idx[k]], points[pt_idx[k]], k)
        )(ks)

    def res_and_jac(cam_params, points):
        ks = jnp.arange(len(obs.cam_idx))

        def one(k):
            row = cam_params[cam_idx[k]]
            pt = points[pt_idx[k]]
            r = per_obs(row, pt, k)
            Jc = jax.jacfwd(lambda rr: per_obs(rr, pt, k))(row)
            Jp = jax.jacfwd(lambda pp: per_obs(row, pp, k))(pt)
            return r, Jc, Jp

        return jax.vmap(one)(ks)

    return jax.jit(residuals), jax.jit(res_and_jac)


# --------------------------------------------------------------------------
# the LM solver with Schur complement
# --------------------------------------------------------------------------


def _lm_solve(
    cam_params,
    points,
    res_and_jac,
    residuals_fn,
    free_mask,  # (N, 11) bool: which camera params move
    cam_idx,
    pt_idx,
    cfg: GeometricCalibrationConfig,
):
    """Levenberg-Marquardt with the bundle-adjustment Schur complement:
    eliminate the block-diagonal 3x3 point blocks, solve the reduced
    camera system, back-substitute."""
    n_cams, n_par = cam_params.shape
    n_pts = len(points)
    lam = cfg.lm_lambda0
    ci = np.asarray(cam_idx)
    pi = np.asarray(pt_idx)

    def total_cost(cp, pts):
        r = np.asarray(residuals_fn(jnp.asarray(cp), jnp.asarray(pts)))
        e = np.linalg.norm(r, axis=1)
        if cfg.robust:
            d = cfg.huber_delta
            c = np.where(e <= d, 0.5 * e**2, d * (e - 0.5 * d))
            return float(c.sum())
        return float(0.5 * (e**2).sum())

    cost = total_cost(cam_params, points)
    for _ in range(cfg.lm_iterations):
        r, Jc, Jp = res_and_jac(jnp.asarray(cam_params), jnp.asarray(points))
        r = np.asarray(r, np.float64)  # (M, 2)
        Jc = np.asarray(Jc, np.float64)  # (M, 2, 11)
        Jp = np.asarray(Jp, np.float64)  # (M, 2, 3)

        if cfg.robust:
            # Huber IRLS weights
            e = np.linalg.norm(r, axis=1, keepdims=True)
            w = np.sqrt(
                np.where(
                    e <= cfg.huber_delta,
                    1.0,
                    cfg.huber_delta / np.maximum(e, 1e-12),
                )
            )
            r = r * w
            Jc = Jc * w[:, :, None]
            Jp = Jp * w[:, :, None]

        # zero locked camera-parameter columns per observation's camera
        Jc = Jc * free_mask[ci][:, None, :]

        # normal-equation blocks
        B = np.zeros((n_cams, n_par, n_par))  # per-camera diagonal blocks
        np.add.at(B, ci, np.einsum("mri,mrj->mij", Jc, Jc))
        C = np.zeros((n_pts, 3, 3))
        np.add.at(C, pi, np.einsum("mri,mrj->mij", Jp, Jp))
        gc = np.zeros((n_cams, n_par))
        np.add.at(gc, ci, np.einsum("mri,mr->mi", Jc, r))
        gp = np.zeros((n_pts, 3))
        np.add.at(gp, pi, np.einsum("mri,mr->mi", Jp, r))
        # E is sparse over (cam, point) pairs; keep per-observation form
        E_obs = np.einsum("mri,mrj->mij", Jc, Jp)  # (M, 11, 3)

        improved = False
        for _try in range(6):
            Cd = C + lam * np.eye(3)[None]
            Cinv = np.linalg.inv(Cd + 1e-12 * np.eye(3)[None])

            # Schur complement assembled over observation pairs:
            # S = B_damped - sum_obs E C^-1 E'^T aggregated per (cam, cam')
            # pairs; observations of the same point from different cameras
            # couple those cameras.
            n_flat = n_cams * n_par
            S = np.zeros((n_flat, n_flat))
            for c in range(n_cams):
                blk = B[c].copy()
                blk[np.diag_indices(n_par)] *= 1.0 + lam
                blk[np.diag_indices(n_par)] += 1e-9
                S[c * n_par : (c + 1) * n_par, c * n_par : (c + 1) * n_par] = blk
            EC = np.einsum("mij,mjk->mik", E_obs, Cinv[pi])  # (M, 11, 3)
            # for each pair of observations (a, b) of the same point:
            # S[ca, cb] -= EC_a @ E_b^T; observations per point are few
            # (<= n_cams), so loop per point over its observations
            from collections import defaultdict

            by_point = defaultdict(list)
            for m, p in enumerate(pi):
                by_point[int(p)].append(m)
            for p, ms in by_point.items():
                for a in ms:
                    ca = ci[a]
                    for b in ms:
                        cb = ci[b]
                        S[
                            ca * n_par : (ca + 1) * n_par,
                            cb * n_par : (cb + 1) * n_par,
                        ] -= EC[a] @ E_obs[b].T
            v = gc.reshape(-1).copy()
            for p, ms in by_point.items():
                for a in ms:
                    ca = ci[a]
                    v[ca * n_par : (ca + 1) * n_par] -= EC[a] @ gp[p]

            mask_flat = free_mask.reshape(-1)
            S_f = S[np.ix_(mask_flat, mask_flat)]
            v_f = v[mask_flat]
            try:
                dc_f = np.linalg.solve(S_f, -v_f)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            dc = np.zeros(n_flat)
            dc[mask_flat] = dc_f
            dc = dc.reshape(n_cams, n_par)
            # back-substitute points: dp = -C^-1 (gp + sum_obs E^T dc)
            rhs = gp.copy()
            np.add.at(
                rhs, pi, np.einsum("mij,mi->mj", E_obs, dc[ci])
            )
            dp = -np.einsum("pkl,pl->pk", Cinv, rhs)

            new_cams = cam_params + dc
            new_pts = points + dp
            new_cost = total_cost(new_cams, new_pts)
            if new_cost < cost:
                cam_params, points, cost = new_cams, new_pts, new_cost
                lam = max(lam / 10, 1e-9)
                improved = True
                break
            lam *= 10
        if not improved:
            break
    return cam_params, points, cost


def reprojection_errors(rig: Rig, obs: CalibrationObservations, points):
    residuals_fn, _ = _residuals_fn(rig, obs)
    r = np.asarray(
        residuals_fn(jnp.asarray(_rig_to_params(rig)), jnp.asarray(points))
    )
    return np.linalg.norm(r, axis=1)


def reprojection_report(errors: np.ndarray) -> dict:
    """RMSE / median / percentile report (getCameraRmseReport-style,
    GeometricCalibration.cpp:582-607)."""
    e = np.sort(errors)
    return {
        "count": len(e),
        "rmse": float(np.sqrt(np.mean(e**2))),
        "median": float(np.median(e)),
        "p90": float(e[int(len(e) * 0.9)]) if len(e) else 0.0,
        "p99": float(e[int(len(e) * 0.99)]) if len(e) else 0.0,
        "worst": float(e[-1]) if len(e) else 0.0,
    }


def calibrate_geometric(
    rig: Rig,
    obs: CalibrationObservations,
    cfg: GeometricCalibrationConfig | None = None,
    verbose: bool = False,
):
    """Run the multi-pass refine loop. Returns (refined rig, final report)."""
    cfg = cfg or GeometricCalibrationConfig()

    points = triangulate_points(rig, obs)
    cam_params = _rig_to_params(rig)

    report = None
    for pass_idx in range(cfg.passes):
        # outlier cull at factor x median before each solve (refine(),
        # GeometricCalibration.cpp:802-813 culls per pass, including the
        # first — aliased gross outliers otherwise bend the cameras)
        errors = reprojection_errors(
            _params_to_rig(rig, cam_params), obs, points
        )
        med = np.median(errors)
        keep = errors <= cfg.outlier_factor * max(med, 1e-9)
        if keep.sum() < len(keep):
            obs = obs.cull(keep)
            points = triangulate_points(
                _params_to_rig(rig, cam_params), obs
            )

        residuals_fn, res_and_jac = _residuals_fn(rig, obs)

        # parameter locking (GeometricCalibration.cpp:860-875): camera 0
        # fully locked as gauge; pass 0 locks position/focal/distortion
        free = np.ones((len(rig.cameras), 11), dtype=bool)
        if pass_idx == 0 or cfg.lock_positions:
            free[:, 0:3] = False
        if pass_idx == 0 or cfg.lock_focal:
            free[:, 8] = False  # focal
        if pass_idx == 0 or cfg.lock_distortion:
            free[:, 9:11] = False  # distortion
        if cfg.lock_principal:
            free[:, 6:8] = False
        free[0, :] = False

        cam_params, points, cost = _lm_solve(
            cam_params,
            points,
            res_and_jac,
            residuals_fn,
            free,
            obs.cam_idx,
            obs.pt_idx,
            cfg,
        )
        errors = reprojection_errors(
            _params_to_rig(rig, cam_params), obs, points
        )
        report = reprojection_report(errors)
        if verbose:
            print(f"pass {pass_idx}: {report}")

    return _params_to_rig(rig, cam_params), report


# --------------------------------------------------------------------------
# synthetic self-test inputs (GeometricCalibration.cpp:115-129, :235-268)
# --------------------------------------------------------------------------


def generate_artificial_points(
    rig: Rig,
    num_points: int = 1000,
    distance: float = 1000.0,
    seed: int = 0,
    noise_px: float = 0.0,
) -> tuple[CalibrationObservations, np.ndarray]:
    """Fabricate world points on a sphere and their observations in every
    camera that sees them (>= 2 views kept)."""
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(num_points, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    world = dirs * distance

    cam_idx, pt_idx, pixels = [], [], []
    from ..geometry.camera import sees

    for ci, cam in enumerate(rig.cameras):
        vis = np.asarray(sees(cam, world))
        pix = np.asarray(world_to_pixel(cam, world))
        for p in np.nonzero(vis)[0]:
            cam_idx.append(ci)
            pt_idx.append(p)
            pixels.append(pix[p] + rng.normal(size=2) * noise_px)
    obs = CalibrationObservations(
        np.asarray(cam_idx, np.int32),
        np.asarray(pt_idx, np.int32),
        np.asarray(pixels, np.float64),
        num_points,
    ).cull(np.ones(len(cam_idx), bool))
    return obs, world


def perturb_rig(
    rig: Rig,
    rotation_amount: float = 0.01,
    principal_amount: float = 2.0,
    seed: int = 1,
) -> Rig:
    """Corrupt the rig like perturbCameras (GeometricCalibration.cpp:115-129)."""
    rng = np.random.default_rng(seed)
    cams = []
    for i, cam in enumerate(rig.cameras):
        if i == 0:
            cams.append(cam)  # gauge camera stays
            continue
        aa = angle_axis_from_rotation(np.asarray(cam.rotation), xp=np)
        aa = aa + rng.normal(size=3) * rotation_amount
        cams.append(
            cam._replace(
                rotation=rotation_from_angle_axis(aa, xp=np),
                principal=np.asarray(cam.principal)
                + rng.normal(size=2) * principal_amount,
            )
        )
    return Rig(cams, list(rig.ids), list(rig.groups), rig.filename)
