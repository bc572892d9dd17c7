"""Calibration CLI drivers.

Rebuilds of scripts/geometric_calibration.py, scripts/color_calibrate_all.py
and scripts/vignetting_calibrate.py as subcommands:

  python -m surround360_tpu.cli.calibrate geometric ...
  python -m surround360_tpu.cli.calibrate color ...
  python -m surround360_tpu.cli.calibrate vignetting ...

COLMAP remains an optional external feature/matcher (its sqlite database is
converted with colmap_db_to_matches_json); without it, the built-in ORB
matcher generates the match graph directly.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from .common import log, read_image_rgba, setup_logging


def run_geometric(args):
    from ..calib.geometric import (
        GeometricCalibrationConfig,
        calibrate_geometric,
        generate_artificial_points,
        perturb_rig,
    )
    from ..calib.matches import assemble_traces, load_matches_json, match_keypoints
    from ..geometry.rig import load_rig, save_rig

    rig = load_rig(args.rig_json)

    if args.unit_test:
        # synthetic self-test (GeometricCalibration --unit_test analog):
        # perturb the rig, recover it from artificial points, report RMSE
        obs, _ = generate_artificial_points(rig, args.num_points)
        bad = perturb_rig(rig, rotation_amount=args.perturb_rotation)
        cfg = GeometricCalibrationConfig(passes=args.pass_count)
        refined, report = calibrate_geometric(bad, obs, cfg, verbose=True)
        log.info("final report: %s", report)
        if args.output_json:
            save_rig(args.output_json, refined)
        return

    if args.matches_json:
        keypoints, matches = load_matches_json(args.matches_json)
        image_to_camera = {}
        for name in keypoints:
            stem = os.path.splitext(os.path.basename(name))[0]
            image_to_camera[name] = rig.ids.index(stem)
    else:
        # built-in matcher over the frame images
        keypoints, matches = {}, []
        images = {}
        for cam_id in rig.ids:
            path = os.path.join(args.frames_dir, cam_id + ".png")
            if not os.path.exists(path):
                path = os.path.join(
                    args.frames_dir, cam_id, f"{args.frame_number:06d}.png"
                )
            images[cam_id] = read_image_rgba(path)
        from ..geometry.camera import overlap as cam_overlap

        image_to_camera = {cam_id: i for i, cam_id in enumerate(rig.ids)}
        for i, id_a in enumerate(rig.ids):
            for j in range(i + 1, len(rig.ids)):
                id_b = rig.ids[j]
                if cam_overlap(rig.cameras[i], rig.cameras[j]) < 0.05:
                    continue
                pts_a, pts_b = match_keypoints(images[id_a], images[id_b])
                if len(pts_a) < 8:
                    continue
                base_a = len(keypoints.setdefault(id_a, np.zeros((0, 2))))
                base_b = len(keypoints.setdefault(id_b, np.zeros((0, 2))))
                keypoints[id_a] = np.concatenate([keypoints[id_a], pts_a])
                keypoints[id_b] = np.concatenate([keypoints[id_b], pts_b])
                matches.append(
                    (
                        id_a,
                        id_b,
                        np.stack(
                            [
                                base_a + np.arange(len(pts_a)),
                                base_b + np.arange(len(pts_b)),
                            ],
                            axis=1,
                        ),
                    )
                )

    obs = assemble_traces(keypoints, matches, image_to_camera)
    log.info(
        "assembled %d observations over %d traces", len(obs.cam_idx), obs.num_points
    )
    cfg = GeometricCalibrationConfig(passes=args.pass_count)
    refined, report = calibrate_geometric(rig, obs, cfg, verbose=True)
    log.info("final report: %s", report)
    save_rig(args.output_json, refined)


def run_color(args):
    from ..calib.color import (
        delta_e_report,
        detect_color_chart,
        solve_isp_color_params,
    )
    from ..isp import load_isp_config

    os.makedirs(args.output_isp_dir, exist_ok=True)
    for name in sorted(os.listdir(args.charts_dir)):
        if not name.lower().endswith((".png", ".tiff", ".tif", ".jpg")):
            continue
        serial = os.path.splitext(name)[0]
        img = read_image_rgba(os.path.join(args.charts_dir, name))[:3]
        centroids, medians = detect_color_chart(img)
        result = solve_isp_color_params(
            medians, centroids, illuminant=args.illuminant
        )
        base = (
            load_isp_config(args.base_isp_json)
            if args.base_isp_json
            else load_isp_config({"CameraIsp": {}})
        )
        import dataclasses

        cfg = dataclasses.replace(
            base,
            black_level=tuple(
                float(b * base.max_pixel_value) for b in result.black_level
            ),
            white_balance_gain=tuple(map(float, result.white_balance)),
            ccm=tuple(tuple(map(float, row)) for row in result.ccm),
        )
        out_path = os.path.join(args.output_isp_dir, f"{serial}.json")
        with open(out_path, "w") as f:
            json.dump(cfg.to_json(), f, indent=2)
        # quality report on corrected medians
        corrected = (
            (medians - result.black_level)
            / (1.0 - result.black_level)
            * result.white_balance
        ) @ np.asarray(result.ccm).T
        rep = delta_e_report(corrected, args.illuminant)
        log.info("%s: deltaE mean %.2f max %.2f -> %s",
                 serial, rep["mean"], rep["max"], out_path)


def run_vignetting(args):
    from ..calib.vignetting import acquire_vignetting_samples, fit_vignetting
    from ..isp import load_isp_config

    import dataclasses

    imgs = []
    for name in sorted(os.listdir(args.sweep_dir)):
        if name.lower().endswith((".png", ".tiff", ".tif")):
            imgs.append(read_image_rgba(os.path.join(args.sweep_dir, name))[1])
    locations, intensities = acquire_vignetting_samples(imgs)
    H, W = imgs[0].shape
    fit = fit_vignetting(locations, intensities, (W, H))
    log.info("vignetting fit rms residual: %.5f", fit.rms_residual)

    base = (
        load_isp_config(args.base_isp_json)
        if args.base_isp_json
        else load_isp_config({"CameraIsp": {}})
    )
    cfg = dataclasses.replace(
        base,
        vignette_rolloff_h=tuple(tuple(map(float, r)) for r in fit.rolloff_h),
        vignette_rolloff_v=tuple(tuple(map(float, r)) for r in fit.rolloff_v),
    )
    os.makedirs(os.path.dirname(args.output_isp_json) or ".", exist_ok=True)
    with open(args.output_isp_json, "w") as f:
        json.dump(cfg.to_json(), f, indent=2)
    log.info("wrote %s", args.output_isp_json)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("geometric")
    g.add_argument("--rig_json", required=True)
    g.add_argument("--output_json", default="")
    g.add_argument("--matches_json", default="")
    g.add_argument("--frames_dir", default="")
    g.add_argument("--frame_number", type=int, default=0)
    g.add_argument("--pass_count", type=int, default=10)
    g.add_argument("--unit_test", action="store_true")
    g.add_argument("--num_points", type=int, default=1000)
    g.add_argument("--perturb_rotation", type=float, default=0.01)

    c = sub.add_parser("color")
    c.add_argument("--charts_dir", required=True)
    c.add_argument("--output_isp_dir", required=True)
    c.add_argument("--illuminant", default="D50", choices=["D50", "D65"])
    c.add_argument("--base_isp_json", default="")

    v = sub.add_parser("vignetting")
    v.add_argument("--sweep_dir", required=True)
    v.add_argument("--output_isp_json", required=True)
    v.add_argument("--base_isp_json", default="")

    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)
    setup_logging(getattr(args, "verbose", False))
    if args.cmd == "geometric":
        run_geometric(args)
    elif args.cmd == "color":
        run_color(args)
    else:
        run_vignetting(args)


if __name__ == "__main__":
    main()
