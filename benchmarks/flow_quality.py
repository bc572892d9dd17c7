"""Flow-quality table: pixflow_tpu vs pixflow_low (vs no-flow baseline).

Synthetic stand-in for the reference's Middlebury frame-interpolation RMSE
harness (TestOpticalFlow.cpp:165-226 — the dataset isn't redistributable).
Each scene warps a textured image by a known transform; flow quality is
measured as the reference does: render the midpoint frame by warping I0
along half the estimated I1->I0 flow and RMSE it against the analytic
midpoint (generateNovelViewSimpleCvRemap, NovelView.cpp:27-45).

Usage: python benchmarks/flow_quality.py   (CPU; prints the table)
The regression test tests/test_flow_quality.py consumes these scenes.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _texture(h, w, seed, sigma=1.5):
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.random((h, w)).astype(np.float32)
    # multi-scale texture: pure blurred noise lacks large-scale structure
    low = cv2.GaussianBlur(rng.random((h, w)).astype(np.float32), (0, 0), 8)
    return 0.6 * cv2.GaussianBlur(img, (0, 0), sigma) + 0.4 * low


def _affine_scene(name, h=120, w=160, seed=3):
    """Returns (i0, i1, midpoint_truth) for an affine motion scene.
    Transforms are mild, comparable to inter-camera overlap motion."""
    import cv2

    big = _texture(h * 2, w * 2, seed)
    cx, cy = w, h

    def mat(t):
        if name == "translation":
            return np.float32([[1, 0, 6.0 * t], [0, 1, 2.0 * t]])
        if name == "rotation":
            return cv2.getRotationMatrix2D((cx, cy), 4.0 * t, 1.0)
        if name == "zoom":
            return cv2.getRotationMatrix2D((cx, cy), 0.0, 1.0 + 0.06 * t)
        if name == "shear":
            return np.float32(
                [[1, 0.05 * t, -0.05 * t * cy], [0, 1, 0]]
            )
        raise ValueError(name)

    def render(t):
        warped = cv2.warpAffine(
            big, mat(t), (w * 2, h * 2), flags=cv2.INTER_CUBIC
        )
        return warped[h // 2 : h // 2 + h, w // 2 : w // 2 + w]

    return render(0.0), render(1.0), render(0.5)


def _occlusion_scene(h=120, w=160, seed=4):
    """Foreground square translating over a differently-moving background."""
    bg = _texture(h * 2, w * 2, seed)
    fg = _texture(h, w, seed + 1, sigma=0.8)

    def render(t):
        ox, oy = int(round(4 * t)), 0  # background moves +4 px in x
        frame = bg[
            h // 2 + oy : h // 2 + oy + h, w // 2 - ox : w // 2 - ox + w
        ].copy()
        # foreground moves the other way, -8 px
        fx = int(round(w * 0.35 - 8 * t))
        fy = int(round(h * 0.3))
        fh, fw = h // 3, w // 4
        frame[fy : fy + fh, fx : fx + fw] = fg[:fh, :fw] * 0.7 + 0.3
        return frame

    return render(0.0), render(1.0), render(0.5)


SCENES = ["translation", "rotation", "zoom", "shear", "occlusion"]


def build_scene(name):
    if name == "occlusion":
        return _occlusion_scene()
    return _affine_scene(name)


def interpolation_rmse(i0, i1, mid_truth, preset):
    import jax.numpy as jnp

    from surround360_tpu.flow import compute_flow, make_flow_params
    from surround360_tpu.ops import remap

    def rgba(g):
        return jnp.asarray(
            np.stack([g, g, g, np.ones_like(g)], 0)[None]
        )

    f10 = compute_flow(rgba(i1), rgba(i0), make_flow_params(preset))
    H, W = i0.shape
    gy, gx = np.meshgrid(
        np.arange(H, dtype=np.float32),
        np.arange(W, dtype=np.float32),
        indexing="ij",
    )
    coords = jnp.asarray(np.stack([gx, gy])[None]) + 0.5 * f10
    mid = remap(rgba(i0)[:, :1], coords, interpolation="bicubic")
    err = np.asarray(mid)[0, 0, 10:-10, 10:-10] - mid_truth[10:-10, 10:-10]
    return float(np.sqrt(np.mean(err * err)))


def no_flow_rmse(i0, i1, mid_truth):
    err = (0.5 * (i0 + i1) - mid_truth)[10:-10, 10:-10]
    return float(np.sqrt(np.mean(err * err)))


def main():
    rows = []
    for scene in SCENES:
        i0, i1, mid = build_scene(scene)
        base = no_flow_rmse(i0, i1, mid)
        r_tpu = interpolation_rmse(i0, i1, mid, "pixflow_tpu")
        r_low = interpolation_rmse(i0, i1, mid, "pixflow_low")
        rows.append((scene, base, r_low, r_tpu))
    print(f"{'scene':<12} {'no-flow':>9} {'pixflow_low':>12} "
          f"{'pixflow_tpu':>12} {'tpu/low':>8}")
    for scene, base, r_low, r_tpu in rows:
        print(
            f"{scene:<12} {base:9.4f} {r_low:12.4f} {r_tpu:12.4f} "
            f"{r_tpu / max(r_low, 1e-9):8.2f}"
        )


if __name__ == "__main__":
    sys.exit(main())
