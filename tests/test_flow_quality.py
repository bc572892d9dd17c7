"""Flow-quality regression over the Middlebury-style synthetic scenes
(benchmarks/flow_quality.py). Absolute thresholds are set ~2x above the
recorded table values in BASELINE.md so real regressions fail while
platform noise doesn't. The shipped pixflow_tpu preset must beat the
no-flow midpoint baseline decisively on every scene."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from flow_quality import build_scene, interpolation_rmse, no_flow_rmse

# scene -> (max absolute RMSE, required improvement factor vs no-flow)
THRESHOLDS = {
    "translation": (0.006, 4.0),
    "rotation": (0.007, 2.0),
    "zoom": (0.006, 2.0),
    "shear": (0.0025, 1.5),
    "occlusion": (0.022, 1.3),
}


@pytest.mark.parametrize("scene", sorted(THRESHOLDS))
def test_pixflow_tpu_quality(scene):
    i0, i1, mid = build_scene(scene)
    base = no_flow_rmse(i0, i1, mid)
    rmse = interpolation_rmse(i0, i1, mid, "pixflow_tpu")
    max_abs, factor = THRESHOLDS[scene]
    assert rmse < max_abs, f"{scene}: RMSE {rmse:.4f} > {max_abs}"
    assert rmse < base / factor, (
        f"{scene}: RMSE {rmse:.4f} vs no-flow {base:.4f} (need {factor}x)"
    )


def test_offset_ranking_quality():
    """The opt-in shared-build offset-ranking preset must stay within the
    same quality envelope as the shipped pixflow_tpu (its candidate
    evaluation is the same math restructured around integer offsets)."""
    from benchmarks.flow_quality import (
        build_scene, interpolation_rmse, no_flow_rmse,
    )

    for scene in ("translation", "rotation"):
        i0, i1, mid = build_scene(scene)
        r_off = interpolation_rmse(i0, i1, mid, "pixflow_tpu_offsets")
        r_base = interpolation_rmse(i0, i1, mid, "pixflow_tpu")
        base = no_flow_rmse(i0, i1, mid)
        assert r_off < 0.6 * base, (scene, r_off, base)
        assert r_off < 2.0 * r_base + 1e-3, (scene, r_off, r_base)
