"""End-to-end pole removal on a synthetic two-bottom-camera fixture.

The reference ships per-camera pole masks and a standalone tool
(res/pole_masks/cam15.png, source/test/TestPoleRemoval.cpp:43-80). Here the
capture simulator renders both bottom cameras, a synthetic "pole" is
painted into each at different image positions (the physical pole occludes
each camera differently), and combine_bottom_images_with_pole_removal must
reconstruct the clean plate under the primary's mask from the secondary's
data (PoleRemoval.cpp:32-188).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from surround360_tpu.capture import render_camera_views
from surround360_tpu.flow import make_flow_params
from surround360_tpu.geometry.camera import approximate_usable_pixels_radius
from surround360_tpu.geometry.rig import make_ring_rig
from surround360_tpu.render.pole import (
    combine_bottom_images_with_pole_removal,
)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


@pytest.fixture(scope="module")
def fixture():
    rig = make_ring_rig().rescaled(0.125)  # 256px cameras
    views = render_camera_views(rig)
    cam1 = rig.cameras[rig.bottom_camera_index]
    cam2 = rig.cameras[rig.bottom_camera2_index]
    clean1 = views[rig.bottom_camera_index].copy()
    clean2 = views[rig.bottom_camera2_index].copy()

    H, W = clean1.shape[-2:]
    cy, cx = H // 2, W // 2

    # paint the "pole" (a dark tripod blob) at different positions in the
    # two cameras — each camera's mask marks its own occlusion
    def paint(img, y0, y1, x0, x1):
        img = img.copy()
        img[:3, y0:y1, x0:x1] = 0.05
        mask = np.zeros((H, W), bool)
        mask[y0:y1, x0:x1] = True
        return img, mask

    img1, mask1 = paint(clean1, cy - 24, cy + 24, cx - 20, cx + 20)
    # secondary: pole lands elsewhere (offset), so after flip/alignment it
    # does not cover the primary's masked region
    img2, mask2 = paint(clean2, cy - 70, cy - 30, cx + 30, cx + 70)

    # interior of the primary mask: the alpha feather deliberately leaks
    # the primary back in near mask edges (the reference draws its shipped
    # masks oversized for exactly this reason), so quality asserts on the
    # eroded interior
    inner = np.zeros((H, W), bool)
    inner[cy - 12 : cy + 12, cx - 8 : cx + 8] = True

    flip180 = bool(np.dot(np.asarray(cam1.up), np.asarray(cam2.up)) < 0)
    combined, flow = combine_bottom_images_with_pole_removal(
        jnp.asarray(img1),
        jnp.asarray(img2),
        mask1,
        mask2,
        approximate_usable_pixels_radius(cam1),
        approximate_usable_pixels_radius(cam2),
        flip180,
        make_flow_params("pixflow_tpu"),
        alpha_feather_size=9,
    )
    return {
        "combined": np.asarray(combined),
        "flow": np.asarray(flow),
        "clean1": clean1,
        "img1": img1,
        "mask1": mask1,
        "inner": inner,
        "H": H,
        "W": W,
    }


class TestPoleRemoval:
    def test_pole_region_refilled_with_alpha(self, fixture):
        """Under the primary's pole mask the output must carry data again
        (the blend pulled the warped secondary in where alpha was cut)."""
        m = fixture["mask1"]
        alpha = fixture["combined"][3]
        assert alpha[m].min() > 0.9, (
            f"pole region not refilled: min alpha {alpha[m].min():.3f}"
        )

    def test_pole_erased_matches_clean_plate(self, fixture):
        """RGB under the mask interior must match the analytically clean
        primary plate — the painted pole (0.05 gray) must be gone."""
        m = fixture["inner"]
        out = fixture["combined"][:3][:, m]
        clean = fixture["clean1"][:3][:, m]
        painted = fixture["img1"][:3][:, m]
        p_clean = psnr(out, clean)
        p_pole = psnr(out, painted)
        assert p_clean > 35.0, f"pole region vs clean plate: {p_clean:.1f} dB"
        assert p_clean > p_pole + 20.0, (
            f"output still resembles the pole ({p_pole:.1f} dB) more than "
            f"the clean plate ({p_clean:.1f} dB)"
        )

    def test_unmasked_region_is_primary(self, fixture):
        """Away from the pole and inside the usable circle the output is
        the primary image (blend only engages where alpha < 1)."""
        H, W = fixture["H"], fixture["W"]
        cy, cx = H // 2, W // 2
        sl = (slice(None), slice(cy + 40, cy + 70), slice(cx - 40, cx - 10))
        np.testing.assert_allclose(
            fixture["combined"][:3][sl],
            fixture["img1"][:3][sl],
            atol=1e-3,
        )

    def test_flow_output_shape(self, fixture):
        assert fixture["flow"].shape == (2, fixture["H"], fixture["W"])
        assert np.isfinite(fixture["flow"]).all()
