"""Parity tests: the static-window tiled sampler must match the dense
reference samplers exactly (same taps, same weights) for displacements
within its halos."""

import jax.numpy as jnp
import numpy as np
import pytest

from surround360_tpu.ops.remap import remap
from surround360_tpu.ops.window_sampler import (
    build_windows,
    plan_windows,
    sample_displaced,
    sample_windows,
)


def _smooth_field(rng, shape, amp):
    """Smooth random displacement field bounded by amp."""
    coarse = rng.uniform(-amp, amp, (shape[0], 5, 7)).astype(np.float32)
    import jax.image

    return np.asarray(
        jax.image.resize(jnp.asarray(coarse), shape, "cubic")
    ).clip(-amp, amp)


@pytest.mark.parametrize("interp", ["bilinear", "bicubic"])
@pytest.mark.parametrize("hw", [(40, 300), (97, 133), (30, 60)])
def test_matches_dense_remap_constant(interp, hw):
    rng = np.random.default_rng(0)
    H, W = hw
    B, C = 2, 3
    img = rng.standard_normal((B, C, H, W)).astype(np.float32)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dx = _smooth_field(rng, (B, H, W), 9.0)
    dy = _smooth_field(rng, (B, H, W), 5.0)
    x = gx[None] + dx
    y = gy[None] + dy

    out = sample_displaced(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y),
        halo_y=6, halo_x=10, interpolation=interp, border="constant",
        tr=8, tc=32,
    )
    coords = jnp.stack([jnp.asarray(x), jnp.asarray(y)], axis=1)
    ref = remap(
        jnp.asarray(img), coords, interpolation=interp, border="constant",
        method="gather",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_matches_bilinear_extend_clamp():
    """Clamp border + coordinate pre-clip reproduces the flow solver's
    bilinear-extend semantics (PixFlow.h:457-475)."""
    from surround360_tpu.flow.pixflow import _sample_bilinear_extend

    rng = np.random.default_rng(1)
    B, C, H, W = 3, 2, 57, 83
    img = rng.standard_normal((B, C, H, W)).astype(np.float32)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    # displacements beyond borders: the pre-clip keeps taps in-image
    dx = _smooth_field(rng, (B, H, W), 7.0)
    dy = _smooth_field(rng, (B, H, W), 7.0)
    x = jnp.clip(gx[None] + dx, 0.0, W - 2.0)
    y = jnp.clip(gy[None] + dy, 0.0, H - 2.0)

    out = sample_displaced(
        jnp.asarray(img), x, y, halo_y=8, halo_x=8,
        interpolation="bilinear", border="clamp", tr=8, tc=32,
    )
    ref = _sample_bilinear_extend(
        jnp.asarray(img), x[:, None], y[:, None]
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_windows_reused_across_fields():
    """build_windows once, sample twice with different coords."""
    rng = np.random.default_rng(2)
    B, C, H, W = 2, 2, 64, 96
    img = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))
    plan = plan_windows((H, W), (H, W), 5, 5, "bilinear", "clamp", 8, 32)
    win = build_windows(img, plan)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    for seed in (3, 4):
        r = np.random.default_rng(seed)
        dx = _smooth_field(r, (B, H, W), 4.0)
        dy = _smooth_field(r, (B, H, W), 4.0)
        x = jnp.clip(gx[None] + dx, 0.0, W - 2.0)
        y = jnp.clip(gy[None] + dy, 0.0, H - 2.0)
        out = sample_windows(win, plan, x, y)
        from surround360_tpu.flow.pixflow import _sample_bilinear_extend

        ref = _sample_bilinear_extend(img, x[:, None], y[:, None])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("tile_chunk", [0, 4])
def test_candidate_batched_sampling(tile_chunk):
    """Coords with extra leading dims (K candidates against shared windows)
    must equal K separate sample_windows calls — the flow inner loop's
    batched error-field ranking relies on this."""
    rng = np.random.default_rng(7)
    B, C, H, W, K = 3, 2, 48, 80, 5
    img = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))
    plan = plan_windows((H, W), (H, W), 6, 6, "bilinear", "clamp", 8, 32)
    win = build_windows(img, plan)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dx = np.stack([_smooth_field(rng, (B, H, W), 5.0) for _ in range(K)])
    dy = np.stack([_smooth_field(rng, (B, H, W), 5.0) for _ in range(K)])
    x = jnp.clip(gx[None, None] + dx, 0.0, W - 2.0)
    y = jnp.clip(gy[None, None] + dy, 0.0, H - 2.0)

    batched = sample_windows(win, plan, x, y, tile_chunk=tile_chunk)
    assert batched.shape == (K, B, C, H, W)
    for k in range(K):
        single = sample_windows(win, plan, x[k], y[k])
        np.testing.assert_allclose(
            np.asarray(batched[k]), np.asarray(single), atol=2e-5
        )


def test_budgeted_plan_and_auto_chunk():
    """plan_windows_budgeted must (a) keep the requested tiles when they
    fit, (b) grow tiles until the window stack fits a tight budget, and
    sampling through a budgeted plan + derived tile_chunk must stay exact
    (the preset-scale HBM-OOM path)."""
    from surround360_tpu.flow.pixflow import _sample_bilinear_extend
    from surround360_tpu.ops.window_sampler import (
        plan_windows_budgeted,
        sampler_tile_chunk,
    )

    rng = np.random.default_rng(11)
    B, C, H, W = 2, 2, 96, 128
    img = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))

    roomy = plan_windows_budgeted(
        (H, W), (H, W), 10, 10, "bilinear", "clamp", 8, 32,
        elems_per_px=B * C, max_window_elems=1 << 30,
    )
    assert (roomy.tr, roomy.tc) == (8, 32)

    tight_budget = B * C * H * W * 4  # allows only ~4x duplication
    tight = plan_windows_budgeted(
        (H, W), (H, W), 10, 10, "bilinear", "clamp", 8, 32,
        elems_per_px=B * C, max_window_elems=tight_budget,
    )
    assert tight.nty * tight.ntx * tight.bh * tight.bw * B * C <= tight_budget
    assert tight.tr > 8 or tight.tc > 32

    win = build_windows(img, tight)
    chunk = sampler_tile_chunk(tight, B, max_elems=tight.tr * tight.tc * B * 2 * (tight.bw + tight.bh))
    assert chunk >= 1
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dx = _smooth_field(rng, (B, H, W), 6.0)
    dy = _smooth_field(rng, (B, H, W), 6.0)
    x = jnp.clip(gx[None] + dx, 0.0, W - 2.0)
    y = jnp.clip(gy[None] + dy, 0.0, H - 2.0)
    out = sample_windows(win, tight, x, y, tile_chunk=chunk)
    ref = _sample_bilinear_extend(img, x[:, None], y[:, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sliced_matches_stacked():
    """sample_windows_sliced (per-tile dynamic_slice, no window stack)
    must equal build_windows + sample_windows exactly — including coords
    with extra candidate dims and a narrower output."""
    from surround360_tpu.ops.window_sampler import sample_windows_sliced

    rng = np.random.default_rng(17)
    B, C, H, W, Wo, K = 2, 3, 48, 80, 64, 3
    img = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))
    plan = plan_windows((H, W), (H, Wo), 7, 9, "bilinear", "clamp", 8, 16)
    win = build_windows(img, plan)
    gy, gx = np.meshgrid(np.arange(H), np.arange(Wo), indexing="ij")
    dx = np.stack([_smooth_field(rng, (B, H, Wo), 4.0) for _ in range(K)])
    dy = np.stack([_smooth_field(rng, (B, H, Wo), 4.0) for _ in range(K)])
    x = jnp.clip(gx[None, None] + dx, 0.0, W - 2.0)
    y = jnp.clip(gy[None, None] + dy, 0.0, H - 2.0)
    ref = sample_windows(win, plan, x, y)
    out = sample_windows_sliced(img, plan, x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)
    # bicubic + constant border too
    plan2 = plan_windows((H, W), (H, Wo), 7, 9, "bicubic", "constant", 8, 16)
    win2 = build_windows(img, plan2)
    ref2 = sample_windows(win2, plan2, x[0], y[0])
    out2 = sample_windows_sliced(img, plan2, x[0], y[0])
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=5e-6)


def test_single_tile_narrow_output():
    """Output narrower than the source with tiles grown past the output
    (budgeted fallback): the single window must be exactly the source, not
    the phase-padded image (6k novel-view chunk regression)."""
    from surround360_tpu.flow.pixflow import _sample_bilinear_extend
    from surround360_tpu.ops.window_sampler import plan_windows_budgeted

    rng = np.random.default_rng(13)
    B, C, H, W, Wo = 2, 3, 40, 53, 45
    img = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))
    plan = plan_windows_budgeted(
        (H, W), (H, Wo), 10, 10, "bilinear", "clamp", 8, 16,
        elems_per_px=B * C, max_window_elems=B * C * H * W,
    )
    assert (plan.nty, plan.ntx) == (1, 1)
    win = build_windows(img, plan)
    assert win.shape == (1, B, C, H, W)
    gy, gx = np.meshgrid(np.arange(H), np.arange(Wo), indexing="ij")
    dx = _smooth_field(rng, (B, H, Wo), 5.0)
    dy = _smooth_field(rng, (B, H, Wo), 5.0)
    x = jnp.clip(gx[None] + dx, 0.0, W - 2.0)
    y = jnp.clip(gy[None] + dy, 0.0, H - 2.0)
    out = sample_windows(win, plan, x, y)
    ref = _sample_bilinear_extend(img, x[:, None], y[:, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_single_tile_fallback():
    """Tiny images degrade to one full window and stay exact."""
    rng = np.random.default_rng(5)
    B, C, H, W = 1, 2, 12, 14
    img = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    x = jnp.clip(gx[None] + 2.3, 0.0, W - 2.0)
    y = jnp.clip(gy[None] - 1.7, 0.0, H - 2.0)
    out = sample_displaced(
        img, x, y, halo_y=4, halo_x=4, interpolation="bilinear",
        border="clamp",
    )
    from surround360_tpu.flow.pixflow import _sample_bilinear_extend

    ref = _sample_bilinear_extend(img, x[:, None], y[:, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_beyond_halo_clamps_gracefully():
    """Displacements beyond the halo must not produce NaNs or wild values;
    constant border reads (partially) zero."""
    rng = np.random.default_rng(6)
    B, C, H, W = 1, 1, 40, 80
    img = jnp.asarray(
        rng.uniform(0.5, 1.0, (B, C, H, W)).astype(np.float32)
    )
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    x = jnp.asarray((gx[None] + 30.0).clip(0, W - 2.0).astype(np.float32))
    y = jnp.asarray(np.broadcast_to(gy[None], (B, H, W)).astype(np.float32))
    out = np.asarray(
        sample_displaced(
            img, x, y, halo_y=2, halo_x=4, interpolation="bilinear",
            border="constant", tr=8, tc=16,
        )
    )
    assert np.isfinite(out).all()
    assert (np.abs(out) <= 1.0 + 1e-5).all()


class TestStaticBandedRemap:
    """remap_static_banded (now banded in both axes) must equal the dense
    gather remap on real rig warps."""

    def _check(self, warp, img_hw, tile_cols=64, chunk_rows=16):
        import jax.numpy as jnp

        from surround360_tpu.ops.remap import remap, remap_static_banded

        rng = np.random.default_rng(8)
        C, H, W = 4, *img_hw
        img = jnp.asarray(rng.uniform(0, 1, (C, H, W)).astype(np.float32))
        banded = remap_static_banded(
            img, warp, "bicubic", "constant",
            chunk_rows=chunk_rows, tile_cols=tile_cols,
        )
        dense = remap(
            img, jnp.asarray(warp), interpolation="bicubic",
            border="constant", method="gather",
        )
        np.testing.assert_allclose(
            np.asarray(banded), np.asarray(dense), atol=3e-5
        )

    def test_side_camera_warp(self):
        from surround360_tpu.geometry.rig import make_ring_rig
        from surround360_tpu.ops.warp import rig_fov, side_cam_spherical_warp

        rig = make_ring_rig().rescaled(0.125)
        sides = rig.side_cameras
        h_rad = 2.0 * rig_fov(sides, False)
        v_rad = 2.0 * rig_fov(sides, True)
        warp, _ = side_cam_spherical_warp(
            sides[2], 2, len(sides), (280, 140), h_rad, v_rad
        )
        self._check(warp, (128, 128))

    def test_fisheye_strip_warp(self):
        from surround360_tpu.geometry.camera import get_fov
        from surround360_tpu.geometry.rig import make_ring_rig
        from surround360_tpu.ops.warp import spherical_warp_for_camera

        rig = make_ring_rig().rescaled(0.125)
        cam = rig.cameras[rig.top_camera_index]
        fov = get_fov(cam)
        top_h = int(140 * fov / np.pi)
        warp = spherical_warp_for_camera(
            cam, (top_h, 280), 2 * np.pi, 0.0, np.pi / 2, np.pi / 2 - fov
        )
        self._check(warp, (128, 128))

    def test_multi_warp_union_bands(self):
        """All 14 side cameras through ONE union-banded call must equal
        per-camera dense remaps (the production projection path)."""
        import jax.numpy as jnp

        from surround360_tpu.geometry.rig import make_ring_rig
        from surround360_tpu.ops.remap import remap, remap_static_banded_multi
        from surround360_tpu.ops.warp import rig_fov, side_cam_spherical_warp

        rig = make_ring_rig().rescaled(0.125)
        sides = rig.side_cameras
        h_rad = 2.0 * rig_fov(sides, False)
        v_rad = 2.0 * rig_fov(sides, True)
        warps = np.stack(
            [
                side_cam_spherical_warp(
                    cam, i, len(sides), (280, 140), h_rad, v_rad
                )[0]
                for i, cam in enumerate(sides)
            ]
        )
        rng = np.random.default_rng(10)
        imgs = jnp.asarray(
            rng.uniform(0, 1, (len(sides), 4, 128, 128)).astype(np.float32)
        )
        banded = remap_static_banded_multi(
            imgs, warps, "bicubic", "constant", chunk_rows=16, tile_cols=32
        )
        for i in range(len(sides)):
            dense = remap(
                imgs[i], jnp.asarray(warps[i]), interpolation="bicubic",
                border="constant", method="gather",
            )
            np.testing.assert_allclose(
                np.asarray(banded[i]), np.asarray(dense), atol=3e-5
            )

    def test_static_pallas_tight_x_matches_dense(self):
        """The fused static-remap path (TPU production projection route)
        in interpret mode must equal dense remaps — exercises tight-x:
        host-planned UNALIGNED window origins, kernel-side quantization,
        the residual lane-roll and the wrapped-column weight mask."""
        import jax.numpy as jnp

        from surround360_tpu.geometry.rig import make_ring_rig
        from surround360_tpu.ops.remap import _remap_static_pallas, remap
        from surround360_tpu.ops.warp import rig_fov, side_cam_spherical_warp

        rig = make_ring_rig().rescaled(0.125)
        sides = rig.side_cameras[:3]
        h_rad = 2.0 * rig_fov(rig.side_cameras, False)
        v_rad = 2.0 * rig_fov(rig.side_cameras, True)
        warps = np.stack(
            [
                side_cam_spherical_warp(
                    cam, i, len(rig.side_cameras), (280, 140), h_rad, v_rad
                )[0]
                for i, cam in enumerate(sides)
            ]
        )
        rng = np.random.default_rng(11)
        imgs = jnp.asarray(
            rng.uniform(0, 1, (len(sides), 4, 128, 128)).astype(np.float32)
        )
        out = _remap_static_pallas(
            imgs, warps, "bicubic", "constant", 16, 128, None
        )
        assert out is not None, "planned windows must fit the VMEM budget"
        for i in range(len(sides)):
            dense = remap(
                imgs[i], jnp.asarray(warps[i]), interpolation="bicubic",
                border="constant", method="gather",
            )
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(dense), atol=3e-5
            )

    def test_device_coords_match_host_coords(self):
        """Passing the warp as a traced device array (coords_dev) must be
        bit-identical to the host-constant path — it is the same math with
        the table riding the jit boundary as an argument."""
        import jax.numpy as jnp

        from surround360_tpu.geometry.rig import make_ring_rig
        from surround360_tpu.ops.remap import remap_static_banded_multi
        from surround360_tpu.ops.warp import rig_fov, side_cam_spherical_warp

        rig = make_ring_rig().rescaled(0.125)
        sides = rig.side_cameras[:4]
        h_rad = 2.0 * rig_fov(rig.side_cameras, False)
        v_rad = 2.0 * rig_fov(rig.side_cameras, True)
        warps = np.stack(
            [
                side_cam_spherical_warp(
                    cam, i, len(rig.side_cameras), (280, 140), h_rad, v_rad
                )[0]
                for i, cam in enumerate(sides)
            ]
        )
        rng = np.random.default_rng(21)
        imgs = jnp.asarray(
            rng.uniform(0, 1, (len(sides), 4, 128, 128)).astype(np.float32)
        )
        for border in ("constant", "wrap"):
            a = remap_static_banded_multi(
                imgs, warps, "bicubic", border, chunk_rows=16, tile_cols=32
            )
            b = remap_static_banded_multi(
                imgs, warps, "bicubic", border, chunk_rows=16, tile_cols=32,
                coords_dev=jnp.asarray(warps),
            )
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )

    def test_tile_chunked_einsum_matches_unchunked(self):
        """Forcing the banded remap's lax.map tile chunking (the 8k
        fisheye-strip memory path) must match the all-tiles einsum."""
        import importlib

        import jax.numpy as jnp

        R = importlib.import_module("surround360_tpu.ops.remap")
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 1, (2, 4, 64, 96)).astype(np.float32))
        gy, gx = np.meshgrid(np.arange(80), np.arange(112), indexing="ij")
        warps = np.stack([
            np.stack([gx * 96 / 112.0 + 3 * np.sin(gy / 9.0),
                      gy * 64 / 80.0 + 2 * np.cos(gx / 7.0)]),
            np.stack([gx * 96 / 112.0 - 2 * np.cos(gy / 11.0),
                      gy * 64 / 80.0 + 1.5 * np.sin(gx / 5.0)]),
        ]).astype(np.float32)
        ref = R.remap_static_banded_multi(
            img, warps, "bicubic", "constant", chunk_rows=16, tile_cols=32
        )
        saved = R._REMAP_MATMUL_CHUNK_ELEMS
        try:
            R._REMAP_MATMUL_CHUNK_ELEMS = 1000
            out = R.remap_static_banded_multi(
                img, warps, "bicubic", "constant", chunk_rows=16, tile_cols=32
            )
        finally:
            R._REMAP_MATMUL_CHUNK_ELEMS = saved
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-6
        )

    def test_batched_image(self):
        from surround360_tpu.geometry.rig import make_ring_rig
        from surround360_tpu.ops.warp import rig_fov, side_cam_spherical_warp
        import jax.numpy as jnp

        from surround360_tpu.ops.remap import remap, remap_static_banded

        rig = make_ring_rig().rescaled(0.125)
        sides = rig.side_cameras
        h_rad = 2.0 * rig_fov(sides, False)
        v_rad = 2.0 * rig_fov(sides, True)
        warp, _ = side_cam_spherical_warp(
            sides[0], 0, len(sides), (280, 140), h_rad, v_rad
        )
        rng = np.random.default_rng(9)
        img = jnp.asarray(rng.uniform(0, 1, (3, 4, 128, 128)).astype(np.float32))
        banded = remap_static_banded(img, warp, "bilinear", "constant",
                                     chunk_rows=8, tile_cols=32)
        dense = remap(img, jnp.asarray(warp), interpolation="bilinear",
                      border="constant", method="gather")
        np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                                   atol=3e-5)


class TestResidualSampler:
    """sample_displaced_residual: displacement-following window origins
    must reproduce the dense remap exactly whenever the WITHIN-TILE
    displacement spread fits the residual halos, regardless of the global
    displacement magnitude."""

    def _case(self, interp, border, res_halo_y, res_halo_x, tr, tc, group):
        from surround360_tpu.ops.window_sampler import (
            sample_displaced_residual,
        )

        rng = np.random.default_rng(3)
        H, W = 160, 384
        img = jnp.asarray(rng.random((2, 4, H, W), dtype=np.float32))
        gy, gx = np.meshgrid(
            np.arange(H, dtype=np.float32),
            np.arange(W, dtype=np.float32),
            indexing="ij",
        )
        # large global offsets (up to ~90 px) with small local variation
        dy = 80 * np.sin(2 * np.pi * gy / H)[None] + 3 * np.sin(
            2 * np.pi * gx / 23
        )[None]
        dx = 60 * np.cos(2 * np.pi * gx / W)[None] + 2 * np.cos(
            2 * np.pi * gy / 31
        )[None]
        dy = np.repeat(dy, 2, 0)
        dx = np.repeat(dx, 2, 0)
        dy[1] *= 0.7
        dx[1] *= -0.5  # per-lead distinct fields -> per-lead origins
        x = jnp.asarray(gx[None] + dx)
        y = jnp.asarray(gy[None] + dy)
        ref = remap(
            img, jnp.stack([x, y], axis=1), interpolation=interp,
            border=border,
        )
        out = sample_displaced_residual(
            img, x, y, halo_y=96, halo_x=72,
            res_halo_y=res_halo_y, res_halo_x=res_halo_x,
            interpolation=interp, border=border, tr=tr, tc=tc, group=group,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )

    @pytest.mark.parametrize("interp", ["bilinear", "bicubic"])
    def test_matches_dense_remap(self, interp):
        # within-tile spread: |dy| ramp 3.1 px/row * 8 rows + 3 -> ~16;
        # |dx| ramp 0.98 px/col * 64 cols + 2 -> ~33
        self._case(interp, "constant", 24, 40, 8, 64, 16)

    def test_clamp_border_and_group_remainder(self):
        # group that does not divide T exercises the divisor fallback
        self._case("bilinear", "clamp", 24, 40, 8, 64, 7)

    def test_degenerate_single_window(self):
        from surround360_tpu.ops.window_sampler import (
            sample_displaced_residual,
        )

        rng = np.random.default_rng(5)
        img = jnp.asarray(rng.random((2, 4, 32, 48), dtype=np.float32))
        x = jnp.full((2, 32, 48), 5.5)
        y = jnp.full((2, 32, 48), 3.5)
        ref = remap(
            img,
            jnp.stack([x, y], axis=1),
            interpolation="bilinear",
            border="clamp",
        )
        out = sample_displaced_residual(
            img, x, y, halo_y=40, halo_x=60, res_halo_y=30, res_halo_x=50,
            interpolation="bilinear", border="clamp",
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )

    def test_mixed_spanning_axis_pins_origin(self):
        """Output narrower than one tile -> the x window spans the whole
        source; its origin must stay pinned (a mean-displacement shift
        would slide real columns out of the source-sized window) while
        the y axis still follows displacement."""
        from surround360_tpu.ops.window_sampler import (
            sample_displaced_residual,
        )

        rng = np.random.default_rng(11)
        H, W = 160, 40  # narrow: W < tc -> ntx == 1
        img = jnp.asarray(rng.random((3, 4, H, W), dtype=np.float32))
        gy, gx = np.meshgrid(
            np.arange(H, dtype=np.float32),
            np.arange(W, dtype=np.float32),
            indexing="ij",
        )
        dy = 60 * np.sin(2 * np.pi * gy / H)[None] + np.sin(gx / 5)[None]
        dx = 12 * np.cos(2 * np.pi * gy / H)[None]  # biased x means
        dy = np.repeat(dy, 3, 0)
        dx = np.repeat(dx, 3, 0)
        x = jnp.asarray(gx[None] + dx)
        y = jnp.asarray(gy[None] + dy)
        ref = remap(
            img, jnp.stack([x, y], axis=1), interpolation="bicubic",
            border="constant",
        )
        out = sample_displaced_residual(
            img, x, y, halo_y=70, halo_x=14, res_halo_y=16, res_halo_x=14,
            interpolation="bicubic", border="constant", tr=8, tc=64,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )


class TestStaticPallasRemap:
    def test_matches_dense_remap(self):
        """The fused-kernel static remap path (host-planned aligned
        window origins -> Pallas DMA + VMEM contraction) must match the
        dense gather remap exactly on real side-camera warps."""
        from surround360_tpu.geometry.rig import make_ring_rig
        from surround360_tpu.ops.warp import rig_fov, side_cam_spherical_warp
        from surround360_tpu.ops.remap import _remap_static_pallas

        rig = make_ring_rig().rescaled(0.125)
        sides = rig.side_cameras
        h_rad = 2.0 * rig_fov(sides, False)
        v_rad = 2.0 * rig_fov(sides, True)
        coords = np.stack([
            side_cam_spherical_warp(
                cam, i, len(sides), (280, 140), h_rad, v_rad
            )[0]
            for i, cam in enumerate(sides[:3])
        ])
        rng = np.random.default_rng(4)
        imgs = jnp.asarray(
            rng.uniform(0, 1, (3, 4, 256, 256)).astype(np.float32)
        )
        out = _remap_static_pallas(
            imgs, coords, "bicubic", "constant", 16, 128, None
        )
        assert out is not None
        dense = jnp.stack([
            remap(
                imgs[i], jnp.asarray(coords[i]), interpolation="bicubic",
                border="constant", method="gather",
            )
            for i in range(3)
        ])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(dense), atol=5e-5
        )

    def test_bucketed_tiles_match_dense(self):
        """Outputs large enough to trigger row-extent bucketing (T >= 64,
        several bh classes) must still match the dense remap exactly —
        covers the bucket partition + inverse-permutation reassembly."""
        from surround360_tpu.geometry.rig import make_ring_rig
        from surround360_tpu.ops.warp import rig_fov, side_cam_spherical_warp
        from surround360_tpu.ops.remap import _remap_static_pallas

        rig = make_ring_rig().rescaled(0.125)
        sides = rig.side_cameras
        h_rad = 2.0 * rig_fov(sides, False)
        v_rad = 2.0 * rig_fov(sides, True)
        coords = np.stack([
            side_cam_spherical_warp(
                cam, i, len(sides), (560, 288), h_rad, v_rad
            )[0]
            for i, cam in enumerate(sides[:2])
        ])
        rng = np.random.default_rng(5)
        imgs = jnp.asarray(
            rng.uniform(0, 1, (2, 4, 256, 256)).astype(np.float32)
        )
        out = _remap_static_pallas(
            imgs, coords, "bicubic", "constant", 16, 128, None
        )
        assert out is not None
        dense = jnp.stack([
            remap(
                imgs[i], jnp.asarray(coords[i]), interpolation="bicubic",
                border="constant", method="gather",
            )
            for i in range(2)
        ])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(dense), atol=5e-5
        )


class TestMakeWindowSampler:
    """The static-origin Pallas route (flow error-field sampler) vs the
    XLA einsum route — same plan contract, interpret-mode kernel."""

    def _mk(self, H, W, B, hy, hx, K, seed=0):
        rng = np.random.default_rng(seed)
        img = jnp.asarray(rng.random((B, 2, H, W)).astype(np.float32))
        gy, gx = np.meshgrid(
            np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32),
            indexing="ij",
        )
        shape = (K, B, H, W) if K else (B, H, W)
        dxs = (rng.random(shape) * 2 - 1) * (hx - 2)
        dys = (rng.random(shape) * 2 - 1) * (hy - 2)
        xs = jnp.asarray(np.clip(gx + dxs, 0, W - 1).astype(np.float32))
        ys = jnp.asarray(np.clip(gy + dys, 0, H - 1).astype(np.float32))
        return img, xs, ys

    def test_candidate_fold_matches_xla(self):
        from surround360_tpu.ops.window_sampler import make_window_sampler

        img, xs, ys = self._mk(72, 160, 3, 10, 14, 13)
        f_p = make_window_sampler(
            img, (72, 160), 10, 14, "bilinear", "clamp",
            tr=8, tc=128, precision="float32", backend="pallas",
        )
        f_x = make_window_sampler(
            img, (72, 160), 10, 14, "bilinear", "clamp",
            tr=8, tc=128, precision="float32", backend="xla",
        )
        assert f_p.backend == "pallas" and f_x.backend == "xla"
        a, b = f_p(xs, ys), f_x(xs, ys)
        assert a.shape == b.shape == (13, 3, 2, 72, 160)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    def test_no_extra_dims_and_odd_tile_padding(self):
        """Wo < 128 forces a single-x-tile plan whose Pt isn't a multiple
        of 128 — exercises the kernel-P padding path."""
        from surround360_tpu.ops.window_sampler import make_window_sampler

        img, xs, ys = self._mk(64, 72, 2, 8, 8, 0)
        f_p = make_window_sampler(
            img, (64, 72), 8, 8, "bilinear", "clamp",
            tr=8, tc=128, precision="float32", backend="pallas",
        )
        f_x = make_window_sampler(
            img, (64, 72), 8, 8, "bilinear", "clamp",
            tr=8, tc=128, precision="float32", backend="xla",
        )
        a, b = f_p(xs, ys), f_x(xs, ys)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    def test_bf16_mode_close(self):
        from surround360_tpu.ops.window_sampler import make_window_sampler

        img, xs, ys = self._mk(72, 160, 2, 10, 14, 5)
        f_p = make_window_sampler(
            img, (72, 160), 10, 14, "bilinear", "clamp",
            tr=8, tc=128, precision="default", backend="pallas",
        )
        f_x = make_window_sampler(
            img, (72, 160), 10, 14, "bilinear", "clamp",
            tr=8, tc=128, precision="float32", backend="xla",
        )
        a, b = np.asarray(f_p(xs, ys)), np.asarray(f_x(xs, ys))
        assert np.abs(a - b).max() < 0.02  # bf16 contraction noise

    def test_offsets_mode_matches_xla(self):
        """Offset fields (one shared tent build + lane rolls) must equal
        sampling at coords+offset through the XLA route."""
        from surround360_tpu.ops.window_sampler import make_window_sampler

        d = 2
        offs = tuple(
            (oy * d, ox * d)
            for oy, ox in ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0),
                           (1, 1), (1, -1), (-1, 1), (-1, -1))
        )
        img, xs, ys = self._mk(72, 288, 3, 10, 14, 0, seed=3)
        f_p = make_window_sampler(
            img, (72, 288), 10, 14, "bilinear", "clamp",
            tr=8, tc=128, precision="float32", backend="pallas",
            offsets=offs,
        )
        f_x = make_window_sampler(
            img, (72, 288), 10, 14, "bilinear", "clamp",
            tr=8, tc=128, precision="float32", backend="xla",
            offsets=offs,
        )
        a, b = np.asarray(f_p(xs, ys)), np.asarray(f_x(xs, ys))
        assert a.shape == b.shape == (9, 3, 2, 72, 288)
        np.testing.assert_allclose(a, b, atol=5e-5)

    def test_offsets_mode_multitile_x(self):
        """Offsets across ntx>1 (tc=128-aligned origins, margin bands)."""
        from surround360_tpu.ops.window_sampler import make_window_sampler

        offs = ((0, 0), (0, 4), (0, -4), (4, 0), (-4, 0))
        img, xs, ys = self._mk(48, 300, 2, 8, 10, 0, seed=4)
        f_p = make_window_sampler(
            img, (48, 300), 8, 10, "bilinear", "clamp",
            tr=8, tc=128, precision="float32", backend="pallas",
            offsets=offs,
        )
        f_x = make_window_sampler(
            img, (48, 300), 8, 10, "bilinear", "clamp",
            tr=8, tc=128, precision="float32", backend="xla",
            offsets=offs,
        )
        a, b = np.asarray(f_p(xs, ys)), np.asarray(f_x(xs, ys))
        np.testing.assert_allclose(a, b, atol=5e-5)
