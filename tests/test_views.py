"""Novel-view synthesis tests (NovelView.cpp behavioral contracts)."""

import cv2
import jax.numpy as jnp
import numpy as np

from surround360_tpu.views import (
    combine_lazy_views,
    generate_novel_view,
    lazy_warp_columns,
    render_chunk_pair,
    render_lazy_novel_view,
)


def _rgba_batch(grey):
    return jnp.asarray(
        np.stack([grey, grey, grey, np.ones_like(grey)], 0)[None]
    )


def _texture(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return cv2.GaussianBlur(rng.random((h, w)).astype(np.float32), (0, 0), 2.0)


class TestLazyWarp:
    def test_columns_affine_and_eye_symmetric(self):
        wl, t = lazy_warp_columns(32, 128, 3.0, "left")
        wr, t2 = lazy_warp_columns(32, 128, 3.0, "right")
        np.testing.assert_allclose(t, t2)
        np.testing.assert_allclose(wl - wr, 6.0)  # 2x verge displacement
        # affine in column index with unit slope
        d = np.diff(wl)
        np.testing.assert_allclose(d, 1.0, atol=1e-6)
        # t sweeps [0, 1)
        assert t[0] == 0.0 and t[-1] < 1.0

    def test_warp_range_lands_in_overlap(self):
        # last novel view (nv=Wc-1) samples near camW/2 - 1
        wl, _ = lazy_warp_columns(32, 128, 0.0, "left")
        assert abs(wl[-1] - (64 - 1)) < 1e-5
        assert abs(wl[0] - (64 - 32)) < 1e-5


class TestRenderLazyNovelView:
    def test_zero_flow_copies_columns(self):
        img = _texture(48, 64, seed=1)
        src = _rgba_batch(img)
        flow = jnp.zeros((1, 2, 48, 64))
        warp_x = np.arange(10, 26, dtype=np.float32)
        t_cols = np.linspace(0, 0.9, 16, dtype=np.float32)
        novel, mag = render_lazy_novel_view(src, flow, warp_x, t_cols, False)
        assert novel.shape == (1, 4, 48, 16)
        np.testing.assert_allclose(
            np.asarray(novel)[0, 0, 4:-4], img[4:-4, 10:26], atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(mag), 0.0, atol=1e-6)
        # alpha = (1 - t)
        np.testing.assert_allclose(
            np.asarray(novel)[0, 3, 24], 1.0 - t_cols, atol=1e-5
        )

    def test_invert_t_flips_alpha_ramp(self):
        img = _texture(48, 64, seed=2)
        src = _rgba_batch(img)
        flow = jnp.zeros((1, 2, 48, 64))
        warp_x = np.arange(10, 26, dtype=np.float32)
        t_cols = np.linspace(0, 0.9, 16, dtype=np.float32)
        novel, _ = render_lazy_novel_view(src, flow, warp_x, t_cols, True)
        np.testing.assert_allclose(np.asarray(novel)[0, 3, 24], t_cols, atol=1e-5)

    def test_flow_shifts_sampling(self):
        img = _texture(48, 64, seed=3)
        src = _rgba_batch(img)
        # uniform flow +4 px in x; at t=0.5 sampling shifts by 2
        flow = jnp.zeros((1, 2, 48, 64)).at[:, 0].set(4.0)
        warp_x = np.full(8, 20.0, dtype=np.float32)
        t_cols = np.full(8, 0.5, dtype=np.float32)
        novel, mag = render_lazy_novel_view(src, flow, warp_x, t_cols, False)
        np.testing.assert_allclose(
            np.asarray(novel)[0, 0, 10:-10, 3], img[10:-10, 22], atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(mag), 4.0, atol=1e-4)


class TestCombineLazyViews:
    def test_opaque_equal_images_passthrough(self):
        img = _texture(32, 24, seed=4)
        v = _rgba_batch(img)
        mag = jnp.zeros((1, 32, 24))
        out = np.asarray(combine_lazy_views(v, v, mag, mag))
        np.testing.assert_allclose(out[0, :3], np.asarray(v)[0, :3], atol=1e-5)
        np.testing.assert_allclose(out[0, 3], 1.0)

    def test_one_sided_alpha_copies_other(self):
        img = _texture(32, 24, seed=5)
        v_l = _rgba_batch(img)
        v_r = jnp.zeros_like(v_l)  # fully transparent
        mag = jnp.zeros((1, 32, 24))
        out = np.asarray(combine_lazy_views(v_l, v_r, mag, mag))
        np.testing.assert_allclose(out[0, :3], np.asarray(v_l)[0, :3], atol=1e-5)

    def test_output_alpha_binarized(self):
        v_l = jnp.full((1, 4, 8, 8), 0.05)  # alpha 0.05 (< 0.1 threshold)
        v_r = jnp.zeros((1, 4, 8, 8))
        mag = jnp.zeros((1, 8, 8))
        out = np.asarray(combine_lazy_views(v_l, v_r, mag, mag))
        np.testing.assert_allclose(out[0, 3], 0.0)


class TestRenderChunkPair:
    def test_stereo_chunks_shapes_and_parallax(self):
        # two views of a textured scene offset horizontally: left/right eye
        # chunks must differ (parallax) but both stay finite and textured
        base = _texture(64, 160, seed=6)
        img_l = _rgba_batch(base[:, 16:112])
        img_r = _rgba_batch(base[:, 8:104])
        flow_ltr = jnp.zeros((1, 2, 64, 96)).at[:, 0].set(-8.0)
        flow_rtl = jnp.zeros((1, 2, 64, 96)).at[:, 0].set(8.0)
        wl, t = lazy_warp_columns(24, 96, 2.0, "left")
        wr, _ = lazy_warp_columns(24, 96, 2.0, "right")
        cl, cr = render_chunk_pair(
            img_l, img_r, flow_ltr, flow_rtl, wl, t, wr
        )
        assert cl.shape == (1, 4, 64, 24)
        assert cr.shape == (1, 4, 64, 24)
        a = np.asarray(cl)
        b = np.asarray(cr)
        assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
        # stereo disparity: the eyes sample verge-shifted columns
        assert np.abs(a[0, 0, 16:-16, 4:-4] - b[0, 0, 16:-16, 4:-4]).mean() > 1e-4


class TestEagerNovelView:
    def test_midpoint_interpolation(self):
        base = _texture(64, 128, seed=7)
        i0 = base[:, 16:112]
        # content moves +6 px: I1(x) = I0(x - 6)
        i1 = base[:, 10:106]
        src = _rgba_batch(i0)
        # reverse flow (R->L): content in I1 maps back to I0 at +6... the
        # novel view at t from I0 uses flowRtoL = -6 (samples I0 leftward)
        rflow = jnp.zeros((1, 2, 64, 96)).at[:, 0].set(-6.0)
        mid = generate_novel_view(src, rflow, 0.5)
        want = base[:, 13:109]  # half-shift ground truth
        np.testing.assert_allclose(
            np.asarray(mid)[0, 0, 8:-8, 8:-8], want[8:-8, 8:-8], atol=5e-3
        )
