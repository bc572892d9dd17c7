"""Pin views/novel_view.py against the scalar reference oracle.

The novel-view / chunk-composite chain was the last major stage anchored
only to the analytic capture-simulator scene; these tests anchor it to a
per-pixel transliteration of the reference math itself
(tests/oracle_novel_view.py <- NovelView.cpp:47-268 +
TestRenderStereoPanorama.cpp:271-285), the same pattern as
tests/oracle_isp.py for the ISP.
"""

import numpy as np
import pytest

from tests import oracle_novel_view as oracle


def _smooth_rgba(rng, H, W, alpha=None):
    """Band-limited RGBA test image (bicubic differences are dominated by
    interpolation error on noise; smooth fields compare tightly)."""
    gy, gx = np.meshgrid(
        np.linspace(0, 2 * np.pi, H), np.linspace(0, 2 * np.pi, W),
        indexing="ij",
    )
    phases = rng.uniform(0, 2 * np.pi, size=(3, 4))
    chans = [
        0.5
        + 0.25 * np.sin(gx * (1 + i) * 0.5 + phases[i, 0])
        * np.cos(gy * (1 + 0.3 * i) + phases[i, 1])
        + 0.15 * np.sin(gx + gy + phases[i, 2])
        for i in range(3)
    ]
    if alpha is None:
        alpha = np.ones((H, W))
    return np.stack(chans + [alpha]).astype(np.float32)


def _smooth_flow(rng, H, W, mag=2.0):
    gy, gx = np.meshgrid(
        np.linspace(0, 2 * np.pi, H), np.linspace(0, 2 * np.pi, W),
        indexing="ij",
    )
    fx = mag * np.sin(gx * 0.7 + 0.3) * np.cos(gy * 0.4)
    fy = 0.5 * mag * np.cos(gx * 0.5) * np.sin(gy * 0.6 + 1.1)
    return np.stack([fx, fy]).astype(np.float32)


def test_lazy_warp_columns_match_reference_buffer():
    from surround360_tpu.views.novel_view import lazy_warp_columns

    for eye in ("left", "right"):
        warp_x, t = lazy_warp_columns(12, 64, 1.75, eye)
        ref_x, ref_t = oracle.lazy_warp_buffer(12, 64, 1.75, eye)
        np.testing.assert_allclose(warp_x, ref_x, atol=1e-6)
        np.testing.assert_allclose(t, ref_t, atol=1e-6)


@pytest.mark.parametrize("invert_t", [False, True])
def test_render_lazy_novel_view_matches_oracle(invert_t):
    from surround360_tpu.views.novel_view import (
        lazy_warp_columns,
        render_lazy_novel_view,
    )

    rng = np.random.default_rng(7)
    H, W, Wc = 24, 64, 8
    src = _smooth_rgba(rng, H, W)
    flow = _smooth_flow(rng, H, W)
    warp_x, t_cols = lazy_warp_columns(Wc, W, 1.5, "left")

    novel, mag = render_lazy_novel_view(
        src[None], flow[None], warp_x, t_cols, invert_t=invert_t
    )
    ref_novel, ref_mag = oracle.render_lazy_novel_view(
        src.astype(np.float64), flow.astype(np.float64),
        warp_x.astype(np.float64), t_cols.astype(np.float64), invert_t,
    )
    # interior rows: the production sampler and cv-style constant border
    # agree wherever every bicubic tap is in range; the flow pulls taps
    # at most ~3 px, so trim a 4-px frame
    s = np.s_[..., 4:-4, :]
    np.testing.assert_allclose(
        np.asarray(novel[0])[s], ref_novel[s], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(mag[0])[..., 4:-4, :], ref_mag[4:-4, :], atol=2e-4
    )


def test_combine_lazy_views_matches_oracle():
    from surround360_tpu.views.novel_view import combine_lazy_views

    rng = np.random.default_rng(3)
    H, Wc = 16, 12
    # alpha patterns exercising all four branches, avoiding the
    # both-in-(0, 0.1] corner where the reference's blended branch and
    # its outAlpha binarization disagree (oracle note)
    a_l = rng.choice([0.0, 0.3, 0.7, 1.0], size=(H, Wc))
    a_r = rng.choice([0.0, 0.4, 0.8, 1.0], size=(H, Wc))
    nl = _smooth_rgba(rng, H, Wc, alpha=a_l)
    nr = _smooth_rgba(rng, H, Wc, alpha=a_r)
    ml = rng.uniform(0, 4, size=(H, Wc)).astype(np.float32)
    mr = rng.uniform(0, 4, size=(H, Wc)).astype(np.float32)

    out = combine_lazy_views(nl[None], nr[None], ml[None], mr[None])
    ref = oracle.combine_lazy_views(
        nl.astype(np.float64), nr.astype(np.float64),
        ml.astype(np.float64), mr.astype(np.float64),
    )
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=5e-5)


def test_render_chunk_pair_matches_oracle():
    """Full per-pair chain: 4 lazy renders + 2 deghost blends vs the
    oracle's combineLazyNovelViews at tiny scale."""
    from surround360_tpu.views.novel_view import (
        lazy_warp_columns,
        render_chunk_pair,
    )

    rng = np.random.default_rng(11)
    H, W, Wc = 24, 64, 8
    verge = 1.5
    img_l = _smooth_rgba(rng, H, W)
    img_r = _smooth_rgba(rng, H, W)
    flow_ltr = _smooth_flow(rng, H, W, mag=1.5)
    flow_rtl = -_smooth_flow(rng, H, W, mag=1.2)
    warp_l, t_cols = lazy_warp_columns(Wc, W, verge, "left")
    warp_r, _ = lazy_warp_columns(Wc, W, verge, "right")

    chunk_l, chunk_r = render_chunk_pair(
        img_l[None], img_r[None], flow_ltr[None], flow_rtl[None],
        warp_l, t_cols, warp_r,
    )
    ref_l, ref_r = oracle.combine_lazy_novel_views(
        img_l.astype(np.float64), img_r.astype(np.float64),
        flow_ltr.astype(np.float64), flow_rtl.astype(np.float64),
        Wc, verge,
    )
    s = np.s_[..., 4:-4, :]
    np.testing.assert_allclose(np.asarray(chunk_l[0])[s], ref_l[s], atol=5e-4)
    np.testing.assert_allclose(np.asarray(chunk_r[0])[s], ref_r[s], atol=5e-4)


def test_combine_novel_views_matches_oracle():
    from surround360_tpu.views.novel_view import combine_novel_views

    rng = np.random.default_rng(5)
    H, W = 16, 20
    a_l = rng.choice([0.0, 0.5, 1.0], size=(H, W))
    a_r = rng.choice([0.0, 0.6, 1.0], size=(H, W))
    vl = _smooth_rgba(rng, H, W, alpha=a_l)
    vr = _smooth_rgba(rng, H, W, alpha=a_r)
    flow_ltr = _smooth_flow(rng, H, W, mag=3.0)
    flow_rtl = -_smooth_flow(rng, H, W, mag=2.0)
    t = 0.35

    out = combine_novel_views(
        vl[None], 1.0 - t, vr[None], t, flow_ltr[None], flow_rtl[None]
    )
    ref = oracle.combine_novel_views(
        vl.astype(np.float64), 1.0 - t, vr.astype(np.float64), t,
        flow_ltr.astype(np.float64), flow_rtl.astype(np.float64),
    )
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=5e-5)
