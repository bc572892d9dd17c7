"""End-to-end renderer tests on the synthetic capture simulator.

The reference is validated against shipped sample datasets with expected
renders (README.md:15-27). Hermetic equivalent: render an analytic
at-infinity environment through the exact camera model, run the full
pipeline, and compare against the analytically-derived expected equirect.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surround360_tpu.capture import (
    checker_sinusoid_environment,
    render_camera_views,
    render_equirect_reference,
)
from surround360_tpu.geometry.rig import make_ring_rig
from surround360_tpu.render.panorama import (
    RenderConfig,
    build_render_context,
    render_frame,
)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


@pytest.fixture(scope="module")
def rig():
    # preview-scale rig: cameras rescaled 2048 -> 256 so warps, simulator
    # views, and the render context share one resolution
    return make_ring_rig().rescaled(0.125)


@pytest.fixture(scope="module")
def views(rig):
    return render_camera_views(rig)


@pytest.fixture(scope="module")
def ring_render(rig, views):
    cfg = RenderConfig(
        eqr_width=280,
        eqr_height=140,
        side_flow_alg="pixflow_tpu",
    )
    ctx = build_render_context(rig, cfg)
    side_images = jnp.asarray(
        np.stack([views[i] for i in [rig.ids.index(s) for s in rig.side_ids]])
    )
    outputs, state = render_frame(ctx, side_images)
    return ctx, outputs, state


class TestRingRender:
    def test_output_shape(self, ring_render):
        ctx, outputs, _ = ring_render
        assert outputs["equirect"].shape == (3, 2 * 140, 280)

    def test_matches_analytic_reference(self, ring_render):
        ctx, outputs, _ = ring_render
        expect = render_equirect_reference(ctx)
        eqr = np.asarray(outputs["equirect"])
        left = eqr[:, :140]
        right = eqr[:, 140:]
        pad = (140 - ctx.strip_h) // 2
        band = slice(pad + 6, pad + ctx.strip_h - 6)
        p_l = psnr(left[:, band], expect[:, band])
        p_r = psnr(right[:, band], expect[:, band])
        assert p_l > 28.0, f"left-eye PSNR vs analytic reference: {p_l:.1f} dB"
        assert p_r > 28.0, f"right-eye PSNR vs analytic reference: {p_r:.1f} dB"

    def test_stereo_eyes_agree_at_infinity(self, ring_render):
        # at-infinity scene: after the zero-parallax wrap shift both eyes
        # must converge to the same panorama
        ctx, outputs, _ = ring_render
        eqr = np.asarray(outputs["equirect"])
        pad = (140 - ctx.strip_h) // 2
        band = slice(pad + 6, pad + ctx.strip_h - 6)
        p = psnr(eqr[:, :140][:, band], eqr[:, 140:][:, band])
        assert p > 30.0, f"L/R eye agreement at infinity: {p:.1f} dB"

    def test_state_pytree_emitted(self, ring_render):
        _, _, state = ring_render
        assert "pair_flow_ltr" in state
        assert state["pair_flow_ltr"].shape[0] == 14


class TestFullSphereRender:
    def test_top_bottom_composite_fills_poles(self, rig, views):
        cfg = RenderConfig(
            eqr_width=280,
            eqr_height=140,
            side_flow_alg="pixflow_tpu",
            polar_flow_alg="pixflow_tpu",
            enable_top=True,
            enable_bottom=True,
        )
        ctx = build_render_context(rig, cfg)
        side_images = jnp.asarray(
            np.stack(
                [views[i] for i in [rig.ids.index(s) for s in rig.side_ids]]
            )
        )
        top = jnp.asarray(views[rig.top_camera_index])
        bottom = jnp.asarray(views[rig.bottom_camera_index])
        outputs, _ = render_frame(ctx, side_images, top, bottom)
        eqr = np.asarray(outputs["equirect"])
        left = eqr[:, :140]
        # polar rows (outside the side band) must now have content
        assert left[:, 2:6].std() > 0.01, "top pole rows are empty"
        assert left[:, -6:-2].std() > 0.01, "bottom pole rows are empty"
        # and the full sphere should resemble the environment: compare the
        # top polar cap against the environment map directly
        expect = render_equirect_reference(ctx)
        pad = (140 - ctx.strip_h) // 2
        band = slice(pad + 6, pad + ctx.strip_h - 6)
        p = psnr(left[:, band], expect[:, band])
        assert p > 25.0, f"full render side-band PSNR: {p:.1f} dB"
        # the polar caps must also match the analytic environment: the
        # reference's linear phi sweep continued past the side band
        # (full_sphere=True) covers the fisheye composites
        expect_fs = render_equirect_reference(ctx, full_sphere=True)
        p_fs = psnr(left[:, 4:-4], np.asarray(expect_fs)[:, 4:-4])
        assert p_fs > 33.0, f"full-sphere PSNR: {p_fs:.1f} dB"

    def test_merged_poles_match_sequential(self, rig, views, monkeypatch):
        """The batched top+bottom pole program (_poles_to_side_flow) must
        match the sequential two-program path: the only semantic delta is
        the bottom flow reading the pre-top-composite band, which differs
        just by the deghost blend's ~5e-5 zero-alpha leak."""
        import surround360_tpu.render.panorama as P

        cfg = RenderConfig(
            eqr_width=280,
            eqr_height=140,
            side_flow_alg="pixflow_tpu",
            polar_flow_alg="pixflow_tpu",
            enable_top=True,
            enable_bottom=True,
        )
        ctx = build_render_context(rig, cfg)
        side_images = jnp.asarray(
            np.stack(
                [views[i] for i in [rig.ids.index(s) for s in rig.side_ids]]
            )
        )
        top = jnp.asarray(views[rig.top_camera_index])
        bottom = jnp.asarray(views[rig.bottom_camera_index])
        assert P._merge_poles(ctx)
        out_m, st_m = render_frame(ctx, side_images, top, bottom)
        monkeypatch.setattr(P, "_merge_poles", lambda _ctx: False)
        out_s, st_s = render_frame(ctx, side_images, top, bottom)
        a = np.asarray(out_m["equirect"])
        b = np.asarray(out_s["equirect"])
        assert np.abs(a - b).mean() < 1e-3, np.abs(a - b).mean()
        p = psnr(a, b)
        assert p > 45.0, f"merged-vs-sequential poles: {p:.1f} dB"
        # identical temporal-state format (keys and shapes)
        assert set(st_m) == set(st_s)
        for k in st_m:
            assert st_m[k].shape == st_s[k].shape, k
        # and a temporal second frame chains through the merged program
        out_2, _ = render_frame(
            ctx, side_images, top, bottom, state=st_m, use_temporal=True
        )
        assert np.isfinite(np.asarray(out_2["equirect"])).all()

    def test_staged_renderer_matches_monolithic(self, rig, views):
        """The preset-scale staged driver (sequential jitted stages) must
        produce the same frame and state as the single-program path."""
        from surround360_tpu.render.panorama import make_jitted_renderer

        cfg = RenderConfig(
            eqr_width=280,
            eqr_height=140,
            side_flow_alg="pixflow_tpu",
            polar_flow_alg="pixflow_tpu",
            enable_top=True,
            enable_bottom=True,
            # exercises the device-arg final-resize matrices (8k path)
            final_eqr_width=256,
            final_eqr_height=256,
        )
        ctx = build_render_context(rig, cfg)
        side_images = jnp.asarray(
            np.stack(
                [views[i] for i in [rig.ids.index(s) for s in rig.side_ids]]
            )
        )
        top = jnp.asarray(views[rig.top_camera_index])
        bottom = jnp.asarray(views[rig.bottom_camera_index])
        mono = make_jitted_renderer(ctx, staged=False)
        staged = make_jitted_renderer(ctx, staged=True)
        out_m, st_m = mono(side_images, top, bottom, None)
        out_s, st_s = staged(side_images, top, bottom, None)
        np.testing.assert_allclose(
            np.asarray(out_m["equirect"]),
            np.asarray(out_s["equirect"]),
            atol=1e-5,
        )
        assert set(st_m.keys()) == set(st_s.keys())
        # temporal chaining works through the staged driver too
        out_s2, _ = staged(side_images, top, bottom, st_s)
        assert np.isfinite(np.asarray(out_s2["equirect"])).all()

    def test_polar_flow_full_res_matches_half_res(self, rig, views):
        """polar_flow_scale=1.0 (the reference's full-res pole flow,
        TestRenderStereoPanorama.cpp:388-561) must run and closely match
        the cheaper 0.5 default (measured 117 dB apart on chip)."""
        side_images = jnp.asarray(
            np.stack(
                [views[i] for i in [rig.ids.index(s) for s in rig.side_ids]]
            )
        )
        top = jnp.asarray(views[rig.top_camera_index])
        bottom = jnp.asarray(views[rig.bottom_camera_index])
        outs = {}
        for scale in (0.5, 1.0):
            cfg = RenderConfig(
                eqr_width=280,
                eqr_height=140,
                side_flow_alg="pixflow_tpu",
                polar_flow_alg="pixflow_tpu",
                enable_top=True,
                enable_bottom=True,
                polar_flow_scale=scale,
            )
            ctx = build_render_context(rig, cfg)
            outputs, _ = render_frame(ctx, side_images, top, bottom)
            outs[scale] = np.asarray(outputs["equirect"])
        p = psnr(outs[0.5], outs[1.0])
        assert p > 35.0, f"half-res vs full-res pole flow: {p:.1f} dB"

    def test_cubemap_output(self, rig, views):
        cfg = RenderConfig(
            eqr_width=280,
            eqr_height=140,
            side_flow_alg="pixflow_tpu",
            cubemap_width=64,
            cubemap_height=64,
            cubemap_format="video",
        )
        ctx = build_render_context(rig, cfg)
        side_images = jnp.asarray(
            np.stack(
                [views[i] for i in [rig.ids.index(s) for s in rig.side_ids]]
            )
        )
        outputs, _ = render_frame(ctx, side_images)
        # video format: 3x2 faces per eye, stacked vertically for stereo
        assert outputs["cubemap"].shape == (3, 2 * 2 * 64, 3 * 64)

    def test_cubemap_banded_matches_dense_wrap(self):
        """The banded cubemap (stacked unwrapped warps on a padded pano,
        constant border) must equal the round-1 dense per-face remap with
        border='wrap' — the BORDER_WRAP contract of ImageWarper.cpp:137."""
        from surround360_tpu.ops.remap import remap
        from surround360_tpu.ops.warp import (
            CUBEMAP_FACE_ORDER,
            equirect_to_cubemap_warp,
        )
        from surround360_tpu.render.panorama import _cubemap

        rng = np.random.default_rng(7)
        eqr_h, eqr_w, face = 96, 192, 48
        pano = jnp.asarray(rng.uniform(size=(3, eqr_h, eqr_w)), jnp.float32)
        for fmt in ("video", "photo"):
            cfg = RenderConfig(
                eqr_width=eqr_w,
                eqr_height=eqr_h,
                cubemap_width=face,
                cubemap_height=face,
                cubemap_format=fmt,
            )
            ctx = SimpleNamespace(config=cfg)
            got = np.asarray(_cubemap(ctx, pano))
            faces = {
                f: remap(
                    pano,
                    jnp.asarray(
                        equirect_to_cubemap_warp(
                            (eqr_h, eqr_w), (face, face), f, np.pi
                        )
                    ),
                    interpolation="bicubic",
                    border="wrap",
                )
                for f in CUBEMAP_FACE_ORDER
            }
            if fmt == "video":
                first3 = [
                    np.flip(faces[f], axis=-1) for f in ("left", "right", "top")
                ]
                second3 = [
                    np.flip(faces[f], axis=-1)
                    for f in ("bottom", "back", "front")
                ]
                want = np.concatenate(
                    [
                        np.concatenate(first3, axis=-1),
                        np.concatenate(second3, axis=-1),
                    ],
                    axis=-2,
                )
            else:
                want = np.concatenate(
                    [faces[f] for f in CUBEMAP_FACE_ORDER], axis=-2
                )
            err = np.abs(got - want).max()
            assert err < 1e-4, f"{fmt}: banded vs dense-wrap cubemap {err}"

    def test_temporal_state_roundtrip(self, rig, views):
        cfg = RenderConfig(
            eqr_width=280, eqr_height=140, side_flow_alg="pixflow_tpu"
        )
        ctx = build_render_context(rig, cfg)
        side_images = jnp.asarray(
            np.stack(
                [views[i] for i in [rig.ids.index(s) for s in rig.side_ids]]
            )
        )
        out1, state1 = render_frame(ctx, side_images)
        out2, state2 = render_frame(
            ctx, side_images, state=state1, use_temporal=True
        )
        # static scene + temporal prior: frame 2 must match frame 1 closely
        p = psnr(out1["equirect"], out2["equirect"])
        assert p > 35.0, f"temporal stability on static scene: {p:.1f} dB"


class TestDebugOutputs:
    def test_save_debug_returns_intermediates(self, rig, views, ring_render):
        ctx, _, _ = ring_render
        side_images = jnp.asarray(
            np.stack([views[i] for i in [rig.ids.index(s) for s in rig.side_ids]])
        )
        outputs, _ = render_frame(ctx, side_images, save_debug=True)
        dbg = outputs["debug"]
        assert dbg["projections"].shape[0] == 14
        assert dbg["spherical_l"].shape == dbg["spherical_r"].shape


class TestFiniteDepthScene:
    def test_parallax_scene_renders_stereo(self, rig):
        """A scene at 3m (vs the 21.8cm ring) has real parallax: the pair
        flows must be nonzero and the two eyes must genuinely differ."""
        views = render_camera_views(rig, scene_distance=300.0)
        cfg = RenderConfig(
            eqr_width=280, eqr_height=140, side_flow_alg="pixflow_tpu",
            zero_parallax_dist=300.0,
        )
        ctx = build_render_context(rig, cfg)
        side_images = jnp.asarray(
            np.stack([views[i] for i in [rig.ids.index(s) for s in rig.side_ids]])
        )
        outputs, state = render_frame(ctx, side_images)
        eqr = np.asarray(outputs["equirect"])
        assert np.isfinite(eqr).all()
        pad = (140 - ctx.strip_h) // 2
        band = slice(pad + 6, pad + ctx.strip_h - 6)
        left, right = eqr[:, :140][:, band], eqr[:, 140:][:, band]
        # content present and textured in both eyes
        assert left.std() > 0.05 and right.std() > 0.05
        # the pair flows picked up real disparity (state flows are stored
        # at the solver's working resolution/units — half the full-res
        # pixel values)
        flow_mag = np.abs(np.asarray(state["pair_flow_ltr"])[:, 0]).mean()
        assert flow_mag > 0.15, f"expected nonzero pair flow, got {flow_mag}"
        # and the scene still resembles the environment (looser than the
        # at-infinity bound: novel-view interpolation at finite depth)
        expect = render_equirect_reference(ctx)
        p = psnr(left, expect[:, band])
        assert p > 17.0, f"finite-depth side-band PSNR: {p:.1f} dB"

    def test_side_flow_scale_matches_full_res(self, rig):
        """side_flow_scale=0.5 (pair flows computed on downscaled
        overlaps, the preset-scale default) must closely match the
        full-res flows on a REAL-parallax scene, including through a
        temporal step (state is stored at the scaled working
        resolution)."""
        views = render_camera_views(rig, scene_distance=300.0)
        side_images = jnp.asarray(
            np.stack([views[i] for i in [rig.ids.index(s) for s in rig.side_ids]])
        )
        outs = {}
        for scale in (1.0, 0.5):
            cfg = RenderConfig(
                eqr_width=280, eqr_height=140, side_flow_alg="pixflow_tpu",
                zero_parallax_dist=300.0, side_flow_scale=scale,
            )
            ctx = build_render_context(rig, cfg)
            out1, st1 = render_frame(ctx, side_images)
            out2, _ = render_frame(
                ctx, side_images, state=st1, use_temporal=True
            )
            outs[scale] = (np.asarray(out1["equirect"]),
                           np.asarray(out2["equirect"]))
        p1 = psnr(outs[0.5][0], outs[1.0][0])
        p2 = psnr(outs[0.5][1], outs[1.0][1])
        assert p1 > 30.0, f"scaled vs full-res side flow (frame 1): {p1:.1f} dB"
        assert p2 > 30.0, f"scaled vs full-res side flow (frame 2): {p2:.1f} dB"


class TestResidualSamplerIntegration:
    """Force the preset-scale residual-window paths at CI scale and
    assert they agree with the static-window render (the two samplers
    must be interchangeable wherever the displacement spread fits)."""

    def test_render_matches_static_paths(self, rig, views):
        import surround360_tpu.render.panorama as pano_mod
        import surround360_tpu.views.novel_view as nv_mod

        side_images = jnp.asarray(
            np.stack([views[rig.ids.index(s)] for s in rig.side_ids])
        )
        top = jnp.asarray(views[rig.top_camera_index])
        bottom = jnp.asarray(views[rig.bottom_camera_index])
        cfg = RenderConfig(
            eqr_width=280,
            eqr_height=140,
            side_flow_alg="pixflow_tpu",
            polar_flow_alg="pixflow_tpu",
            enable_top=True,
            enable_bottom=True,
        )
        ctx = build_render_context(rig, cfg)
        ref, _ = render_frame(ctx, side_images, top, bottom)

        saved = (
            pano_mod.RESIDUAL_SAMPLER_MIN_EQR_W,
            nv_mod.RESIDUAL_MIN_HALO_Y,
            nv_mod.RESIDUAL_MIN_HALO_X,
        )
        pano_mod.RESIDUAL_SAMPLER_MIN_EQR_W = 1
        nv_mod.RESIDUAL_MIN_HALO_Y = 1
        nv_mod.RESIDUAL_MIN_HALO_X = 1
        try:
            out, _ = render_frame(ctx, side_images, top, bottom)
        finally:
            (
                pano_mod.RESIDUAL_SAMPLER_MIN_EQR_W,
                nv_mod.RESIDUAL_MIN_HALO_Y,
                nv_mod.RESIDUAL_MIN_HALO_X,
            ) = saved

        a = np.asarray(ref["equirect"])
        b = np.asarray(out["equirect"])
        # identical up to beyond-residual-halo taps (none on this scene)
        p = psnr(a, b)
        assert p > 40.0, f"residual vs static render: {p:.1f} dB"
