"""Device-mesh sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surround360_tpu.parallel.mesh import (
    make_render_mesh,
    shard_frame_batch,
    sharded_render_step,
)

needs_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


class TestMeshConstruction:
    @needs_8
    def test_ring_axis_divides_cameras(self):
        mesh = make_render_mesh(jax.devices()[:8], num_side_cams=14)
        assert mesh.shape["ring"] in (1, 2, 7, 14)
        assert mesh.shape["data"] * mesh.shape["ring"] == 8

    @needs_8
    def test_explicit_dp(self):
        mesh = make_render_mesh(jax.devices()[:8], data_parallel=4)
        assert mesh.shape == {"data": 4, "ring": 2}

    @needs_8
    def test_invalid_ring_rejected(self):
        with pytest.raises(AssertionError):
            make_render_mesh(jax.devices()[:8], data_parallel=2)  # ring=4


class TestShardedRender:
    @needs_8
    def test_frame_batch_renders_and_matches_single(self):
        from surround360_tpu.capture import render_camera_views
        from surround360_tpu.geometry.rig import make_ring_rig
        from surround360_tpu.render.panorama import (
            RenderConfig,
            build_render_context,
            render_frame,
        )

        rig = make_ring_rig().rescaled(0.03125)
        cfg = RenderConfig(
            eqr_width=140, eqr_height=70, side_flow_alg="pixflow_tpu"
        )
        ctx = build_render_context(rig, cfg)
        views = render_camera_views(rig)
        side = jnp.asarray(
            np.stack([views[rig.ids.index(s)] for s in rig.side_ids])
        )
        single, _ = render_frame(ctx, side)

        mesh = make_render_mesh(jax.devices()[:8], num_side_cams=14)
        F = mesh.shape["data"] * 2
        frames = jnp.broadcast_to(side, (F,) + side.shape)
        step, _ = sharded_render_step(ctx, mesh)
        frames = shard_frame_batch(mesh, frames)
        outputs, _ = step(frames, None, None, None)
        out = np.asarray(outputs["equirect"])
        assert out.shape[0] == F
        # every sharded frame matches the single-device render
        for f in range(F):
            np.testing.assert_allclose(
                out[f], np.asarray(single["equirect"]), atol=1e-4
            )


class TestRingWidths:
    """Camera-dim sharding at the widths real hardware would use: ring=7
    (2 cams/device) and ring=14 (1 cam/device) — the neighbor-overlap
    exchange (jnp.roll over the sharded camera dim) lowers to a
    collective permute at real ring widths, and the output must equal the
    single-device render exactly."""

    @pytest.fixture(scope="class")
    def scene(self):
        from surround360_tpu.capture import render_camera_views
        from surround360_tpu.geometry.rig import make_ring_rig
        from surround360_tpu.render.panorama import (
            RenderConfig,
            build_render_context,
            render_frame,
        )

        rig = make_ring_rig().rescaled(0.03125)
        cfg = RenderConfig(
            eqr_width=140, eqr_height=70, side_flow_alg="pixflow_tpu"
        )
        ctx = build_render_context(rig, cfg)
        views = render_camera_views(rig)
        side = jnp.asarray(
            np.stack([views[rig.ids.index(s)] for s in rig.side_ids])
        )
        single, _ = render_frame(ctx, side)
        return ctx, side, np.asarray(single["equirect"])

    @pytest.mark.parametrize("n_dev", [7, 14])
    def test_ring_matches_single_device(self, scene, n_dev):
        if jax.device_count() < n_dev:
            pytest.skip(f"needs {n_dev} virtual devices")
        ctx, side, single = scene
        mesh = make_render_mesh(jax.devices()[:n_dev], num_side_cams=14)
        assert mesh.shape["ring"] == n_dev and mesh.shape["data"] == 1
        step, _ = sharded_render_step(ctx, mesh)
        frames = shard_frame_batch(mesh, side[None])
        outputs, _ = step(frames, None, None, None)
        np.testing.assert_allclose(
            np.asarray(outputs["equirect"])[0], single, atol=1e-4
        )


class TestShardedTemporal:
    @needs_8
    def test_chunked_sequential_matches_single_device_chain(self):
        """use_temporal=True: each data shard scans its contiguous frame
        chunk carrying the flow prior — identical to a sequential
        single-device loop over that chunk (reference frame chain,
        TestRenderStereoPanorama.cpp:210-256)."""
        from surround360_tpu.capture import render_camera_views
        from surround360_tpu.geometry.rig import make_ring_rig
        from surround360_tpu.render.panorama import (
            RenderConfig,
            build_render_context,
            render_frame,
        )

        rig = make_ring_rig().rescaled(0.03125)
        cfg = RenderConfig(
            eqr_width=140, eqr_height=70, side_flow_alg="pixflow_tpu"
        )
        ctx = build_render_context(rig, cfg)
        views = render_camera_views(rig)
        side = jnp.asarray(
            np.stack([views[rig.ids.index(s)] for s in rig.side_ids])
        )

        mesh = make_render_mesh(jax.devices()[:8], num_side_cams=14)
        dp = mesh.shape["data"]
        c = 2
        F = dp * c
        # distinct frames: global brightness drift makes the temporal
        # prior actually matter
        gains = (0.8 + 0.4 * np.arange(F) / max(F - 1, 1)).astype(np.float32)
        frames = jnp.stack(
            [
                jnp.concatenate([side[:, :3] * g, side[:, 3:]], axis=1)
                for g in gains
            ]
        )

        step, _ = sharded_render_step(ctx, mesh, use_temporal=True)
        sharded = shard_frame_batch(mesh, frames)
        outputs, states = step(sharded, None, None, None)
        out = np.asarray(outputs["equirect"])
        assert out.shape[0] == F

        # chaining across batches: feed the returned per-shard states back
        outputs2, _ = step(sharded, None, None, states)
        out2 = np.asarray(outputs2["equirect"])
        assert out2.shape[0] == F

        # sequential reference per chunk: batch 1 resets at chunk borders,
        # batch 2 CONTINUES each shard's chain through the returned state —
        # both must equal the single-device loop frame for frame
        for d in range(dp):
            st = None
            for batch, batch_out in ((0, out), (1, out2)):
                for i in range(c):
                    f = d * c + i
                    ref, st = render_frame(
                        ctx,
                        frames[f],
                        state=st,
                        use_temporal=st is not None,
                    )
                    np.testing.assert_allclose(
                        batch_out[f], np.asarray(ref["equirect"]), atol=1e-4,
                        err_msg=f"shard {d} batch {batch} frame {i}",
                    )
