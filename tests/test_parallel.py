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
