"""Device-mesh sharding for the renderer.

The reference's parallelism is pthread fan-out per camera / pair / eye on
one CPU (SURVEY §2.10). The TPU-native equivalents:

- **ring axis**: the 14 side cameras form a physical ring; camera strips and
  pair flows shard over a ``ring`` mesh axis. The only cross-shard exchange
  is each pair needing its right neighbor's overlap strip —
  ``jnp.roll(projections, -1, axis=0)`` over a sharded camera dim, which
  GSPMD lowers to a single collective-permute riding the ICI ring (the
  literal hardware ring matching the literal camera ring).
- **data axis**: video frames are embarrassingly parallel apart from the
  temporal flow prior; frames shard over ``data`` and the prior is carried
  inside each shard's frame-chunk (chunked-sequential semantics).

No manual collectives are written here: shardings are annotated via
NamedSharding and XLA inserts the comms.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.panorama import RenderContext, render_frame

__all__ = ["make_render_mesh", "shard_frame_batch", "sharded_render_step"]


def make_render_mesh(
    devices=None,
    data_parallel: int | None = None,
    num_side_cams: int = 14,
) -> Mesh:
    """Mesh over (data, ring). The ring axis must divide the side-camera
    count (14 -> ring in {1, 2, 7, 14}); with no hints, pick the largest
    valid ring (intra-frame parallelism, lowest per-frame latency) and put
    the rest on ``data`` (frame throughput)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data_parallel is None:
        ring = 1
        for cand in sorted(
            {d for d in range(1, num_side_cams + 1) if num_side_cams % d == 0}
        ):
            if n % cand == 0:
                ring = cand
        dp = n // ring
    else:
        dp = data_parallel
        assert n % dp == 0, f"{n} devices not divisible by data_parallel={dp}"
        ring = n // dp
        assert num_side_cams % ring == 0, (
            f"ring axis {ring} must divide the {num_side_cams}-camera ring"
        )
    return Mesh(devices.reshape(dp, n // dp), axis_names=("data", "ring"))


def shard_frame_batch(mesh: Mesh, frames_side_images):
    """Place a frame batch (F, N, 4, H, W) with frames on ``data`` and the
    camera ring on ``ring``."""
    sharding = NamedSharding(mesh, P("data", "ring"))
    return jax.device_put(frames_side_images, sharding)


def sharded_render_step(
    ctx: RenderContext,
    mesh: Mesh,
    use_temporal: bool = False,
):
    """Compile a frame-batch render step over ``mesh``.

    Returns fn(frames_side (F,N,4,H,W), frames_top (F,4,H,W) | None,
    frames_bottom | None, state) -> (outputs with leading F, new_state).
    F must be divisible by the ``data`` axis; N by the ``ring`` axis
    (14 pairs pad naturally on 1/2/7/14-way ring axes).
    """
    cam_sharding = NamedSharding(mesh, P("data", "ring"))
    fish_sharding = NamedSharding(mesh, P("data"))

    def step(frames_side, frames_top, frames_bottom, state):
        frames_side = jax.lax.with_sharding_constraint(
            frames_side, cam_sharding
        )
        if frames_top is not None:
            frames_top = jax.lax.with_sharding_constraint(
                frames_top, fish_sharding
            )
        if frames_bottom is not None:
            frames_bottom = jax.lax.with_sharding_constraint(
                frames_bottom, fish_sharding
            )

        def one_frame(side, top, bottom):
            out, new_state = render_frame(
                ctx, side, top, bottom, state=None, use_temporal=False
            )
            return out, new_state

        outputs, states = jax.vmap(one_frame)(
            frames_side, frames_top, frames_bottom
        )
        return outputs, states

    return jax.jit(step), cam_sharding
