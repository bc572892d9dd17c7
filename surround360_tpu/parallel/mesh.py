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
import jax.numpy as jnp
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

    use_temporal=True gives chunked-sequential semantics, matching the
    reference's frame chain (TestRenderStereoPanorama.cpp:210-256): each
    data shard takes a contiguous chunk of frames and lax.scans over it
    carrying the flow-prior state; chunks run in parallel across the
    ``data`` axis and the chain only breaks at chunk boundaries. ``state``
    may be the per-shard state pytree returned by a previous step (leading
    dim = data-axis size) to chain across batches; with state=None each
    shard's first frame renders priorless (like the reference's frame 0).
    """
    dp = mesh.shape["data"]
    cam_sharding = NamedSharding(mesh, P("data", "ring"))
    fish_sharding = NamedSharding(mesh, P("data"))
    chunk_cam = NamedSharding(mesh, P("data", None, "ring"))
    chunk_fish = NamedSharding(mesh, P("data"))
    state_sharding = NamedSharding(mesh, P("data"))

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

        if not use_temporal:
            def one_frame(side, top, bottom):
                return render_frame(
                    ctx, side, top, bottom, state=None, use_temporal=False
                )

            outputs, states = jax.vmap(one_frame)(
                frames_side, frames_top, frames_bottom
            )
            return outputs, states

        F = frames_side.shape[0]
        assert F % dp == 0, f"frames {F} not divisible by data axis {dp}"
        c = F // dp

        def to_chunks(a, sh):
            if a is None:
                return None
            a = a.reshape((dp, c) + a.shape[1:])
            return jax.lax.with_sharding_constraint(a, sh)

        cs = to_chunks(frames_side, chunk_cam)
        ct = to_chunks(frames_top, chunk_fish)
        cb = to_chunks(frames_bottom, chunk_fish)

        def chunk_scan(side_c, top_c, bottom_c, init_state):
            start = 0
            if init_state is None:
                # frame 0 renders priorless and seeds the carry structure
                out0, init_state = render_frame(
                    ctx,
                    side_c[0],
                    None if top_c is None else top_c[0],
                    None if bottom_c is None else bottom_c[0],
                    state=None,
                    use_temporal=False,
                )
                start = 1

            def body(carry, frame):
                side, top, bottom = frame
                out, new_state = render_frame(
                    ctx, side, top, bottom, state=carry, use_temporal=True
                )
                return new_state, out

            xs = (
                side_c[start:],
                None if top_c is None else top_c[start:],
                None if bottom_c is None else bottom_c[start:],
            )
            last_state, outs = jax.lax.scan(body, init_state, xs)
            if start:
                outs = jax.tree_util.tree_map(
                    lambda o0, os: jnp.concatenate([o0[None], os]), out0, outs
                )
            return outs, last_state

        in_axes = (0, None if ct is None else 0, None if cb is None else 0,
                   None if state is None else 0)
        outputs, states = jax.vmap(chunk_scan, in_axes=in_axes)(
            cs, ct, cb, state
        )
        states = jax.lax.with_sharding_constraint(states, state_sharding)
        outputs = jax.tree_util.tree_map(
            lambda o: o.reshape((F,) + o.shape[2:]), outputs
        )
        return outputs, states

    return jax.jit(step), cam_sharding
