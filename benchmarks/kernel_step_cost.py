"""Minimized Mosaic repro: attribute the fused kernel's per-step cost.

Round-4 measured the offsets-mode lead-folded kernel at ~57 us per lead
step at the side-L0 flow-ranking geometry vs ~12 us modeled (VPU tent
build + MXU dots), and shipped the offset-ranking formulation opt-in
because the gap was unattributed (BASELINE.md round-4 offset-ranking
experiment). This script isolates the suspects one at a time in tiny
single-tile kernels so the culprit is measured, not guessed:

  dots       MXU contractions alone (constant operands)
  tent       + the distance-kernel interpolation-matrix build
  roll       + pltpu.roll of the window per unique x-offset
  dyn        dynamic-index VMEM read/write inside fori_loop vs an
             unrolled static-index variant of the same body

Each variant runs as a (N,) grid whose step executes the same body;
cost(N2) - cost(N1) / (N2 - N1) gives us per-step time with dispatch
and fixed overheads cancelled.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernel_step_cost.py
Env: S360_STEP_REPS (20)
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# side-L0 ranking geometry (round-4 experiment): window 64x512 f32,
# Pg=512 samples/step, C=1 gradient channel pair folded to 2, 13 offsets
BH, BW = 64, 512
PG = 512
C = 2
N_OX = 5  # unique x-offsets among the 13 ranking offsets


def _sync(out):
    # np.asarray of a scalar slice is the only RELIABLE device sync under
    # the axon relay: jax.block_until_ready can return without waiting
    # (measured 2026-08-19: 10 queued 4096^2 matmuls + block "finished" in
    # 0.24 ms total -> 29x hardware peak; a fetch-synced scan chain of the
    # same matmul measures 179.8 TF/s = 91% of bf16 peak, so the chip is
    # fine, the sync isn't). bench.py/profile_stages already fetch.
    np.asarray(out[0, 0, 0])


def _time_grid(make_kernel, n_steps, out_shape, args, reps):
    fn = make_kernel(n_steps)
    _sync(fn(*args))
    best = float("inf")
    for _ in range(3):  # best-of-3 batches to shed tunnel noise
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    reps = int(os.environ.get("S360_STEP_REPS", "20"))
    rng = np.random.default_rng(0)
    win_host = jnp.asarray(rng.random((C, BH, BW)).astype(np.float32))
    def x_steps(n_steps):
        # sublane-padded to satisfy the (8, 128) min block tile
        return jnp.asarray(
            (rng.random((n_steps, 8, PG)) * (BW - 8) + 2).astype(np.float32)
        )
    prec = jax.lax.Precision.HIGHEST

    a = -0.75

    def k01(s):
        return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

    def k12(s):
        return ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a

    def tent(xv, b):
        grid = jax.lax.broadcasted_iota(jnp.int32, (PG, b), 1).astype(
            jnp.float32
        )
        s = jnp.abs(xv[:, None] - grid)
        return jnp.where(
            s < 1.0, k01(s), jnp.where(s < 2.0, k12(s), 0.0)
        ).astype(jnp.float32)

    def dot(oh, w):
        return jax.lax.dot_general(
            oh,
            w.reshape(C * BH, BW),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    results = {}

    def variant(name, body, n_out=1):
        def make(n_steps):
            def kernel(x_ref, win_ref, out_ref):
                body(x_ref, win_ref, out_ref)

            return jax.jit(
                partial(
                    pl.pallas_call,
                    kernel,
                    grid=(n_steps,),
                    in_specs=[
                        # per-step coord block defeats grid-invariant
                        # hoisting (the real kernel's coords vary per step)
                        pl.BlockSpec((1, 8, PG), lambda i: (i, 0, 0)),
                        pl.BlockSpec((C, BH, BW), lambda i: (0, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec(
                        (1, n_out, PG), lambda i: (i, 0, 0)
                    ),
                    out_shape=jax.ShapeDtypeStruct(
                        (n_steps, n_out, PG), jnp.float32
                    ),
                )()
            )

        ns = (64, 4096)
        ts = [
            _time_grid(make, n, (n, n_out, PG), (x_steps(n), win_host), reps)
            for n in ns
        ]
        per_step_us = (ts[1] - ts[0]) / (ns[1] - ns[0]) * 1e6
        results[name] = round(per_step_us, 2)
        print(
            f"{name:28s} {per_step_us:8.2f} us/step   "
            f"(t64 {ts[0]*1e3:.2f} ms, t4096 {ts[1]*1e3:.2f} ms)"
        )

    # --- dots only: constant one-hot built once per step from iota (no
    # coords), N_OX dots against the same window ---
    def body_dots(x_ref, win_ref, out_ref):
        # coord-dependent but tent-free: scale iota by the first coord so
        # the dots cannot be hoisted, without paying the tent build
        oh = jax.lax.broadcasted_iota(jnp.int32, (PG, BW), 1).astype(
            jnp.float32
        ) * (x_ref[0, 0, 0] * 1e-6)
        for o in range(N_OX):
            out_ref[0, o, :] = jnp.sum(
                dot(oh + float(o), win_ref[...])[:, :BH], axis=-1
            )

    variant("dots_x5", body_dots, n_out=N_OX)

    # --- + tent build (one shared build, as the offsets kernel does) ---
    def body_tent(x_ref, win_ref, out_ref):
        oh = tent(x_ref[0, 0], BW)
        for o in range(N_OX):
            out_ref[0, o, :] = jnp.sum(
                dot(oh, win_ref[...])[:, :BH], axis=-1
            )

    variant("tent_plus_dots_x5", body_tent, n_out=N_OX)

    # --- + per-offset window roll (the offsets-mode inner loop) ---
    def body_roll(x_ref, win_ref, out_ref):
        oh = tent(x_ref[0, 0], BW)
        w = win_ref[...]
        for o in range(N_OX):
            wr = pltpu.roll(w.reshape(C * BH, BW), o, 1) if o else w.reshape(
                C * BH, BW
            )
            out_ref[0, o, :] = jnp.sum(
                jax.lax.dot_general(
                    oh, wr,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )[:, :BH],
                axis=-1,
            )

    variant("tent_dots_roll_x5", body_roll, n_out=N_OX)

    # --- dynamic-index VMEM access inside fori_loop vs static unroll ---
    L = 8

    def make_dyn(unrolled):
        def make(n_steps):
            def kernel(x_ref, win_ref, out_ref):
                def body(l, _):
                    oh = tent(x_ref[0, l], BW)
                    out_ref[0, l, :] = jnp.sum(
                        dot(oh, win_ref[...])[:, :BH], axis=-1
                    )
                    return 0

                if unrolled:
                    for l in range(L):
                        body(l, 0)
                else:
                    jax.lax.fori_loop(0, L, body, 0)

            return jax.jit(
                partial(
                    pl.pallas_call,
                    kernel,
                    grid=(n_steps,),
                    in_specs=[
                        pl.BlockSpec((1, L, PG), lambda i: (i, 0, 0)),
                        pl.BlockSpec((C, BH, BW), lambda i: (0, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, L, PG), lambda i: (i, 0, 0)),
                    out_shape=jax.ShapeDtypeStruct(
                        (n_steps, L, PG), jnp.float32
                    ),
                )()
            )

        return make

    def xs_steps(n_steps):
        return jnp.asarray(
            (rng.random((n_steps, L, PG)) * (BW - 8) + 2).astype(np.float32)
        )

    for unrolled in (False, True):
        name = f"lead8_{'unrolled' if unrolled else 'fori'}"
        make = make_dyn(unrolled)
        ns = (64, 512)  # 8 leads/step -> 512 steps is already 4096 bodies
        ts = [
            _time_grid(make, n, None, (xs_steps(n), win_host), reps)
            for n in ns
        ]
        per_step_us = (ts[1] - ts[0]) / (ns[1] - ns[0]) * 1e6
        per_lead_us = per_step_us / L
        results[name] = round(per_lead_us, 2)
        print(
            f"{name:28s} {per_step_us:8.2f} us/step "
            f"({L} leads/step -> {per_lead_us:.2f} us/lead)"
        )

    # --- per-step dynamic window DMA (the fused kernel's real structure:
    # window origin is data-dependent, copied HBM->VMEM each step) ---
    BIGH = BH * 4

    def make_dma(n_steps):
        big = jnp.asarray(
            rng.random((C, BIGH, BW)).astype(np.float32)
        )

        def kernel(x_ref, big_ref, out_ref, win_scr, sem):
            oy = (jax.lax.convert_element_type(x_ref[0, 0, 0] % 128.0, jnp.int32) // 8) * 8
            cp = pltpu.make_async_copy(
                big_ref.at[:, pl.ds(oy, BH), :], win_scr, sem
            )
            cp.start()
            cp.wait()
            oh = tent(x_ref[0, 0], BW)
            for o in range(N_OX):
                out_ref[0, o, :] = jnp.sum(
                    jax.lax.dot_general(
                        oh,
                        win_scr[...].reshape(C * BH, BW),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )[:, :BH],
                    axis=-1,
                )

        return jax.jit(
            pl.pallas_call(
                kernel,
                grid=(n_steps,),
                in_specs=[
                    pl.BlockSpec((1, 8, PG), lambda i: (i, 0, 0)),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((1, N_OX, PG), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct(
                    (n_steps, N_OX, PG), jnp.float32
                ),
                scratch_shapes=[
                    pltpu.VMEM((C, BH, BW), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
            )
        )

    def run_dma():
        ns = (64, 4096)
        ts = []
        for n in ns:
            fn = make_dma(n)
            args = (x_steps(n), jnp.asarray(
                rng.random((C, BIGH, BW)).astype(np.float32)))
            _sync(fn(*args))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                for _ in range(reps):
                    out = fn(*args)
                _sync(out)
                best = min(best, (time.time() - t0) / reps)
            ts.append(best)
        per_step_us = (ts[1] - ts[0]) / (ns[1] - ns[0]) * 1e6
        results["tent_dots_dyn_dma_x5"] = round(per_step_us, 2)
        print(
            f"{'tent_dots_dyn_dma_x5':28s} {per_step_us:8.2f} us/step   "
            f"(t64 {ts[0]*1e3:.2f} ms, t4096 {ts[1]*1e3:.2f} ms)"
        )

    run_dma()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
