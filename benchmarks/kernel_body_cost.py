"""Attribute the NON-OFFSETS fused-sampler step cost, component by
component, at the 6k novel-view geometry.

Round-5 found stage time scales ~linearly with Pg (samples per step) but
NOT with the interpolation-matrix build width (tight-x shrank the build
384 -> 256 lanes and bought only 2.3%), so the per-sample bound is some
other ~constant-per-sample component. This probe runs the real kernel
body (bicubic distance-kernel builds, 3-pass bf16-limb contraction,
per-channel mul-reduce, residual lane-roll, window DMA) as minimized
(N,)-grid kernels, with ONE component stubbed per variant — the stub
keeps a per-step data dependency so Mosaic can't hoist or DCE it. The
difference full - stubbed attributes that component; per-step cost comes
from a (N1, N2) grid-size contrast so dispatch and fixed overheads
cancel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernel_body_cost.py
Env: S360_STEP_REPS (10), S360_BODY_* geometry overrides.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# 6k novel-view residual-sampler geometry (BASELINE.md round-5):
# window 72x384 f32 fetch, tight build width 256 (p.bw=149), Pg=512
# samples/step, C=4 RGBA, bicubic, f32 3-pass limb emulation
C = int(os.environ.get("S360_BODY_C", "4"))
BH = int(os.environ.get("S360_BODY_BH", "72"))
BW = int(os.environ.get("S360_BODY_BW", "384"))
BWB = int(os.environ.get("S360_BODY_BWB", "256"))
PG = int(os.environ.get("S360_BODY_PG", "512"))
N1, N2 = 256, 2048


def _sync(out):
    np.asarray(out[0, 0, 0])  # scalar fetch: the only reliable axon sync


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    reps = int(os.environ.get("S360_STEP_REPS", "10"))
    rng = np.random.default_rng(0)
    win_host = jnp.asarray(rng.random((C * BH, BW)).astype(np.float32))
    a = -0.75

    def k01(s):
        return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

    def k12(s):
        return ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a

    def bicubic_matrix(xv, b):
        grid = jax.lax.broadcasted_iota(jnp.int32, (PG, b), 1)
        s = jnp.abs(xv[:, None] - grid.astype(jnp.float32))
        return jnp.where(s < 1.0, k01(s), jnp.where(s < 2.0, k12(s), 0.0))

    def dot3(ax, b):
        ah = ax.astype(jnp.bfloat16)
        al = (ax - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh_ = b.astype(jnp.bfloat16)
        bl = (b - bh_.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        f = lambda p, q: jax.lax.dot_general(
            p, q, dimension_numbers=dn, preferred_element_type=jnp.float32
        )
        return f(ah, bh_) + f(al, bh_) + f(ah, bl)

    # stubs: per-step-varying cheap stand-ins (defeat hoisting/DCE)
    def stub_matrix(xv, b):
        return xv[:, None] * jnp.full((PG, b), 1e-3, jnp.float32)

    def stub_tmp(xv):
        return xv[:, None] * jnp.full((PG, C * BH), 1e-3, jnp.float32)

    def body(x, y, shift, win, out_write, *, ohx_on, ohy_on, dot_on,
             reduce_on, roll_on):
        mat = bicubic_matrix if ohx_on else stub_matrix
        ohx = mat(x, BWB)
        maty = bicubic_matrix if ohy_on else stub_matrix
        ohy32 = maty(y, BH)
        wm = win
        if roll_on:
            wm = pltpu.roll(wm, shift, 1)
        wm = wm[:, :BWB]
        if dot_on:
            tmp = dot3(ohx, wm)  # (PG, C*BH)
        else:
            tmp = stub_tmp(x) + ohx[:, :1]  # keep ohx live
        for c in range(C):
            if reduce_on:
                v = jnp.sum(tmp[:, c * BH : (c + 1) * BH] * ohy32, axis=-1)
            else:
                v = tmp[:, c * BH] + ohy32[:, 0]  # keep inputs live
            out_write(c, v)

    def make_variant(n_steps, dma, **toggles):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((1, 1, PG), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, PG), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY)
                if dma
                else pl.BlockSpec(
                    (C * BH, BW), lambda i, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, C, PG), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=(
                [pltpu.VMEM((2, C * BH, BW), jnp.float32),
                 pltpu.SemaphoreType.DMA((2,))]
                if dma
                else []
            ),
        )

        def kernel(sh_ref, x_ref, y_ref, win_ref, out_ref, *scr):
            i = pl.program_id(0)
            x = x_ref[0, 0]
            y = y_ref[0, 0]
            shift = sh_ref[i]
            if dma:
                win_scr, sem = scr
                n = pl.num_programs(0)

                def start(j, slot):
                    # rotate the source row offset per step so the DMA
                    # isn't a cached re-read of one address
                    pltpu.make_async_copy(
                        win_ref.at[pl.ds((j % 8) * 8, C * BH), :],
                        win_scr.at[slot],
                        sem.at[slot],
                    ).start()

                @pl.when(i == 0)
                def _():
                    start(0, 0)

                @pl.when(i + 1 < n)
                def _():
                    start(i + 1, (i + 1) % 2)

                pltpu.make_async_copy(
                    win_ref.at[pl.ds((i % 8) * 8, C * BH), :],
                    win_scr.at[i % 2],
                    sem.at[i % 2],
                ).wait()
                win = win_scr[i % 2]
            else:
                win = win_ref[...]

            def out_write(c, v):
                out_ref[0, c, :] = v

            body(x, y, shift, win, out_write, **toggles)

        def fn(shifts, xs, ys, win):
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((n_steps, C, PG), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024
                ),
                interpret=jax.default_backend() != "tpu",
            )(shifts, xs, ys, win)

        return jax.jit(fn)

    def inputs(n_steps, dma):
        xs = jnp.asarray(
            rng.uniform(2, BWB - 3, (n_steps, 1, PG)).astype(np.float32)
        )
        ys = jnp.asarray(
            rng.uniform(2, BH - 3, (n_steps, 1, PG)).astype(np.float32)
        )
        shifts = jnp.asarray(rng.integers(0, 128, n_steps, np.int32))
        win = (
            jnp.asarray(rng.random((C * BH + 64, BW)).astype(np.float32))
            if dma
            else win_host
        )
        return shifts, xs, ys, win

    def measure(name, dma=False, **toggles):
        per = {}
        for n_steps in (N1, N2):
            fn = make_variant(n_steps, dma, **toggles)
            args = inputs(n_steps, dma)
            _sync(fn(*args))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                for _ in range(reps):
                    out = fn(*args)
                _sync(out)
                best = min(best, (time.time() - t0) / reps)
            per[n_steps] = best
        us = (per[N2] - per[N1]) / (N2 - N1) * 1e6
        print(f"{name:24s} {us:8.2f} us/step", flush=True)
        return us

    only = os.environ.get("S360_BODY_ONLY", "")
    on = dict(
        ohx_on=True, ohy_on=True, dot_on=True, reduce_on=True, roll_on=True
    )
    variants = {"full": (False, on)}
    for stub in ("ohx", "ohy", "dot", "reduce", "roll"):
        variants[f"no_{stub}"] = (False, {**on, f"{stub}_on": False})
    variants["full_dma"] = (True, on)
    res = {}
    for name, (dma, toggles) in variants.items():
        if only and name != only:
            continue
        res[name] = measure(name, dma=dma, **toggles)
    if "full" in res:
        out = {"full": res["full"]}
        for name, v in res.items():
            if name.startswith("no_"):
                out[name[3:]] = res["full"] - v
        if "full_dma" in res:
            out["dma"] = res["full_dma"] - res["full"]
        res = out
    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
