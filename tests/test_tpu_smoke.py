"""TPU-gated Mosaic smoke tests.

The Pallas paths are CI-covered in interpret mode (exact, CPU); Mosaic
COMPILATION is only exercised on real hardware. These tests run on the
bench box (skipped on CPU) so Mosaic regressions surface before bench:
VERDICT round-3 weak #5. They bypass tests/conftest.py's JAX_PLATFORMS
pin via a dedicated env marker: run with S360_TPU_SMOKE=1 and no
platform override, e.g.

  PYTHONPATH=/root/repo:/root/.axon_site S360_TPU_SMOKE=1 \
      python -m pytest tests/test_tpu_smoke.py -q
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("S360_TPU_SMOKE") != "1",
    reason="TPU smoke tests run only with S360_TPU_SMOKE=1 on the bench box",
)


@requires_tpu
class TestMosaicSmoke:
    def setup_method(self, _):
        import jax

        if jax.default_backend() not in ("tpu", "axon"):
            pytest.skip("no TPU backend")

    def test_fused_window_sample_compiles_and_matches(self):
        """Static-origin kernel at a preset-scale-like tile shape: Mosaic
        compile + f32 parity vs the XLA einsum route."""
        import jax.numpy as jnp

        from surround360_tpu.ops.window_sampler import make_window_sampler

        rng = np.random.default_rng(0)
        H, W, B, K = 256, 384, 4, 13
        img = jnp.asarray(rng.random((B, 2, H, W)).astype(np.float32))
        gy, gx = np.meshgrid(
            np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32),
            indexing="ij",
        )
        dxs = (rng.random((K, B, H, W)) * 2 - 1) * 20
        dys = (rng.random((K, B, H, W)) * 2 - 1) * 14
        xs = jnp.asarray(np.clip(gx + dxs, 0, W - 1).astype(np.float32))
        ys = jnp.asarray(np.clip(gy + dys, 0, H - 1).astype(np.float32))
        f_p = make_window_sampler(
            img, (H, W), 16, 24, "bilinear", "clamp",
            precision="float32", backend="pallas",
        )
        f_x = make_window_sampler(
            img, (H, W), 16, 24, "bilinear", "clamp",
            precision="float32", backend="xla",
        )
        a, b = np.asarray(f_p(xs, ys)), np.asarray(f_x(xs, ys))
        assert np.abs(a - b).max() < 1e-4

    def test_static_remap_pallas_compiles(self):
        """The projection path's fused remap at a realistic camera shape."""
        import jax.numpy as jnp

        from surround360_tpu.ops.remap import remap_static_banded_multi

        rng = np.random.default_rng(1)
        N, C, H, W = 3, 4, 512, 512
        imgs = jnp.asarray(rng.random((N, C, H, W)).astype(np.float32))
        gy, gx = np.meshgrid(
            np.arange(384, dtype=np.float32), np.arange(448, dtype=np.float32),
            indexing="ij",
        )
        coords = np.stack(
            [
                np.stack([gx * (W - 2) / 448 + 3 * np.sin(gy / 40),
                          gy * (H - 2) / 384 + 2 * np.cos(gx / 60)])
                for _ in range(N)
            ]
        ).astype(np.float32)
        out = remap_static_banded_multi(imgs, coords, "bicubic", "constant")
        out = np.asarray(out)
        assert out.shape == (N, C, 384, 448)
        assert np.isfinite(out).all()
        # against the XLA bucketed route
        from surround360_tpu.ops.remap import _remap_static_banded_bucketed

        ref = np.asarray(
            _remap_static_banded_bucketed(
                imgs, coords, "bicubic", "constant", 16, 64, None
            )
        )
        assert np.abs(out - ref).max() < 1e-4

    def test_bf16_mode_within_tolerance(self):
        import jax.numpy as jnp

        from surround360_tpu.ops.window_sampler import make_window_sampler

        rng = np.random.default_rng(2)
        H, W, B = 256, 256, 2
        img = jnp.asarray(rng.random((B, 2, H, W)).astype(np.float32))
        gy, gx = np.meshgrid(
            np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32),
            indexing="ij",
        )
        xs = jnp.asarray(np.clip(gx + 5.3, 0, W - 1).astype(np.float32))[None].repeat(B, 0)
        ys = jnp.asarray(np.clip(gy - 2.7, 0, H - 1).astype(np.float32))[None].repeat(B, 0)
        f_b = make_window_sampler(
            img, (H, W), 8, 12, "bilinear", "clamp",
            precision="default", backend="pallas",
        )
        f_x = make_window_sampler(
            img, (H, W), 8, 12, "bilinear", "clamp",
            precision="float32", backend="xla",
        )
        a, b = np.asarray(f_b(xs, ys)), np.asarray(f_x(xs, ys))
        assert np.abs(a - b).max() < 0.02
