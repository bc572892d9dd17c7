"""Pallas fused-sampling kernel: parity with the XLA matmul sampler.

Runs in interpreter mode on CPU; on TPU the same kernel compiles via
Mosaic (validated manually — see the module docstring for the measured
trade-off vs the XLA path)."""

import numpy as np
import pytest

from surround360_tpu.flow.pallas_sampler import sample_bilinear_pallas
from surround360_tpu.flow.pixflow import (
    _sample_bilinear_extend,
    _sample_bilinear_matmul,
)


class TestPallasSampler:
    @pytest.mark.parametrize("shape", [(3, 2, 20, 28), (9, 2, 33, 17)])
    def test_matches_matmul_sampler(self, shape):
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        B, C, H, W = shape
        img = jnp.asarray(rng.random(shape), jnp.float32)
        x = jnp.asarray(rng.random((B, H, W)) * (W + 8) - 4, jnp.float32)
        y = jnp.asarray(rng.random((B, H, W)) * (H + 8) - 4, jnp.float32)
        a = np.asarray(_sample_bilinear_matmul(img, x, y))
        b = np.asarray(sample_bilinear_pallas(img, x, y))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_matches_gather_sampler(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(2)
        B, C, H, W = 2, 2, 24, 40
        img = jnp.asarray(rng.random((B, C, H, W)), jnp.float32)
        x = jnp.asarray(rng.random((B, H, W)) * W, jnp.float32)
        y = jnp.asarray(rng.random((B, H, W)) * H, jnp.float32)
        ref = np.asarray(
            _sample_bilinear_extend(img, x[:, None], y[:, None])
        )
        out = np.asarray(sample_bilinear_pallas(img, x, y))
        np.testing.assert_allclose(ref, out, atol=1e-5)
