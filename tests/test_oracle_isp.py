"""Production ISP vs the independent scalar oracle (tests/oracle_isp.py).

Breaks the round-1 validation circularity: the oracle is transliterated
per-pixel from the reference C++ spec, sharing no code or conventions
with the JAX pipeline."""

import numpy as np
import pytest

from surround360_tpu.isp.pipeline import IspConfig, isp_process

from oracle_isp import oracle_isp


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 200.0 if mse == 0 else -10.0 * np.log10(mse)


CONFIGS = [
    IspConfig(
        bayer_pattern="GBRG",
        demosaic_filter="bilinear",
        black_level=(10.0, 12.0, 14.0),
        bits_per_pixel=8,
        white_balance_gain=(1.3, 1.0, 1.8),
        clamp_min=(0.01, 0.02, 0.0),
        clamp_max=(0.98, 1.0, 0.95),
        vignette_rolloff_h=((0.9, 0.95, 0.9), (1.2, 1.15, 1.25), (0.95, 1.0, 0.9)),
        vignette_rolloff_v=((1.0, 1.0, 1.0), (1.1, 1.05, 1.1)),
        ccm=((0.9, 0.1, 0.0), (0.05, 0.9, 0.05), (0.0, 0.2, 0.8)),
        saturation=1.2,
        gamma=(0.45, 0.5, 0.45),
        low_key_boost=(0.05, 0.0, -0.02),
        high_key_boost=(-0.03, 0.02, 0.0),
        contrast=1.1,
        sharpening=(0.0, 0.0, 0.0),
    ),
    IspConfig(
        bayer_pattern="RGGB",
        demosaic_filter="bilinear",
        black_level=(4.0, 4.0, 4.0),
        bits_per_pixel=12,
        white_balance_gain=(2.0, 1.0, 1.4),
        gamma=(1.0, 1.0, 1.0),
        contrast=1.0,
        saturation=0.8,
        ccm=((1.2, -0.1, -0.1), (-0.05, 1.1, -0.05), (-0.1, -0.2, 1.3)),
        sharpening=(0.0, 0.0, 0.0),
    ),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=["gbrg-full", "rggb-linearish"])
def test_isp_matches_scalar_oracle(cfg):
    rng = np.random.default_rng(7)
    H, W = 24, 32
    raw = rng.uniform(0.0, 1.0, (H, W)).astype(np.float32)
    ours = np.asarray(isp_process(raw, cfg, skip_sharpen=True))
    ref = oracle_isp(raw, cfg)
    psnr = _psnr(ours, ref)
    assert ours.shape == ref.shape == (3, H, W)
    assert psnr >= 40.0, f"ISP vs scalar oracle PSNR {psnr:.1f} dB"
    # the only permitted divergence is +-1 LUT index at bin edges
    assert np.mean(np.abs(ours - ref) > 2e-3) < 0.01
