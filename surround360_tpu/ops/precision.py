"""Global MXU precision policy for the "exact" float32 sampler paths.

TPU MXUs multiply in bfloat16; float32 matmuls are emulated by splitting
each operand into bf16 limbs. JAX exposes the pass count as
``lax.Precision``: HIGHEST ("float32", 6 passes) reproduces f32 to
~1 ulp, HIGH ("bfloat16_3x", 3 passes) is accurate to ~1e-7 relative on
image-range data at half the MXU cost, DEFAULT is one bf16 pass (~5e-3).

Every sampler/filter einsum that wants "exact" f32 resolves its
precision through :func:`resolve` so the whole pipeline can be A/B'd
between emulation depths with one env var::

    S360_F32_PRECISION=bfloat16_3x python benchmarks/profile_stages.py

The candidate-RANKING samplers in the flow solver ship single-pass bf16
by design (they only order energies; BASELINE.md round-2) — that is a
separate, explicit setting and does not route through this knob.

Reference provenance: the reference computes everything in f32 on CPU
(e.g. ImageWarper.cpp:95-174 cv::remap); the emulation-depth choice is a
TPU-only degree of freedom with no reference analog.
"""

from __future__ import annotations

import os

# value must be a jax.lax.Precision alias string; "float32" -> HIGHEST
# (6-pass, bit-faithful), "bfloat16_3x"/"tensorfloat32" -> HIGH (3-pass).
# Default is the 3-pass class (round 5): measured max abs sampling error
# vs HIGHEST is 1.4e-5 on image-range data (~97 dB — far beyond the
# 40 dB target) while the fused Pallas sampler runs 7.8x faster
# (97.3 -> 12.4 ms on the parity microbench; Mosaic lowers HIGHEST
# poorly, whereas the kernel's manual hi/lo bf16 limb emulation of HIGH
# hits the native single-pass MXU path — BASELINE.md round-5).
# S360_F32_PRECISION=float32 restores bit-faithful 6-pass everywhere.
F32_PRECISION: str = os.environ.get("S360_F32_PRECISION", "bfloat16_3x")


def resolve(precision):
    """Map the samplers' "float32" sentinel to the session policy; pass
    any other explicit setting (e.g. "bfloat16" ranking mode) through."""
    return F32_PRECISION if precision == "float32" else precision


def is_f32_class(precision) -> bool:
    """True when a resolved precision string means "f32-accurate
    multi-pass MXU emulation" (lax.Precision HIGHEST or HIGH) — the class
    of settings eligible for the fused Pallas sampler's exact path. The
    single source of truth for the alias set, so the fused-path gates
    can't drift from what :func:`resolve` accepts."""
    import jax

    try:
        prec = jax.lax.Precision(precision)
    except (ValueError, TypeError):
        return False
    return prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH)
