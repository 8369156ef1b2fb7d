"""Independent per-sample linear-interpolation resampler — SECOND
implementation for de-circularized verification of the engine's
resample kernel (operators/audio_ops._resample_one, which is
np.interp over time axes + int16 truncation).

Re-derived from the definition of linear interpolation over a
uniformly-sampled signal: output sample j sits at time j/target_sr;
its fractional position on the input grid is found by scalar
arithmetic per sample (floor index + remainder mix), not by
searchsorted over precomputed time arrays. Clamp-at-the-ends
semantics match np.interp's (values beyond the last input sample hold
the edge value). No imports from ungoliant_spark.

Float caveat, stated honestly: the two implementations group the
interpolation arithmetic differently, so individual float64 samples
can differ in the last ulp; after the int16 truncation that is at
most 1 LSB. The property pin asserts per-sample |diff| <= 1 LSB on
random signals and EXACT equality where the math is exact
(identity-rate resample hits input sample points)."""

from __future__ import annotations

import numpy as np


def resample_scalar(
    pcm: np.ndarray, sr: int, target_sr: int
) -> tuple[int, bytes]:
    """(n_samples_out, pcm_s16le bytes) — mirror of the engine
    contract: n_out = max(1, round(n * target/sr)); empty input
    produces one zero sample."""
    n = len(pcm)
    n_out = max(1, int(round(n * target_sr / int(sr))))
    if n == 0:
        return n_out, np.zeros(n_out, dtype="<i2").tobytes()
    x = pcm.astype(np.float64)
    out = np.empty(n_out, dtype=np.float64)
    for j in range(n_out):
        # fractional input index of output time j/target_sr: scalar
        # per-sample arithmetic (engine builds full time arrays and
        # lets np.interp searchsorted them)
        pos = (j * int(sr)) / target_sr
        i = int(np.floor(pos))
        if i >= n - 1:
            out[j] = x[n - 1]
            continue
        frac = pos - i
        out[j] = x[i] + frac * (x[i + 1] - x[i])
    out16 = np.clip(out, -32768, 32767).astype("<i2")
    return n_out, out16.tobytes()
