"""PCM synthesis / encode / decode for the clips fixture.

Codecs supported natively (stdlib only): ``pcm_s16le`` (raw
little-endian int16 frames) and ``wav`` (RIFF container via the
``wave`` module). Any other codec raises NotImplementedError at
decode time — the Spark-side plumbing (schema, batch shape, binary
passthrough) is identical for real codecs; only the decode kernel
would change (e.g. soundfile/ffmpeg on a production cluster).
"""

from __future__ import annotations

import io
import wave

import numpy as np


def synth_pcm(rng: np.random.Generator, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Deterministic sine+noise mixture, int16 mono."""
    n = int(sr_hz * dur_ms / 1000)
    t = np.arange(n, dtype=np.float64) / sr_hz
    f0 = float(rng.uniform(80, 1200))
    f1 = float(rng.uniform(1200, min(3800.0, sr_hz / 2 - 100)))
    sig = (
        0.55 * np.sin(2 * np.pi * f0 * t)
        + 0.25 * np.sin(2 * np.pi * f1 * t + rng.uniform(0, np.pi))
        + 0.08 * rng.standard_normal(n)
    )
    return np.clip(sig * 12000.0, -32768, 32767).astype("<i2")


def encode(pcm: np.ndarray, sr_hz: int, codec: str) -> bytes:
    if codec == "pcm_s16le":
        return pcm.astype("<i2").tobytes()
    if codec == "wav":
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr_hz)
            w.writeframes(pcm.astype("<i2").tobytes())
        return buf.getvalue()
    raise NotImplementedError(
        f"codec {codec!r}: decode/encode kernel not available in this "
        "sandbox (plumbing supports it; plug soundfile/ffmpeg here)"
    )


def decode(data: bytes, codec: str) -> np.ndarray:
    if codec == "pcm_s16le":
        return np.frombuffer(data, dtype="<i2")
    if codec == "wav":
        with wave.open(io.BytesIO(data), "rb") as w:
            frames = w.readframes(w.getnframes())
        return np.frombuffer(frames, dtype="<i2")
    raise NotImplementedError(f"codec {codec!r}")


def snr_db(reference: np.ndarray, candidate: np.ndarray) -> float:
    """SNR of candidate vs reference in dB (inf when bit-identical)."""
    ref = reference.astype(np.float64)
    cand = candidate.astype(np.float64)
    if len(ref) != len(cand):
        return float("-inf")
    noise = ref - cand
    p_noise = float((noise**2).sum())
    if p_noise == 0.0:
        return float("inf")
    p_sig = float((ref**2).sum())
    return 10.0 * np.log10(p_sig / p_noise)
