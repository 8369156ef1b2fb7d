"""Audio-column operators — multimodal processing over the opaque
``bytes`` column with typed metadata (clip_id, sr_hz, dur_ms, codec).

Everything runs as ``mapInPandas`` over a NARROW projection (never
alongside unrelated wide columns), with numpy kernels per Arrow
batch:

* decode + stats: PCM decode (pcm_s16le / wav via stdlib; other
  codecs raise NotImplementedError and surface as decode_ok=false —
  the Spark-side plumbing is identical for real codec libs)
* spectral features: RMS, peak, zero-crossing rate, spectral
  centroid (single rFFT per clip)
* resample: linear-interpolation resampling to a target rate
* frame sampling: fixed-count energy frames (the audio analog of
  video frame-sampling — returns an array column with stable shape)

At cluster scale these stages are embarrassingly parallel and
shuffle-free; the only sizing concern is Arrow batch memory, bounded
by spark.sql.execution.arrow.maxRecordsPerBatch (session.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ungoliant_spark.sources.audio import decode

N_FRAMES = 8

AUDIO_STATS_T = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.FloatType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zcr", T.FloatType()),
        T.StructField("centroid_hz", T.FloatType()),
        T.StructField("frame_energy", T.ArrayType(T.FloatType())),
    ]
)


def _stats_one(data: bytes, codec: str, sr: int) -> dict:
    try:
        pcm = decode(data, codec)
    except NotImplementedError:
        return {
            "decode_ok": False, "n_samples": None, "rms": None,
            "peak": None, "zcr": None, "centroid_hz": None,
            "frame_energy": None,
        }
    x = pcm.astype(np.float64)
    n = len(x)
    if n == 0:
        return {
            "decode_ok": True, "n_samples": 0, "rms": 0.0, "peak": 0,
            "zcr": 0.0, "centroid_hz": 0.0,
            "frame_energy": [0.0] * N_FRAMES,
        }
    rms = float(np.sqrt((x**2).mean()))
    peak = int(np.abs(pcm).max())
    zcr = float((np.abs(np.diff(np.signbit(x).astype(np.int8))) > 0).mean())
    # centroid from a bounded head segment: an O(n log n) FFT over a
    # multi-minute clip buys no precision for a summary statistic and
    # would let rare huge clips dominate task time (skew)
    seg = x[: min(n, 1 << 16)]
    spec = np.abs(np.fft.rfft(seg))
    freqs = np.fft.rfftfreq(len(seg), d=1.0 / sr)
    denom = float(spec.sum())
    centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
    bounds = np.linspace(0, n, N_FRAMES + 1, dtype=int)
    frame_energy = [
        float(np.sqrt((x[bounds[i]: bounds[i + 1]] ** 2).mean()))
        if bounds[i + 1] > bounds[i]
        else 0.0
        for i in range(N_FRAMES)
    ]
    return {
        "decode_ok": True, "n_samples": n, "rms": rms, "peak": peak,
        "zcr": zcr, "centroid_hz": centroid, "frame_energy": frame_energy,
    }


def audio_stats(clips: DataFrame) -> DataFrame:
    """Decode + per-clip features. Input: full clips table; only the
    needed columns are projected into the Python stage."""
    narrow = clips.select("clip_id", "bytes", "codec", "sr_hz")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for cid, data, codec, sr in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                d = _stats_one(bytes(data), codec, int(sr))
                d["clip_id"] = cid
                rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_STATS_T])

    return narrow.mapInPandas(batches, schema=AUDIO_STATS_T)


RESAMPLE_T = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("target_sr", T.IntegerType()),
        T.StructField("n_samples_out", T.LongType()),
        T.StructField("bytes_out", T.BinaryType()),
    ]
)


def resample(clips: DataFrame, target_sr: int = 16000) -> DataFrame:
    """Linear-interp resample to target_sr, re-encoded as raw
    pcm_s16le. numpy end-to-end; output is again an opaque binary
    column + metadata (composable with downstream audio stages)."""
    narrow = clips.select("clip_id", "bytes", "codec", "sr_hz")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for cid, data, codec, sr in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["sr_hz"]
            ):
                try:
                    pcm = decode(bytes(data), codec).astype(np.float64)
                except NotImplementedError:
                    rows.append(
                        {"clip_id": cid, "target_sr": target_sr,
                         "n_samples_out": None, "bytes_out": None}
                    )
                    continue
                n_out = max(1, int(round(len(pcm) * target_sr / int(sr))))
                t_in = np.arange(len(pcm)) / int(sr)
                t_out = np.arange(n_out) / target_sr
                out = np.interp(t_out, t_in, pcm) if len(pcm) else np.zeros(1)
                out16 = np.clip(out, -32768, 32767).astype("<i2")
                rows.append(
                    {
                        "clip_id": cid,
                        "target_sr": target_sr,
                        "n_samples_out": n_out,
                        "bytes_out": out16.tobytes(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESAMPLE_T])

    return narrow.mapInPandas(batches, schema=RESAMPLE_T)


# -- audio-side quality gate ------------------------------------------

# int16-scale thresholds: a clip whose overall RMS sits below
# RMS_SILENCE is effectively silent recording-floor noise; a peak at
# full scale means the capture clipped; frames below RMS_SILENCE are
# dead air, and a majority of dead-air frames marks a mostly-empty
# clip even when a short loud burst lifts the overall RMS.
RMS_SILENCE = 50.0
CLIP_PEAK = 32767
MAX_SILENCE_RATIO = 0.5


def audio_quality(clips: DataFrame) -> DataFrame:
    """(clip_id, decode_ok, too_quiet, clipped, silence_ratio,
    audio_keep) — the AUDIO-side quality gate, the PCM analog of the
    transcript heuristics (the reference filters text only; an
    audio+transcript corpus needs both sides gated). Pure Catalyst
    over the already-verified :func:`audio_stats` features — the one
    decode pass is shared, no second trip through Arrow — so the
    DuckDB twin recomputes the gate from the independent-decode
    expected table and the driver hash-check pins the decision
    end-to-end. Undecodable clips keep ``audio_keep`` false with
    null signal columns (unknown, not 'loud')."""
    s = audio_stats(clips)
    rms_d = F.col("rms").cast("double")
    silent_frames = F.size(
        F.filter(
            F.col("frame_energy"),
            lambda e: e.cast("double") < F.lit(RMS_SILENCE),
        )
    )
    silence_ratio = F.when(
        F.col("decode_ok"),
        F.round(
            silent_frames.cast("double") / F.size("frame_energy"), 3
        ),
    )
    too_quiet = F.when(F.col("decode_ok"), rms_d < RMS_SILENCE)
    clipped = F.when(F.col("decode_ok"), F.col("peak") >= CLIP_PEAK)
    keep = (
        F.col("decode_ok")
        & ~too_quiet
        & ~clipped
        & (silence_ratio <= MAX_SILENCE_RATIO)
    )
    return s.select(
        "clip_id",
        "decode_ok",
        too_quiet.alias("too_quiet"),
        clipped.alias("clipped"),
        silence_ratio.alias("silence_ratio"),
        F.coalesce(keep, F.lit(False)).alias("audio_keep"),
    )
