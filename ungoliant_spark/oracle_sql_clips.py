"""DuckDB oracles for the clips-table model/binary queries.

These queries have no closed-form ANSI-SQL twin (fastText inference,
PCM decode), so their oracles follow the fixture-expected-table
pattern: ground truth is computed OUTSIDE Spark — the frozen label
table written by the fixture generator (pure-Python oracle,
sources/fixtures.py) and expected audio/LID tables built here with an
independent decode path — and the oracle SQL simply reads those
parquet files. The driver's hash compare then checks the distributed
engine against per-row ground truth.

All paths are absolute (the driver's DuckDB connection has no view of
our fixture cache); the ensure_* builders are invoked when the oracle
SQL is constructed, so the files exist before DuckDB runs.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ungoliant_spark.sources.fixtures import CACHE_ROOT, generate

ORACLE_SF = 0.01  # the driver compares at sf=0.01
EXPECTED_DIR = os.path.abspath(os.path.join(CACHE_ROOT, "..", "expected"))


def ensure_labels(sf: float = ORACLE_SF) -> str:
    d = generate(sf, with_labels=True)
    return os.path.join(d, "labels.parquet")


# ---- independent audio decode (struct-based RIFF walk; the engine
# uses the stdlib wave module — sources/audio.py) ----------------------

def _decode_wav_independent(data: bytes) -> np.ndarray:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack(
            "<I", data[pos + 4 : pos + 8]
        )[0]
        if cid == b"data":
            raw = data[pos + 8 : pos + 8 + size]
            return np.frombuffer(raw, dtype="<i2")
        pos += 8 + size + (size & 1)
    raise ValueError("no data chunk")


def _afp_independent(spec: np.ndarray, freqs: np.ndarray, sr: int) -> int:
    """Independently-coded twin of audio_ops.afp63: np.bincount
    accumulation instead of add.at, slice sums instead of a padded
    concatenate. Both accumulate bins in ascending index order and
    quantize the smoothed band energies to float32 before the strict
    sign compare, so the words are bit-identical."""
    from ungoliant_spark.operators.audio_ops import AFP_BANDS, afp_band_index

    e = np.square(spec)
    # band boundaries come from the SHARED contract helper (ADVICE r6:
    # never let two engines group a boundary float expression
    # differently); accumulation/smoothing/sign stay independent
    idx = afp_band_index(freqs)
    m = (idx >= 0) & (idx < AFP_BANDS)
    bands = np.bincount(idx[m], weights=e[m], minlength=AFP_BANDS)[:AFP_BANDS]
    left = np.concatenate(([0.0], bands[:-1]))
    right = np.concatenate((bands[1:], [0.0]))
    smooth = ((left + bands) + right).astype(np.float32)
    bits = smooth[:-1] > smooth[1:]
    return int(sum(1 << b for b in range(AFP_BANDS - 1) if bits[b]))


def _expected_audio_rows(clip_id, data, codec, sr):
    if codec == "pcm_s16le":
        pcm = np.frombuffer(data, dtype="<i2")
    elif codec == "wav":
        pcm = _decode_wav_independent(data)
    else:
        return {
            "clip_id": clip_id, "decode_ok": False, "n_samples": None,
            "rms": None, "peak": None, "zcr": None, "centroid_hz": None,
            "frame_energy": None, "afp": None,
            "target_sr": 16000, "n_samples_out": None, "n_bytes_out": None,
        }
    x = pcm.astype(np.float64)
    n = len(x)
    if n == 0:
        rms, peak, zcr, centroid = 0.0, 0, 0.0, 0.0
        frames = [0.0] * 8
        afp = 0
    else:
        rms = float(np.sqrt((x * x).sum() / n))
        peak = int(np.abs(pcm).max())
        neg = x < 0  # sign change count over consecutive samples
        zcr = (
            float(np.count_nonzero(neg[1:] != neg[:-1])) / (n - 1)
            if n > 1
            else 0.0
        )
        seg = x[: min(n, 1 << 16)]
        spec = np.abs(np.fft.rfft(seg))
        freqs = np.fft.rfftfreq(len(seg), d=1.0 / sr)
        denom = float(spec.sum())
        centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
        afp = _afp_independent(spec, freqs, sr)
        bounds = np.linspace(0, n, 9, dtype=int)
        frames = [
            float(np.sqrt(np.sum(x[a:b] * x[a:b]) / (b - a)))
            if b > a
            else 0.0
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
    # resample contract: linear interp to 16 kHz, int16 re-encode
    n_out = max(1, int(round(n * 16000 / int(sr)))) if n else 1
    return {
        "clip_id": clip_id,
        "decode_ok": True,
        "n_samples": n,
        "rms": np.float32(rms),
        "peak": peak,
        "zcr": np.float32(zcr),
        "centroid_hz": np.float32(centroid),
        "frame_energy": [np.float32(f) for f in frames],
        "afp": afp,
        "target_sr": 16000,
        "n_samples_out": n_out,
        "n_bytes_out": 2 * n_out,
    }


AUDIO_EXPECTED_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("decode_ok", pa.bool_()),
        ("n_samples", pa.int64()),
        ("rms", pa.float32()),
        ("peak", pa.int32()),
        ("zcr", pa.float32()),
        ("centroid_hz", pa.float32()),
        ("frame_energy", pa.list_(pa.float32())),
        ("afp", pa.int64()),
        ("target_sr", pa.int32()),
        ("n_samples_out", pa.int64()),
        ("n_bytes_out", pa.int64()),
    ]
)


def ensure_audio_expected(sf: float = ORACLE_SF) -> str:
    from ungoliant_spark.sources.fixtures import FIXTURE_VERSION

    out = os.path.join(
        EXPECTED_DIR, f"audio_sf{sf}_v4_f{FIXTURE_VERSION}.parquet"
    )
    if os.path.exists(out):
        return out
    os.makedirs(EXPECTED_DIR, exist_ok=True)
    clips = os.path.join(generate(sf, with_labels=False), "clips.parquet")
    pf = pq.ParquetFile(clips)
    tmp = out + ".tmp"
    writer = pq.ParquetWriter(tmp, AUDIO_EXPECTED_SCHEMA, compression="zstd")
    for batch in pf.iter_batches(
        columns=["clip_id", "bytes", "codec", "sr_hz"], batch_size=512
    ):
        rows = [
            _expected_audio_rows(cid, data, codec, sr)
            for cid, data, codec, sr in zip(
                batch.column("clip_id").to_pylist(),
                batch.column("bytes").to_pylist(),
                batch.column("codec").to_pylist(),
                batch.column("sr_hz").to_pylist(),
            )
        ]
        writer.write_table(
            pa.Table.from_pylist(rows, schema=AUDIO_EXPECTED_SCHEMA)
        )
    writer.close()
    os.replace(tmp, out)
    return out


LID_DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("lang", pa.string()),
        ("lang_prob", pa.float32()),
    ]
)


def ensure_lid_documents_expected(
    sf_dir: str = "/root/testdata/sf0.01",
) -> str:
    """Per-row LID ground truth over the shared documents table,
    computed via the single-row oracle path (identify_doc — the same
    frozen model/semantics the batched UDF is tested against in
    tests/test_lid.py::test_spark_udf_matches_direct)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(EXPECTED_DIR, f"lid_documents_{tag}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(EXPECTED_DIR, exist_ok=True)
    from ungoliant_spark import oracle
    from ungoliant_spark.operators.lid import identify_doc

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    rows = []
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        lang, prob, _, _ = identify_doc(oracle.rust_lines(text or ""))
        rows.append(
            {
                "doc_id": doc_id,
                "lang": lang,
                "lang_prob": np.float32(prob) if prob is not None else None,
            }
        )
    tmp = out + ".tmp"
    pq.write_table(
        pa.Table.from_pylist(rows, schema=LID_DOCS_SCHEMA),
        tmp,
        compression="zstd",
    )
    os.replace(tmp, out)
    return out


# ---- oracle SQL -------------------------------------------------------

def oracle_clips_decisions() -> str:
    labels = ensure_labels()
    return f"""
SELECT clip_id, keep, trim_keep, pfilter_keep, annotation_keep,
  keep AS lid_keep,
  lang,
  round(lang_prob::DOUBLE, 5) AS lang_prob,
  CAST(len(quality_warnings) AS INTEGER) AS n_warnings
FROM read_parquet('{labels}')
"""


def oracle_clips_kept() -> str:
    labels = ensure_labels()
    return f"""
SELECT clip_id, lang,
  round(lang_prob::DOUBLE, 5) AS lang_prob,
  COALESCE(array_to_string(list_sort(quality_warnings), ','), '')
    AS warnings,  -- DuckDB array_to_string([]) is NULL, not ''
  COALESCE(array_to_string(list_sort(categories), ','), '') AS categories,
  round(harmful_pp::DOUBLE, 2) AS harmful_pp,
  tlsh, line_start, line_end
FROM read_parquet('{labels}')
WHERE keep
"""


def oracle_audio_stats() -> str:
    exp = ensure_audio_expected()
    return f"""
SELECT clip_id, decode_ok, n_samples,
  round(rms::DOUBLE, 3) AS rms,
  peak,
  round(zcr::DOUBLE, 5) AS zcr,
  round(centroid_hz::DOUBLE, 2) AS centroid_hz,
  afp
FROM read_parquet('{exp}')
"""


def oracle_audio_dup_pairs() -> str:
    """Naive O(n²) twin of the engine's banded-LSH acoustic-fingerprint
    pair join: every decodable pair, xor + bit_count, threshold — the
    structure-free proof that the lossless banding misses nothing and
    invents nothing. Fingerprints come from the independent-decode
    expected table (independent RIFF walk + independently-coded
    fingerprint kernel). The ≤ 3 threshold is the engine default
    (audio_ops.audio_dup_pairs max_hamming=3)."""
    exp = ensure_audio_expected()
    return f"""
SELECT a.clip_id AS clip_a, b.clip_id AS clip_b,
  CAST(bit_count(xor(a.afp, b.afp)) AS INTEGER) AS hamming
FROM read_parquet('{exp}') a
JOIN read_parquet('{exp}') b
  ON a.clip_id < b.clip_id
WHERE a.decode_ok AND b.decode_ok
  AND bit_count(xor(a.afp, b.afp)) <= 3
"""


def oracle_audio_dup_components() -> str:
    """Recursive-CTE transitive closure over the naive O(n²)
    fingerprint pair set — min reachable clip per node over
    bidirectional edges. The engine computes the same fixpoint by
    rep-level label propagation without ever materializing clip-level
    pairs; the hash match proves the rep composition clusters
    identically (same twin discipline as oracle_dedup_components)."""
    exp = ensure_audio_expected()
    return f"""
WITH RECURSIVE nodes AS (
  SELECT clip_id FROM read_parquet('{exp}') WHERE decode_ok
), pairs AS (
  SELECT a.clip_id AS id_a, b.clip_id AS id_b
  FROM read_parquet('{exp}') a
  JOIN read_parquet('{exp}') b ON a.clip_id < b.clip_id
  WHERE a.decode_ok AND b.decode_ok
    AND bit_count(xor(a.afp, b.afp)) <= 3
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(id, r) AS (
  SELECT clip_id, clip_id FROM nodes
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS clip_id, min(r) AS component_rep FROM reach GROUP BY id
"""


def oracle_audio_dedup_against() -> str:
    """Naive twin of the engine's banded bipartite fingerprint
    lookup: every (new, ref) pair via a structure-free
    bit_count(xor) join over the independent-decode expected table,
    min reference id per distinct new fingerprint, distance to that
    chosen reference. Same even/odd clip-index corpus split as the
    driver query, reconstructed from the clip_id."""
    exp = ensure_audio_expected()
    return f"""
WITH expt AS (
  SELECT clip_id, decode_ok, afp,
         CAST(substr(clip_id, 6) AS INTEGER) AS idx
  FROM read_parquet('{exp}')
), refs AS (
  SELECT clip_id, afp FROM expt WHERE idx % 2 = 0 AND decode_ok
), news AS (
  SELECT clip_id, afp FROM expt WHERE idx % 2 = 1
), m AS (
  SELECT n.afp AS afp, min(r.clip_id) AS dup_of_ref
  FROM (SELECT DISTINCT afp FROM news WHERE afp IS NOT NULL) n
  JOIN refs r ON bit_count(xor(n.afp, r.afp)) <= 3
  GROUP BY n.afp
)
SELECT n.clip_id, n.afp, m.dup_of_ref,
  CASE WHEN m.dup_of_ref IS NOT NULL
       THEN CAST(bit_count(xor(n.afp, r2.afp)) AS INTEGER)
  END AS hamming,
  m.dup_of_ref IS NOT NULL AS is_dup
FROM news n
LEFT JOIN m ON n.afp = m.afp
LEFT JOIN refs r2 ON r2.clip_id = m.dup_of_ref
"""


def oracle_speech_rate() -> str:
    """Closed-form twin of audio_ops.speech_rate on the raw clips
    table (no decode involved): whitespace-split token count with
    empties dropped, duration from the stored dur_ms. Arithmetic is
    kept bit-deterministic across engines: dur_s = dur_ms/1000.0
    (same single IEEE division both sides, no re-rounding) and
    tokens_per_s = round(n_tokens*1000.0/dur_ms, 4) (integer
    numerator, one division)."""
    clips = os.path.join(
        generate(ORACLE_SF, with_labels=False), "clips.parquet"
    )
    return f"""
WITH t AS (
  SELECT clip_id,
    len(list_filter(regexp_split_to_array(transcript, '\\s+'),
                    x -> x != '')) AS n_tokens,
    dur_ms
  FROM read_parquet('{clips}')
)
SELECT clip_id,
  n_tokens,
  dur_ms / 1000.0 AS dur_s,
  round(n_tokens * 1000.0 / dur_ms, 4) AS tokens_per_s,
  round(n_tokens * 1000.0 / dur_ms, 4) BETWEEN 0.25 AND 7.5 AS rate_ok
FROM t
"""


def oracle_audio_vad() -> str:
    """Gaps-and-islands twin of audio_ops.audio_vad: unnest the frame
    energies with ordinality, mark active frames, find consecutive
    runs via the i - row_number() group key, aggregate run lengths —
    a completely different formulation (window over unnested rows)
    from the engine's O(8) higher-order fold, same fixpoint.
    Undecodable clips come back via the left join with null signals."""
    from ungoliant_spark.operators.audio_ops import N_FRAMES, RMS_SILENCE

    exp = ensure_audio_expected()
    return f"""
WITH base AS (
  SELECT clip_id, decode_ok, frame_energy FROM read_parquet('{exp}')
), f AS (
  SELECT clip_id, unnest(frame_energy) AS e,
         generate_subscripts(frame_energy, 1) AS i
  FROM base WHERE decode_ok
), marked AS (
  SELECT clip_id, i, (e >= {RMS_SILENCE}) AS act FROM f
), runs AS (
  SELECT clip_id, act,
         i - row_number() OVER (PARTITION BY clip_id, act ORDER BY i)
           AS grp
  FROM marked
), runlen AS (
  SELECT clip_id, act, count(*) AS rl
  FROM runs GROUP BY clip_id, act, grp
), agg AS (
  SELECT clip_id,
    CAST(sum(CASE WHEN act THEN rl ELSE 0 END) AS INTEGER) AS n_active,
    round(sum(CASE WHEN act THEN rl ELSE 0 END) / {N_FRAMES}.0, 3)
      AS active_ratio,
    CAST(max(CASE WHEN act THEN rl ELSE 0 END) AS INTEGER)
      AS longest_run
  FROM runlen GROUP BY clip_id
)
SELECT b.clip_id, b.decode_ok, a.n_active, a.active_ratio,
       a.longest_run
FROM base b LEFT JOIN agg a USING (clip_id)
"""


def oracle_audio_signals() -> str:
    """Combined twin of plans.clips_queries.q_audio_signals: the
    speech-rate and VAD oracles (each still independently formulated
    — closed-form arithmetic vs gaps-and-islands windows) joined on
    clip_id. One driver row covers both operators because the
    driver's correctness artifact caps at 50 recorded rows."""
    return f"""
SELECT sr.clip_id, sr.n_tokens, sr.dur_s, sr.tokens_per_s, sr.rate_ok,
       v.decode_ok, v.n_active, v.active_ratio, v.longest_run
FROM ({oracle_speech_rate()}) sr
JOIN ({oracle_audio_vad()}) v ON sr.clip_id = v.clip_id
"""


def oracle_audio_frames() -> str:
    exp = ensure_audio_expected()
    return f"""
SELECT clip_id, CAST(u.f.i - 1 AS INTEGER) AS frame_idx,
  round(u.f.e::DOUBLE, 3) AS energy
FROM read_parquet('{exp}'),
  unnest(list_transform(frame_energy,
                        (x, i) -> struct_pack(i := i, e := x))) AS u(f)
WHERE decode_ok
"""


def oracle_audio_resample() -> str:
    exp = ensure_audio_expected()
    return f"""
SELECT clip_id, target_sr, n_samples_out, n_bytes_out
FROM read_parquet('{exp}')
"""


def oracle_audio_quality() -> str:
    """Gate twin over the independent-decode expected table: the same
    int16-scale thresholds (audio_ops.RMS_SILENCE / CLIP_PEAK /
    MAX_SILENCE_RATIO) applied to the independently-computed rms /
    peak / frame_energy; silence_ratio counts of the 8 fixed frames
    are exact eighths, so round(,3) is bit-stable cross-engine."""
    from ungoliant_spark.operators.audio_ops import (
        CLIP_PEAK,
        MAX_SILENCE_RATIO,
        RMS_SILENCE,
    )

    exp = ensure_audio_expected()
    sil = (
        "CAST(len(list_filter(frame_energy,"
        f" e -> e::DOUBLE < {RMS_SILENCE})) AS DOUBLE)"
        " / len(frame_energy)"
    )
    return f"""
SELECT clip_id, decode_ok,
  CASE WHEN decode_ok THEN (rms::DOUBLE < {RMS_SILENCE}) END AS too_quiet,
  CASE WHEN decode_ok THEN (peak >= {CLIP_PEAK}) END AS clipped,
  CASE WHEN decode_ok THEN round({sil}, 3) END AS silence_ratio,
  COALESCE(
    decode_ok AND NOT (rms::DOUBLE < {RMS_SILENCE})
      AND NOT (peak >= {CLIP_PEAK})
      AND round({sil}, 3) <= {MAX_SILENCE_RATIO},
    false) AS audio_keep
FROM read_parquet('{exp}')
"""


def oracle_lid_documents() -> str:
    exp = ensure_lid_documents_expected()
    return f"""
SELECT doc_id, lang, round(lang_prob::DOUBLE, 5) AS lang_prob
FROM read_parquet('{exp}')
"""
