"""Deterministic clips-table fixture generator (seed 42, FIXTURES.md).

Produces the BASELINE.json input_hint shape:
  clips(clip_id string, bytes binary, sr_hz int32, dur_ms int32,
        codec string, transcript string)
plus the frozen expected-label table computed by the pure-Python
oracle (heuristics from ungoliant_spark.oracle, LID from the same
committed model via per-row identify_doc, PII scrub, adult-term
categories). Labels are the "reference labels" the engine is graded
against (keep/drop F1 ≥ 0.99, scrubbed-transcript exact match).

Transcript case classes are boundary-heavy by construction —
each class targets a specific rule edge in SURVEY.md §5.
Language skew: ~70% of identified rows are 'en' (FIXTURES.md §3.12)
to exercise salted repartitioning.
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ungoliant_spark import oracle
from ungoliant_spark.langdata import (
    GIBBERISH_LABEL,
    LANGS,
    sentence,
    sentence_of_min_chars,
)
from ungoliant_spark.operators.lid import identify_doc
from ungoliant_spark.sources.audio import encode, synth_pcm

SEED = 42
CACHE_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", ".cache", "clips")

# bump whenever generated CONTENT changes: the cache directory is
# version-keyed so stale fixtures from an older generator can never be
# read (v2: planted audio anomalies — silent / clipped / dead-air
# clips for the audio-side quality gate; v3: planted audio near-dup
# pairs — every DUP_PERIOD-th clip is a gain-scaled + lightly-noised
# re-upload of the previous clip's PCM — for the acoustic-fingerprint
# dedup operator)
FIXTURE_VERSION = 3

# every k-th clip (mod position) gets a planted audio anomaly; the
# selector depends only on the row index — the transcript rng stream
# is untouched, so transcript-side labels are identical across
# fixture versions. ~5.7% of clips fail the audio gate.
AUDIO_ANOMALY_PERIOD = 53

# every DUP_PERIOD-th clip (at offset DUP_OFFSET) replaces its audio
# with a near-duplicate of the PREVIOUS clip's PCM: same sample rate
# and duration, gain 0.75, small additive noise, independently drawn
# codec (container may differ — the audio fingerprint must see through
# that). Transcripts stay the row's own (an audio re-upload with a
# different caption is exactly what text dedup cannot catch). Rows
# where either side carries a planted anomaly are skipped so the
# anomaly classes stay pure. ~2.3% of clips are near-dups.
DUP_PERIOD = 41
DUP_OFFSET = 23


def is_dup_row(i: int) -> bool:
    return (
        i % DUP_PERIOD == DUP_OFFSET
        and i >= 1
        and i % AUDIO_ANOMALY_PERIOD not in (1, 2, 3)
        and (i - 1) % AUDIO_ANOMALY_PERIOD not in (1, 2, 3)
    )


def plant_audio_dup(i: int, base: np.ndarray) -> np.ndarray:
    """Deterministic near-dup transform for dup row ``i`` over the
    previous row's PCM: re-upload with different gain and a light
    noise floor (sigma 60 against a ~9000-amplitude signal)."""
    drng = np.random.default_rng(SEED * 2_000_003 + i)
    return np.clip(
        base.astype(np.float64) * 0.75
        + drng.standard_normal(len(base)) * 60.0,
        -32768,
        32767,
    ).astype("<i2")


def expected_pcm(i: int, sr: int, dur_ms: int) -> np.ndarray:
    """Reconstruct row ``i``'s final PCM from (row index, stored
    sr_hz, stored dur_ms) alone — shared by the generator, the SNR
    passthrough test, and the fingerprint recall test. For dup rows
    the stored sr/dur are the PREVIOUS row's, so the base signal is
    re-synthesized from the previous row's audio rng stream."""
    if is_dup_row(i):
        base_rng = np.random.default_rng(SEED * 1_000_003 + (i - 1))
        return plant_audio_dup(i, synth_pcm(base_rng, sr, dur_ms))
    arng = np.random.default_rng(SEED * 1_000_003 + i)
    return plant_audio_anomaly(i, synth_pcm(arng, sr, dur_ms), arng)


def fixture_dir(sf: float) -> str:
    return os.path.abspath(
        os.path.join(CACHE_ROOT, f"sf{sf}-v{FIXTURE_VERSION}")
    )


def plant_audio_anomaly(
    i: int, pcm: np.ndarray, arng: np.random.Generator
) -> np.ndarray:
    """Deterministic audio-anomaly transform for row index ``i`` —
    shared by the generator and the SNR-passthrough test so both
    reproduce the exact planted bytes."""
    k = i % AUDIO_ANOMALY_PERIOD
    if k == 1:
        # silent: recording-floor noise, RMS ~10 << the gate's 50
        return (arng.standard_normal(len(pcm)) * 10.0).astype("<i2")
    if k == 2:
        # clipped capture: drive the mix past full scale
        return np.clip(
            pcm.astype(np.int32) * 6, -32768, 32767
        ).astype("<i2")
    if k == 3:
        # mostly dead air: first 5/8 of the samples are zero, so 5 of
        # the 8 energy frames are silent (ratio 0.625 > gate 0.5)
        # while the overall RMS stays loud
        pcm = pcm.copy()
        pcm[: len(pcm) * 5 // 8] = 0
    return pcm

ADULT_TERMS = [f"badword{i:03d}" for i in range(100)]
ADULT_CATEGORY = "adult"

_PII_SNIPPETS = [
    "contact me at john.doe+spam@example.co.uk please",
    "my server is 192.168.12.254 in the rack",
    "ipv6 2001:0db8:85a3:0000:0000:8a2e:0370:7334 works",
    "call +33 6 12 34 56 78 tomorrow",
    "call (555) 123-4567 after lunch",
    "mail root@localhost.localdomain and 10.0.0.7",
]


def _pick_lang(rng: random.Random) -> str:
    return "en" if rng.random() < 0.7 else rng.choice(LANGS)


def _long(rng, lang, n=101):
    return sentence_of_min_chars(rng, lang, n)


def _short(rng, lang, max_chars=60):
    s = sentence(rng, lang, rng.randint(2, 6))
    return s[:max_chars]


def _noisy_line(rng, n_min=110):
    punct = "!@#$%^&*()[]{};:,./<>?|`~-=_+"
    out = []
    while sum(len(x) + 1 for x in out) < n_min:
        out.append("".join(rng.choice(punct) for _ in range(rng.randint(2, 6))))
    return " ".join(out)


def _exact_chars(rng, lang, n):
    s = sentence_of_min_chars(rng, lang, n)
    return s[:n]


# ---- case-class transcript builders: fn(rng, lang) -> str ----------------

def _c_normal(rng, lang):
    return "\n".join(_long(rng, lang) for _ in range(rng.randint(5, 9)))


def _c_trim(rng, lang):
    head = [_short(rng, lang) for _ in range(rng.randint(1, 3))]
    body = [_long(rng, lang) for _ in range(rng.randint(5, 7))]
    tail = [_short(rng, lang) for _ in range(rng.randint(1, 3))]
    return "\n".join(head + body + tail)


def _c_all_short(rng, lang):
    return "\n".join(_short(rng, lang) for _ in range(rng.randint(2, 8)))


def _c_boundary(rng, lang):
    ls = [
        _exact_chars(rng, lang, 99),
        _exact_chars(rng, lang, 100),
        _exact_chars(rng, lang, 101),
        _long(rng, lang),
        _exact_chars(rng, lang, 100),
    ]
    rng.shuffle(ls)
    return "\n".join(ls)


def _c_pfilter_edge(rng, lang):
    # upper mass ratio engineered near 0.6 from either side
    long_lines = [_exact_chars(rng, lang, 120) for _ in range(3)]  # 360 upper
    n_short = rng.choice([3, 4, 5])  # 3*60=180 → .667; 4 → .60; 5 → .545
    short_lines = [_exact_chars(rng, lang, 60) for _ in range(n_short)]
    mix = long_lines + short_lines
    rng.shuffle(mix)
    return "\n".join(mix)


def _c_tiny(rng, lang):
    return "\n".join(_long(rng, lang) for _ in range(rng.randint(1, 4)))


def _c_header_footer(rng, lang):
    n_body = rng.randint(8, 12)
    body = [_long(rng, lang) for _ in range(n_body)]
    n_edge = max(2, n_body // 4)
    which = rng.random()
    head = [_short(rng, lang) + " " + _long(rng, lang)[:50] for _ in range(n_edge)]
    head = [h[:99] for h in head]
    tail = [_short(rng, lang)[:99] for _ in range(n_edge)]
    if which < 0.4:
        return "\n".join([_long(rng, lang)] + head + body)
    if which < 0.8:
        return "\n".join(body + tail + [_long(rng, lang)])
    return "\n".join([_long(rng, lang)] + head + body + tail + [_long(rng, lang)])


def _c_noisy(rng, lang):
    return "\n".join(_noisy_line(rng) for _ in range(rng.randint(5, 8)))


def _c_noisy_tiny(rng, lang):
    return "\n".join(_noisy_line(rng) for _ in range(rng.randint(1, 4)))


def _c_gibberish(rng, lang):
    return "\n".join(
        sentence_of_min_chars(rng, GIBBERISH_LABEL, 101)
        for _ in range(rng.randint(5, 8))
    )


def _c_multilingual(rng, lang):
    n_langs = rng.randint(2, 4)
    langs = rng.sample(LANGS, n_langs)
    per = rng.randint(5, 7)
    lines = []
    for lg in langs:
        lines += [_long(rng, lg) for _ in range(per)]
    rng.shuffle(lines)
    return "\n".join(lines)


def _c_lowconf(rng, lang):
    en = [_long(rng, "en") for _ in range(3)]
    gib = [sentence_of_min_chars(rng, GIBBERISH_LABEL, 300) for _ in range(2)]
    return "\n".join(en + gib)


def _c_pii(rng, lang):
    lines = [_long(rng, lang) for _ in range(rng.randint(5, 7))]
    k = rng.randint(1, 3)
    for _ in range(k):
        i = rng.randrange(len(lines))
        lines[i] = lines[i] + " " + rng.choice(_PII_SNIPPETS)
    return "\n".join(lines)


def _c_adult(rng, lang):
    lines = [_long(rng, lang) for _ in range(rng.randint(5, 7))]
    for _ in range(rng.randint(1, 3)):
        i = rng.randrange(len(lines))
        lines[i] = lines[i] + " " + rng.choice(ADULT_TERMS)
    return "\n".join(lines)


def _c_malformed(rng, lang):
    return rng.choice(["", "\n", "\r\n", _short(rng, lang), "a\n\n"])


def _c_nul(rng, lang):
    base = _long(rng, lang)
    i = rng.randrange(1, len(base))
    return base[:i] + "\x00" + base[i:] + "\n" + _long(rng, lang)


CASES = [
    ("normal", _c_normal, 0.28),
    ("trim", _c_trim, 0.10),
    ("all_short", _c_all_short, 0.05),
    ("boundary", _c_boundary, 0.05),
    ("pfilter_edge", _c_pfilter_edge, 0.07),
    ("tiny", _c_tiny, 0.06),
    ("header_footer", _c_header_footer, 0.06),
    ("noisy", _c_noisy, 0.05),
    ("noisy_tiny", _c_noisy_tiny, 0.04),
    ("gibberish", _c_gibberish, 0.05),
    ("multilingual", _c_multilingual, 0.05),
    ("lowconf", _c_lowconf, 0.03),
    ("pii", _c_pii, 0.05),
    ("adult", _c_adult, 0.04),
    ("malformed", _c_malformed, 0.02),
    ("nul", _c_nul, 0.02),
]

CLIPS_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
        ("case_class", pa.string()),  # extra debug column, not in input_hint
    ]
)


def n_rows_for_sf(sf: float) -> int:
    return max(200, int(sf * 2_000_000))


def adult_categories(content: str) -> list[str] | None:
    toks = set(
        t for t in "".join(
            c.lower() if c.isalnum() else " " for c in content
        ).split()
    )
    hits = sorted({ADULT_CATEGORY for t in ADULT_TERMS if t in toks})
    return hits or None


def make_row(
    i: int,
    rng: random.Random,
    small_audio: bool,
    prev_audio: tuple[int, int] | None = None,
):
    name, fn, _ = _pick_case(rng)
    lang = _pick_lang(rng)
    transcript = fn(rng, lang)
    sr = rng.choice([8000, 16000, 22050])
    if small_audio:
        dur = rng.randint(150, 400)
    else:
        dur = rng.randint(200, 4000)
        if i % 997 == 0:  # a few multi-MB clips (FIXTURES.md §3.11)
            dur = rng.randint(30_000, 60_000)
            sr = 16000
    codec = rng.choice(["pcm_s16le", "wav"])
    if is_dup_row(i) and prev_audio is not None:
        # near-dup plant: the drawn sr/dur above are CONSUMED (the
        # transcript rng stream stays identical across fixture
        # versions) but the stored audio metadata is the previous
        # row's, matching the duplicated PCM
        sr, dur = prev_audio
    pcm = expected_pcm(i, sr, dur)
    return {
        "clip_id": f"clip-{i:08d}",
        "bytes": encode(pcm, sr, codec),
        "sr_hz": sr,
        "dur_ms": dur,
        "codec": codec,
        "transcript": transcript,
        "case_class": name,
    }


_CASE_CUM = None


def _pick_case(rng: random.Random):
    global _CASE_CUM
    if _CASE_CUM is None:
        total = sum(w for _, _, w in CASES)
        acc, cum = 0.0, []
        for name, fn, w in CASES:
            acc += w / total
            cum.append((acc, name, fn))
        _CASE_CUM = cum
    x = rng.random()
    for acc, name, fn in _CASE_CUM:
        if x <= acc:
            return name, fn, acc
    return _CASE_CUM[-1][1], _CASE_CUM[-1][2], 1.0


_ARPA_CACHE: dict = {}


def _label_pp(lang: str, content: str):
    from ungoliant_spark.arpa import ArpaModel, model_path

    if lang not in _ARPA_CACHE:
        path = model_path(lang)
        _ARPA_CACHE[lang] = (
            ArpaModel.load(path) if os.path.exists(path) else None
        )
    m = _ARPA_CACHE[lang]
    if m is None:
        return None
    return float(np.float32(m.perplexity(content.replace("\n", " "))))


def label_row(clip_id: str, transcript: str) -> dict:
    """Frozen reference label via the pure-Python oracle, in pipeline
    stage order (pipeline.rs:162-226): trim → pfilter → LID →
    annotate → noisy+tiny drop → scrub + adult categories + TLSH +
    per-language perplexity."""
    from ungoliant_spark.operators.tlsh_op import tlsh_hash

    h = oracle.heuristic_pipeline(transcript)
    lang = lang_prob = None
    keep = False
    if h.trim_keep and h.pfilter_keep:
        kept_lines = oracle.rust_lines(transcript)[h.line_start : h.line_end + 1]
        lang, lang_prob, _, _ = identify_doc(kept_lines)
        if lang is not None:
            keep = h.annotation_keep
    cats = adult_categories(h.content) if keep else None
    return {
        "clip_id": clip_id,
        "keep": keep,
        "trim_keep": h.trim_keep,
        "pfilter_keep": h.pfilter_keep,
        "annotation_keep": h.annotation_keep,
        "lang": lang if keep else None,
        "lang_prob": float(lang_prob) if (keep and lang_prob is not None) else None,
        "quality_warnings": h.quality_warnings if h.trim_keep and h.pfilter_keep else [],
        "categories": cats,
        "harmful_pp": _label_pp(lang, h.content) if keep else None,
        "tlsh": tlsh_hash(h.content.encode("utf-8")) if keep else None,
        "scrubbed_transcript": oracle.scrub(h.content) if keep else None,
        "line_start": h.line_start,
        "line_end": h.line_end,
    }


LABELS_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("keep", pa.bool_()),
        ("trim_keep", pa.bool_()),
        ("pfilter_keep", pa.bool_()),
        ("annotation_keep", pa.bool_()),
        ("lang", pa.string()),
        ("lang_prob", pa.float32()),
        ("quality_warnings", pa.list_(pa.string())),
        ("categories", pa.list_(pa.string())),
        ("harmful_pp", pa.float32()),
        ("tlsh", pa.string()),
        ("scrubbed_transcript", pa.string()),
        ("line_start", pa.int32()),
        ("line_end", pa.int32()),
    ]
)


def regenerate_labels(sf: float, out_dir: str | None = None) -> str:
    """Recompute labels.parquet from an existing clips.parquet (after
    a frozen-spec change, e.g. new ARPA artifacts) without touching
    the clips bytes."""
    out_dir = out_dir or fixture_dir(sf)
    clips_path = os.path.join(out_dir, "clips.parquet")
    labels_path = os.path.join(out_dir, "labels.parquet")
    pf = pq.ParquetFile(clips_path)
    writer = pq.ParquetWriter(labels_path, LABELS_SCHEMA, compression="zstd")
    for batch in pf.iter_batches(columns=["clip_id", "transcript"]):
        rows = [
            label_row(cid, tr)
            for cid, tr in zip(
                batch.column("clip_id").to_pylist(),
                batch.column("transcript").to_pylist(),
            )
        ]
        writer.write_table(pa.Table.from_pylist(rows, schema=LABELS_SCHEMA))
    writer.close()
    return labels_path


def generate(
    sf: float,
    out_dir: str | None = None,
    with_labels: bool = True,
    force: bool = False,
) -> str:
    """Write clips.parquet (+ labels.parquet) for a scale factor;
    returns the directory. Cached by (sf, SEED, FIXTURE_VERSION)."""
    out_dir = out_dir or fixture_dir(sf)
    clips_path = os.path.join(out_dir, "clips.parquet")
    labels_path = os.path.join(out_dir, "labels.parquet")
    done = os.path.exists(clips_path) and (
        not with_labels or os.path.exists(labels_path)
    )
    if done and not force:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    n = n_rows_for_sf(sf)
    small_audio = n > 50_000
    rng = random.Random(SEED)
    # write to .tmp and rename at the end: the cache-hit check above is
    # existence-based, so a generator killed mid-write must not leave a
    # truncated file at the final path (r8 inherited state: an
    # interrupted round boundary left a footer-less clips.parquet that
    # every later session treated as done)
    clips_tmp = clips_path + ".tmp"
    labels_tmp = labels_path + ".tmp"
    clips_writer = pq.ParquetWriter(clips_tmp, CLIPS_SCHEMA, compression="zstd")
    labels_writer = (
        pq.ParquetWriter(labels_tmp, LABELS_SCHEMA, compression="zstd")
        if with_labels
        else None
    )
    chunk: list[dict] = []
    lchunk: list[dict] = []
    prev_audio: tuple[int, int] | None = None
    for i in range(n):
        row = make_row(i, rng, small_audio, prev_audio)
        prev_audio = (row["sr_hz"], row["dur_ms"])
        chunk.append(row)
        if labels_writer is not None:
            lchunk.append(label_row(row["clip_id"], row["transcript"]))
        if len(chunk) >= 4000:
            # modest row groups: rows carry multi-KB binary audio
            clips_writer.write_table(
                pa.Table.from_pylist(chunk, schema=CLIPS_SCHEMA),
                row_group_size=512,
            )
            chunk = []
            if labels_writer is not None:
                labels_writer.write_table(
                    pa.Table.from_pylist(lchunk, schema=LABELS_SCHEMA)
                )
                lchunk = []
    if chunk:
        clips_writer.write_table(pa.Table.from_pylist(chunk, schema=CLIPS_SCHEMA))
    if labels_writer is not None and lchunk:
        labels_writer.write_table(
            pa.Table.from_pylist(lchunk, schema=LABELS_SCHEMA)
        )
    clips_writer.close()
    os.replace(clips_tmp, clips_path)
    if labels_writer is not None:
        labels_writer.close()
        os.replace(labels_tmp, labels_path)
    return out_dir
