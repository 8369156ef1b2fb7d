"""Hypothesis property pins: engine kernels vs the independent twins
on ADVERSARIALLY GENERATED inputs.

test_independent_pins.py holds the kernels to frozen vectors plus
seeded random sweeps; this module extends that coverage with
property-based exploration — boundary lengths around TLSH's
minimum-input None cutoff, degenerate byte distributions, NUL bytes
inside LID tokens (the exact hazard the predict_batch dedup-dict
comment documents: C-string hashing would collapse tokens differing
only past a NUL), astral-plane / combining-mark unicode through the
FNV feature hasher, all-zero / all-peak / single-sample PCM through
the audio-stats + acoustic-fingerprint kernel — and shrinks any
disagreement to a minimal counterexample.

Determinism: ``derandomize=True`` on every test (no flaky CI
exploration; the generated corpus is a pure function of the test
code). ``deadline=None`` because first examples amortize module-level
resource loads. No SparkSession anywhere — these pin PER-ROW kernel
math; the distributed plans over these kernels are pinned separately
by the driver oracle rows and the plan-quality gates.

Reference parity targets (same as test_independent_pins.py):
/root/reference/src/identifiers/model.rs:64-89 (predict_one
semantics), adult_content.rs:56-60 (perplexity input contract).
"""

from __future__ import annotations

import functools
import math
import os
import sys

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "independent"))

NPZ = os.path.join(
    os.path.dirname(HERE), "ungoliant_spark", "resources", "lid_model.npz"
)
ARPA_DIR = os.path.join(
    os.path.dirname(HERE), "ungoliant_spark", "resources", "arpa"
)

COMMON = dict(derandomize=True, deadline=None, print_blob=True)


# ---------------------------------------------------------------- TLSH

# uniform random bytes (the easy case), low-entropy alphabets (where
# bucket spread — and therefore the None cutoff — is adversarial),
# and run-length-repeated patterns (q-gram windows see few distinct
# contexts). Lengths deliberately straddle the minimum-input cutoff.
_tlsh_inputs = st.one_of(
    st.binary(min_size=0, max_size=1200),
    st.builds(
        bytes,
        st.lists(st.integers(0, 3), min_size=0, max_size=600),
    ),
    st.builds(
        lambda pat, n: (pat * n)[:1200],
        st.binary(min_size=1, max_size=8),
        st.integers(1, 400),
    ),
)


@settings(max_examples=200, **COMMON)
@given(data=_tlsh_inputs)
def test_tlsh_engine_matches_scalar(data):
    """Engine numpy-batched TLSH == independent per-byte scalar,
    including agreeing on WHEN the hash is None (too short / too
    little bucket spread)."""
    from tlsh_scalar import tlsh_scalar

    from ungoliant_spark.operators.tlsh_op import tlsh_hash

    assert tlsh_hash(data) == tlsh_scalar(data)


@settings(max_examples=100, **COMMON)
@given(a=st.binary(min_size=60, max_size=400), b=st.binary(min_size=60, max_size=400))
def test_tlsh_distance_is_a_premetric(a, b):
    """distance(h,h)==0 and distance symmetry — properties of the
    published TLSH diff, required for the near-dup threshold to mean
    the same thing regardless of operand order."""
    from ungoliant_spark.operators.tlsh_op import distance, tlsh_hash

    ha, hb = tlsh_hash(a), tlsh_hash(b)
    if ha is None or hb is None:
        return
    assert distance(ha, ha) == 0
    assert distance(hb, hb) == 0
    assert distance(ha, hb) == distance(hb, ha)
    assert distance(ha, hb) >= 0


# ----------------------------------------------------------------- LID

@functools.lru_cache(maxsize=1)
def _lid_model():
    from ungoliant_spark.lid_model import LidModel

    return LidModel.load()


# arbitrary unicode (astral planes, combining marks, bidi controls),
# plus targeted shapes: tokens containing NUL bytes, and real-vocab
# words glued to junk so predictions land near the 0.8 threshold.
def _vocab_line():
    from ungoliant_spark.langdata import LANGS, WORDS

    flat = [w for lang in LANGS for w in WORDS[lang][:30]]
    return st.lists(
        st.sampled_from(flat) | st.text(max_size=6), min_size=1, max_size=12
    ).map(" ".join)


_lid_lines = st.one_of(
    st.text(max_size=200),
    st.text(alphabet=st.characters(codec="utf-8"), max_size=120),
    _vocab_line(),
    # NUL inside a token: engine's dict-based token dedup must not
    # collapse "a\x00b" with "a\x00c" (C-string hashing would)
    st.builds(
        lambda pre, post, rest: f"{pre}\x00{post} {pre}\x00{rest}",
        st.text(min_size=1, max_size=5),
        st.text(min_size=1, max_size=5),
        st.text(min_size=1, max_size=5),
    ),
)


@settings(max_examples=120, **COMMON)
@given(line=_lid_lines)
def test_lid_engine_matches_scalar(line):
    """Batched engine inference == independent scalar fastText twin on
    arbitrary unicode: same (label, prob) or same None (threshold /
    junk-class / featureless agreement)."""
    from lid_scalar import predict_scalar

    got = _lid_model().predict_one(line)
    ind = predict_scalar(NPZ, line)
    if ind is None:
        assert got is None, repr(line)
    else:
        assert got is not None, repr(line)
        assert got[0] == ind[0], repr(line)
        assert got[1] == pytest.approx(ind[1], abs=2e-5), repr(line)


# ---------------------------------------------------------------- ARPA

@functools.lru_cache(maxsize=1)
def _arpa_pair():
    import arpa_scalar

    from ungoliant_spark.arpa import ArpaModel

    path = os.path.join(ARPA_DIR, "en.arpa")
    # cache the scalar's parse so 100 hypothesis examples don't re-read
    # the 850 KB file per call — composition logic stays the scalar's
    arpa_scalar.parse_arpa = functools.lru_cache(maxsize=2)(
        arpa_scalar.parse_arpa
    )
    return ArpaModel.load_arpa(path), path


_arpa_tokens = st.lists(
    st.one_of(
        st.sampled_from("the of and to in a is was for on".split()),
        st.text(
            alphabet=st.characters(exclude_characters=" \t\n\r"),
            min_size=1,
            max_size=8,
        ),
    ),
    min_size=0,
    max_size=14,
)


@settings(max_examples=100, **COMMON)
@given(tokens=_arpa_tokens)
def test_arpa_engine_matches_scalar(tokens):
    """Memoized-recursive engine scorer == independent dict-of-dicts
    scalar on random in-vocab/OOV/unicode mixtures (Katz backoff with
    missing-context bow=0, longest-window scoring, <s> anchoring)."""
    from arpa_scalar import perplexity_scalar

    model, path = _arpa_pair()
    text = " ".join(tokens)
    got = model.perplexity(text)
    ind = perplexity_scalar(path, text)
    if math.isinf(ind):
        assert math.isinf(got), repr(text)
    else:
        assert got == pytest.approx(ind, rel=1e-12), repr(text)


# --------------------------------------------- audio stats + fingerprint

_pcm_arrays = hnp.arrays(
    dtype=np.int16,
    shape=st.integers(0, 4096),
    elements=st.integers(-32768, 32767),
)

_SRS = [8000, 11025, 16000, 22050, 44100, 48000]


@settings(max_examples=80, **COMMON)
@given(
    pcm=_pcm_arrays,
    sr=st.sampled_from(_SRS),
    codec=st.sampled_from(["pcm_s16le", "wav"]),
)
def test_audio_stats_engine_matches_independent(pcm, sr, codec):
    """Engine per-clip decode+stats+fingerprint kernel (_stats_one,
    the one inside the shared mapInPandas decode pass) == the
    independently-coded twin used by the DuckDB oracle
    (oracle_sql_clips._expected_audio_rows: separate RIFF parser,
    bincount accumulation, slice-sum frames) — on arbitrary int16 PCM
    including empty, constant, and full-scale-peak signals. The afp
    word must be EXACTLY equal (it feeds Hamming joins in both
    engines); floats compare AFTER float32 quantization because that
    is the stored column contract on both sides (AUDIO_STATS_T uses
    FloatType, the oracle schema pa.float32 — the twin pre-quantizes,
    the engine's float64 is cast by the Spark schema)."""
    from ungoliant_spark.operators.audio_ops import _stats_one
    from ungoliant_spark.oracle_sql_clips import _expected_audio_rows
    from ungoliant_spark.sources.audio import encode

    data = encode(pcm, sr, codec)
    got = _stats_one(data, codec, sr)
    exp = _expected_audio_rows("x", data, codec, sr)

    assert got["decode_ok"] is True
    assert got["n_samples"] == exp["n_samples"] == len(pcm)
    assert got["afp"] == exp["afp"]
    assert got["peak"] == exp["peak"]
    for key in ("rms", "zcr", "centroid_hz"):
        assert np.float32(got[key]) == np.float32(exp[key]), key
    assert [np.float32(v) for v in got["frame_energy"]] == [
        np.float32(v) for v in exp["frame_energy"]
    ]


@settings(max_examples=60, **COMMON)
@given(pcm=_pcm_arrays, sr=st.sampled_from(_SRS))
def test_audio_codecs_agree(pcm, sr):
    """The same samples through the raw-PCM path and the RIFF/WAVE
    container path must produce identical stats — the codec seam
    (README 'audio codec surface') changes framing, never values."""
    from ungoliant_spark.operators.audio_ops import _stats_one
    from ungoliant_spark.sources.audio import encode

    raw = _stats_one(encode(pcm, sr, "pcm_s16le"), "pcm_s16le", sr)
    wav = _stats_one(encode(pcm, sr, "wav"), "wav", sr)
    assert raw == wav


# ------------------------------------------------------------- resample

@settings(max_examples=60, **COMMON)
@given(
    pcm=hnp.arrays(
        dtype=np.int16,
        shape=st.integers(0, 2000),
        elements=st.integers(-32768, 32767),
    ),
    sr=st.sampled_from(_SRS),
    target=st.sampled_from([8000, 16000, 22050]),
)
def test_resample_engine_matches_scalar(pcm, sr, target):
    """Engine np.interp resample kernel vs the independent per-sample
    scalar twin (tests/independent/resample_scalar): same output
    length, per-sample agreement within 1 int16 LSB (the two
    implementations group the interpolation arithmetic differently —
    the honest float bound), and every output inside the input's
    value envelope (linear interpolation is a convex combination)."""
    from resample_scalar import resample_scalar

    from ungoliant_spark.operators.audio_ops import _resample_one
    from ungoliant_spark.sources.audio import encode

    got = _resample_one(encode(pcm, sr, "pcm_s16le"), "pcm_s16le", sr, target)
    n_ind, b_ind = resample_scalar(pcm, sr, target)
    assert got["n_samples_out"] == n_ind
    eng = np.frombuffer(got["bytes_out"], dtype="<i2").astype(np.int32)
    ind = np.frombuffer(b_ind, dtype="<i2").astype(np.int32)
    assert len(eng) == len(ind) == n_ind
    assert np.abs(eng - ind).max(initial=0) <= 1
    if len(pcm):
        assert eng.min() >= int(pcm.min()) - 1
        assert eng.max() <= int(pcm.max()) + 1


@settings(max_examples=40, **COMMON)
@given(
    pcm=hnp.arrays(
        dtype=np.int16,
        shape=st.integers(1, 2000),
        elements=st.integers(-32768, 32767),
    ),
    sr=st.sampled_from(_SRS),
)
def test_resample_identity_rate_is_exact(pcm, sr):
    """Resampling at the input's own rate must reproduce the input
    BIT-EXACTLY (every output time hits an input sample point; linear
    interpolation is exact there) — the strongest no-tolerance pin the
    kernel admits."""
    from ungoliant_spark.operators.audio_ops import _resample_one
    from ungoliant_spark.sources.audio import encode

    got = _resample_one(encode(pcm, sr, "pcm_s16le"), "pcm_s16le", sr, sr)
    assert got["n_samples_out"] == len(pcm)
    assert got["bytes_out"] == pcm.astype("<i2").tobytes()


# ------------------------------------------------- ARPA artifact formats

_corpus_sentences = st.lists(
    st.lists(
        st.sampled_from("alpha beta gamma delta eps zeta".split())
        | st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters=" \t\n\r\\"),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=30, **COMMON)
@given(sentences=_corpus_sentences, queries=_arpa_tokens)
def test_arpa_artifact_roundtrip_preserves_scoring(
    sentences, queries, tmp_path_factory
):
    """train → write_arpa → load_arpa → compile_binary → load_binary
    is score-preserving for an arbitrary training corpus (unicode
    tokens included): both loaded artifacts give the in-memory model's
    exact perplexity on arbitrary query strings, and the text artifact
    parses back to the 6-dp-quantized weights write_arpa emits. Pins
    the whole artifact seam the production job crosses (the reference
    prefers .binary over .arpa the same way)."""
    from ungoliant_spark.arpa import (
        ArpaModel,
        compile_binary,
        train_arpa,
        write_arpa,
    )

    tmp = tmp_path_factory.mktemp("arpa_prop")
    model = train_arpa(sentences)
    path = str(tmp / "m.arpa")
    write_arpa(model, path)
    from_text = ArpaModel.load_arpa(path)
    from_bin = ArpaModel.load_binary(compile_binary(path))
    assert from_bin.model == from_text.model
    text = " ".join(queries)
    got_text = from_text.perplexity(text)
    got_bin = from_bin.perplexity(text)
    assert got_text == got_bin
    # the text artifact quantizes weights to 6 dp — loading must give
    # exactly those quantized values back (no parse drift)
    for n, entries in from_text.model.items():
        for ng, (lp, bow) in entries.items():
            src_lp, src_bow = model[n][ng]
            assert lp == float(f"{src_lp:.6f}"), (n, ng)
            if bow is not None and src_bow is not None:
                assert bow == float(f"{src_bow:.6f}"), (n, ng)


# --------------------------------------------- banded-Hamming pigeonhole

@settings(max_examples=200, **COMMON)
@given(
    word=st.integers(0, (1 << 63) - 1),
    flips=st.lists(st.integers(0, 62), min_size=0, max_size=3, unique=True),
)
def test_banded_pigeonhole_is_lossless(word, flips):
    """The lossless claim behind every banded-Hamming join (text
    SimHash AND acoustic afp): for ANY 63-bit word and ANY ≤3 bit
    flips, the two words share at least one identical band chunk under
    SIMHASH_BANDS — so the (band, chunk) equi-join can never miss a
    Hamming-≤3 pair. Chunks are extracted here with independent pure
    Python (mask arithmetic mirrors the published banding argument,
    not the engine's Catalyst expressions); the distance-0 case (no
    flips) must collide on EVERY band."""
    from ungoliant_spark.operators.dedup import SIMHASH_BANDS

    other = word
    for b in flips:
        other ^= 1 << b

    def chunks(w):
        return [
            (w >> off) & ((1 << width) - 1) for off, width in SIMHASH_BANDS
        ]

    same = [a == b for a, b in zip(chunks(word), chunks(other))]
    assert any(same)
    if not flips:
        assert all(same)
    # and the bound is tight: flipping one bit in EVERY band defeats
    # 4-band pigeonhole at Hamming 4 (why max_hamming > 3 raises)
    defeat = word
    for off, _ in SIMHASH_BANDS:
        defeat ^= 1 << off
    assert not any(
        a == b for a, b in zip(chunks(word), chunks(defeat))
    )
