"""fastText .bin loader: byte-format round-trip + featurization
semantics (dict word ids, subword bucket offset, signed-char FNV
hash) against an independent in-test reference computation."""

from __future__ import annotations

import numpy as np
import pytest

from ungoliant_spark.fasttext_bin import (
    ft_hash,
    ft_subword_ids,
    load_fasttext_bin,
    write_fasttext_bin,
)

WORDS = ["hello", "world", "bonjour"]
LABELS = ["__label__en", "__label__fr", "__label__zz"]
BUCKET = 1 << 10
DIM = 8


@pytest.fixture()
def model_file(tmp_path):
    rng = np.random.default_rng(11)
    E = rng.standard_normal((len(WORDS) + BUCKET, DIM)).astype(np.float32)
    out = rng.standard_normal((len(LABELS), DIM)).astype(np.float32)
    path = str(tmp_path / "mini.bin")
    write_fasttext_bin(path, E, out, WORDS, LABELS, minn=2, maxn=4,
                       bucket=BUCKET)
    return path, E, out


def _ref_probs(line: str, E, out):
    words = {w: i for i, w in enumerate(WORDS)}
    ids: list[int] = []
    for tok in line.split():
        ids += ft_subword_ids(tok, words, len(WORDS), BUCKET, 2, 4)
    if not ids:
        return None
    h = E[np.array(ids)].astype(np.float64).mean(axis=0)
    logits = h @ out.T.astype(np.float64)
    logits -= logits.max()
    p = np.exp(logits)
    return p / p.sum()


def test_roundtrip_predictions(model_file):
    path, E, out = model_file
    m = load_fasttext_bin(path)
    assert m.labels == LABELS
    lines = [
        "hello world",          # in-vocab words
        "hello unknownword",    # OOV → ngrams only
        "héllo wörld",          # multibyte: signed-char hash path
        "bonjour",
    ]
    got = [m.predict_batch([ln], threshold=0.0)[0] for ln in lines]
    for ln, g in zip(lines, got):
        ref = _ref_probs(ln, E, out)
        i = int(np.argmax(ref))
        assert g is not None
        assert g[0] == LABELS[i], ln
        assert abs(g[1] - float(ref[i])) < 1e-6, ln


def test_ft_hash_sign_extension():
    # ASCII agrees with plain FNV-1a; high bytes differ (sign extension)
    from ungoliant_spark.lid_model import fnv1a

    assert ft_hash(b"abc") == fnv1a(b"abc")
    assert ft_hash("é".encode()) != fnv1a("é".encode())


def test_reject_bad_magic(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        load_fasttext_bin(str(p))
