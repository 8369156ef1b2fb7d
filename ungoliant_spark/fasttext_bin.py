"""fastText .bin model I/O — the production path for real
lid.176.bin weights.

The committed fixture model (lid_model.npz) ships for offline tests;
a production cluster instead points ``UNGOLIANT_LID_BIN`` at the real
fastText supervised model (e.g. lid.176.bin, the model the reference
loads via the fasttext crate, /root/reference/src/identifiers/
model.rs:241-259). This module parses that public binary format
(github.com/facebookresearch/fastText, src/fasttext.cc
FastText::loadModel / src/args.cc Args::load / src/dictionary.cc
Dictionary::load / src/densematrix.cc) directly into the same
(E, W, b, labels) arrays LidModel uses — no fasttext wheel needed.

Restrictions (checked, with clear errors): dense models only (no
product quantization), softmax loss (hierarchical-softmax trees are
not walked — lid.176.bin uses plain softmax).

A writer for the same format is included so the loader is
round-trip-testable offline against the fixture model.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

FASTTEXT_MAGIC = 793_712_314
FASTTEXT_VERSION = 12

# src/args.h enums
_LOSS_SOFTMAX = 3
_MODEL_SUP = 1


@dataclass
class FtArgs:
    dim: int
    minn: int
    maxn: int
    bucket: int
    nwords: int
    nlabels: int


def _read_args(f) -> dict:
    # Args::load — 12 int32 + 1 double + 2 int32 + ... exact order from
    # src/args.cc: dim, ws, epoch, minCount, neg, wordNgrams, loss,
    # model, bucket, minn, maxn, lrUpdateRate (int32 each), t (double)
    keys = [
        "dim", "ws", "epoch", "minCount", "neg", "wordNgrams",
        "loss", "model", "bucket", "minn", "maxn", "lrUpdateRate",
    ]
    vals = struct.unpack("<12i", f.read(48))
    out = dict(zip(keys, vals))
    (out["t"],) = struct.unpack("<d", f.read(8))
    return out


def _write_args(f, a: dict) -> None:
    f.write(
        struct.pack(
            "<12i",
            a["dim"], a["ws"], a["epoch"], a["minCount"], a["neg"],
            a["wordNgrams"], a["loss"], a["model"], a["bucket"],
            a["minn"], a["maxn"], a["lrUpdateRate"],
        )
    )
    f.write(struct.pack("<d", a["t"]))


def _read_cstr(f) -> bytes:
    out = bytearray()
    while True:
        c = f.read(1)
        if not c or c == b"\x00":
            return bytes(out)
        out += c


def _read_dictionary(f):
    """Dictionary::load (src/dictionary.cc): size, nwords, nlabels,
    ntokens(i64), pruneidx_size(i64), then per-entry: word\\0,
    count(i64), type(i8); then pruneidx pairs."""
    size, nwords, nlabels = struct.unpack("<3i", f.read(12))
    ntokens, pruneidx_size = struct.unpack("<2q", f.read(16))
    words: list[str] = []
    labels: list[str] = []
    for _ in range(size):
        w = _read_cstr(f).decode("utf-8")
        _count, etype = struct.unpack("<qb", f.read(9))
        if etype == 0:
            words.append(w)
        else:
            labels.append(w)
    if pruneidx_size > 0:
        f.read(8 * pruneidx_size)
    return words, labels, nwords, nlabels


def _write_dictionary(f, words: list[str], labels: list[str]) -> None:
    size = len(words) + len(labels)
    f.write(struct.pack("<3i", size, len(words), len(labels)))
    f.write(struct.pack("<2q", size, -1 if False else 0))
    for w in words:
        f.write(w.encode("utf-8") + b"\x00")
        f.write(struct.pack("<qb", 1, 0))
    for lb in labels:
        f.write(lb.encode("utf-8") + b"\x00")
        f.write(struct.pack("<qb", 1, 1))


def _read_densematrix(f) -> np.ndarray:
    quant = struct.unpack("<b", f.read(1))[0]
    if quant:
        raise NotImplementedError(
            "quantized (.ftz) fastText models are not supported — "
            "use the dense .bin"
        )
    m, n = struct.unpack("<2q", f.read(16))
    data = np.frombuffer(f.read(m * n * 4), dtype="<f4").reshape(m, n)
    return data.copy()


def _write_densematrix(f, mat: np.ndarray) -> None:
    f.write(struct.pack("<b", 0))
    m, n = mat.shape
    f.write(struct.pack("<2q", m, n))
    f.write(mat.astype("<f4").tobytes())


def load_fasttext_bin(path: str):
    """Parse a fastText supervised .bin into a
    :class:`ungoliant_spark.lid_model.LidModel`.

    Input matrix rows are [words | subword buckets]; our hashing-only
    LidModel addresses rows by ``fnv1a(ngram) % buckets`` *offset past
    the word rows*, matching fastText's subword id =
    nwords + (hash % bucket). Known words hit their word row exactly
    like fastText's dictionary lookup would. The output layer W is the
    transpose of fastText's output matrix; b is zero (fastText
    supervised has no output bias).
    """
    from ungoliant_spark.lid_model import LidModel

    with open(path, "rb") as f:
        magic, version = struct.unpack("<2i", f.read(8))
        if magic != FASTTEXT_MAGIC:
            raise ValueError(f"not a fastText model (magic {magic})")
        if version > FASTTEXT_VERSION:
            raise ValueError(f"unsupported fastText version {version}")
        args = _read_args(f)
        if args["model"] != _MODEL_SUP:
            raise NotImplementedError("only supervised models supported")
        if args["loss"] != _LOSS_SOFTMAX:
            raise NotImplementedError(
                "only softmax-loss models supported (lid.176.bin is)"
            )
        words, labels, nwords, nlabels = _read_dictionary(f)
        input_mat = _read_densematrix(f)
        output_mat = _read_densematrix(f)
    E = input_mat  # (nwords + bucket, dim)
    W = output_mat.T.astype(np.float32)  # (dim, nlabels)
    b = np.zeros(W.shape[1], dtype=np.float32)
    model = LidModel(E=E, W=W, b=b, labels=labels, junk=set())
    # fastText addressing metadata consumed by LidModel featurization
    model.__dict__["ft_words"] = {w: i for i, w in enumerate(words)}
    model.__dict__["ft_word_offset"] = len(words)
    model.__dict__["ft_minn"] = args["minn"]
    model.__dict__["ft_maxn"] = args["maxn"]
    model.__dict__["ft_bucket"] = args["bucket"]
    return model


def write_fasttext_bin(
    path: str,
    E: np.ndarray,
    output: np.ndarray,  # (nlabels, dim) — fastText layout
    words: list[str],
    labels: list[str],
    minn: int = 2,
    maxn: int = 4,
    bucket: int | None = None,
) -> None:
    """Emit a minimal spec-conformant supervised .bin (round-trip
    testing of the loader; also lets offline users export the fixture
    model into standard tooling)."""
    bucket = bucket if bucket is not None else E.shape[0] - len(words)
    args = {
        "dim": E.shape[1], "ws": 5, "epoch": 5, "minCount": 1,
        "neg": 5, "wordNgrams": 1, "loss": _LOSS_SOFTMAX,
        "model": _MODEL_SUP, "bucket": bucket, "minn": minn,
        "maxn": maxn, "lrUpdateRate": 100, "t": 1e-4,
    }
    with open(path, "wb") as f:
        f.write(struct.pack("<2i", FASTTEXT_MAGIC, FASTTEXT_VERSION))
        _write_args(f, args)
        _write_dictionary(f, words, labels)
        _write_densematrix(f, E)  # leading byte doubles as quant_ flag
        _write_densematrix(f, output)  # leading byte doubles as qout flag


def ft_hash(data: bytes) -> int:
    """fastText's FNV-1a variant (src/dictionary.cc Dictionary::hash):
    bytes are taken as SIGNED chars then widened to uint32, so bytes
    ≥ 0x80 xor with sign-extended values — differs from plain FNV-1a
    on non-ASCII input. Must match exactly to address the same
    buckets as a real lid.176.bin."""
    h = 2166136261
    for b in data:
        if b >= 128:
            b = b - 256  # int8
        h ^= b & 0xFFFFFFFF
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def ft_subword_ids(
    tok: str,
    words: dict[str, int],
    word_offset: int,
    bucket: int,
    minn: int,
    maxn: int,
) -> list[int]:
    """Dictionary::getSubwords semantics: the word's dict id (if in
    vocabulary) + hashed char ngrams of '<tok>' with minn ≤ n ≤ maxn
    (1-char '<' / '>' edge ngrams excluded as in computeSubwords)."""
    ids: list[int] = []
    wid = words.get(tok)
    if wid is not None:
        ids.append(wid)
    w = f"<{tok}>"
    chars = list(w)
    L = len(chars)
    for i in range(L):
        for n in range(1, maxn + 1):
            j = i + n
            if j > L:
                break
            if n >= minn and not (n == 1 and (i == 0 or j == L)):
                ng = "".join(chars[i:j])
                ids.append(word_offset + ft_hash(ng.encode("utf-8")) % bucket)
    return ids
