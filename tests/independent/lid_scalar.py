"""Independent scalar fastText-style LID inference — SECOND
implementation for de-circularized verification (round-2 verdict
item 2).

Re-derived from the public fastText supervised-inference description
(token + '<tok>' char-ngrams → FNV-1a 32-bit hash buckets → MEAN of
embedding rows → linear layer → softmax; minn=2, maxn=4) using only
the raw npz arrays. Pure-Python loops — no imports from
ungoliant_spark and no shared featurization/matmul code with the
engine's batched path (lid_model.py assembles hidden vectors through
a token cache and scores a whole batch in one numpy matmul).
"""

from __future__ import annotations

import math

import numpy as np

MINN, MAXN = 2, 4


def fnv1a_32(data: bytes) -> int:
    h = 2166136261
    for byte in data:
        h = ((h ^ byte) * 16777619) & 0xFFFFFFFF
    return h


def features(line: str, buckets: int) -> list[int]:
    ids = []
    for tok in line.split():
        ids.append(fnv1a_32(tok.encode("utf-8")) % buckets)
        wrapped = "<" + tok + ">"
        for n in range(MINN, MAXN + 1):
            for i in range(len(wrapped) - n + 1):
                ids.append(
                    fnv1a_32(wrapped[i : i + n].encode("utf-8")) % buckets
                )
    return ids


def predict_scalar(
    npz_path: str, line: str, threshold: float = 0.8
) -> tuple[str, float] | None:
    """(label, prob) of the argmax class, or None when below threshold
    or the argmax is a junk class — FastText::predict_one semantics
    (/root/reference/src/identifiers/model.rs:64-89)."""
    z = np.load(npz_path, allow_pickle=False)
    E, W, b = z["E"], z["W"], z["b"]
    labels = [str(x) for x in z["labels"]]
    junk = {str(x) for x in z["junk"]}
    ids = features(line, E.shape[0])
    if not ids:
        return None
    dim = E.shape[1]
    hidden = [0.0] * dim
    for fid in ids:
        row = E[fid]
        for d in range(dim):
            hidden[d] += float(row[d])
    hidden = [np.float32(h / len(ids)) for h in hidden]
    n_classes = W.shape[1]
    logits = []
    for c in range(n_classes):
        acc = 0.0
        for d in range(dim):
            acc += float(hidden[d]) * float(W[d, c])
        logits.append(acc + float(b[c]))
    mx = max(logits)
    exps = [math.exp(v - mx) for v in logits]
    total = sum(exps)
    probs = [e / total for e in exps]
    best = max(range(n_classes), key=lambda c: probs[c])
    if probs[best] < threshold or labels[best] in junk:
        return None
    return labels[best], float(np.float32(probs[best]))
