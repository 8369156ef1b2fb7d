"""Independent ARPA/KenLM-style backoff scorer — SECOND implementation
for de-circularized verification (round-2 verdict item 2).

Re-derived from the public ARPA file-format description and the
standard Katz backoff rule: P(w|ctx) = P_n(ctx,w) if the n-gram is
listed, else bow(ctx) + P(w | shorter ctx) in log10 space, with
unlisted contexts contributing backoff weight 0. Whole-string
perplexity = 10^(-mean log10 prob) over transitions from <s>,
scoring each position against the longest available window (the
contract pinned against the reference's adult_content.rs:56-60).

Regex-driven parser + dict-of-dicts-by-order layout; no imports from
ungoliant_spark (the engine's arpa.py uses a line-state-machine parser
and a memoized recursive scorer).
"""

from __future__ import annotations

import re

BOS, EOS, UNK = "<s>", "</s>", "<unk>"

_SECTION = re.compile(r"^\\(\d)-grams:$")
_ENTRY = re.compile(r"^(-?[\d.]+(?:[eE][+-]?\d+)?)\t([^\t]+)(?:\t(-?[\d.]+(?:[eE][+-]?\d+)?))?$")


def parse_arpa(path: str) -> dict[int, dict[tuple[str, ...], tuple[float, float | None]]]:
    orders: dict[int, dict] = {}
    current: dict | None = None
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.rstrip("\n")
            m = _SECTION.match(line)
            if m:
                current = orders.setdefault(int(m.group(1)), {})
                continue
            if current is None:
                continue
            e = _ENTRY.match(line)
            if not e:
                continue
            lp = float(e.group(1))
            words = tuple(e.group(2).split(" "))
            bow = float(e.group(3)) if e.group(3) is not None else None
            current[words] = (lp, bow)
    return orders


def logprob(orders: dict, ngram: tuple[str, ...]) -> float:
    entry = orders.get(len(ngram), {}).get(ngram)
    if entry is not None:
        return entry[0]
    if len(ngram) == 1:
        return orders[1][(UNK,)][0]
    ctx = orders.get(len(ngram) - 1, {}).get(ngram[:-1])
    bow = ctx[1] if ctx is not None and ctx[1] is not None else 0.0
    return bow + logprob(orders, ngram[1:])


def perplexity_scalar(path: str, text: str) -> float:
    orders = parse_arpa(path)
    max_order = max(orders)
    vocab = orders[1]
    words = [w if (w,) in vocab else UNK for w in text.split()]
    seq = [BOS] + words + [EOS]
    total = 0.0
    for i in range(1, len(seq)):
        window = tuple(seq[max(0, i - max_order + 1) : i + 1])
        total += logprob(orders, window)
    scored = len(seq) - 1
    if scored == 0:
        return float("inf")
    return 10.0 ** (-total / scored)
