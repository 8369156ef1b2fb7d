"""ARPA n-gram language models: tiny trainer + backoff scorer.

The reference scores documents with per-language KenLM models
(/root/reference/src/transformers/kenlm/adult_content.rs:9-61),
lazily loaded per language (kenlm/lru.rs:54-169), storing the
perplexity as ``harmful_pp`` — annotation only, no drop.

No kenlm wheel exists in this sandbox, so this module implements the
same math from scratch: an order-3 ARPA model (absolute-discount
backoff, log10 probs) trained deterministically on the synthetic
corpora by scripts/train_arpa.py, and a dict-lookup scorer with
standard backoff recursion:

    P(w|u,v) = P3(u,v,w)            if (u,v,w) in model
             = bow(u,v)*P(w|v)      else

Perplexity follows KenLM's convention: score <s> w1..wn </s>,
pp = 10^(-Σ log10 P / (n+1)), OOV words hit <unk>.
"""

from __future__ import annotations

import math
import os
from collections import defaultdict

ARPA_DIR = os.path.join(os.path.dirname(__file__), "resources", "arpa")
ORDER = 3
DISCOUNT = 0.5
UNK, BOS, EOS = "<unk>", "<s>", "</s>"


def train_arpa(sentences: list[list[str]], order: int = ORDER) -> dict:
    """Counts → absolute-discount backoff model.
    Returns {n: {ngram_tuple: (log10 p, log10 bow|None)}}."""
    counts: list[dict] = [defaultdict(int) for _ in range(order + 1)]
    for toks in sentences:
        seq = [BOS] + toks + [EOS]
        for n in range(1, order + 1):
            for i in range(len(seq) - n + 1):
                if n == 1 and seq[i] == BOS:
                    # <s> is context-only (KenLM convention): it gets
                    # the dummy -99 unigram below and must not inflate
                    # the unigram denominator
                    continue
                counts[n][tuple(seq[i : i + n])] += 1
    # context totals and continuation fan-out
    ctx_total: list[dict] = [defaultdict(int) for _ in range(order + 1)]
    ctx_types: list[dict] = [defaultdict(int) for _ in range(order + 1)]
    for n in range(2, order + 1):
        for ng, c in counts[n].items():
            ctx_total[n][ng[:-1]] += c
            ctx_types[n][ng[:-1]] += 1
    model: dict[int, dict] = {n: {} for n in range(1, order + 1)}
    # unigrams: add-one over vocab incl <unk>/<eos>
    vocab = set(w for (w,) in counts[1]) | {UNK, EOS}
    total1 = sum(counts[1].values()) + len(vocab)
    for w in sorted(vocab | {BOS}):
        if w == BOS:
            model[1][(w,)] = (-99.0, 0.0)  # ARPA convention for <s>
            continue
        p = (counts[1].get((w,), 0) + 1) / total1
        model[1][(w,)] = (math.log10(p), 0.0)
    # higher orders with absolute discounting
    for n in range(2, order + 1):
        for ng, c in counts[n].items():
            ctx = ng[:-1]
            p = (c - DISCOUNT) / ctx_total[n][ctx]
            if p <= 0:
                continue
            model[n][ng] = (math.log10(p), 0.0 if n < order else None)
        # backoff weights live on the (n-1)-gram entries
        for ctx, tot in ctx_total[n].items():
            bow = DISCOUNT * ctx_types[n][ctx] / tot
            if ctx in model[n - 1]:
                lp, _ = model[n - 1][ctx]
                model[n - 1][ctx] = (lp, math.log10(bow))
    return model


def write_arpa(model: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        for n in sorted(model):
            f.write(f"ngram {n}={len(model[n])}\n")
        for n in sorted(model):
            f.write(f"\n\\{n}-grams:\n")
            for ng in sorted(model[n]):
                lp, bow = model[n][ng]
                line = f"{lp:.6f}\t{' '.join(ng)}"
                if bow is not None and n < max(model):
                    line += f"\t{bow:.6f}"
                f.write(line + "\n")
        f.write("\n\\end\\\n")


class ArpaModel:
    """Backoff scorer over a parsed ARPA file (KenLM math)."""

    def __init__(self, model: dict[int, dict]):
        self.model = model
        self.order = max(model)

    @classmethod
    def load(cls, path: str) -> "ArpaModel":
        """Dispatch on artifact kind (.binary preferred by callers)."""
        if path.endswith(".binary"):
            return cls.load_binary(path)
        return cls.load_arpa(path)

    @classmethod
    def load_binary(cls, path: str) -> "ArpaModel":
        """Load a pre-parsed .binary artifact. The payload is JSON —
        a data-only format, deliberately NOT pickle: model dirs may be
        shared/untrusted and KenLM's own binary format is plain data
        (an attacker-supplied file must not execute code on load)."""
        import json

        with open(path, "rb") as f:
            magic = f.read(len(BINARY_MAGIC))
            if magic != BINARY_MAGIC:
                raise ValueError(f"{path}: not a USARPA2 binary model")
            payload = json.loads(f.read().decode("utf-8"))
        model: dict[int, dict] = {}
        for n_str, entries in payload.items():
            n = int(n_str)
            model[n] = {
                tuple(ng.split(" ")): (lp, bow) for ng, lp, bow in entries
            }
        return cls(model)

    @classmethod
    def load_arpa(cls, path: str) -> "ArpaModel":
        model: dict[int, dict] = {}
        cur_n = None
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if line.startswith("\\") and line.endswith("-grams:"):
                    cur_n = int(line[1])
                    model[cur_n] = {}
                    continue
                if not line or line.startswith("\\") or line.startswith("ngram"):
                    continue
                if cur_n is None:
                    continue
                parts = line.split("\t")
                lp = float(parts[0])
                ng = tuple(parts[1].split(" "))
                bow = float(parts[2]) if len(parts) > 2 else None
                model[cur_n][ng] = (lp, bow)
        return cls(model)

    def logprob(self, ngram: tuple[str, ...]) -> float:
        memo = self.__dict__.setdefault("_memo", {})
        hit = memo.get(ngram)
        if hit is not None:
            return hit
        n = len(ngram)
        entry = self.model.get(n, {}).get(ngram)
        if entry is not None:
            out = entry[0]
        elif n == 1:
            out = self.model[1][(UNK,)][0]
        else:
            # backoff: bow(context) + P(w | shorter context)
            ctx = self.model.get(n - 1, {}).get(ngram[:-1])
            bow = ctx[1] if ctx is not None and ctx[1] is not None else 0.0
            out = bow + self.logprob(ngram[1:])
        if len(memo) < 5_000_000:
            memo[ngram] = out
        return out

    def _fast_tables(self):
        """Int-packed lookup tables for the order-3 scoring hot path
        (r8): the same (lp, bow) floats keyed by packed vocab ids
        instead of tuples of strings — tuple construction + string-
        tuple hashing was ~60% of perplexity() wall (measured 5.3 s /
        5k docs single-core). Key representation only; every float and
        every addition is unchanged, so scores are bit-identical to
        :meth:`logprob` (gated by the frozen-pin + hypothesis twins
        and an exhaustive fixture-equality check)."""
        fast = self.__dict__.get("_fast")
        if fast is not None:
            return fast
        vocab: dict[str, int] = {}
        for (w,) in self.model[1]:
            vocab[w] = len(vocab)
        nv = len(vocab)
        uni_lp = [0.0] * nv
        uni_bow = [0.0] * nv
        for (w,), (lp, bow) in self.model[1].items():
            i = vocab[w]
            uni_lp[i] = lp
            uni_bow[i] = bow if bow is not None else 0.0
        big: dict[int, tuple[float, float]] = {}
        for ng, (lp, bow) in self.model.get(2, {}).items():
            a, b = vocab.get(ng[0]), vocab.get(ng[1])
            if a is None or b is None:
                continue  # scored tokens are always vocab words
            big[a * nv + b] = (lp, bow if bow is not None else 0.0)
        tri: dict[int, float] = {}
        for ng, (lp, _) in self.model.get(3, {}).items():
            a, b, c = vocab.get(ng[0]), vocab.get(ng[1]), vocab.get(ng[2])
            if a is None or b is None or c is None:
                continue
            tri[(a * nv + b) * nv + c] = lp
        fast = (vocab, nv, uni_lp, uni_bow, big, tri, {}, {})
        self.__dict__["_fast"] = fast
        return fast

    def perplexity(self, text: str) -> float:
        """KenLM-style whole-string perplexity; the reference feeds
        content with newlines replaced by spaces
        (adult_content.rs:56-60)."""
        if self.order != 3:
            return self._perplexity_generic(text)
        (
            vocab,
            nv,
            uni_lp,
            uni_bow,
            big,
            tri,
            memo3,
            memo2,
        ) = self._fast_tables()
        unk = vocab[UNK]
        vget = vocab.get
        ids = [vget(w, unk) for w in text.split()]
        seq = [vocab[BOS]] + ids + [vocab[EOS]]
        total = 0.0
        scored = len(seq) - 1
        if scored == 0:
            return float("inf")
        bget, tget = big.get, tri.get
        m3get, m2get = memo3.get, memo2.get

        def lp2(k2: int) -> float:
            # bigram logprob with unigram backoff — the n=2 branch of
            # :meth:`logprob`, identical floats in identical order
            out = m2get(k2)
            if out is not None:
                return out
            e = bget(k2)
            if e is not None:
                out = e[0]
            else:
                out = uni_bow[k2 // nv] + uni_lp[k2 % nv]
            memo2[k2] = out
            return out

        # position 1 scores the (BOS, w1) bigram; positions 2.. score
        # trigrams — exactly logprob(seq[max(0, i-2) : i+1])
        a, b = seq[0], seq[1]
        total += lp2(a * nv + b)
        for i in range(2, len(seq)):
            c = seq[i]
            k3 = (a * nv + b) * nv + c
            out = m3get(k3)
            if out is None:
                out = tget(k3)
                if out is None:
                    e = bget(a * nv + b)
                    bow = e[1] if e is not None else 0.0
                    out = bow + lp2(b * nv + c)
                memo3[k3] = out
            total += out
            a, b = b, c
        return 10.0 ** (-total / scored)

    def _perplexity_generic(self, text: str) -> float:
        """Tuple-keyed scoring loop for non-order-3 models (the shape
        perplexity() had before the r8 fast path; logprob() is the
        same recursive scorer either way)."""
        words = [
            w if (w,) in self.model[1] else UNK for w in text.split()
        ]
        seq = [BOS] + words + [EOS]
        total = 0.0
        scored = 0
        for i in range(1, len(seq)):
            lo = max(0, i - self.order + 1)
            total += self.logprob(tuple(seq[lo : i + 1]))
            scored += 1
        if scored == 0:
            return float("inf")
        return 10.0 ** (-total / scored)


BINARY_MAGIC = b"USARPA2\n"  # v2: JSON payload (v1 was pickle — removed)


def compile_binary(arpa_path: str, bin_path: str | None = None) -> str:
    """Pre-parse an .arpa file into a .binary artifact (our analog of
    KenLM's build_binary): loading skips text parsing entirely. The
    reference prefers `<lang>.binary` over `<lang>.arpa` when both
    exist (src/transformers/kenlm/lru.rs:86-91).

    Concurrency-safe: many Python UDF workers on one host can hit the
    missing-.binary case simultaneously, so each stages to a UNIQUE
    temp file (mkstemp) and publishes with an atomic os.replace —
    interleaved writers each publish a complete artifact and the last
    rename wins; no reader ever sees a torn file."""
    import json
    import tempfile

    bin_path = bin_path or arpa_path[: -len(".arpa")] + ".binary"
    model = ArpaModel.load_arpa(arpa_path).model
    payload = {
        str(n): [[" ".join(ng), lp, bow] for ng, (lp, bow) in sorted(entries.items())]
        for n, entries in model.items()
    }
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(bin_path) or ".", prefix=".arpa-bin-"
    )
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(BINARY_MAGIC)
            f.write(json.dumps(payload, separators=(",", ":")).encode("utf-8"))
        os.replace(tmp, bin_path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return bin_path


# everything a corrupt / stale-format / concurrently-written .binary
# can raise — fall back to the .arpa text, never fail the task
_BINARY_ERRORS = (OSError, ValueError, EOFError, KeyError, TypeError)


def load_model(lang: str, arpa_dir: str | None = None) -> "ArpaModel | None":
    """Load the model for a language, preferring `<lang>.binary` over
    `<lang>.arpa` (lru.rs:86-91). When only the .arpa exists, a
    .binary is compiled beside it for subsequent loads (best-effort —
    read-only model dirs just re-parse the text each time). A stale or
    corrupt .binary (old format, torn write) is recompiled from the
    .arpa instead of failing tasks persistently."""
    d = arpa_dir or ARPA_DIR
    bin_path = os.path.join(d, f"{lang}.binary")
    arpa_path = os.path.join(d, f"{lang}.arpa")
    if os.path.exists(bin_path):
        try:
            return ArpaModel.load_binary(bin_path)
        except _BINARY_ERRORS as exc:
            if not os.path.exists(arpa_path):
                # a .binary was DEPLOYED but is unreadable and there is
                # no .arpa to recompile from: returning None here would
                # silently disable the perplexity filter for this lang
                # (quality regression with no error signal) — fail the
                # task instead so the truncated artifact gets fixed
                raise ValueError(
                    f"corrupt ARPA binary {bin_path!r} with no "
                    f"companion .arpa to recompile from: {exc}"
                ) from exc
            # stale/corrupt artifact — recompile below
    if not os.path.exists(arpa_path):
        return None
    try:
        return ArpaModel.load_binary(compile_binary(arpa_path, bin_path))
    except _BINARY_ERRORS:
        return ArpaModel.load_arpa(arpa_path)


def model_path(lang: str) -> str:
    return os.path.join(ARPA_DIR, f"{lang}.arpa")
