"""fastText-style language-ID model: hashed char-ngram linear model
in pure numpy.

Same math as fastText supervised inference (the model class behind
lid.176.bin used by the reference, /root/reference/src/identifiers/
model.rs:64-89): token + char-ngram features → FNV-1a hash buckets →
mean of embedding rows → linear layer → softmax. No fasttext wheel
exists in this sandbox, so the engine ships its own deterministic
fixture model (trained offline on the synthetic corpora in
langdata.py by scripts/train_lid.py); a production deployment would
load the real lid.176.bin weights into the same (E, W, b) arrays.

Everything is vectorizable per Arrow batch: featurization is a
python loop per line (cheap, short lines), the matmul work is numpy.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

# fastText FNV-1a 32-bit (src/dictionary.cc hash())
_FNV_PRIME = np.uint32(16777619)
_FNV_BASIS = np.uint32(2166136261)

MINN, MAXN = 2, 4
DEFAULT_MODEL_PATH = os.path.join(
    os.path.dirname(__file__), "resources", "lid_model.npz"
)


def fnv1a(data: bytes) -> int:
    h = int(_FNV_BASIS)
    for byte in data:
        h ^= byte
        h = (h * int(_FNV_PRIME)) & 0xFFFFFFFF
    return h


def line_features(line: str, buckets: int) -> list[int]:
    """Feature ids for one line: per token '<tok>' char ngrams
    (n=MINN..MAXN) plus the token itself, FNV-hashed into buckets."""
    ids: list[int] = []
    for tok in line.split():
        w = f"<{tok}>"
        ids.append(fnv1a(tok.encode("utf-8")) % buckets)
        for n in range(MINN, MAXN + 1):
            for i in range(len(w) - n + 1):
                ids.append(fnv1a(w[i : i + n].encode("utf-8")) % buckets)
    return ids


@dataclass
class LidModel:
    E: np.ndarray  # (buckets, dim) float32 input embeddings
    W: np.ndarray  # (dim, n_classes) float32 output layer
    b: np.ndarray  # (n_classes,) float32
    labels: list[str]  # fastText-style '__label__xxx'
    junk: set[str]  # labels treated as unidentified (e.g. __label__zz)

    @property
    def buckets(self) -> int:
        return self.E.shape[0]

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez_compressed(
            path,
            E=self.E,
            W=self.W,
            b=self.b,
            labels=np.array(self.labels),
            junk=np.array(sorted(self.junk)),
        )

    @classmethod
    def load(cls, path: str = DEFAULT_MODEL_PATH) -> "LidModel":
        z = np.load(path, allow_pickle=False)
        return cls(
            E=z["E"].astype(np.float32),
            W=z["W"].astype(np.float32),
            b=z["b"].astype(np.float32),
            labels=[str(x) for x in z["labels"]],
            junk={str(x) for x in z["junk"]},
        )

    def _token_vec(self, tok: str) -> tuple[np.ndarray, int]:
        """(sum of feature embeddings, feature count) for one token,
        memoized — natural-language token distributions are Zipfian,
        so the cache hit rate dominates at corpus scale."""
        cache = self.__dict__.setdefault("_tok_cache", {})
        hit = cache.get(tok)
        if hit is not None:
            return hit
        if "ft_words" in self.__dict__:
            # real fastText .bin: dictionary word ids + offset subword
            # buckets with fastText's signed-char hash
            from ungoliant_spark.fasttext_bin import ft_subword_ids

            ids = ft_subword_ids(
                tok,
                self.__dict__["ft_words"],
                self.__dict__["ft_word_offset"],
                self.__dict__["ft_bucket"],
                self.__dict__["ft_minn"],
                self.__dict__["ft_maxn"],
            )
            if not ids:
                out = (np.zeros(self.E.shape[1], dtype=np.float64), 0)
                cache[tok] = out
                return out
        else:
            w = f"<{tok}>"
            ids = [fnv1a(tok.encode("utf-8")) % self.buckets]
            for n in range(MINN, MAXN + 1):
                for i in range(len(w) - n + 1):
                    ids.append(fnv1a(w[i : i + n].encode("utf-8")) % self.buckets)
        vec = self.E[np.array(ids, dtype=np.int64)].sum(
            axis=0, dtype=np.float64
        )
        out = (vec, len(ids))
        if len(cache) < 2_000_000:
            cache[tok] = out
        return out

    def _token_vecs_bulk(
        self, tokens: list[str]
    ) -> tuple[np.ndarray, np.ndarray]:
        """(V, C): per-token feature-embedding sums and feature counts
        for a list of UNIQUE tokens — the batched twin of _token_vec.

        Cache misses are hashed vectorized: all missed tokens' feature
        strings (token + '<tok>' char-ngrams, in _token_vec's order)
        go into one padded byte matrix and FNV-1a runs as ~width numpy
        steps over every feature at once. The per-token embedding sum
        then uses THE SAME ``E[ids].sum(axis=0, dtype=float64)`` call
        on the same ids _token_vec would produce, so values are
        BIT-IDENTICAL to the scalar path (same op, same inputs — no
        reliance on summation-order equivalence; np.sum is pairwise,
        not sequential). Features longer than 64 UTF-8 bytes
        (pathological tokens) and the real-fastText path fall back to
        _token_vec."""
        dim = self.E.shape[1]
        V = np.empty((len(tokens), dim), dtype=np.float64)
        C = np.empty(len(tokens), dtype=np.int64)
        cache = self.__dict__.setdefault("_tok_cache", {})
        missing: list[int] = []
        for i, tok in enumerate(tokens):
            hit = cache.get(tok)
            if hit is None:
                missing.append(i)
            else:
                V[i], C[i] = hit
        if not missing:
            return V, C
        if "ft_words" in self.__dict__:
            for i in missing:
                V[i], C[i] = self._token_vec(tokens[i])
            return V, C
        prime = np.uint64(int(_FNV_PRIME))
        mask = np.uint64(0xFFFFFFFF)
        # three lanes (r8): ASCII tokens get fully-vectorized ngram
        # hashing (no per-ngram byte objects at all — the slicing loop
        # was ~45% of this function); non-ASCII tokens keep the
        # per-ngram-encode path (char ngrams span multi-byte UTF-8, so
        # the fixed-offset column scan below does not apply); >62-byte
        # tokens take the scalar fallback
        asc: list[int] = []
        feats: list[bytes] = []
        spans_na: list[tuple[int, int, int]] = []  # (tok idx, start, end)
        slow: list[int] = []
        ap = feats.append
        for i in missing:
            tok = tokens[i]
            w = f"<{tok}>"
            if w.isascii():
                if len(tok) > 62:  # only the token itself can exceed
                    slow.append(i)  # the cap: char-ngrams are ≤ 4 chars
                else:
                    asc.append(i)
                continue
            tok_b = tok.encode("utf-8")
            if len(tok_b) > 62:
                slow.append(i)
                continue
            s = len(feats)
            ap(tok_b)
            for n in range(MINN, MAXN + 1):
                for j in range(len(w) - n + 1):
                    ap(w[j : j + n].encode("utf-8"))
            spans_na.append((i, s, len(feats)))
        for i in slow:
            V[i], C[i] = self._token_vec(tokens[i])

        id_blocks: list[np.ndarray] = []
        owners: list[tuple[int, int, int]] = []  # (tok idx, start, end)
        base0 = 0
        wbs_all = [
            (i, b"<" + tokens[i].encode("utf-8") + b">") for i in asc
        ]
        # width-bucketed column scan (r8): tokens are padded to their
        # BUCKET's max length, not the global 64-byte cap — the scan
        # is O(rows × width) per pass, and one 60-byte token would
        # otherwise make every 6-byte token pay 64 lanes (~85% waste
        # at the observed token-length distribution)
        for _lo, _hi in ((0, 8), (8, 16), (16, 32), (32, 64)):
            grp = [(i, wb) for i, wb in wbs_all if _lo < len(wb) <= _hi]
            if not grp:
                continue
            asc_g = [i for i, _ in grp]
            # padded byte matrix of the '<tok>' forms: ONE concat +
            # vectorized scatter (same machinery as the feature matrix
            # below, but over ~15× fewer rows — one per token)
            wbs = [wb for _, wb in grp]
            lens = np.fromiter(
                (len(b) for b in wbs), dtype=np.int64, count=len(wbs)
            )
            width = int(lens.max())
            flat = np.frombuffer(b"".join(wbs), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            within = np.arange(len(flat), dtype=np.int64) - np.repeat(
                starts, lens
            )
            rowbase = np.repeat(
                np.arange(len(wbs), dtype=np.int64) * width, lens
            )
            mat = np.zeros(len(wbs) * width, dtype=np.uint8)
            mat[rowbase + within] = flat
            mat = mat.reshape(len(wbs), width)
            # incremental FNV-1a column scan: after d+1 XOR-multiply
            # steps, H[t, j] holds the hash of bytes j..j+d — i.e. ALL
            # n-grams of every token hash in MAXN vector passes. For
            # ASCII, char slicing == byte slicing, so these are exactly
            # the fnv1a(w[j:j+n]) values of the scalar path. Positions
            # with j+n > len are garbage (padding mixed in) and are
            # simply never gathered.
            H = np.full((len(wbs), width), int(_FNV_BASIS), dtype=np.uint64)
            grams: dict[int, np.ndarray] = {}
            for d in range(MAXN):
                if width - d <= 0:
                    grams[d + 1] = np.empty((len(wbs), 0), dtype=np.uint64)
                    continue
                sub = H[:, : width - d]
                sub ^= mat[:, d:]
                sub *= prime
                sub &= mask
                if MINN <= d + 1:
                    grams[d + 1] = H[:, : width - d].copy()
            # token-only hash (no angle brackets): FNV over byte
            # columns 1..len-2, length-DESC-sorted so each step works a
            # contiguous prefix slice
            tok_lens = lens - 2
            order = np.argsort(-tok_lens, kind="stable")
            mat_s = mat[order]
            tl_s = tok_lens[order]
            ht = np.full(len(wbs), int(_FNV_BASIS), dtype=np.uint64)
            for pos in range(int(tl_s[0]) if len(tl_s) else 0):
                k = int(np.searchsorted(-tl_s, -(pos + 1), side="right"))
                if k == 0:
                    break
                hk = ht[:k]
                hk ^= mat_s[:k, 1 + pos]
                hk *= prime
                hk &= mask
            tok_hash = np.empty_like(ht)
            tok_hash[order] = ht
            # assemble the flat id array in the scalar path's exact
            # order per token: [tok, n=2 j asc, n=3 j asc, n=4 j asc]
            cnts = {
                n: np.maximum(lens - n + 1, 0) for n in range(MINN, MAXN + 1)
            }
            tot = np.ones(len(wbs), dtype=np.int64)
            for n in range(MINN, MAXN + 1):
                tot += cnts[n]
            off = np.concatenate(([0], np.cumsum(tot)))
            ids_a = np.empty(int(off[-1]), dtype=np.uint64)
            ids_a[off[:-1]] = tok_hash
            base = off[:-1] + 1
            for n in range(MINN, MAXN + 1):
                c = cnts[n]
                nz = int(c.sum())
                if nz:
                    wg = np.arange(nz, dtype=np.int64) - np.repeat(
                        np.concatenate(([0], np.cumsum(c)))[:-1], c
                    )
                    dst = np.repeat(base, c) + wg
                    stride = grams[n].shape[1]
                    src = (
                        np.repeat(
                            np.arange(len(wbs), dtype=np.int64) * stride, c
                        )
                        + wg
                    )
                    ids_a[dst] = grams[n].ravel()[src]
                base = base + c
            id_blocks.append(
                (ids_a % np.uint64(self.buckets)).astype(np.int64)
            )
            for t, i in enumerate(asc_g):
                owners.append((i, base0 + int(off[t]), base0 + int(off[t + 1])))
            base0 += int(off[-1])
        if feats:
            lens = np.fromiter(
                (len(b) for b in feats), dtype=np.int64, count=len(feats)
            )
            width = int(lens.max())
            # padded byte matrix over the per-ngram features (concat +
            # scatter), FNV over length-DESC-sorted rows: at byte
            # position p only the first k_p rows are still active, so
            # each step works a contiguous prefix slice
            flat = np.frombuffer(b"".join(feats), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            within = np.arange(len(flat), dtype=np.int64) - np.repeat(
                starts, lens
            )
            rowbase = np.repeat(
                np.arange(len(feats), dtype=np.int64) * width, lens
            )
            mat = np.zeros(len(feats) * width, dtype=np.uint8)
            mat[rowbase + within] = flat
            mat = mat.reshape(len(feats), width)
            order = np.argsort(-lens, kind="stable")
            mat_s = mat[order]
            lens_s = lens[order]
            h = np.full(len(feats), int(_FNV_BASIS), dtype=np.uint64)
            for pos in range(width):
                k = int(np.searchsorted(-lens_s, -(pos + 1), side="right"))
                if k == 0:
                    break
                hk = h[:k]
                hk ^= mat_s[:k, pos]
                hk *= prime
                hk &= mask
            ids_s = (h % np.uint64(self.buckets)).astype(np.int64)
            ids = np.empty_like(ids_s)
            ids[order] = ids_s
            id_blocks.append(ids)
            for i, s, e in spans_na:
                owners.append((i, base0 + s, base0 + e))
            base0 += len(ids)
        if owners:
            # ONE embedding gather + segment-sum for every freshly
            # hashed token (r8): np.add.reduceat over contiguous spans
            # accumulates each segment row-sequentially in float64 —
            # verified bit-identical to the per-token
            # E[ids].sum(axis=0, dtype=float64) calls it replaces
            # (axis-0 2-D reduction is also row-sequential; 20k random
            # segments incl. >128-row ones: zero mismatches). The
            # gather reads a once-cast float64 copy of E: f32→f64 is
            # exact, and reduceat with a dtype= override falls into
            # numpy's buffered-casting path (measured 5× slower)
            all_ids = (
                id_blocks[0]
                if len(id_blocks) == 1
                else np.concatenate(id_blocks)
            )
            seg_starts = np.fromiter(
                (s for _, s, _ in owners), dtype=np.int64, count=len(owners)
            )
            E64 = self.__dict__.get("_E64")
            if E64 is None:
                E64 = self.E.astype(np.float64)
                self.__dict__["_E64"] = E64
            sums = np.add.reduceat(E64[all_ids], seg_starts, axis=0)
            for t, (i, s, e) in enumerate(owners):
                vec = sums[t]
                V[i] = vec
                C[i] = e - s
                if len(cache) < 2_000_000:
                    cache[tokens[i]] = (vec, e - s)
        return V, C

    def hidden(self, line: str) -> np.ndarray | None:
        toks = line.split()
        if not toks:
            return None
        total = None
        count = 0
        for tok in toks:
            vec, n = self._token_vec(tok)
            total = vec.copy() if total is None else total + vec
            count += n
        if count == 0:
            return None
        return (total / count).astype(np.float32)

    def predict_probs(self, line: str) -> np.ndarray | None:
        h = self.hidden(line)
        if h is None:
            return None
        logits = h.astype(np.float64) @ self.W.astype(np.float64) + self.b
        logits -= logits.max()
        p = np.exp(logits)
        return (p / p.sum()).astype(np.float32)

    def predict_batch(
        self, lines: list[str], threshold: float = 0.8
    ) -> list[tuple[str, float] | None]:
        """Vectorized k=1 prediction for a batch of lines: hidden
        vectors are assembled per line (token-sum cache), then ONE
        (n×dim)·(dim×classes) float64 matmul + row softmax scores the
        whole batch — the per-row-Python-free hot path used by the
        Spark UDF. Semantics identical to FastText::predict_one
        (model.rs:64-89): below-threshold or junk-class argmax → None.
        """
        out: list[tuple[str, float] | None] = [None] * len(lines)
        # hidden-vector assembly vectorized over the whole batch: the
        # per-token Python work was 55% of the fused model stage. One
        # _token_vecs_bulk call covers the unique tokens (bit-identical
        # to _token_vec — see its docstring), then one scatter-add
        # forms the per-line sums. np.add.at applies additions in
        # index order, so each line's float64 accumulation order is
        # exactly the sequential loop's (and 0.0 + x == x), making the
        # float32 hidden — and every downstream decision — unchanged
        # (gated by an exhaustive equality test). Dedup is a plain
        # dict: pandas' factorize hashes object strings as C strings,
        # silently collapsing tokens that differ only past a NUL byte.
        tokd = [line.split() for line in lines]
        all_toks = [t for toks in tokd for t in toks]
        if not all_toks:
            return out
        index: dict[str, int] = {}
        uniques: list[str] = []
        codes = np.empty(len(all_toks), dtype=np.int64)
        for k, tok in enumerate(all_toks):
            j = index.get(tok)
            if j is None:
                j = len(uniques)
                index[tok] = j
                uniques.append(tok)
            codes[k] = j
        V, C = self._token_vecs_bulk(uniques)
        row_arr = np.repeat(
            np.arange(len(lines)), [len(t) for t in tokd]
        )
        dim = V.shape[1]
        total = np.zeros((len(lines), dim), dtype=np.float64)
        np.add.at(total, row_arr, V[codes])
        nfeat = np.zeros(len(lines), dtype=np.int64)
        np.add.at(nfeat, row_arr, C[codes])
        valid = nfeat > 0
        idx = np.nonzero(valid)[0].tolist()
        if not idx:
            return out
        hidden32 = (
            total[valid] / nfeat[valid, None]
        ).astype(np.float32)
        H = hidden32.astype(np.float64)
        logits = H @ self.W.astype(np.float64) + self.b
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        best = p.argmax(axis=1)
        probs = p[np.arange(len(best)), best].astype(np.float32)
        for row, i in enumerate(idx):
            label = self.labels[int(best[row])]
            prob = float(probs[row])
            if label in self.junk or prob < threshold:
                continue
            out[i] = (label, prob)
        return out

    def predict_one(
        self, line: str, threshold: float = 0.8
    ) -> tuple[str, float] | None:
        """Single-line convenience wrapper over predict_batch."""
        return self.predict_batch([line], threshold)[0]


def train(
    seed: int = 42,
    buckets: int = 1 << 16,
    dim: int = 16,
    n_per_class: int = 3000,
    epochs: int = 4,
    lr: float = 0.35,
) -> LidModel:
    """Deterministic softmax-regression training (numpy SGD) on the
    synthetic corpora — run once offline by scripts/train_lid.py; the
    resulting npz is committed so labels are stable."""
    import random as _random

    from ungoliant_spark.langdata import GIBBERISH_LABEL, LANGS, sentence

    iso3 = {
        "en": "eng", "fr": "fra", "de": "deu", "es": "spa",
        "it": "ita", "pt": "por", "nl": "nld", "fi": "fin",
        GIBBERISH_LABEL: "zz",
    }
    classes = LANGS + [GIBBERISH_LABEL]
    labels = [f"__label__{iso3[c]}" for c in classes]
    rng = _random.Random(seed)
    samples: list[tuple[list[int], int]] = []
    for ci, lang in enumerate(classes):
        for _ in range(n_per_class):
            n_words = rng.randint(2, 18)
            ids = line_features(sentence(rng, lang, n_words), buckets)
            if ids:
                samples.append((ids, ci))
    order = np.random.RandomState(seed)
    E = (order.rand(buckets, dim).astype(np.float32) - 0.5) / dim
    W = np.zeros((dim, len(classes)), dtype=np.float32)
    b = np.zeros(len(classes), dtype=np.float32)
    idx = np.arange(len(samples))
    for ep in range(epochs):
        order.shuffle(idx)
        cur_lr = lr * (1 - ep / epochs)
        for j in idx:
            ids, ci = samples[j]
            a = np.array(ids, dtype=np.int64)
            h = E[a].mean(axis=0, dtype=np.float32)
            logits = h @ W + b
            logits -= logits.max()
            p = np.exp(logits)
            p /= p.sum()
            p[ci] -= 1.0
            gh = W @ p
            W -= cur_lr * np.outer(h, p)
            b -= cur_lr * p
            E[a] -= cur_lr * gh / len(ids)
    return LidModel(
        E=E, W=W, b=b, labels=labels, junk={f"__label__{iso3[GIBBERISH_LABEL]}"}
    )
