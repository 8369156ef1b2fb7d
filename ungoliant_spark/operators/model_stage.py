"""Fused model stage: LID + TLSH + per-language perplexity in ONE
ArrowEvalPython node.

Why fused: every Python-UDF node materializes the full pass-through
row through a JVM row queue while batches round-trip to the worker.
On the clips table the pass-through includes the multi-KB..MB audio
``bytes`` column, so each extra Python node re-spools the entire
audio payload per stage (measured at sf0.1/local[32]: ~35 s per node
— a no-op UDF costs the same as a real one). Three chained nodes
(LID, TLSH, perplexity) plus the keep-filter's duplicated LID eval
made the pipeline 3-8× slower than its kernels. One fused node pays
the pass-through exactly once; the kernels themselves are the same
batched implementations (lid_model.predict_batch one-matmul,
tlsh_op.tlsh_hash_batch, arpa.ArpaModel) the standalone operators
use, so decisions are bit-identical — asserted by the F1 gates and
the clips_kept/clips_decisions driver oracles.

The returned UDF is marked ``asNondeterministic()``: it is in fact
deterministic, but the marking stops Catalyst from inlining the call
into downstream ``filter(keep)`` predicates (which would duplicate
the whole model stage into a second ArrowEvalPython node) and from
pushing filters through it. The single-node shape is asserted by
tests/test_plan_quality.py.

Reference stages covered: per-line fastText + doc vote
(src/identifiers/model.rs, pipeline.rs:237-311), LSH/TLSH annotator
(src/transformers/lsh.rs), KenLM AdultDetector
(src/transformers/kenlm/adult_content.rs) — citations in the
respective operator modules.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ungoliant_spark.arpa import ARPA_DIR
from ungoliant_spark.operators.lid import (
    LID_LINE_THRESHOLD,
    SENTENCE_LANG_T,
    _doc_from_preds,
    _get_model,
)
from ungoliant_spark.operators.perplexity import _get_model as _get_arpa
from ungoliant_spark.operators.tlsh_op import tlsh_hash_batch

MODEL_RESULT_T = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("lang_prob", T.FloatType()),
        T.StructField("sentence_langs", SENTENCE_LANG_T),
        T.StructField("multilingual", T.BooleanType()),
        T.StructField("tlsh", T.StringType()),
        T.StructField("harmful_pp", T.FloatType()),
    ]
)


def make_model_stage_udf(arpa_dir: str | None = None):
    """The UDF consumes ONE STRING per row (the trimmed lines joined
    with '\\n'; NULL for heuristic drops), not ``array<string>``:
    Arrow list<string> transport plus the per-element pandas
    materialization was the dominant non-kernel cost of the node
    (round-3 verdict item 1b) — a flat string column ships one buffer
    pair and splits back into lines with one C-level ``str.split``.
    Faithful because trimmed lines cannot contain '\\n' (they are the
    output of line-splitting the transcript) and a zero-line doc maps
    to NULL, which the model treats exactly like the empty line array
    (no predictions → lang None). Equality with the modular
    array-input path is gated by test_fused_matches_modular and the
    clips_kept/clips_decisions driver oracles."""
    arpa_dir = arpa_dir or ARPA_DIR

    @pandas_udf(MODEL_RESULT_T)
    def model_stage_udf(text_series: pd.Series) -> pd.DataFrame:
        model = _get_model()
        raw_docs: list[list[str]] = [
            s.split("\n") if s is not None else [] for s in text_series
        ]
        stripped: list[list[str]] = [
            [ln.replace("\x00", "") for ln in doc] if "\x00" in s else doc
            for s, doc in zip(
                ("" if s is None else s for s in text_series), raw_docs
            )
        ]
        flat = [ln for doc in stripped for ln in doc]
        flat_preds = model.predict_batch(flat, threshold=LID_LINE_THRESHOLD)
        langs, probs, slangs, multis = [], [], [], []
        pos = 0
        # content is the ORIGINAL (unstripped) joined body — the
        # reference hashes/scores the document as-is, \0 included; the
        # input string IS that join, so no re-join happens here
        contents: list[str | None] = []
        for s, doc in zip(text_series, stripped):
            preds = flat_preds[pos : pos + len(doc)]
            pos += len(doc)
            lang, prob, sl, multi = _doc_from_preds(doc, preds)
            langs.append(lang)
            probs.append(prob)
            slangs.append(
                [
                    None if x is None else {"label": x[0], "prob": x[1]}
                    for x in sl
                ]
            )
            multis.append(multi)
            contents.append(s if lang is not None else None)
        # TLSH + perplexity only for rows that survived the doc vote
        # (heuristic drops arrive with an empty lines array → lang None)
        tlsh = tlsh_hash_batch(
            [c.encode("utf-8") if c is not None else None for c in contents]
        )
        pps: list[float | None] = []
        for lang, content in zip(langs, contents):
            m = _get_arpa(lang, arpa_dir) if content is not None else None
            pps.append(
                float(m.perplexity(content.replace("\n", " ")))
                if m is not None
                else None
            )
        return pd.DataFrame(
            {
                "lang": langs,
                "lang_prob": pd.Series(probs, dtype="float32"),
                "sentence_langs": slangs,
                "multilingual": multis,
                "tlsh": tlsh,
                "harmful_pp": pd.Series(pps, dtype="float32"),
            }
        )

    return model_stage_udf.asNondeterministic()
