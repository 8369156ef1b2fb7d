"""Frozen rule constants, each cited to the reference implementation.

All citations are file:line into /root/reference (oscar-project/ungoliant).
"""

# Sentence-length filter: keep iff chars().count() > LENGTH_MIN_CODEPOINTS
# (strict >; src/filtering/sentence.rs:27-37)
LENGTH_MIN_CODEPOINTS = 100

# PFilter: per-line codepoint counts bucketed; count >= min goes to the
# upper bucket (note >=, unlike Length's >; src/filtering/record.rs:59-69).
# Keep iff upper >= threshold * (upper + lower)
# (src/filtering/record.rs:72-84; defaults record.rs:88-97).
PFILTER_THRESHOLD = 0.6
PFILTER_MIN_CODEPOINTS = 100

# TinyDocument: < 5 lines => "tiny" (src/transformers/tiny.rs:5-20)
TINY_MIN_LINES = 5

# ShortSentences: short-line count > (0.5 * nb_lines as f32) as usize
# => "short_sentences" (src/transformers/sentence_filter.rs:17-56)
SHORT_SENTENCES_THRESHOLD = 0.5

# Header/Footer: window = floor(0.2*nb_lines) lines; short line = BYTE
# length < 100 (src/transformers/header.rs:81 uses line.len());
# annotate if short count > floor(floor(0.2*n)*0.5)
# (src/transformers/header.rs:12-88)
HEADER_PCTG = 0.2
HEADER_THRESHOLD_PCTG = 0.5
HEADER_MIN_BYTES = 100

# Noisy: non-letter (Unicode GeneralCategory Letter|Mark) char count
# > floor(0.5 * nb_chars) => "noisy" (src/transformers/noisy.rs:10-53)
NOISY_THRESHOLD = 0.5

# fastText LID: k=1, per-line prob threshold 0.8
# (src/identifiers/model.rs:251-259; pipeline.rs:429-433)
LID_LINE_THRESHOLD = 0.8

# Document-level language confidence threshold
# (DOC_THRESHOLD, src/pipelines/oscardoc/pipeline.rs:52,284-286)
DOC_THRESHOLD = 0.6

# StrictMultilingual defaults (src/identifiers/multilingual.rs:188-197)
MULTI_MIN_SENTENCES = 10
MULTI_CONFIDENCE = 0.8
MULTI_MIN_CONFIDENT_PCTG = 0.8
MULTI_MAX_LANGS = 5
# doc identification assigned to multilingual docs (pipeline.rs:261-270)
MULTI_LABEL = "multi"
MULTI_PROB = 0.5

# Drop a doc whose annotation *set* == {noisy, tiny}
# (documented intent of pipeline.rs:219-226; see SURVEY.md §2.2 quirk)
NOISY_TINY_DROP = frozenset({"noisy", "tiny"})

# PII scrub placeholders (spec'd in this repo; the reference version has
# no PII module — OSCAR 22.01 paper §3 describes the annotation pass).
PII_EMAIL_TOKEN = "<EMAIL>"
PII_IP_TOKEN = "<IP>"
PII_PHONE_TOKEN = "<PHONE>"
