"""Generate the frozen ground-truth files in tests/data/ from the
INDEPENDENT scalar implementations (tlsh_scalar / lid_scalar /
arpa_scalar) — never from engine code. Run offline:

    python tests/independent/generate_frozen.py

The committed JSON is the engine-independent ground truth the gate
tests in tests/test_independent_pins.py hold the engine kernels to
(round-2 verdict item 2: the fixture-label generator imports the
engine's own kernels, so driver-green model columns proved the
distributed plan, not the kernel math).
"""

from __future__ import annotations

import json
import os
import random
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
DATA = os.path.join(REPO, "tests", "data")
sys.path.insert(0, HERE)

from arpa_scalar import perplexity_scalar  # noqa: E402
from lid_scalar import predict_scalar  # noqa: E402
from tlsh_scalar import tlsh_scalar  # noqa: E402

NPZ = os.path.join(REPO, "ungoliant_spark", "resources", "lid_model.npz")
ARPA_DIR = os.path.join(REPO, "ungoliant_spark", "resources", "arpa")

# one full sentence per language built from the synthetic inventories
# (langdata.py vocab — input SELECTION only; predictions come from the
# scalar implementation), plus mixed/gibberish/empty-ish edge cases
LID_LINES = [
    "the people of this world were there because they could",
    "le français est une langue que nous avons déjà aujourd'hui",
    "der größer werden die Jahre zwischen der Straße natürlich",
    "el corazón español está entre los años de la información",
    "la città italiana è già stato perché questo governo così",
    "a população portuguesa não é uma nação sem tradução então",
    "het nederlands is natuurlijk mogelijk tijdens het schrijven",
    "suomalainen kaupunki on kuitenkin vielä tässä vuonna sitten",
    "xqzt vprw mklj htgb dfns",  # gibberish -> junk class / None
    "the le der el",  # mixed -> likely below threshold
    "a",  # single short token
]

ARPA_TEXTS = [
    "the fast key order sort table scan",
    "group query join filter window",
    "completely novel words outside vocabulary here",
    "the the the the",
    "",
    "sort",
]


def main() -> None:
    os.makedirs(DATA, exist_ok=True)

    rng = random.Random(20260816)
    tlsh_inputs = [
        bytes(rng.randrange(256) for _ in range(n))
        for n in (49, 50, 64, 100, 300, 656, 657, 1000, 3199, 3200, 5000)
    ]
    tlsh_inputs += [
        ("the quick brown fox jumps over the lazy dog " * 5).encode(),
        b"a" * 200,  # low variance -> None
        "héllo wörld ünïcode ťęxt — multilingual! ".encode() * 4,
    ]
    tlsh_out = [
        {"input_hex": d.hex(), "tlsh": tlsh_scalar(d)} for d in tlsh_inputs
    ]
    with open(os.path.join(DATA, "frozen_tlsh_vectors.json"), "w") as f:
        json.dump(tlsh_out, f, indent=1)

    lid_out = []
    for line in LID_LINES:
        pred = predict_scalar(NPZ, line)
        lid_out.append(
            {
                "line": line,
                "label": None if pred is None else pred[0],
                "prob": None if pred is None else round(pred[1], 6),
            }
        )
    with open(os.path.join(DATA, "frozen_lid_predictions.json"), "w") as f:
        json.dump(lid_out, f, indent=1, ensure_ascii=False)

    arpa_out = []
    for lang in ("en", "fr", "multi"):
        path = os.path.join(ARPA_DIR, f"{lang}.arpa")
        for text in ARPA_TEXTS:
            pp = perplexity_scalar(path, text)
            arpa_out.append(
                {
                    "lang": lang,
                    "text": text,
                    "perplexity": None if pp == float("inf") else pp,
                }
            )
    with open(os.path.join(DATA, "frozen_arpa_perplexities.json"), "w") as f:
        json.dump(arpa_out, f, indent=1)
    print("wrote frozen vectors to", DATA)


if __name__ == "__main__":
    main()
