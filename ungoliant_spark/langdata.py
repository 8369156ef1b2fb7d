"""Deterministic synthetic language corpora (seed-driven, no external
data) used by (a) the clips fixture generator and (b) the LID model
trainer. Eight real languages + gibberish for the below-threshold bin.

Word inventories are hand-written common-word lists with
language-distinctive character patterns (diacritics, digraphs) so a
char-ngram model separates them cleanly — the same signal class
fastText lid.176.bin exploits.
"""

from __future__ import annotations

import random

WORDS: dict[str, list[str]] = {
    "en": (
        "the of and to in is was for that with he as his on at by are this "
        "from they she which were been have their has would there what about "
        "when will can said who them some could into time than only its over "
        "also people because through where after years most these things world"
    ).split(),
    "fr": (
        "le la les de des du et à un une est était pour que qui dans sur avec "
        "il elle ils elles nous vous être avoir fait comme plus sans sous "
        "même aussi après années où leur cette ces tout tous mais par deux "
        "très français était être été çà déjà peut-être aujourd'hui général"
    ).split(),
    "de": (
        "der die das und zu in ist war für daß mit er sie sich auf nicht "
        "ein eine als auch es an werden aus wird sind noch wie einer nach "
        "über so zum können schön größer während müssen Jahre zwischen "
        "deutsch Straße weiß natürlich übrigens tatsächlich möglich häufig"
    ).split(),
    "es": (
        "el la los las de del y a en es era para que qué con él ella por un "
        "una su no se lo le más pero sus años entre está cuando muy sin "
        "también cómo años así español sobre ser tiene hasta desde nación "
        "según corazón mañana señor niño pequeño después acción información"
    ).split(),
    "it": (
        "il lo la i gli le di del e a in è era per che con lui lei da un una "
        "suo non si più ma sono anni tra quando molto senza anche come così "
        "italiano sopra essere stato già perché città però ancora quello "
        "questo dopo azione informazione famiglia governo esempio possibilità"
    ).split(),
    "pt": (
        "o a os as de do da e em é era para que com ele ela por um uma seu "
        "não se mais mas são anos entre está quando muito sem também como "
        "português sobre ser já foi anos depois ação informação coração "
        "não ção lição nação então opinião situação população tradução"
    ).split(),
    "nl": (
        "de het een en van in is was voor dat met hij zij zich op niet als "
        "ook het aan worden uit wordt zijn nog zoals naar over zo om kunnen "
        "mooi groter tijdens moeten jaren tussen nederlands natuurlijk "
        "eigenlijk mogelijk vaak ijsvrij zijn wij jij kijken rijden schrijven"
    ).split(),
    "fi": (
        "ja on ei se että oli hän mutta ovat kun niin myös jos vain joka "
        "mitä tämä ole siitä kaikki kuin vuonna sekä jälkeen kanssa ilman "
        "suomalainen yli olla ollut jo koska kaupunki kuitenkin vielä tuo "
        "tässä sitten toiminta tieto sydän huomenna herra lapsi pieni käyttää"
    ).split(),
}

LANGS = sorted(WORDS.keys())
GIBBERISH_LABEL = "zz"  # trained "junk" class; predictions on it stay
#                          below the 0.8 line threshold for real langs

_CONSONANTS = "bcdfghjklmnpqrstvwxz"
_VOWELS = "aeiouy"


def gibberish_word(rng: random.Random) -> str:
    n = rng.randint(3, 11)
    return "".join(
        rng.choice(_CONSONANTS if rng.random() < 0.8 else _VOWELS)
        for _ in range(n)
    )


def sentence(rng: random.Random, lang: str, n_words: int) -> str:
    if lang == GIBBERISH_LABEL:
        return " ".join(gibberish_word(rng) for _ in range(n_words))
    words = WORDS[lang]
    return " ".join(rng.choice(words) for _ in range(n_words))


def sentence_of_min_chars(rng: random.Random, lang: str, min_chars: int) -> str:
    """A sentence with at least ``min_chars`` codepoints (for the
    >100-codepoint keep rules)."""
    out = sentence(rng, lang, max(3, min_chars // 6))
    while len(out) < min_chars:
        out += " " + sentence(rng, lang, 4)
    return out
