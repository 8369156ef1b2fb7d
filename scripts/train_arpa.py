"""Train tiny per-language ARPA LMs on the synthetic corpora and
write ungoliant_spark/resources/arpa/{lang}.arpa (committed)."""
import random
import sys

sys.path.insert(0, ".")
from ungoliant_spark.arpa import model_path, train_arpa, write_arpa
from ungoliant_spark.langdata import LANGS, sentence

if __name__ == "__main__":
    for lang in LANGS + ["multi"]:
        rng = random.Random(42)
        sents = []
        for _ in range(4000):
            lg = lang if lang != "multi" else rng.choice(LANGS)
            sents.append(sentence(rng, lg, rng.randint(3, 15)).split())
        m = train_arpa(sents)
        write_arpa(m, model_path(lang))
        print(lang, {n: len(d) for n, d in m.items()})
