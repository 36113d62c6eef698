"""Quantify the rule-based letter-to-sound G2P against CMUdict ground truth.

The reference phonemizes OOV words with the g2p_en neural model
(reference tokenizer/g2p.py:112); this repo replaces it with NRL-style
letter-to-sound rules (speechain_tpu/utils/letter_to_sound.py). This tool
measures the disagreement: phoneme error rate (PER = phone-level edit
distance / reference length) of the rules against dictionary
pronunciations, i.e. the error a TTS phoneme recipe inherits on words
missing from its lexicon.

Usage:
    python tools/g2p_eval.py                    # embedded CMU probe set
    python tools/g2p_eval.py --lexicon FILE     # full CMUdict-format file
                                                # (word PH ON EMES per line)

Prints one JSON line: {"n_words", "per", "per_stressed", "worst": [...]}.
``per`` compares stress-stripped phones (the tokenizer's own fallback
accepts stress-stripped matches, data/tokenizer.py:224-227);
``per_stressed`` keeps stress digits (the rules place primary stress on
the first vowel, a deterministic stand-in — expect this to be higher).

The embedded probe set is 150 CMUdict entries spanning regular and
irregular orthography; every word is evaluated OOV (the rules have no
lexicon of their own). Measured result is recorded in docs/PARITY.md.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from speechain_tpu.utils.letter_to_sound import letter_to_sound  # noqa: E402
from speechain_tpu.utils.metrics import edit_distance  # noqa: E402

# CMUdict (v0.7b, public domain) pronunciations; first variant per word.
PROBE_LEXICON = {
    "about": "AH0 B AW1 T",
    "absolute": "AE1 B S AH0 L UW2 T",
    "action": "AE1 K SH AH0 N",
    "afternoon": "AE2 F T ER0 N UW1 N",
    "against": "AH0 G EH1 N S T",
    "almost": "AO1 L M OW2 S T",
    "although": "AO2 L DH OW1",
    "always": "AO1 L W EY2 Z",
    "amount": "AH0 M AW1 N T",
    "animal": "AE1 N AH0 M AH0 L",
    "another": "AH0 N AH1 DH ER0",
    "answer": "AE1 N S ER0",
    "around": "ER0 AW1 N D",
    "attention": "AH0 T EH1 N SH AH0 N",
    "balance": "B AE1 L AH0 N S",
    "basket": "B AE1 S K AH0 T",
    "because": "B IH0 K AO1 Z",
    "become": "B IH0 K AH1 M",
    "before": "B IH0 F AO1 R",
    "believe": "B IH0 L IY1 V",
    "better": "B EH1 T ER0",
    "between": "B IH0 T W IY1 N",
    "birthday": "B ER1 TH D EY2",
    "blanket": "B L AE1 NG K AH0 T",
    "bottle": "B AA1 T AH0 L",
    "bright": "B R AY1 T",
    "brother": "B R AH1 DH ER0",
    "building": "B IH1 L D IH0 NG",
    "butter": "B AH1 T ER0",
    "camera": "K AE1 M ER0 AH0",
    "candle": "K AE1 N D AH0 L",
    "carry": "K AE1 R IY0",
    "center": "S EH1 N T ER0",
    "certain": "S ER1 T AH0 N",
    "chance": "CH AE1 N S",
    "change": "CH EY1 N JH",
    "chicken": "CH IH1 K AH0 N",
    "children": "CH IH1 L D R AH0 N",
    "choose": "CH UW1 Z",
    "church": "CH ER1 CH",
    "circle": "S ER1 K AH0 L",
    "cloud": "K L AW1 D",
    "coffee": "K AA1 F IY0",
    "cold": "K OW1 L D",
    "collect": "K AH0 L EH1 K T",
    "corner": "K AO1 R N ER0",
    "country": "K AH1 N T R IY0",
    "danger": "D EY1 N JH ER0",
    "daughter": "D AO1 T ER0",
    "deep": "D IY1 P",
    "dinner": "D IH1 N ER0",
    "doctor": "D AA1 K T ER0",
    "double": "D AH1 B AH0 L",
    "dream": "D R IY1 M",
    "early": "ER1 L IY0",
    "earth": "ER1 TH",
    "elephant": "EH1 L AH0 F AH0 N T",
    "enough": "IH0 N AH1 F",
    "evening": "IY1 V N IH0 NG",
    "every": "EH1 V ER0 IY0",
    "explain": "IH0 K S P L EY1 N",
    "family": "F AE1 M AH0 L IY0",
    "father": "F AA1 DH ER0",
    "feather": "F EH1 DH ER0",
    "finger": "F IH1 NG G ER0",
    "flower": "F L AW1 ER0",
    "follow": "F AA1 L OW0",
    "foreign": "F AO1 R AH0 N",
    "forest": "F AO1 R AH0 S T",
    "forget": "F ER0 G EH1 T",
    "freedom": "F R IY1 D AH0 M",
    "friend": "F R EH1 N D",
    "garden": "G AA1 R D AH0 N",
    "gentle": "JH EH1 N T AH0 L",
    "glass": "G L AE1 S",
    "gold": "G OW1 L D",
    "grass": "G R AE1 S",
    "ground": "G R AW1 N D",
    "handle": "HH AE1 N D AH0 L",
    "happen": "HH AE1 P AH0 N",
    "health": "HH EH1 L TH",
    "heavy": "HH EH1 V IY0",
    "history": "HH IH1 S T ER0 IY0",
    "hollow": "HH AA1 L OW0",
    "hundred": "HH AH1 N D R AH0 D",
    "hungry": "HH AH1 NG G R IY0",
    "island": "AY1 L AH0 N D",
    "jacket": "JH AE1 K AH0 T",
    "kitchen": "K IH1 CH AH0 N",
    "ladder": "L AE1 D ER0",
    "language": "L AE1 NG G W AH0 JH",
    "laughter": "L AE1 F T ER0",
    "letter": "L EH1 T ER0",
    "little": "L IH1 T AH0 L",
    "machine": "M AH0 SH IY1 N",
    "market": "M AA1 R K AH0 T",
    "matter": "M AE1 T ER0",
    "middle": "M IH1 D AH0 L",
    "minute": "M IH1 N AH0 T",
    "moment": "M OW1 M AH0 N T",
    "morning": "M AO1 R N IH0 NG",
    "mother": "M AH1 DH ER0",
    "mountain": "M AW1 N T AH0 N",
    "music": "M Y UW1 Z IH0 K",
    "nation": "N EY1 SH AH0 N",
    "nature": "N EY1 CH ER0",
    "needle": "N IY1 D AH0 L",
    "night": "N AY1 T",
    "nothing": "N AH1 TH IH0 NG",
    "number": "N AH1 M B ER0",
    "ocean": "OW1 SH AH0 N",
    "office": "AO1 F AH0 S",
    "orange": "AO1 R AH0 N JH",
    "other": "AH1 DH ER0",
    "paper": "P EY1 P ER0",
    "pencil": "P EH1 N S AH0 L",
    "people": "P IY1 P AH0 L",
    "picture": "P IH1 K CH ER0",
    "planet": "P L AE1 N AH0 T",
    "pocket": "P AA1 K AH0 T",
    "question": "K W EH1 S CH AH0 N",
    "quiet": "K W AY1 AH0 T",
    "rather": "R AE1 DH ER0",
    "reason": "R IY1 Z AH0 N",
    "river": "R IH1 V ER0",
    "school": "S K UW1 L",
    "second": "S EH1 K AH0 N D",
    "shadow": "SH AE1 D OW0",
    "silver": "S IH1 L V ER0",
    "simple": "S IH1 M P AH0 L",
    "sister": "S IH1 S T ER0",
    "smooth": "S M UW1 DH",
    "spring": "S P R IH1 NG",
    "station": "S T EY1 SH AH0 N",
    "stretch": "S T R EH1 CH",
    "strong": "S T R AO1 NG",
    "summer": "S AH1 M ER0",
    "table": "T EY1 B AH0 L",
    "teacher": "T IY1 CH ER0",
    "thirty": "TH ER1 T IY0",
    "thought": "TH AO1 T",
    "through": "TH R UW1",
    "thunder": "TH AH1 N D ER0",
    "together": "T AH0 G EH1 DH ER0",
    "tomorrow": "T AH0 M AA1 R OW2",
    "trouble": "T R AH1 B AH0 L",
    "twelve": "T W EH1 L V",
    "under": "AH1 N D ER0",
    "understand": "AH2 N D ER0 S T AE1 N D",
    "village": "V IH1 L AH0 JH",
    "water": "W AO1 T ER0",
    "weather": "W EH1 DH ER0",
    "window": "W IH1 N D OW0",
    "winter": "W IH1 N T ER0",
    "without": "W IH0 TH AW1 T",
    "yellow": "Y EH1 L OW0",
    "yesterday": "Y EH1 S T ER0 D EY2",
}


def _strip(phones):
    return [p.rstrip("0123456789") for p in phones]


def evaluate(lexicon):
    """lexicon: {word: "PH ON EMES"}. Returns the result dict."""
    tot_d = tot_ds = tot_n = tot_ns = 0
    per_word = []
    for word, pron in sorted(lexicon.items()):
        ref = pron.split()
        hyp = letter_to_sound(word)
        d = edit_distance(_strip(hyp), _strip(ref))
        ds = edit_distance(hyp, ref)
        tot_d += d
        tot_ds += ds
        tot_n += len(ref)
        tot_ns += len(ref)
        per_word.append((d / max(len(ref), 1), word,
                         " ".join(hyp), pron))
    per_word.sort(reverse=True)
    return dict(
        n_words=len(lexicon),
        per=round(tot_d / max(tot_n, 1), 4),
        per_stressed=round(tot_ds / max(tot_ns, 1), 4),
        worst=[dict(word=w, per=round(p, 3), hyp=h, ref=r)
               for p, w, h, r in per_word[:10]],
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--lexicon", default=None,
                    help="CMUdict-format file (word PH ON EMES per line); "
                         "default: the embedded 150-word probe set")
    ap.add_argument("--limit", type=int, default=0,
                    help="evaluate only the first N lexicon entries")
    args = ap.parse_args(argv)
    if args.lexicon:
        lex = {}
        with open(args.lexicon, encoding="latin-1") as f:
            for line in f:
                if line.startswith(";;;") or not line.strip():
                    continue
                parts = line.replace("\t", " ").split()
                word = parts[0].lower()
                if "(" in word or not word.isalpha():
                    continue  # skip alternate prons and punctuation entries
                lex.setdefault(word, " ".join(parts[1:]))
                if args.limit and len(lex) >= args.limit:
                    break
    else:
        lex = PROBE_LEXICON
    print(json.dumps(evaluate(lex)))


if __name__ == "__main__":
    main()
