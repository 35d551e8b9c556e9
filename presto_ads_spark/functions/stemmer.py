"""Porter2 (Snowball English) stemmer — pure-Python implementation of
the public algorithm specification (snowballstem.org, "The English
(Porter2) stemming algorithm"), matching the reference's
WordStemFunction.java which delegates to
org.tartarus.snowball.ext.EnglishStemmer.

French/Spanish/Portuguese/Italian/German live in stemmer_ml.py
(round 11 — the languages the reference test suite pins); the
remaining Snowball languages in WordStemFunction's table raise a
documented not-implemented error."""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_VALID = frozenset("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_STEP2 = (
    ("ational", "ate"), ("fulness", "ful"), ("iveness", "ive"),
    ("ization", "ize"), ("ousness", "ous"), ("biliti", "ble"),
    ("lessli", "less"), ("tional", "tion"), ("alism", "al"),
    ("aliti", "al"), ("ation", "ate"), ("entli", "ent"),
    ("fulli", "ful"), ("iviti", "ive"), ("ousli", "ous"),
    ("abli", "able"), ("alli", "al"), ("anci", "ance"),
    ("ator", "ate"), ("enci", "ence"), ("izer", "ize"),
    ("bli", "ble"),
)
_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
)
_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic",
)


def _mark_ys(w: str) -> str:
    out = []
    for i, c in enumerate(w):
        if c == "y" and (i == 0 or w[i - 1] in _VOWELS):
            out.append("Y")  # consonant y
        else:
            out.append(c)
    return "".join(out)


def _r1r2(w: str) -> tuple[int, int]:
    if w.startswith(("gener", "arsen")):
        r1 = 5
    elif w.startswith("commun"):
        r1 = 6
    else:
        r1 = len(w)
        for i in range(1, len(w)):
            if w[i].lower() not in _VOWELS and w[i - 1].lower() in _VOWELS:
                r1 = i + 1
                break
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if w[i].lower() not in _VOWELS and w[i - 1].lower() in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _is_v(w: str, i: int) -> bool:
    return w[i] in _VOWELS  # uppercase Y deliberately fails (consonant)


def _ends_short_syllable(w: str) -> bool:
    n = len(w)
    if n == 2:
        return _is_v(w, 0) and not _is_v(w, 1)
    if n >= 3:
        return (
            not _is_v(w, n - 3)
            and _is_v(w, n - 2)
            and not _is_v(w, n - 1)
            and w[n - 1] not in "wxY"
        )
    return False


def _has_vowel(w: str) -> bool:
    return any(c in _VOWELS for c in w)


def porter2_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    if w in _EXCEPTIONS1:
        return _EXCEPTIONS1[w]
    if w.startswith("'"):
        w = w[1:]
    w = _mark_ys(w)
    r1, r2 = _r1r2(w)

    # step 0
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s") and _has_vowel(w[:-2].lower()):
        w = w[:-1]
    if w.lower() in _EXCEPTIONS2:
        return w.lower()
    # step 1b — eedly/eed: replace by ee iff the suffix lies in R1
    # (suffix start index >= r1); otherwise the ed/ing family
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + "ee"
            break
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if _has_vowel(stem.lower()):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.lower().endswith(_DOUBLES):
                        w = w[:-1]
                    elif _ends_short_syllable(w) and r1 >= len(w):
                        w += "e"
                break
    # step 1c
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2].lower() not in _VOWELS
    ):
        w = w[:-1] + "i"
    # step 2 (longest matching suffix; fires only if it lies in R1)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ogi"):
            if len(w) - 3 >= r1 and len(w) > 3 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if (
                len(w) - 2 >= r1
                and len(w) > 2
                and w[-3].lower() in _LI_VALID
            ):
                w = w[:-2]
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ative") and len(w) - 5 >= r2:
            w = w[:-5]
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                w = w[: -len(suf)]
            break
    else:
        if (
            w.endswith("ion")
            and len(w) - 3 >= r2
            and len(w) > 3
            and w[-4] in "st"
        ):
            w = w[:-3]
    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) > 1 and w[-2] == "l":
        w = w[:-1]
    return w.lower()
