"""Snowball stemmers beyond English — French, Spanish, Portuguese,
Italian, German — implemented from the published algorithm
specifications at snowballstem.org (public domain), matching the
reference's ``WordStemFunction.java:88`` language table entries the
reference test suite actually pins (``TestWordStemFunction.java``:
fr/es/pt/it/de one word each; 'de' maps to German2, whose difference
from German — ae/oe/ue treated as umlaut spellings — is included).

Each stemmer follows the spec's structure: compute the R1/R2/RV
regions, strip attached pronouns (Romance), longest-match standard
suffixes with region conditions, verb-suffix removal, residual-suffix
cleanup, and un-accenting. The five reference-pinned words round-trip
exactly; the long verb-ending tables are transcribed from the specs'
conjugation lists.
"""

from __future__ import annotations

# --- shared region machinery -------------------------------------------


def _r1r2(word: str, vowels: str) -> tuple[int, int]:
    """Standard Snowball R1/R2: positions after the first (second)
    non-vowel that follows a vowel."""

    def _next(start: int) -> int:
        i = start
        n = len(word)
        while i < n and word[i] not in vowels:
            i += 1
        while i < n and word[i] in vowels:
            i += 1
        # now at a non-vowel following a vowel (or end)
        return min(i + 1, n) if i < n else n

    # The canonical definition: R1 is after the first non-vowel
    # following a vowel.
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r2 = i + 1
            break
    return r1, r2


def _rv_romance(word: str, vowels: str) -> int:
    """RV per the Spanish/Portuguese/Italian definition."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in vowels:
        # region after the next following vowel
        for i in range(2, n):
            if word[i] in vowels:
                return i + 1
        return n
    if word[0] in vowels and word[1] in vowels:
        # region after the next consonant
        for i in range(2, n):
            if word[i] not in vowels:
                return i + 1
        return n
    # consonant-vowel start: after the third letter
    return 3


def _longest(word: str, suffixes) -> str | None:
    """Longest suffix of ``word`` among ``suffixes`` (None if none)."""
    best = None
    for s in suffixes:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


# --- Spanish -------------------------------------------------------------

_ES_V = "aeiouáéíóúü"

_ES_PRONOUNS = (
    "me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
    "las", "les", "los", "nos",
)
_ES_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_PRE_B = ("ando", "iendo", "ar", "er", "ir")
_ES_S1_DEL_R2 = (
    "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
    "osos", "osas", "amiento", "amientos", "imiento", "imientos",
)
_ES_S1_ADOR = (
    "adora", "ador", "ación", "adoras", "adores", "aciones", "ante",
    "antes", "ancia", "ancias",
)
_ES_2A = (
    "ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas",
    "yes", "yais", "yamos",
)
# regular conjugation endings (delete if in RV) — spec step 2b
_ES_2B_GU = ("en", "es", "éis", "emos")
# the spec's step-2b table = the regular conjugation endings of the
# -ar / -er / -ir paradigms (imperfect, subjunctives, preterite,
# future, conditional, participles, infinitives, present persons)
_ES_2B = tuple(
    (
        # -ar paradigm
        "aba abas ábamos abais aban "
        "ara aras áramos arais aran "
        "ase ases ásemos aseis asen "
        "aste asteis aron "
        "aré arás ará aremos aréis arán "
        "aría arías aríamos aríais arían "
        "ando ado ada ados adas ad ar "
        # -er / -ir paradigm
        "ía ías íamos íais ían "
        "iera ieras iéramos ierais ieran "
        "iese ieses iésemos ieseis iesen "
        "iste isteis ieron ió "
        "eré erás erá eremos eréis erán "
        "ería erías eríamos eríais erían "
        "iré irás irá iremos iréis irán "
        "iría irías iríamos iríais irían "
        "iendo ido ida idos idas ed id er ir "
        # present persons not in the gu-group
        "amos imos an as ís áis"
    ).split()
)
_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")


def stem_es(word: str) -> str:
    w = word.lower()
    r1, r2 = _r1r2(w, _ES_V)
    rv = _rv_romance(w, _ES_V)

    # step 0: attached pronoun
    pron = _longest(w, _ES_PRONOUNS)
    if pron:
        base = w[: -len(pron)]
        pre_a = _longest(base, _ES_PRE_A)
        pre_b = _longest(base, _ES_PRE_B)
        if pre_a and len(base) - len(pre_a) >= rv:
            w = (
                base[: -len(pre_a)]
                + pre_a.translate(_ES_UNACCENT)
            )
        elif (pre_b and len(base) - len(pre_b) >= rv) or (
            base.endswith("yendo") and base[-6:-5] == "u"
        ):
            w = base

    changed = False

    def in_r(suf: str, start: int) -> bool:
        return len(w) - len(suf) >= start

    # step 1: standard suffix
    all_s1 = (
        _ES_S1_DEL_R2
        + _ES_S1_ADOR
        + ("logía", "logías", "ución", "uciones", "encia", "encias",
           "amente", "mente", "idad", "idades", "iva", "ivo", "ivas",
           "ivos")
    )
    suf = _longest(w, all_s1)
    if suf:
        if suf in _ES_S1_DEL_R2 and in_r(suf, r2):
            w = w[: -len(suf)]
            changed = True
        elif suf in _ES_S1_ADOR and in_r(suf, r2):
            w = w[: -len(suf)]
            changed = True
            if w.endswith("ic") and len(w) - 2 >= r2:
                w = w[:-2]
        elif suf in ("logía", "logías") and in_r(suf, r2):
            w = w[: -len(suf)] + "log"
            changed = True
        elif suf in ("ución", "uciones") and in_r(suf, r2):
            w = w[: -len(suf)] + "u"
            changed = True
        elif suf in ("encia", "encias") and in_r(suf, r2):
            w = w[: -len(suf)] + "ente"
            changed = True
        elif suf == "amente" and in_r(suf, r1):
            w = w[: -len(suf)]
            changed = True
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            else:
                for p in ("os", "ic", "ad"):
                    if w.endswith(p) and len(w) - 2 >= r2:
                        w = w[:-2]
                        break
        elif suf == "mente" and in_r(suf, r2):
            w = w[: -len(suf)]
            changed = True
            for p in ("ante", "able", "ible"):
                if w.endswith(p) and len(w) - len(p) >= r2:
                    w = w[: -len(p)]
                    break
        elif suf in ("idad", "idades") and in_r(suf, r2):
            w = w[: -len(suf)]
            changed = True
            for p in ("abil", "ic", "iv"):
                if w.endswith(p) and len(w) - len(p) >= r2:
                    w = w[: -len(p)]
                    break
        elif suf in ("iva", "ivo", "ivas", "ivos") and in_r(suf, r2):
            w = w[: -len(suf)]
            changed = True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]

    # step 2a / 2b: verb suffixes
    if not changed:
        suf = _longest(w, _ES_2A)
        if (
            suf
            and len(w) - len(suf) >= rv
            and w[: -len(suf)].endswith("u")
        ):
            w = w[: -len(suf)]
        else:
            suf = _longest(w, _ES_2B_GU + _ES_2B)
            if suf and len(w) - len(suf) >= rv:
                w = w[: -len(suf)]
                if suf in _ES_2B_GU and w.endswith("gu"):
                    w = w[:-1]

    # step 3: residual suffix
    rv = _rv_romance(w, _ES_V)  # regions shrink with the word
    suf = _longest(w, ("os", "a", "o", "á", "í", "ó"))
    if suf and len(w) - len(suf) >= rv:
        w = w[: -len(suf)]
    elif w.endswith(("e", "é")) and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]

    return w.translate(_ES_UNACCENT)


# --- Portuguese ----------------------------------------------------------

_PT_V = "aeiouáéíóúâêô"

_PT_S1_DEL_R2 = (
    "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
    "amento", "amentos", "imento", "imentos", "adora", "ador",
    "aça~o", "adoras", "adores", "aço~es", "ante", "antes", "ância",
)
_PT_2 = (
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este",
    "iste", "ei", "arei", "erei", "irei", "am", "iam", "ariam",
    "eriam", "iriam", "aram", "eram", "iram", "avam", "em", "arem",
    "erem", "irem", "assem", "essem", "issem", "ado", "ido", "ando",
    "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as",
    "adas", "idas", "ias", "arias", "erias", "irias", "arás", "aras",
    "erás", "eras", "irás", "avas", "es", "ardes", "erdes", "irdes",
    "ares", "eres", "ires", "asses", "esses", "isses", "astes",
    "estes", "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis",
    "iríeis", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "ásseis", "ésseis", "ísseis", "áveis", "ados", "idos", "ámos",
    "amos", "íamos", "aríamos", "eríamos", "iríamos", "áramos",
    "éramos", "íramos", "ávamos", "emos", "aremos", "eremos",
    "iremos", "ássemos", "êssemos", "íssemos", "imos", "armos",
    "ermos", "irmos", "eu", "iu", "ou", "ira", "iras",
)
_PT_UNACCENT = str.maketrans("áéíóúâêô", "aeiouaeo")


def stem_pt(word: str) -> str:
    w = word.lower().replace("ã", "a~").replace("õ", "o~")
    r1, r2 = _r1r2(w, _PT_V)
    rv = _rv_romance(w, _PT_V)

    def in_r(suf: str, start: int) -> bool:
        return len(w) - len(suf) >= start

    changed = False
    all_s1 = _PT_S1_DEL_R2 + (
        "logia", "logias", "uça~o", "uço~es", "ência", "ências",
        "amente", "mente", "idade", "idades", "iva", "ivo", "ivas",
        "ivos", "ira", "iras",
    )
    suf = _longest(w, all_s1)
    if suf:
        if suf in _PT_S1_DEL_R2 and in_r(suf, r2):
            w = w[: -len(suf)]
            changed = True
            if w.endswith("ic") and len(w) - 2 >= r2:
                w = w[:-2]
        elif suf in ("logia", "logias") and in_r(suf, r2):
            w = w[: -len(suf)] + "log"
            changed = True
        elif suf in ("uça~o", "uço~es") and in_r(suf, r2):
            w = w[: -len(suf)] + "u"
            changed = True
        elif suf in ("ência", "ências") and in_r(suf, r2):
            w = w[: -len(suf)] + "ente"
            changed = True
        elif suf == "amente" and in_r(suf, r1):
            w = w[: -len(suf)]
            changed = True
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            else:
                for p in ("os", "ic", "ad"):
                    if w.endswith(p) and len(w) - 2 >= r2:
                        w = w[:-2]
                        break
        elif suf == "mente" and in_r(suf, r2):
            w = w[: -len(suf)]
            changed = True
            for p in ("ante", "avel", "ível"):
                if w.endswith(p) and len(w) - len(p) >= r2:
                    w = w[: -len(p)]
                    break
        elif suf in ("idade", "idades") and in_r(suf, r2):
            w = w[: -len(suf)]
            changed = True
            for p in ("abil", "ic", "iv"):
                if w.endswith(p) and len(w) - len(p) >= r2:
                    w = w[: -len(p)]
                    break
        elif suf in ("iva", "ivo", "ivas", "ivos") and in_r(suf, r2):
            w = w[: -len(suf)]
            changed = True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
        elif suf in ("ira", "iras") and in_r(suf, rv) and w[
            : -len(suf)
        ].endswith("e"):
            w = w[: -len(suf)] + "ir"
            changed = True

    if not changed:
        suf = _longest(w, _PT_2)
        if suf and in_r(suf, rv):
            w = w[: -len(suf)]
            changed = True
        if changed and w.endswith("ci") and len(w) - 1 >= rv:
            # step 3: delete i if in RV preceded by c
            w = w[:-1]

    if not changed:
        suf = _longest(w, ("os", "a", "i", "o", "á", "í", "ó"))
        if suf and len(w) - len(suf) >= rv:
            w = w[: -len(suf)]

    # step 5
    if w.endswith(("e", "é", "ê")) and len(w) - 1 >= rv:
        w = w[:-1]
        if (w.endswith("gu") or w.endswith("ci")) and len(w) - 1 >= rv:
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.translate(_PT_UNACCENT).replace("a~", "ã").replace(
        "o~", "õ"
    )


# --- Italian -------------------------------------------------------------

_IT_V = "aeiouàèìòù"

_IT_PRONOUNS = (
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene",
)
_IT_S1_DEL_R2 = (
    "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
    "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
    "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
    "ose", "mente", "atrice", "atrici", "ante", "anti",
)
_IT_2 = (
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "erà", "erai", "eranno", "ere", "erebbe",
    "erebbero", "erei", "eremmo", "eremo", "ereste", "eresti",
    "erete", "erò", "erono", "essero", "ete", "eva", "evamo",
    "evano", "evate", "evi", "evo", "Yamo", "iamo", "immo", "irà",
    "irai", "iranno", "ire", "irebbe", "irebbero", "irei", "iremmo",
    "iremo", "ireste", "iresti", "irete", "irò", "irono", "isca",
    "iscano", "isce", "isci", "isco", "iscono", "issero", "ita",
    "ite", "iti", "ito", "iva", "ivamo", "ivano", "ivate", "ivi",
    "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir",
)
_IT_UNACCENT = str.maketrans("áéíóú", "àèìòù")


def stem_it(word: str) -> str:
    w = word.lower().translate(_IT_UNACCENT)
    # mark u/i between vowels as consonants (U/I); also qu → qU
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in "ui"
            and chars[i - 1] in _IT_V
            and chars[i + 1] in _IT_V
        ):
            chars[i] = chars[i].upper()
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    w = "".join(chars)
    vow = _IT_V + "AEIOU"  # marked chars never count as vowels
    r1, r2 = _r1r2(w, _IT_V)
    rv = _rv_romance(w, _IT_V)

    # step 0: attached pronoun following ando/endo (delete) or
    # ar/er/ir (replace with e), the preceding ending in RV
    pron = _longest(w, _IT_PRONOUNS)
    if pron:
        base = w[: -len(pron)]
        for pre in ("ando", "endo"):
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                w = base
                break
        else:
            for pre in ("ar", "er", "ir"):
                if base.endswith(pre) and len(base) - len(pre) >= rv:
                    w = base + "e"
                    break

    def in_r(suf: str, start: int) -> bool:
        return len(w) - len(suf) >= start

    changed = False
    all_s1 = _IT_S1_DEL_R2 + (
        "azione", "azioni", "atore", "atori", "logia", "logie",
        "uzione", "uzioni", "usione", "usioni", "enza", "enze",
        "amento", "amenti", "imento", "imenti", "amente", "ità",
        "ivo", "ivi", "iva", "ive",
    )
    suf = _longest(w, all_s1)
    if suf:
        if suf in ("azione", "azioni", "atore", "atori") and in_r(
            suf, r2
        ):
            w = w[: -len(suf)]
            changed = True
            if w.endswith("ic") and len(w) - 2 >= r2:
                w = w[:-2]
        elif suf in ("logia", "logie") and in_r(suf, r2):
            w = w[: -len(suf)] + "log"
            changed = True
        elif suf in ("uzione", "uzioni", "usione", "usioni") and in_r(
            suf, r2
        ):
            w = w[: -len(suf)] + "u"
            changed = True
        elif suf in ("enza", "enze") and in_r(suf, r2):
            w = w[: -len(suf)] + "ente"
            changed = True
        elif suf == "amente" and in_r(suf, r1):
            w = w[: -len(suf)]
            changed = True
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            else:
                for p in ("os", "ic", "abil"):
                    if w.endswith(p) and len(w) - len(p) >= r2:
                        w = w[: -len(p)]
                        break
        elif suf in ("amento", "amenti", "imento", "imenti") and in_r(
            suf, rv
        ):
            w = w[: -len(suf)]
            changed = True
        elif suf == "ità" and in_r(suf, r2):
            w = w[: -len(suf)]
            changed = True
            for p in ("abil", "ic", "iv"):
                if w.endswith(p) and len(w) - len(p) >= r2:
                    w = w[: -len(p)]
                    break
        elif suf in ("ivo", "ivi", "iva", "ive") and in_r(suf, r2):
            w = w[: -len(suf)]
            changed = True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif suf in _IT_S1_DEL_R2 and in_r(suf, r2):
            w = w[: -len(suf)]
            changed = True

    # step 2: verb suffixes (only if step 1 removed nothing)
    if not changed:
        suf = _longest(w, _IT_2)
        if suf and in_r(suf, rv):
            w = w[: -len(suf)]

    # step 3a: final vowel (and a preceding i) in RV
    if w and w[-1] in "aeioàèìò" and len(w) - 1 >= rv:
        w = w[:-1]
        if w and w[-1] == "i" and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b: ch/gh → c/g if in RV
    for pair in ("ch", "gh"):
        if w.endswith(pair) and len(w) - 1 >= rv:
            w = w[:-1]
            break

    return w.lower()


# --- French --------------------------------------------------------------

_FR_V = "aeiouyâàëéêèïîôûù"

_FR_S1 = (
    # delete if in R2
    "ance", "iqUe", "isme", "able", "iste", "eux", "ances", "iqUes",
    "ismes", "ables", "istes",
    "atrice", "ateur", "ation", "atrices", "ateurs", "ations",
    "logie", "logies", "usion", "ution", "usions", "utions",
    "ence", "ences", "ement", "ements", "ité", "ités", "if", "ive",
    "ifs", "ives", "eaux", "aux", "euse", "euses", "issement",
    "issements", "amment", "emment", "ment", "ments",
)
_FR_2A = (
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
    "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
    "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
    "issant", "issante", "issantes", "issants", "isse", "issent",
    "isses", "issez", "issiez", "issions", "issons", "it",
)
_FR_2B_ER = (
    "é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
    "erais", "erait", "eras", "erez", "eriez", "erions", "erons",
    "eront", "ez", "iez",
)
_FR_2B_A = (
    "â", "a", "ai", "aIent", "ais", "ait", "ant", "ante", "antes",
    "ants", "as", "asse", "assent", "asses", "assiez", "assions",
    "âmes", "ât", "âtes",
)


def stem_fr(word: str) -> str:
    w = word.lower()
    # mark consonant u/i/y: u,i between vowels; y next to a vowel;
    # u after q
    chars = list(w)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        prev_v = i > 0 and chars[i - 1] in _FR_V
        next_v = i + 1 < n and chars[i + 1] in _FR_V
        if c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    w = "".join(chars)
    r1, r2 = _r1r2(w, _FR_V)
    # RV: if the word begins with two vowels, after the third letter;
    # otherwise after the first vowel not at the beginning
    n = len(w)
    if n >= 3 and w[0] in _FR_V and w[1] in _FR_V:
        rv = 3
    else:
        rv = n
        for i in range(1, n):
            if w[i] in _FR_V:
                rv = i + 1
                break
    if w[:3] in ("par", "col", "tap"):
        rv = 3

    def in_r(suf: str, start: int) -> bool:
        return len(w) - len(suf) >= start

    did1 = False
    found_ment = False
    suf = _longest(w, _FR_S1)
    if suf:
        if suf in ("amment", "emment", "ment", "ments"):
            found_ment = True
        elif suf in (
            "ance", "iqUe", "isme", "able", "iste", "eux", "ances",
            "iqUes", "ismes", "ables", "istes",
        ) and in_r(suf, r2):
            w = w[: -len(suf)]
            did1 = True
        elif suf in (
            "atrice", "ateur", "ation", "atrices", "ateurs", "ations"
        ) and in_r(suf, r2):
            w = w[: -len(suf)]
            did1 = True
            if w.endswith("ic"):
                if len(w) - 2 >= r2:
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
        elif suf in ("logie", "logies") and in_r(suf, r2):
            w = w[: -len(suf)] + "log"
            did1 = True
        elif suf in ("usion", "ution", "usions", "utions") and in_r(
            suf, r2
        ):
            w = w[: -len(suf)] + "u"
            did1 = True
        elif suf in ("ence", "ences") and in_r(suf, r2):
            w = w[: -len(suf)] + "ent"
            did1 = True
        elif suf in ("ement", "ements") and in_r(suf, rv):
            w = w[: -len(suf)]
            did1 = True
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            elif w.endswith("eus"):
                if len(w) - 3 >= r2:
                    w = w[:-3]
                elif len(w) - 3 >= r1:
                    w = w[:-3] + "eux"
            elif w.endswith("abl") and len(w) - 3 >= r2:
                w = w[:-3]
            elif w.endswith("iqU") and len(w) - 3 >= r2:
                w = w[:-3]
            elif w.endswith("ièr") and len(w) - 3 >= rv:
                w = w[:-3] + "i"
            elif w.endswith("Ièr") and len(w) - 3 >= rv:
                w = w[:-3] + "i"
        elif suf in ("ité", "ités") and in_r(suf, r2):
            w = w[: -len(suf)]
            did1 = True
            if w.endswith("abil"):
                if len(w) - 4 >= r2:
                    w = w[:-4]
                else:
                    w = w[:-4] + "abl"
            elif w.endswith("ic"):
                if len(w) - 2 >= r2:
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
            elif w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
        elif suf in ("if", "ive", "ifs", "ives") and in_r(suf, r2):
            w = w[: -len(suf)]
            did1 = True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif suf == "eaux":
            w = w[:-4] + "eau"
            did1 = True
        elif suf == "aux" and in_r(suf, r1):
            w = w[:-3] + "al"
            did1 = True
        elif suf in ("euse", "euses"):
            if in_r(suf, r2):
                w = w[: -len(suf)]
                did1 = True
            elif in_r(suf, r1):
                w = w[: -len(suf)] + "eux"
                did1 = True
        elif suf in ("issement", "issements") and in_r(suf, r1):
            base = w[: -len(suf)]
            if base and base[-1] not in _FR_V:
                w = base
                did1 = True

    if found_ment:
        suf = _longest(w, ("amment", "emment", "ment", "ments"))
        if suf in ("amment", "emment") and in_r(suf, rv):
            w = w[: -len(suf)] + ("ant" if suf == "amment" else "ent")
        elif suf in ("ment", "ments"):
            base = w[: -len(suf)]
            if base and base[-1] in _FR_V and len(base) - 1 >= rv:
                w = base

    # step 2a / 2b
    if not did1 or found_ment:
        suf = _longest(w, _FR_2A)
        did2a = False
        if suf and in_r(suf, rv):
            base = w[: -len(suf)]
            if base and base[-1] not in _FR_V and len(base) - 1 >= rv:
                w = base
                did2a = True
        if not did2a:
            suf = _longest(w, ("ions",) + _FR_2B_ER + _FR_2B_A)
            if suf == "ions" and in_r(suf, r2):
                w = w[: -len(suf)]
            elif suf in _FR_2B_ER and in_r(suf, rv):
                w = w[: -len(suf)]
            elif suf in _FR_2B_A and in_r(suf, rv):
                w = w[: -len(suf)]
                if w.endswith("e") and len(w) - 1 >= rv:
                    w = w[:-1]

    # step 3 / 4
    if w.endswith("Y"):
        w = w[:-1] + "i"
    elif w.endswith("ç"):
        w = w[:-1] + "c"
    else:
        if (
            w.endswith("s")
            and len(w) >= 2
            and w[-2] not in "aiouès"
        ):
            w = w[:-1]
        suf = _longest(w, ("ion", "ier", "ière", "Ier", "Ière", "e", "ë"))
        if (
            suf == "ion"
            and in_r(suf, r2)
            and len(w) - 4 >= 0
            and w[-4] in "st"
            and len(w) - len(suf) >= rv
        ):
            w = w[: -len(suf)]
        elif suf in ("ier", "ière", "Ier", "Ière"):
            w = w[: -len(suf)] + "i"
        elif suf == "e" and len(w) - 1 >= rv:
            w = w[:-1]
        elif suf == "ë" and w.endswith("guë") and len(w) - 1 >= rv:
            w = w[:-1]

    # step 5: undouble
    for pair in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(pair):
            w = w[:-1]
            break
    # step 6: un-accent é/è before final consonant run
    m = len(w) - 1
    i = m
    while i >= 0 and w[i] not in _FR_V:
        i -= 1
    if 0 <= i < m and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1 :]

    return w.lower()


# --- German (German2 variant) -------------------------------------------

_DE_V = "aeiouyäöü"
_DE_S_END = set("bdfghklmnrt")
_DE_ST_END = set("bdfghklmnt")


def stem_de(word: str) -> str:
    w = word.lower().replace("ß", "ss")
    # German2: ae/oe/ue are umlaut spellings (not after q / in 'eue')
    out = []
    i = 0
    while i < len(w):
        two = w[i : i + 2]
        if two in ("ae", "oe", "ue") and not (
            two == "ue" and (i == 0 or w[i - 1] == "q")
        ):
            out.append({"ae": "ä", "oe": "ö", "ue": "ü"}[two])
            i += 2
        else:
            out.append(w[i])
            i += 1
    w = "".join(out)
    # mark u/y between vowels as consonants
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in "uy"
            and chars[i - 1] in _DE_V
            and chars[i + 1] in _DE_V
        ):
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _r1r2(w, _DE_V)
    r1 = max(r1, 3)  # R1 begins no earlier than position 3

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    # step 1
    suf = _longest(w, ("em", "ern", "er", "e", "en", "es", "s"))
    if suf in ("em", "ern", "er") and in_r1(suf):
        w = w[: -len(suf)]
    elif suf in ("e", "en", "es") and in_r1(suf):
        w = w[: -len(suf)]
        if w.endswith("niss"):
            w = w[:-1]
    elif (
        suf == "s"
        and in_r1(suf)
        and len(w) >= 2
        and w[-2] in _DE_S_END
    ):
        w = w[:-1]

    # step 2
    suf = _longest(w, ("en", "er", "est", "st"))
    if suf in ("en", "er", "est") and in_r1(suf):
        w = w[: -len(suf)]
    elif (
        suf == "st"
        and in_r1(suf)
        and len(w) >= 6
        and w[-3] in _DE_ST_END
    ):
        w = w[:-2]

    # step 3: d-suffixes
    suf = _longest(w, ("end", "ung", "ig", "ik", "isch", "lich",
                       "heit", "keit"))
    if suf in ("end", "ung") and in_r2(suf):
        w = w[: -len(suf)]
        if (
            w.endswith("ig")
            and len(w) - 2 >= r2
            and not w.endswith("eig")
        ):
            w = w[:-2]
    elif suf in ("ig", "ik", "isch") and in_r2(suf) and not w[
        : -len(suf)
    ].endswith("e"):
        w = w[: -len(suf)]
    elif suf in ("lich", "heit") and in_r2(suf):
        w = w[: -len(suf)]
        for p in ("er", "en"):
            if w.endswith(p) and len(w) - 2 >= r1:
                w = w[:-2]
                break
    elif suf == "keit" and in_r2(suf):
        w = w[: -len(suf)]
        for p in ("lich", "ig"):
            if w.endswith(p) and len(w) - len(p) >= r2:
                w = w[: -len(p)]
                break

    return (
        w.lower()
        .translate(str.maketrans("äöü", "aou"))
    )


STEMMERS = {
    "fr": stem_fr,
    "es": stem_es,
    "pt": stem_pt,
    "it": stem_it,
    "de": stem_de,
}
