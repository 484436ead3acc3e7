"""Pure-Python Porter2 (Snowball "english") stemmer.

Implemented from the published Snowball english algorithm description
(snowballstem.org) — public knowledge.  The reference engine uses
``nltk.stem.snowball.SnowballStemmer("english")``
(``app/TextPreProcess.py:13`` in /root/reference); nltk is unavailable in
this environment, so the engine and its correctness oracle both import
THIS module, making analyzer semantics identical on both sides
(SURVEY.md §7.4/§7.5).

No Spark imports — usable from executors, the driver, and the oracle.
"""

from __future__ import annotations

VOWELS = frozenset("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDINGS = frozenset("cdeghkmnrt")

# Exceptional forms (step 0 of the published algorithm).
_EXCEPTIONS = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Invariant after step 1a.
_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)


def _regions(word: str) -> tuple[int, int]:
    """Return (r1, r2) start offsets per the Snowball definition."""
    r1 = len(word)
    # Special prefixes whose R1 starts right after them.
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, len(word)):
            if word[i] not in "aeiouy" and word[i - 1] in "aeiouy":
                r1 = i + 1
                break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if word[i] not in "aeiouy" and word[i - 1] in "aeiouy":
            r2 = i + 1
            break
    return r1, r2


def _is_short_syllable(word: str, i: int) -> bool:
    """True if a short syllable ends at index i (i = position of the vowel)."""
    if i == 0:
        return (
            len(word) >= 2
            and word[0] in "aeiouy"
            and word[1] not in "aeiouy"
        )
    return (
        word[i] in "aeiouy"
        and i + 1 < len(word)
        and word[i + 1] not in "aeiouy"
        and word[i + 1] not in "wxY"
        and word[i - 1] not in "aeiouy"
    )


def _is_short_word(word: str, r1: int) -> bool:
    if r1 < len(word):
        return False
    # ends in a short syllable
    if len(word) >= 2 and _is_short_syllable(word, len(word) - 2):
        return True
    if len(word) == 2 and word[0] in "aeiouy" and word[1] not in "aeiouy":
        return True
    return False


def _contains_vowel(segment: str) -> bool:
    return any(c in "aeiouy" for c in segment)


def stem(token: str) -> str:
    """Stem one lowercase token (non-alpha tokens pass through unchanged)."""
    word = token
    if len(word) <= 2:
        return word
    if not word.isalpha():
        return word

    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word]

    # Mark consonant-y with Y.
    if word.startswith("y"):
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in "aeiouy":
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _regions(word)

    # --- Step 0: strip apostrophe suffixes (tokens here never contain ') ---

    # --- Step 1a ---
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2].lower()):
            word = word[:-1]

    if word.lower() in _EXCEPTIONS2:
        return word.lower()

    # --- Step 1b ---
    if word.endswith(("eedly", "eed")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part.lower()):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.lower().endswith(DOUBLES):
                        word = word[:-1]
                    else:
                        nr1, _ = _regions(word)
                        if _is_short_word(word.lower(), nr1):
                            word += "e"
                break

    # --- Step 1c ---
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in "aeiouy"
    ):
        word = word[:-1] + "i"

    def in_r1(suffix: str) -> bool:
        return len(word) - len(suffix) >= r1

    def in_r2(suffix: str) -> bool:
        return len(word) - len(suffix) >= r2

    # --- Step 2 (longest suffix, only applied if in R1) ---
    step2 = (
        ("ization", "ize"),
        ("ational", "ate"),
        ("fulness", "ful"),
        ("ousness", "ous"),
        ("iveness", "ive"),
        ("tional", "tion"),
        ("biliti", "ble"),
        ("lessli", "less"),
        ("entli", "ent"),
        ("ation", "ate"),
        ("alism", "al"),
        ("aliti", "al"),
        ("ousli", "ous"),
        ("iviti", "ive"),
        ("fulli", "ful"),
        ("enci", "ence"),
        ("anci", "ance"),
        ("abli", "able"),
        ("izer", "ize"),
        ("ator", "ate"),
        ("alli", "al"),
        ("bli", "ble"),
        ("ogi", None),  # special: -> og if preceded by l
        ("li", None),  # special: delete if preceded by valid li-ending
    )
    for suf, repl in step2:
        if word.endswith(suf):
            if in_r1(suf):
                if suf == "ogi":
                    if len(word) > 3 and word[-4] == "l":
                        word = word[:-1]
                elif suf == "li":
                    if len(word) > 2 and word[-3] in LI_ENDINGS:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # --- Step 3 (in R1) ---
    step3 = (
        ("ational", "ate"),
        ("tional", "tion"),
        ("alize", "al"),
        ("icate", "ic"),
        ("iciti", "ic"),
        ("ative", None),  # delete only if in R2
        ("ical", "ic"),
        ("ness", ""),
        ("ful", ""),
    )
    for suf, repl in step3:
        if word.endswith(suf):
            if in_r1(suf):
                if suf == "ative":
                    if in_r2(suf):
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + repl
            break

    # --- Step 4 (in R2) ---
    step4 = (
        "ement",
        "ance",
        "ence",
        "able",
        "ible",
        "ment",
        "ant",
        "ent",
        "ism",
        "ate",
        "iti",
        "ous",
        "ive",
        "ize",
        "ion",
        "al",
        "er",
        "ic",
    )
    for suf in step4:
        if word.endswith(suf):
            if in_r2(suf):
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # --- Step 5 ---
    if word.endswith("e"):
        if in_r2("e"):
            word = word[:-1]
        elif in_r1("e"):
            # delete unless preceded by a short syllable
            base = word[:-1].lower()
            preceded_short = len(base) >= 2 and _is_short_syllable(base, len(base) - 2)
            if len(base) == 1:
                preceded_short = False
            if not preceded_short:
                word = word[:-1]
    elif word.endswith("l") and in_r2("l") and len(word) > 1 and word[-2] == "l":
        word = word[:-1]

    return word.lower()
