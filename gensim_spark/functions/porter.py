"""Porter stemming algorithm (Porter, 1980) — pure Python, batch-friendly.

Implements the original algorithm as published ("An algorithm for suffix
stripping", Program 14(3), 1980), matching the reference behavior of
gensim/parsing/porter.py (which is Porter's own reference implementation):
input is lowercased, strings of length <= 2 are returned unchanged, and the
classic quirks ("today" -> "todai", "useful" -> "us") are reproduced.

This is an independent implementation written from the published rule tables,
structured around suffix-rule lists rather than the reference's index-juggling
style; a memo cache makes repeated words (zipfian text) cheap inside Arrow
batches.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in the [C](VC)^m[V] decomposition."""
    m = 0
    prev_cons = True
    seen_vowel = False
    for i in range(len(stem)):
        if _is_cons(stem, i):
            if seen_vowel:
                m += 1
                seen_vowel = False
            prev_cons = True
        else:
            seen_vowel = True
            prev_cons = False
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _is_cons(stem, len(stem) - 1)
    )


def _ends_cvc(stem: str) -> bool:
    """*o condition: stem ends cons-vowel-cons, final cons not w, x or y."""
    if len(stem) < 3:
        return False
    return (
        _is_cons(stem, len(stem) - 3)
        and not _is_cons(stem, len(stem) - 2)
        and _is_cons(stem, len(stem) - 1)
        and stem[-1] not in "wxy"
    )


def _replace_suffix(word, rules):
    """Apply the first matching (suffix, replacement, condition) rule.

    ``condition`` receives the stem (word minus suffix) and decides whether the
    replacement fires; a matched suffix ends rule scanning either way, per the
    published algorithm.
    """
    for suffix, repl, cond in rules:
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)]
            if cond is None or cond(stem):
                return stem + repl
            return word
    return word


def _step1ab(word: str) -> str:
    if word.endswith("s"):
        if word.endswith("sses"):
            word = word[:-2]
        elif word.endswith("ies"):
            word = word[:-2]
        elif not word.endswith("ss"):
            word = word[:-1]
    flag = False
    if word.endswith("eed"):
        if _measure(word[:-3]) > 0:
            word = word[:-1]
    elif word.endswith("ed") and _has_vowel(word[:-2]):
        word, flag = word[:-2], True
    elif word.endswith("ing") and _has_vowel(word[:-3]):
        word, flag = word[:-3], True
    if flag:
        if word.endswith(("at", "bl", "iz")):
            word += "e"
        elif _ends_double_cons(word) and word[-1] not in "lsz":
            word = word[:-1]
        elif _measure(word) == 1 and _ends_cvc(word):
            word += "e"
    return word


def _step1c(word: str) -> str:
    if word.endswith("y") and _has_vowel(word[:-1]):
        word = word[:-1] + "i"
    return word


_M_POS = lambda stem: _measure(stem) > 0  # noqa: E731
_M_GT1 = lambda stem: _measure(stem) > 1  # noqa: E731

_STEP2_RULES = [
    ("ational", "ate", _M_POS), ("tional", "tion", _M_POS),
    ("enci", "ence", _M_POS), ("anci", "ance", _M_POS),
    ("izer", "ize", _M_POS), ("abli", "able", _M_POS),
    ("alli", "al", _M_POS), ("entli", "ent", _M_POS),
    ("eli", "e", _M_POS), ("ousli", "ous", _M_POS),
    ("ization", "ize", _M_POS), ("ation", "ate", _M_POS),
    ("ator", "ate", _M_POS), ("alism", "al", _M_POS),
    ("iveness", "ive", _M_POS), ("fulness", "ful", _M_POS),
    ("ousness", "ous", _M_POS), ("aliti", "al", _M_POS),
    ("iviti", "ive", _M_POS), ("biliti", "ble", _M_POS),
]

_STEP3_RULES = [
    ("icate", "ic", _M_POS), ("ative", "", _M_POS), ("alize", "al", _M_POS),
    ("iciti", "ic", _M_POS), ("ical", "ic", _M_POS), ("ful", "", _M_POS),
    ("ness", "", _M_POS),
]

_STEP4_RULES = [
    ("al", "", _M_GT1), ("ance", "", _M_GT1), ("ence", "", _M_GT1),
    ("er", "", _M_GT1), ("ic", "", _M_GT1), ("able", "", _M_GT1),
    ("ible", "", _M_GT1), ("ant", "", _M_GT1), ("ement", "", _M_GT1),
    ("ment", "", _M_GT1), ("ent", "", _M_GT1),
    ("ion", "", lambda stem: _M_GT1(stem) and stem[-1:] in ("s", "t")),
    ("ou", "", _M_GT1), ("ism", "", _M_GT1), ("ate", "", _M_GT1),
    ("iti", "", _M_GT1), ("ous", "", _M_GT1), ("ive", "", _M_GT1),
    ("ize", "", _M_GT1),
]


def _step5(word: str) -> str:
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            word = stem
    if _measure(word) > 1 and word.endswith("ll"):
        word = word[:-1]
    return word


@lru_cache(maxsize=65536)
def porter_stem(word: str) -> str:
    """Stem a single word. Lowercases first; len<=2 words pass through."""
    word = word.lower()
    if len(word) <= 2:
        return word
    word = _step1ab(word)
    word = _step1c(word)
    word = _replace_suffix(word, _STEP2_RULES)
    word = _replace_suffix(word, _STEP3_RULES)
    word = _replace_suffix(word, _STEP4_RULES)
    word = _step5(word)
    return word
