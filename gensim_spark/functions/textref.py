"""Pure-Python reference text functions — the byte-identity layer.

These run *inside* vectorized pandas UDFs (see ``textprep``), batch-at-a-time,
so the Python ``re`` engine itself produces the extracted bytes. That makes
per-row equality with a local gensim run trivially exact — Java regex ``\\w``
unicode classes differ from Python's, so the hot extraction path never relies
on JVM regex where parity matters.

Reference semantics (piskvorky/gensim):
- ``PAT_ALPHABETIC``/``RE_HTML_ENTITY``: gensim/utils.py:49-50
- ``tokenize``/``simple_tokenize``/``simple_preprocess``: gensim/utils.py:226-313
- ``deaccent``: gensim/utils.py:173-200
- ``decode_htmlentities``: gensim/utils.py:1159-1207
- filter chain: gensim/parsing/preprocessing.py:62-445

All implementations here are written from those documented semantics; regex
constants are the published patterns (data, not code).
"""

from __future__ import annotations

import re
import string
import unicodedata
from html.entities import name2codepoint

from gensim_spark.functions.porter import porter_stem
from gensim_spark.functions.stopwords import STOPWORDS

# gensim/utils.py:49 — unicode word chars, tokens must not start with a digit.
PAT_ALPHABETIC = re.compile(r"(((?![\d])\w)+)", re.UNICODE)
# gensim/utils.py:50 — named / decimal / hex HTML entities.
RE_HTML_ENTITY = re.compile(r"&(#?)([xX]?)(\w{1,8});", re.UNICODE)

# gensim/parsing/preprocessing.py:62-68
RE_PUNCT = re.compile(r"([%s])+" % re.escape(string.punctuation), re.UNICODE)
RE_TAGS = re.compile(r"<([^>]+)>", re.UNICODE)
RE_NUMERIC = re.compile(r"[0-9]+", re.UNICODE)
RE_NONALPHA = re.compile(r"\W", re.UNICODE)
RE_AL_NUM = re.compile(r"([a-z]+)([0-9]+)", re.UNICODE)
RE_NUM_AL = re.compile(r"([0-9]+)([a-z]+)", re.UNICODE)
RE_WHITESPACE = re.compile(r"(\s)+", re.UNICODE)

# html→text cascade extras (this engine's canonical web-page extraction;
# not in gensim, which only ships the wiki-markup cascade).
RE_HTML_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
RE_SCRIPT_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE
)


def to_unicode(text, encoding="utf8", errors="strict") -> str:
    """bytes → str passthrough (gensim/utils.py:316-368 ``any2unicode``)."""
    if isinstance(text, str):
        return text
    return str(text, encoding, errors=errors)


def deaccent(text) -> str:
    """NFD-normalize, drop combining marks (category Mn), NFC-normalize."""
    text = to_unicode(text)
    norm = unicodedata.normalize("NFD", text)
    stripped = "".join(ch for ch in norm if unicodedata.category(ch) != "Mn")
    return unicodedata.normalize("NFC", stripped)


def _entity_repl(match: re.Match) -> str:
    try:
        body = match.group(3)
        if match.group(1) == "#":
            codepoint = int(body, 16) if match.group(2) in ("x", "X") else int(body)
            return chr(codepoint)
        codepoint = name2codepoint.get(body)
        return chr(codepoint) if codepoint else match.group()
    except Exception:
        return match.group()


def decode_htmlentities(text: str) -> str:
    """Decode named/decimal/hex HTML entities; malformed entities pass through."""
    return RE_HTML_ENTITY.sub(_entity_repl, text)


def simple_tokenize(text: str):
    """Yield maximal runs of word characters that don't start with a digit."""
    for match in PAT_ALPHABETIC.finditer(text):
        yield match.group()


def tokenize(text, lowercase=False, deacc=False, encoding="utf8", errors="strict"):
    """unicode → optional lower → optional deaccent → simple_tokenize."""
    text = to_unicode(text, encoding, errors=errors)
    if lowercase:
        text = text.lower()
    if deacc:
        text = deaccent(text)
    return simple_tokenize(text)


def simple_preprocess(doc, deacc=False, min_len=2, max_len=15) -> list[str]:
    """Lowercased tokens with length in [min_len, max_len], no '_'-prefixed."""
    return [
        token
        for token in tokenize(doc, lowercase=True, deacc=deacc, errors="ignore")
        if min_len <= len(token) <= max_len and not token.startswith("_")
    ]


# --- gensim/parsing/preprocessing.py filter chain ---------------------------


def strip_tags(s: str) -> str:
    return RE_TAGS.sub("", to_unicode(s))


def strip_punctuation(s: str) -> str:
    return RE_PUNCT.sub(" ", to_unicode(s))


def strip_numeric(s: str) -> str:
    return RE_NUMERIC.sub("", to_unicode(s))


def strip_non_alphanum(s: str) -> str:
    return RE_NONALPHA.sub(" ", to_unicode(s))


def split_alphanum(s: str) -> str:
    s = RE_AL_NUM.sub(r"\1 \2", to_unicode(s))
    return RE_NUM_AL.sub(r"\1 \2", s)


def strip_multiple_whitespaces(s: str) -> str:
    return RE_WHITESPACE.sub(" ", to_unicode(s))


def remove_short_tokens(tokens, minsize=3) -> list[str]:
    return [token for token in tokens if len(token) >= minsize]


def strip_short(s, minsize=3) -> str:
    return " ".join(remove_short_tokens(to_unicode(s).split(), minsize))


def remove_stopword_tokens(tokens, stopwords=None) -> list[str]:
    if stopwords is None:
        stopwords = STOPWORDS
    return [token for token in tokens if token not in stopwords]


def remove_stopwords(s, stopwords=None) -> str:
    return " ".join(remove_stopword_tokens(to_unicode(s).split(), stopwords))


def stem_text(text) -> str:
    """Porter-stem each whitespace-separated word (stemmer lowercases)."""
    return " ".join(porter_stem(word) for word in to_unicode(text).split())


DEFAULT_FILTERS = [
    lambda s: s.lower(),
    strip_tags,
    strip_punctuation,
    strip_multiple_whitespaces,
    strip_numeric,
    remove_stopwords,
    strip_short,
    stem_text,
]


def preprocess_string(s, filters=None) -> list[str]:
    """Apply the filter chain then split on whitespace."""
    s = to_unicode(s)
    for f in DEFAULT_FILTERS if filters is None else filters:
        s = f(s)
    return s.split()


# --- html → text extraction (the per-url byte-identity invariant) -----------


def extract_html_text(html) -> str:
    """Canonical web-page extraction cascade: utf-8 decode → drop comments and
    script/style blocks → strip tags → decode entities → collapse whitespace.

    This single function defines the per-url extraction invariant; the Spark
    path runs exactly this code per Arrow batch, so extracted text is
    byte-identical between a driver-local call and the distributed job.
    """
    text = to_unicode(html, errors="ignore")
    text = RE_HTML_COMMENT.sub("", text)
    text = RE_SCRIPT_STYLE.sub("", text)
    text = strip_tags(text)
    text = decode_htmlentities(text)
    text = strip_multiple_whitespaces(text)
    return text.strip()
