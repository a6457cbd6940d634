"""MediaWiki markup removal — the reference's web-scale extraction cascade.

Reference semantics (gensim/corpora/wikicorpus.py):
- the 17 published filter regexes RE_P0…RE_P17 (wikicorpus.py:44-89 — regex
  constants are data) and the iterative ``remove_markup`` cascade
  (wikicorpus.py:205-265): strip language-link tail, remove nested templates
  and File/Image markup, then loop ≤ 3 passes removing comments, footnotes,
  nowiki/math, tags, categories, urls (keep description), simplified links,
  table markup — stopping when a pass changes nothing.
- ``remove_template`` (wikicorpus.py:268-305): nested ``{{ }}`` brace
  matching by a single character scan (regexes can't nest).
- ``remove_file`` (wikicorpus.py:308-334): ``[[File:…|caption]]`` replaced by
  its last-pipe caption.
- ``tokenize`` (wikicorpus.py:337-363): lowercase unicode tokens with
  2 ≤ len ≤ 15, '_'-prefixed dropped — i.e. ``simple_preprocess`` semantics.
- article filter: ≥ 50 tokens and not in an ignored namespace
  (wikicorpus.py:534-726, ARTICLE_MIN_WORDS wikicorpus.py:93).

These run inside ``mapInPandas`` (see :func:`wiki_articles_to_tokens`) — the
Python ``re`` engine produces the bytes, keeping per-article extraction
byte-identical with a driver-local call (the same invariant as
``textref.extract_html_text``).
"""

from __future__ import annotations

import re

from gensim_spark.functions.textref import (decode_htmlentities,
                                            simple_preprocess, to_unicode)

ARTICLE_MIN_WORDS = 50

RE_P0 = re.compile(r'<!--.*?-->', re.DOTALL | re.UNICODE)           # comments
RE_P1 = re.compile(r'<ref([> ].*?)(</ref>|/>)', re.DOTALL | re.UNICODE)
RE_P2 = re.compile(r'(\n\[\[[a-z][a-z][\w-]*:[^:\]]+\]\])+$', re.UNICODE)
RE_P5 = re.compile(r'\[(\w+):\/\/(.*?)(( (.*?))|())\]', re.UNICODE)
RE_P6 = re.compile(r'\[([^][]*)\|([^][]*)\]', re.DOTALL | re.UNICODE)
RE_P9 = re.compile(r'<nowiki([> ].*?)(</nowiki>|/>)', re.DOTALL | re.UNICODE)
RE_P10 = re.compile(r'<math([> ].*?)(</math>|/>)', re.DOTALL | re.UNICODE)
RE_P11 = re.compile(r'<(.*?)>', re.DOTALL | re.UNICODE)             # any tag
RE_P12 = re.compile(r'(({\|)|(\|-(?!\d))|(\|}))(.*?)(?=\n)', re.UNICODE)
RE_P13 = re.compile(
    r'(?<=(\n[ ])|(\n\n)|([ ]{2})|(.\n)|(.\t))(\||\!)([^[\]\n]*?\|)*',
    re.UNICODE,
)
RE_P14 = re.compile(r'\[\[Category:[^][]*\]\]', re.UNICODE)
RE_P15 = re.compile(r'\[\[([fF]ile:|[iI]mage)[^]]*(\]\])', re.UNICODE)
RE_P17 = re.compile(
    r'(\n.{0,4}((bgcolor)|(\d{0,1}[ ]?colspan)|(rowspan)|(style=)|(class=)|(align=)|(scope=))(.*))|'
    r'(^.{0,2}((bgcolor)|(\d{0,1}[ ]?colspan)|(rowspan)|(style=)|(class=)|(align=))(.*))',
    re.UNICODE,
)

IGNORED_NAMESPACES = [
    'Wikipedia', 'Category', 'File', 'Portal', 'Template',
    'MediaWiki', 'User', 'Help', 'Book', 'Draft', 'WikiProject',
    'Special', 'Talk',
]


def remove_template(s: str) -> str:
    """Drop nested ``{{ … }}`` templates via a brace-balance scan."""
    out = []
    keep_from = 0
    i, n = 0, len(s)
    while i < n - 1:
        if s[i] == '{' and s[i + 1] == '{':
            depth = 0
            j = i
            while j < n:
                if s[j] == '{':
                    depth += 1
                elif s[j] == '}':
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            out.append(s[keep_from:i])
            keep_from = j + 1
            i = j + 1
        else:
            i += 1
    out.append(s[keep_from:])
    return ''.join(out)


def remove_file(s: str) -> str:
    """Replace ``[[File:…|caption]]`` / ``[[Image:…]]`` by the caption (text
    after the last pipe, wikicorpus.py:308-334)."""
    for match in re.finditer(RE_P15, s):
        m = match.group(0)
        caption = m[:-2].split('|')[-1]
        s = s.replace(m, caption, 1)
    return s


def remove_markup(text: str, promote_remaining: bool = True,
                  simplify_links: bool = True) -> str:
    """The iterative cascade (wikicorpus.py:205-265): ≤ 3 passes, fixpoint."""
    text = RE_P2.sub('', text)
    text = remove_template(text)
    text = remove_file(text)
    iters = 0
    while True:
        old, iters = text, iters + 1
        text = RE_P0.sub('', text)
        text = RE_P1.sub('', text)
        text = RE_P9.sub('', text)
        text = RE_P10.sub('', text)
        text = RE_P11.sub('', text)
        text = RE_P14.sub('', text)
        text = RE_P5.sub(r'\3', text)
        if simplify_links:
            text = RE_P6.sub(r'\2', text)
        text = text.replace('!!', '\n|')
        text = text.replace('|-||', '\n|')
        text = RE_P12.sub('\n', text)
        text = text.replace('|||', '|\n|')
        text = text.replace('||', '\n|')
        text = RE_P13.sub('\n', text)
        text = RE_P17.sub('\n', text)
        text = text.replace('[]', '')
        if old == text or iters > 2:
            break
    if promote_remaining:
        text = text.replace('[', '').replace(']', '')
    return text


def filter_wiki(raw, promote_remaining: bool = True,
                simplify_links: bool = True) -> str:
    """Raw wiki markup → plain text (wikicorpus.py:184-202)."""
    text = to_unicode(raw, 'utf8', errors='ignore')
    text = decode_htmlentities(text)
    return remove_markup(text, promote_remaining, simplify_links)


def wiki_tokenize(content: str) -> list[str]:
    """wikicorpus.tokenize (wikicorpus.py:337-363): lowercase, 2 ≤ len ≤ 15,
    no '_'-prefixed — simple_preprocess semantics without deaccenting."""
    return simple_preprocess(content)


def is_ignored_title(title: str) -> bool:
    return any(title.startswith(ns + ':') for ns in IGNORED_NAMESPACES)


RE_XML_TITLE = re.compile(r"<title>(.*?)</title>", re.DOTALL)
RE_XML_TEXT = re.compile(r"<text[^>]*>(.*?)</text>", re.DOTALL)


def read_wiki_dump(spark, path: str):
    """MediaWiki XML dump → (doc_id, title, markup), fully distributed.

    The dump is split into one record per ``<page>`` by reading with
    ``lineSep='</page>'`` — each fragment parses independently (title +
    text via the page-level tags; XML entities are handled downstream by
    ``filter_wiki``'s decode_htmlentities). This replaces the reference's
    single-threaded iterparse + multiprocessing pool
    (wikicorpus.py:534-726) with input-split parallelism. For .bz2 dumps
    decompress first (bz2 is not splittable); the reference pays the same
    single-reader cost on the compressed stream.
    """
    from pyspark.sql import functions as F

    frags = spark.read.option("lineSep", "</page>").text(path)
    pages = frags.filter(F.col("value").contains("<title>"))
    rdd = pages.rdd.zipWithIndex().map(lambda ri: (ri[1], ri[0]["value"]))
    df = spark.createDataFrame(rdd, "doc_id long, fragment string")

    import pandas as pd

    def parse(it):
        for pdf in it:
            rows = []
            for doc_id, frag in zip(pdf["doc_id"], pdf["fragment"]):
                tm = RE_XML_TITLE.search(frag)
                xm = RE_XML_TEXT.search(frag)
                if tm is None or xm is None:
                    continue
                rows.append((doc_id, tm.group(1), xm.group(1)))
            yield pd.DataFrame(rows,
                               columns=["doc_id", "title", "markup"])

    return df.mapInPandas(parse, schema="doc_id long, title string, markup string")


def wiki_corpus(spark, path: str, min_words: int = ARTICLE_MIN_WORDS):
    """The WikiCorpus pipeline: dump file → filtered (doc_id, title, tokens)."""
    return wiki_articles_to_tokens(read_wiki_dump(spark, path),
                                   min_words=min_words)


# --- segment_wiki parity (gensim/scripts/segment_wiki.py:75-270) ------------

RE_P16 = re.compile(r'\[{2}(.*?)\]{2}', re.UNICODE)  # interlinks

RE_TOP_HEADING = re.compile(r"\n==[^=].*[^=]==\n")
RE_TOP_HEADING_CAPTURE = re.compile(r"\n==([^=].*[^=])==\n")
LEAD_SECTION_HEADING = "Introduction"


def find_interlinks(raw: str) -> list[tuple[str, str]]:
    """[[target|text]] links of an article (wikicorpus.py:153-181):
    filter markup keeping link syntax, collect RE_P16 matches, split target
    from display text (display defaults to the target), drop nested-bracket
    leftovers."""
    kept_links = filter_wiki(raw, promote_remaining=False,
                             simplify_links=False)
    out = []
    for match in RE_P16.findall(kept_links):
        target, _, text = match.partition('|')
        if '[' in target or ']' in target:
            continue
        out.append((target, text if text else target))
    return out


def segment_sections(text: str) -> list[tuple[str, str]]:
    """Split article markup into (heading, filtered content) at top-level
    ``== Heading ==`` lines; the lead section is titled "Introduction"
    (segment_wiki.py:231-254)."""
    if text is None:
        return []
    contents = RE_TOP_HEADING.split(text)
    headings = [LEAD_SECTION_HEADING] + RE_TOP_HEADING_CAPTURE.findall(text)
    headings = [h.strip() for h in headings]
    return list(zip(headings, [filter_wiki(c) for c in contents]))


def segment_wiki_articles(articles, min_article_character: int = 200,
                          include_interlinks: bool = False,
                          title_col: str = "title",
                          markup_col: str = "markup"):
    """(doc_id, title, markup) → segment_wiki JSONL shape: (title,
    section_titles array, section_texts array[, interlinks map]).

    Reference filters (_WikiSectionsCorpus.get_texts_with_sections,
    segment_wiki.py:303-345): ignored-namespace titles, #REDIRECT pages,
    and articles whose stripped section bodies total < min_article_character
    are dropped. One mapInPandas stage over the distributed page scan."""
    import pandas as pd

    schema = ("title string, section_titles array<string>,"
              " section_texts array<string>")
    if include_interlinks:
        schema += ", interlinks map<string,string>"

    def batches(it):
        for pdf in it:
            rows = []
            for title, markup in zip(pdf[title_col], pdf[markup_col]):
                if title and is_ignored_title(title):
                    continue
                sections = segment_sections(markup)
                if (not sections
                        or sections[0][1].lstrip().lower()
                        .startswith("#redirect")):
                    continue
                if sum(len(body.strip()) for _, body in sections) \
                        < min_article_character:
                    continue
                row = (title, [h for h, _ in sections],
                       [b for _, b in sections])
                if include_interlinks:
                    row += (dict(find_interlinks(markup)),)
                rows.append(row)
            cols = ["title", "section_titles", "section_texts"]
            if include_interlinks:
                cols.append("interlinks")
            yield pd.DataFrame(rows, columns=cols)

    return articles.mapInPandas(batches, schema=schema)


def segment_wiki_to_jsonl(spark, dump_path: str, out_path: str,
                          min_article_character: int = 200,
                          include_interlinks: bool = False) -> None:
    """Dump file → segment_wiki-style JSON-lines output (the
    segment_and_write_all_articles analogue, distributed)."""
    pages = read_wiki_dump(spark, dump_path)
    out = segment_wiki_articles(pages, min_article_character,
                                include_interlinks)
    out.write.mode("overwrite").json(out_path)


def wiki_articles_to_tokens(articles, title_col: str = "title",
                            markup_col: str = "markup",
                            min_words: int = ARTICLE_MIN_WORDS):
    """DataFrame (doc_id, title, markup) → (doc_id, title, tokens) with the
    WikiCorpus filters: ignored namespaces and < min_words dropped
    (wikicorpus.py:697-699). One mapInPandas stage — the reference's
    multiprocessing pool fan-out (wikicorpus.py:687-693) as a Spark scan."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, title, markup in zip(
                pdf["doc_id"], pdf[title_col], pdf[markup_col]
            ):
                if title and is_ignored_title(title):
                    continue
                toks = wiki_tokenize(filter_wiki(markup))
                if len(toks) < min_words:
                    continue
                rows.append((doc_id, title, toks))
            yield pd.DataFrame(rows, columns=["doc_id", "title", "tokens"])

    return articles.mapInPandas(
        batches, schema="doc_id long, title string, tokens array<string>"
    )
