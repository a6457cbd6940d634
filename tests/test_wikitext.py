"""Wiki-markup cascade (wikicorpus.py semantics) — behavior goldens."""

from gensim_spark.functions import wikitext as W


def test_remove_template_nested():
    assert W.remove_template("a {{tpl {{inner}} x}} b") == "a  b"
    assert W.remove_template("{{a}}{{b}}c") == "c"
    assert W.remove_template("plain") == "plain"
    # unclosed template drops the tail (reference scan semantics)
    assert W.remove_template("keep {{oops") == "keep "


def test_remove_file_keeps_caption():
    s = "x\n[[File:Pic.jpg|thumb|A caption]] y"
    out = W.remove_file(s)
    assert "A caption" in out and "Pic.jpg" not in out


def test_filter_wiki_cascade():
    raw = (
        "'''Title''' is a {{infobox|a=1}} thing.<ref>cite</ref>\n"
        "<!-- hidden -->See [[target|description]] and [[Plainlink]].\n"
        "[http://example.org ext desc]\n"
        "[[Category:Stuff]]\n"
        "<math>x^2</math>here"
    )
    out = W.filter_wiki(raw)
    assert "infobox" not in out
    assert "cite" not in out
    assert "hidden" not in out
    assert "description" in out and "target" not in out
    assert "Plainlink" in out  # promoted to plain text
    assert "ext desc" in out and "example.org" not in out
    assert "Category" not in out
    assert "here" in out and "x^2" not in out
    assert "'''Title'''" in out  # bold markup is NOT stripped by the cascade


def test_entities_decoded_before_markup():
    assert "\xa0" in W.filter_wiki("a&nbsp;b")


def test_wiki_tokenize_rules():
    toks = W.wiki_tokenize("The Quick _hidden x " + "y" * 20 + " brown")
    assert toks == ["the", "quick", "brown"]


def test_wiki_articles_pipeline(spark):
    rows = [
        (0, "Good Article", "word " * 60),
        (1, "Talk:Ignored", "word " * 60),
        (2, "Short", "too short article"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string, markup string")
    out = W.wiki_articles_to_tokens(df).collect()
    assert [r["doc_id"] for r in out] == [0]
    assert len(out[0]["tokens"]) == 60


def test_read_wiki_dump(spark, tmp_path):
    xml = """<mediawiki>
  <siteinfo><sitename>Test</sitename></siteinfo>
  <page>
    <title>Article One</title>
    <revision><text bytes="120">'''One''' is a {{num}} article with """ + "word " * 60 + """</text></revision>
  </page>
  <page>
    <title>Talk:Ignored</title>
    <revision><text>chatter """ + "word " * 60 + """</text></revision>
  </page>
  <page>
    <title>Two</title>
    <revision><text>short stub</text></revision>
  </page>
</mediawiki>"""
    f = tmp_path / "dump.xml"
    f.write_text(xml)
    from gensim_spark.functions import wikitext as W

    pages = {r["title"]: r["markup"] for r in
             W.read_wiki_dump(spark, str(f)).collect()}
    assert set(pages) == {"Article One", "Talk:Ignored", "Two"}
    assert "{{num}}" in pages["Article One"]
    arts = W.wiki_corpus(spark, str(f)).collect()
    assert [r["title"] for r in arts] == ["Article One"]
    toks = arts[0]["tokens"]
    assert "num" not in toks and toks.count("word") == 60


def test_find_interlinks_semantics():
    raw = ("'''Alpha''' links to [[Beta]] and [[Gamma|shown text]] "
           "and [[File:pic.jpg|thumb|caption]] stays out.")
    links = W.find_interlinks(raw)
    assert ("Beta", "Beta") in links
    assert ("Gamma", "shown text") in links
    assert all("File:" not in a for a, _ in links)


def test_segment_sections_lead_and_headings():
    text = ("Lead paragraph text here.\n"
            "== History ==\n"
            "Old stuff with [[Link]].\n"
            "== Uses ==\n"
            "Some uses.\n")
    sections = W.segment_sections(text)
    assert [h for h, _ in sections] == ["Introduction", "History", "Uses"]
    assert "Lead paragraph" in sections[0][1]
    assert "Link" in sections[1][1] and "[[" not in sections[1][1]


def test_segment_wiki_articles_filters_and_output(spark, tmp_path):
    """segment_wiki parity: redirects, ignored namespaces and short stubs
    dropped; JSONL rows carry title/section_titles/section_texts/interlinks
    (segment_wiki.py:109-168,303-345)."""
    body = ("Lead about things, linking [[Other Article]] and "
            "[[Target|display]]. " + "pad " * 60 + "\n"
            "== Details ==\n" + "more detail text " * 20)
    rows = [
        (0, "Keep Me", body),
        (1, "Redirect Page", "#REDIRECT [[Keep Me]]"),
        (2, "Template:Infobox", body),
        (3, "Stub", "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string, markup string")
    out = W.segment_wiki_articles(df, include_interlinks=True).collect()
    assert [r["title"] for r in out] == ["Keep Me"]
    r = out[0]
    assert r["section_titles"] == ["Introduction", "Details"]
    assert len(r["section_texts"]) == 2
    assert "[[" not in r["section_texts"][0]
    assert r["interlinks"]["Other Article"] == "Other Article"
    assert r["interlinks"]["Target"] == "display"
    # end-to-end JSONL write from a dump file
    xml = ("<mediawiki><page><title>Keep Me</title><revision><text>"
           + body.replace("[[", "[[").replace("&", "&amp;")
           + "</text></revision></page>"
           "<page><title>Redirect Page</title><revision><text>"
           "#REDIRECT [[Keep Me]]</text></revision></page></mediawiki>")
    dump = tmp_path / "dump.xml"
    dump.write_text(xml)
    out_dir = str(tmp_path / "segmented")
    W.segment_wiki_to_jsonl(spark, str(dump), out_dir,
                            include_interlinks=True)
    import json as _json
    import os

    recs = []
    for name in os.listdir(out_dir):
        if name.startswith("part-"):
            with open(os.path.join(out_dir, name)) as f:
                recs += [_json.loads(ln) for ln in f if ln.strip()]
    assert [r["title"] for r in recs] == ["Keep Me"]
    assert recs[0]["section_titles"][0] == "Introduction"
