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
