"""HTML → text extraction (functions/html.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bdqc_spark.functions.html import extract_html_text, extract_text, html_escape_col

PAGE = """<!DOCTYPE html><html><head><title>My &amp; Page</title>
<style>body { color: red }</style><script>var x = "<p>evil</p>";</script></head>
<body><nav><a href="/">Home</a> <a href="/about">About</a></nav>
<header><h1>Site Banner</h1></header>
<main><p>First paragraph with &lt;angle&gt; brackets &amp; entity.</p>
<p>Second paragraph, plain.</p>
<div>Menu: <a href="1">one</a> <a href="2">two</a> <a href="3">three</a></div>
</main><footer>Copyright 2020</footer></body></html>"""


def test_extractor_semantics():
    r = extract_text(PAGE)
    assert r["extracted_text"] == (
        "First paragraph with <angle> brackets & entity.\n"
        "Second paragraph, plain."
    )
    assert r["title"] == "My & Page"
    # nav + header + footer + link-dense menu div all dropped
    assert r["n_dropped_blocks"] == 4
    assert r["n_blocks"] == 6
    # script/style content never leaks
    assert "evil" not in r["extracted_text"] and "color" not in r["extracted_text"]


def test_malformed_and_edge_inputs():
    assert extract_text("<p>unclosed <b>bold <p>next")["extracted_text"] == (
        "unclosed bold\nnext"
    )
    assert extract_text("")["extracted_text"] == ""
    assert extract_text("just < text & stuff")["extracted_text"].startswith("just")
    # deeply nested boilerplate: everything inside nav stays dropped
    r = extract_text("<nav><div><p>menu item</p></div></nav><p>real</p>")
    assert r["extracted_text"] == "real"


def test_link_density_threshold():
    dense = "<div><a href=1>aaaa</a> <a href=2>bbbb</a> x</div>"
    sparse = "<div>A long sentence with <a href=1>one link</a> inside lots of prose text.</div>"
    assert extract_text(dense)["extracted_text"] == ""
    assert "one link" in extract_text(sparse)["extracted_text"]
    # threshold is a parameter
    assert extract_text(dense, max_link_density=0.95)["extracted_text"] != ""


def test_spark_wrap_roundtrip(spark):
    """The registry query's contract: in-plan escape + wrap, extractor
    inverts exactly (including &/</> in the source text)."""
    rows = [
        (1, "plain body text"),
        (2, "tricky < angle & amp > chars"),
        (3, "unicode: naïve café — ok"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    page = F.concat(
        F.lit("<html><head><script>junk()</script></head><body><nav>"
              "<a href=1>x</a></nav><main><p>"),
        html_escape_col(F.col("text")),
        F.lit("</p></main><footer>foot</footer></body></html>"),
    )
    out = extract_html_text(d.select("doc_id", page.alias("html")), "html")
    got = {r.doc_id: r.extracted_text for r in out.collect()}
    assert got == {i: t for i, t in rows}
    # null html degrades, not crashes
    bad = spark.createDataFrame([(9, None)], "doc_id int, html string")
    r = extract_html_text(bad, "html").first()
    assert r.extracted_text is None and r.n_blocks == 0
