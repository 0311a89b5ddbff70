"""HTML → text extraction with boilerplate removal.

Web-scale text corpora start as HTML; the canonical first pipeline
stage (CCNet/trafilatura territory) strips markup and drops
boilerplate before any quality filter sees a character. This is a
from-scratch extractor on stdlib ``html.parser`` — no lxml in the
sandbox, and none needed for the rule set that matters:

- ``script``/``style``/``noscript``/``template``/``svg``/``head``
  subtrees contribute NO text (their raw content must never leak into
  a training corpus);
- ``nav``/``header``/``footer``/``aside`` subtrees are boilerplate
  containers — their text is counted (``n_dropped_blocks``) but
  excluded;
- block-level boundaries (``p/div/h1-6/li/tr/section/article/
  blockquote/pre/br``) split the output into blocks, joined with
  newlines; inline markup (``a/b/i/span/em/strong/code``) is
  transparent;
- entity references decode (``&amp;`` → ``&``, numeric refs too);
- per-block link density (chars inside ``<a>`` / block chars) is
  measured and blocks above ``max_link_density`` are dropped — the
  classic nav-menu heuristic for boilerplate that isn't inside a
  labeled container;
- malformed input (unclosed tags, stray ``<``) degrades, never
  raises — html.parser is a forgiving stream parser by design.

Execution shape: one ``mapInPandas`` pass (the parse is per-document
CPU inside an Arrow batch; no shuffle, no driver involvement). The
registry query wraps each document in a deterministic page template
(escaped in-plan with Catalyst ``replace``) and the extractor must
invert it EXACTLY — the DuckDB oracle for `doc_html_extract` is the
identity on ``documents.text``, which pins markup stripping, entity
decoding, boilerplate-container drops and whitespace fidelity in one
equality.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SKIP = {"script", "style", "noscript", "template", "svg", "head"}  # title exempt
_BOILER = {"nav", "header", "footer", "aside"}
_BLOCK = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr",
    "section", "article", "blockquote", "pre", "br", "table", "ul",
    "ol", "main", "body",
}
_VOID = {"br", "img", "hr", "meta", "link", "input"}

HTML_FIELDS = (
    "extracted_text string, title string, n_blocks int, "
    "n_dropped_blocks int, link_chars int, text_chars int"
)


class _Extractor(HTMLParser):
    def __init__(self, max_link_density: float):
        super().__init__(convert_charrefs=True)
        self.max_link_density = max_link_density
        self.skip_depth = 0
        self.boiler_depth = 0
        self.link_depth = 0
        self.in_title = False
        self.title_parts: list[str] = []
        self.blocks: list[tuple[str, int, bool]] = []  # (text, link_chars, boiler)
        self._cur: list[str] = []
        self._cur_link = 0
        self._cur_boiler = False

    def _flush(self) -> None:
        text = "".join(self._cur)
        if text.strip():
            self.blocks.append((text.strip(), self._cur_link, self._cur_boiler))
        self._cur = []
        self._cur_link = 0
        self._cur_boiler = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP:
            self.skip_depth += 1
            return
        if tag == "title":
            self.in_title = True
            return
        if tag in _BOILER:
            self._flush()
            self.boiler_depth += 1
            return
        if tag == "a":
            self.link_depth += 1
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP:
            self.skip_depth = max(self.skip_depth - 1, 0)
            return
        if tag == "title":
            self.in_title = False
            return
        if tag in _BOILER:
            self._flush()
            self.boiler_depth = max(self.boiler_depth - 1, 0)
            return
        if tag == "a":
            self.link_depth = max(self.link_depth - 1, 0)
        if tag in _BLOCK:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self.in_title:  # before the skip check: <title> lives in <head>
            self.title_parts.append(data)
            return
        if self.skip_depth:
            return
        if not data:
            return
        self._cur.append(data)
        if self.link_depth:
            self._cur_link += len(data)
        if self.boiler_depth:
            self._cur_boiler = True


def extract_text(html: str, max_link_density: float = 0.5) -> dict:
    """Extract main text from one HTML document. Never raises on
    malformed markup."""
    p = _Extractor(max_link_density)
    try:
        p.feed(html or "")
        p.close()
    except Exception:  # html.parser is forgiving; belt and braces
        pass
    p._flush()
    kept: list[str] = []
    dropped = 0
    link_chars = 0
    text_chars = 0
    for text, links, boiler in p.blocks:
        text_chars += len(text)
        link_chars += links
        density = links / len(text) if text else 0.0
        if boiler or density > max_link_density:
            dropped += 1
            continue
        kept.append(text)
    return {
        "extracted_text": "\n".join(kept),
        "title": "".join(p.title_parts).strip() or None,
        "n_blocks": len(p.blocks),
        "n_dropped_blocks": dropped,
        "link_chars": link_chars,
        "text_chars": text_chars,
    }


def extract_html_text(
    df: DataFrame, html_col: str = "html", max_link_density: float = 0.5
) -> DataFrame:
    """df(html, …) → per-doc extraction; passthrough columns kept, the
    raw HTML column dropped (same never-shuffle-payload contract as
    the audio ops)."""
    keep = [f for f in df.schema.fieldNames() if f != html_col]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name != html_col
    )

    out_cols = keep + [
        "extracted_text", "title", "n_blocks", "n_dropped_blocks",
        "link_chars", "text_chars",
    ]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(columns=out_cols)
                continue
            rows = [
                extract_text(h, max_link_density) if isinstance(h, str) else
                {
                    "extracted_text": None, "title": None, "n_blocks": 0,
                    "n_dropped_blocks": 0, "link_chars": 0, "text_chars": 0,
                }
                for h in pdf[html_col]
            ]
            out = pd.DataFrame(rows)
            for c in keep:
                out[c] = pdf[c].to_numpy()
            yield out[out_cols]

    return df.mapInPandas(_run, f"{out_schema}, {HTML_FIELDS}")


def html_escape_col(c: Column) -> Column:
    """Catalyst-side minimal HTML escape (&, <, >) — used by the
    registry's deterministic page wrapper so the wrap happens in-plan
    and the extractor's unescape must exactly invert it."""
    return F.replace(
        F.replace(F.replace(c, F.lit("&"), F.lit("&amp;")), F.lit("<"), F.lit("&lt;")),
        F.lit(">"),
        F.lit("&gt;"),
    )
