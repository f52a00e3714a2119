"""HTML → markdown-ish text column transform (SURVEY §2.9 X1).

The reference maps ``html2text`` over the Opralog ``additional_comment``
column during ingestion (reference: elt-pipelines/facility_ops/ingest/
accelerator/opralogweb/opralogweb.py:81-88). That library isn't in this
container, so the converter is a stdlib ``html.parser`` implementation
covering the constructs logbook HTML actually uses (paragraphs, breaks,
lists, bold/italic, links); exposed as an Arrow-batched ``pandas_udf`` so
conversion is vectorized per batch, never row-at-a-time Python.
"""

from __future__ import annotations

import html
import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_BLOCK_TAGS = {"p", "div", "br", "tr", "table", "ul", "ol", "h1", "h2", "h3", "h4"}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._href: str | None = None
        self._link_text: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")
        if tag == "li":
            self.parts.append("\n* ")
        elif tag in ("b", "strong"):
            self.parts.append("**")
        elif tag in ("i", "em"):
            self.parts.append("*")
        elif tag == "a":
            self._href = dict(attrs).get("href")
            self._link_text = []

    def handle_endtag(self, tag):
        if tag == "br":  # void element: <br/> fires start+end — emit once
            return
        if tag in ("b", "strong"):
            self.parts.append("**")
        elif tag in ("i", "em"):
            self.parts.append("*")
        elif tag == "a":
            text = "".join(self._link_text).strip()
            if self._href and text:
                self.parts.append(f"[{text}]({self._href})")
            elif text:
                self.parts.append(text)
            self._href = None
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if self._href is not None:
            self._link_text.append(data)
        else:
            self.parts.append(data)


def html_to_markdown(text: str | None) -> str | None:
    if text is None:
        return None
    parser = _TextExtractor()
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        return html.unescape(re.sub(r"<[^>]+>", " ", text)).strip()
    out = "".join(parser.parts)
    out = re.sub(r"[ \t]+", " ", out)
    out = re.sub(r" ?\n ?", "\n", out)
    out = re.sub(r"\n{2,}", "\n\n", out)
    return out.strip()


def html_to_markdown_col(col: Column | str) -> Column:
    """Arrow-batched column transform. The pandas_udf is built lazily —
    pyspark 4 resolves the return type against the active session, so the
    decorator can't run at import time."""
    from pyspark.sql.functions import col as _col

    @pandas_udf("string")
    def _udf(series: pd.Series) -> pd.Series:
        return series.map(html_to_markdown)

    return _udf(_col(col) if isinstance(col, str) else col)
