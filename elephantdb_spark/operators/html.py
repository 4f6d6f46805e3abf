"""HTML main-text extraction for crawl curation — stdlib html.parser,
no external parsing libraries.

The first stage of every web-crawl training pipeline: turn raw HTML into
text the downstream curation operators (normalize → gopher → dedup)
consume. Semantics are deliberately simple and DETERMINISTIC so the
whole stage is testable against a SQL oracle (q96):

* content of non-text elements (``script``/``style``/``template``/
  ``noscript``/``iframe``/``svg``/``head``-except-``title``) is dropped;
* block-level boundaries (``p``/``div``/``h1``-``h6``/``li``/``br``/
  ``tr``/``section``/``article``/``blockquote``/``pre``) split text
  chunks; the result joins non-empty chunks with a single newline;
* within a chunk, whitespace runs collapse to one space and ends are
  trimmed;
* HTML entities are unescaped by the parser (``convert_charrefs``);
* the first ``<title>`` is extracted separately.

``html.parser`` is the lenient stdlib tokenizer, so hostile/broken
markup degrades to best-effort text instead of raising — the property a
100 TB crawl needs (fuzz-tested). The Spark surface is an Arrow-batched
``mapInPandas`` stage: rowwise, zero shuffle, pipelines into the scan.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame

#: elements whose text content is dropped entirely
SKIP_ELEMENTS = frozenset(
    {"script", "style", "template", "noscript", "iframe", "svg", "head"}
)

#: elements that open/close a text chunk
BLOCK_ELEMENTS = frozenset(
    {
        "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "br", "tr",
        "table", "ul", "ol", "section", "article", "blockquote", "pre",
        "header", "footer", "nav", "body", "html",
    }
)


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._cur: list[str] = []
        # head is tracked separately from the other skip elements: its
        # content is dropped too, but a <title> inside head (the normal
        # place) IS the page title, while a <title> inside svg/noscript/
        # iframe is a tooltip/fallback and must NOT shadow the real one
        self._head_depth = 0
        self._skip_depth = 0
        self._in_title = False
        self.title: str | None = None
        self._title_parts: list[str] = []

    def _flush(self) -> None:
        text = " ".join("".join(self._cur).split())
        self._cur = []
        if text:
            self.chunks.append(text)

    def _finalize_title(self) -> None:
        if self._in_title:
            if self.title is None:
                self.title = " ".join("".join(self._title_parts).split())
            self._in_title = False
            self._title_parts = []

    def handle_starttag(self, tag, attrs):
        # a <title> legally contains only text: ANY tag event closes a
        # pending title, so broken markup (unclosed <title>) cannot
        # swallow the rest of the document into the title buffer
        if tag != "title":
            self._finalize_title()
        if tag == "title":
            if self._skip_depth == 0 and not self._in_title:
                self._in_title = True
            return
        if tag == "head":
            self._head_depth += 1
            return
        if tag in SKIP_ELEMENTS:
            self._skip_depth += 1
            return
        if tag in BLOCK_ELEMENTS:
            # spec-legal implied </head>: head ends at <body> (or any
            # body-content block) — crawled pages omit </head> routinely,
            # and without this the whole body would count as head content
            self._head_depth = 0
            self._flush()

    def handle_endtag(self, tag):
        self._finalize_title()
        if tag == "title":
            return
        if tag == "head":
            self._head_depth = max(0, self._head_depth - 1)
            return
        if tag in SKIP_ELEMENTS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in BLOCK_ELEMENTS:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        self._finalize_title()
        if tag in BLOCK_ELEMENTS:
            self._flush()

    def handle_data(self, data):
        if self._in_title:
            self._title_parts.append(data)
        elif self._skip_depth == 0 and self._head_depth == 0:
            self._cur.append(data)


def html_to_text(payload: str) -> tuple[str | None, str]:
    """(title, text) from an HTML string — lenient, never raises on
    malformed markup (stdlib tokenizer semantics)."""
    p = _TextExtractor()
    try:
        p.feed(payload or "")
        p.close()
    except Exception:  # the stdlib parser is lenient; belt and braces
        pass
    p._finalize_title()  # EOF inside an unclosed <title>
    p._flush()
    return p.title, "\n".join(p.chunks)


def extract_html_text(
    df: DataFrame,
    id_col: str,
    html_col: str,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """HTML → (id, title, text[, *passthrough]) as an Arrow-batched
    ``mapInPandas`` stage: rowwise, zero shuffle — the crawl-ingest front
    of the curation pipeline (compose with ``curation.normalize_text`` /
    ``gopher_filter`` downstream). NULL html yields (NULL title, '').

    ``passthrough`` carries extra columns (e.g. the record URI) through
    the stage verbatim — the alternative, joining them back on id,
    recomputes the upstream python stages once per join branch."""
    import pandas as pd

    reserved = {"id", "title", "text"}
    clash = reserved.intersection(passthrough)
    if clash:
        raise ValueError(
            f"passthrough columns {sorted(clash)} collide with the fixed "
            "output fields (id, title, text) — alias them first"
        )
    cols = df.select(id_col, html_col, *passthrough)
    dtypes = dict(df.dtypes)
    # the id field's type follows id_col (a crawl's string doc ids must
    # not hit an opaque Arrow long-cast failure at task runtime)
    schema = f"id {dtypes[id_col]}, title string, text string" + "".join(
        f", `{c}` {dtypes[c]}" for c in passthrough  # backticks: odd names
    )

    def run(batches):
        for pdf in batches:
            titles, texts = [], []
            for payload in pdf[html_col]:
                title, text = html_to_text(payload)
                titles.append(title)
                texts.append(text)
            out = {"id": pdf[id_col], "title": titles, "text": texts}
            for c in passthrough:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, schema)
