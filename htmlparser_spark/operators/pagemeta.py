"""Page-metadata extraction: one metadata row per document.

Spark surface over htmldom/meta.py. Crawl pipelines gate corpus
membership on these fields (robots noindex, canonical URL collapse,
language routing) before any body-text work, so the operator is
designed to run FIRST and cheap: one map-only Arrow stage over
(passthrough cols, html), no shuffle at any corpus size, composing
with the pipeline checkpoint/resume contract like the parse kernel.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from ..htmldom.meta import META_FIELDS, extract_page_meta
from ..htmldom.parse import parse

__all__ = ["extract_page_metadata"]

_META_FIELDS_SQL = [
    StructField(n, BooleanType() if n == "robots_noindex"
                else StringType(), True)
    for n in META_FIELDS
]


def extract_page_metadata(df: DataFrame, text_col: str = "text",
                          drop_text: bool = False) -> DataFrame:
    """Append the ``META_FIELDS`` columns (title, base_href,
    canonical_url, meta_description, meta_robots, robots_noindex,
    og_title, og_url, lang, charset) to every row; NULL html yields
    all-NULL fields with ``robots_noindex`` NULL too (unknown, not
    False — the caller decides the crawl policy for unparsed rows).
    ``drop_text`` removes the source HTML before the Arrow return
    transfer."""
    fields = [f for f in df.schema.fields
              if not (drop_text and f.name == text_col)]
    schema = StructType(fields + _META_FIELDS_SQL)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = dict.fromkeys(META_FIELDS)
        for pdf in batches:
            metas = [empty if s is None else extract_page_meta(parse(s))
                     for s in pdf[text_col]]
            out = (pdf.drop(columns=[text_col]) if drop_text
                   else pdf.copy())
            for name in META_FIELDS:
                out[name] = pd.Series(
                    [m[name] for m in metas], dtype="object")
            yield out

    return df.mapInPandas(fn, schema=schema)
