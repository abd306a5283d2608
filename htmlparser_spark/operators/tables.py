"""Structured table extraction: HTML ``<table>`` → per-cell rows.

Spark surface over htmldom/tables.py — the layout-parse stage of the
north rule's extraction tier. One map-only Arrow stage over
(key columns, html); the per-cell explosion happens Python-side
INSIDE the stage (same rationale as content_blocks: cell arrays never
cross the Arrow boundary as nested payloads), so the operator
composes with the pipeline's checkpoint/resume contract like the
parse kernel and adds no shuffle at any corpus size.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..htmldom.parse import parse
from ..htmldom.tables import extract_tables

__all__ = ["extract_table_cells"]

_CELL_FIELDS = [
    StructField("table_idx", IntegerType(), False),
    StructField("row_idx", IntegerType(), False),
    StructField("col_idx", IntegerType(), False),
    StructField("is_header", BooleanType(), False),
    StructField("cell_text", StringType(), False),
]


def extract_table_cells(df: DataFrame,
                        key_cols: Tuple[str, ...] = ("doc_id",),
                        text_col: str = "text") -> DataFrame:
    """One output row per table cell: (key_cols…, table_idx, row_idx,
    col_idx, is_header, cell_text) in document order. Documents
    without tables contribute no rows; NULL html contributes no rows.
    """
    key_fields = [f for f in df.schema.fields if f.name in key_cols]
    schema = StructType(key_fields + _CELL_FIELDS)
    keys = list(key_cols)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tup in pdf[keys + [text_col]].itertuples(index=False):
                *kv, s = tup
                if s is None:
                    continue
                for t_i, r_i, c_i, hdr, txt in extract_tables(parse(s)):
                    rows.append((*kv, t_i, r_i, c_i, hdr, txt))
            out = pd.DataFrame(
                rows, columns=keys + ["table_idx", "row_idx", "col_idx",
                                      "is_header", "cell_text"])
            out = out.astype({"table_idx": "int32", "row_idx": "int32",
                              "col_idx": "int32", "is_header": "bool"})
            yield out

    return df.select(*keys, text_col).mapInPandas(fn, schema=schema)
