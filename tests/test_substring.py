"""Content-defined chunking + repeated-substring audit: partition
exactness, alignment robustness (the property fixed-stride windows
lack), cap/ordering determinism, plan hygiene."""

from pyspark.sql import functions as F

from htmlparser_spark.operators.substring import (cdc_chunks,
                                                  cdc_chunks_expr,
                                                  repeated_chunks)
from test_plans import assert_no_python_row_udf  # noqa: E402

TAIL = (" Cookie Policy: we use cookies to improve your experience;"
        " accept all cookies to continue reading our privacy terms.")


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_partition_text_exactly(spark):
    rows = [(1, "alpha beta gamma" * 20), (2, "x"), (3, ""),
            (4, "1234567"), (5, "12345678"), (6, "émoji 😀 text" * 10)]
    df = _df(spark, rows)
    bad = (df.select("text",
                     F.array_join(cdc_chunks_expr("text"), "").alias("r"))
           .filter(F.col("r") != F.col("text")).count())
    assert bad == 0
    got = {r.doc_id: r for r in
           df.select("doc_id",
                     F.size(cdc_chunks_expr("text")).alias("nc"))
           .collect()}
    assert got[3].nc == 0            # empty text -> no chunks
    assert got[4].nc == 1            # shorter than the window: 1 chunk


def test_repeated_chunks_alignment_robust(spark):
    """The same boilerplate tail at three DIFFERENT offsets must
    surface as shared interior chunks — the whole point of CDC over
    fixed-stride windows."""
    rows = [(1, "short pre" + TAIL),
            (2, "a considerably longer and different preamble " * 3
             + TAIL),
            (3, "third unrelated beginning" + TAIL),
            (4, "nothing shared in this document at all whatsoever")]
    rep = repeated_chunks(_df(spark, rows), min_docs=3, min_len=12)
    rows_out = rep.collect()
    assert len(rows_out) >= 1
    for r in rows_out:
        assert r.chunk in TAIL           # interior chunks of the tail
        assert r.n_docs == 3 and sorted(r.doc_ids) == [1, 2, 3]


def test_repeated_chunks_counts_and_cap(spark):
    # one shared chunk carried by 8 docs, in-doc repetition in one
    base = "zz" + TAIL + TAIL            # tail twice in doc 0
    rows = [(0, base)] + [(i, f"prefix-{i} distinct" + TAIL)
                          for i in range(1, 8)]
    rep = {r.chunk: r for r in
           repeated_chunks(_df(spark, rows), min_docs=4, min_len=12,
                           max_ids=3).collect()}
    assert rep, "expected shared chunks"
    for r in rep.values():
        assert r.n_docs == 8
        assert r.n_occ >= r.n_docs      # doc 0 contributes twice
        assert r.doc_ids == [0, 1, 2]   # capped to the 3 smallest
    assert any(r.n_occ == 9 for r in rep.values())


def test_substring_ops_plan_hygiene(spark):
    df = _df(spark, [(1, "a" * 100)])
    assert_no_python_row_udf(cdc_chunks(df))
    assert "Exchange" not in (cdc_chunks(df)._jdf.queryExecution()
                              .executedPlan().toString())
    out = repeated_chunks(df, min_docs=1)
    assert_no_python_row_udf(out)
    # the ids cap is the spillable row_number shape (index.py pattern)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in plan


def test_dup_chunk_stats_fraction(spark):
    from htmlparser_spark.operators.substring import dup_chunk_stats
    rows = [(1, "unique preamble one" + TAIL),
            (2, "very different other beginning two" + TAIL),
            (3, "totally fresh content with nothing shared anywhere"),
            (4, "")]
    got = {r.doc_id: r for r in
           dup_chunk_stats(_df(spark, rows), min_docs=2).collect()}
    assert len(got) == 4                  # empty doc restored with zeros
    assert got[4] and (got[4].n_chunks, got[4].dup_char_ppm) == (0, 0)
    assert got[3].n_dup_chunks == 0 and got[3].dup_char_ppm == 0
    # tail carriers share the tail's interior chunks
    for d in (1, 2):
        assert got[d].n_dup_chunks >= 1
        assert 0 < got[d].dup_char_ppm < 1000000
    # doc 1 has the shorter unique prefix -> higher duplicated fraction
    assert got[1].dup_char_ppm > got[2].dup_char_ppm
