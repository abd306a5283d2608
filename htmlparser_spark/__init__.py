"""htmlparser_spark — PySpark-native main-content extraction engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference HTML parser (mylogin/htmlparser): an HTML5-style tokenizer +
DOM builder + CSS-selector query engine + text/attribute extraction,
packaged as vectorized Arrow-batch kernels over DataFrames of
multi-turn transcripts, with salted repartitioning, stable turn
ordering, checkpoint lineage + idempotent resume, and a suite of
training-data pipeline operators (dedup, similarity search, text
stats, multimodal plumbing).

Layout:
    htmldom/    pure-Python parse/select/serialize kernel (no Spark)
    kernel.py   Arrow-batch kernels + Spark schemas
    operators/  extraction pipeline, selectors-as-DataFrames, dedup, ANN
    sources/    transcripts synthesizers (test-scale + distributed)
    functions/  column-level helpers (JVM-side expressions)
    streaming/  Structured Streaming variant of the extraction pipeline
    plans/      plan-inspection helpers (pushdown/codegen assertions)
"""

__version__ = "0.1.0"
