"""Benchmark decontamination: flag/remove training documents that
overlap an evaluation set by word-k-shingles.

The standard training-data hygiene pass (the GPT-3 appendix-C /
PaLM-style n-gram filter, public method): build the set of distinct
word n-grams occurring in the benchmark, and call a training document
contaminated when at least ``min_overlap`` of its distinct n-grams
appear in that set.

Scale shape (100 TB corpus, benchmark ≪ corpus):

- The benchmark gram set is ``distinct`` n-grams of the EVAL suite —
  10⁵..10⁷ rows in practice — and is broadcast (explicitly, below its
  configured threshold), so the corpus side never shuffles for the
  probe: explode is a flatMap, the hash-join probes a broadcast table,
  and only matching (doc_id, gram) rows — a tiny fraction — reach the
  per-doc count aggregate, which map-side combines.
- Above the threshold the join degrades to a shuffle hash join keyed
  on the gram string; pass ``hash_grams=True`` to key it on
  ``xxhash64(gram)`` instead (8-byte shuffle rows; collisions can only
  ADD spurious hits at P ≈ 2⁻⁶⁴ per gram pair — conservative in the
  removal direction, noted here because the oracle joins on the exact
  string and therefore runs with the default ``hash_grams=False``).
- The contaminated-id frame is small (hits only); the keep-side
  anti-join broadcasts it back against the corpus.

Tokenization is byte-identical to the dedup family
(``_shingle_array_expr``): Java-regex whitespace split of
lower(trim(text)), distinct k-shingles — so the DuckDB oracle
reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .caching import cache_df
from .dedup import _shingle_array_expr
from ..functions.columns import bind
from .sample import hash_u32_col

__all__ = ["benchmark_grams", "contamination_hits", "decontaminate",
           "decontaminate_spans", "bloom_gate"]

# benchmark gram sets above this row count stop being broadcast and
# fall back to a shuffle join (the 8 GB Spark broadcast hard cap is
# the real bound; this default keeps driver memory comfortable)
DEFAULT_BROADCAST_LIMIT = 50_000_000


def benchmark_grams(benchmark: DataFrame, text_col: str = "text",
                    k: int = 5) -> DataFrame:
    """Distinct word-k-shingles of the eval suite: one column ``gram``.

    Persist this once per benchmark release (it is the reusable
    index; re-deriving it per corpus batch wastes an eval-suite scan)."""
    return (benchmark
            .select(F.explode(_shingle_array_expr(text_col, k))
                    .alias("gram"))
            .distinct())


def contamination_hits(corpus: DataFrame, bench_grams: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       k: int = 5, broadcast_bench: bool = True,
                       hash_grams: bool = False) -> DataFrame:
    """(id, n_hits): distinct corpus-doc k-shingles found in the
    benchmark gram set. Docs with zero hits are absent.

    ``_shingle_array_expr`` is already per-doc distinct, so the count
    is #distinct shared grams — the contamination score n-gram
    decontamination thresholds on."""
    cg = corpus.select(
        F.col(id_col),
        F.explode(_shingle_array_expr(text_col, k)).alias("gram"))
    bg = bench_grams
    if hash_grams:
        cg = cg.select(id_col, F.xxhash64("gram").alias("gram"))
        bg = bg.select(F.xxhash64("gram").alias("gram")).distinct()
    if broadcast_bench:
        # guard the broadcast: an oversized eval-suite gram set would
        # hit Spark's 8 GB broadcast hard cap / driver OOM. Cache the
        # gram frame FIRST so the guard count and the broadcast build
        # read one materialization — without it the explode+distinct
        # runs twice, measured at ~13% of the whole query (stage
        # timing, round 5); above the limit the cached frame feeds
        # the shuffle-join fallback instead.
        bg = cache_df(bg)
        if bg.limit(DEFAULT_BROADCAST_LIMIT + 1).count() \
                <= DEFAULT_BROADCAST_LIMIT:
            bg = F.broadcast(bg)
    return (cg.join(bg, "gram")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_hits")))


_WS = "[ \\t\\n\\x0b\\f\\r]+"


def decontaminate_spans(corpus: DataFrame, benchmark: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 5, pad: int = 0,
                        broadcast_bench: bool = True) -> DataFrame:
    """SPAN-level decontamination: instead of dropping a document that
    overlaps the eval suite (``decontaminate``), surgically remove the
    matching k-gram token spans and keep the rest — the right tool
    when a long document quotes one benchmark item. Output per doc:
    (id, n_matched, n_removed, clean_text) where clean_text is the
    original-case tokens outside every matched span (whitespace
    normalized to single spaces — span removal is token surgery),
    n_matched counts matched gram positions and n_removed the tokens
    cut. ``pad`` widens every span by that many tokens on each side
    (quote-boundary slack).

    Matching tokenization is byte-identical to the dedup/decontam
    family (lower(trim(text)), the explicit Java-\\s class), so the
    whole operator is exactly SQL-replayable; a short document
    (< k tokens) forms one whole-document gram, same as
    ``_shingle_array_expr``.

    Scale shape: the corpus side explodes one row per gram POSITION
    (linear in corpus tokens — same order as the tokenize pass),
    probes the broadcast gram set, and only matches survive to a
    per-doc collect of integer start positions (bounded by the doc's
    own token count — the rebuild is per-document work by nature).
    The rebuild joins those bounded arrays back by id; document text
    never shuffles."""
    otoks = F.split(F.trim(F.col(text_col)), _WS)

    # token array lambda-bound (bind): capturing the split expression
    # in the transform lambda would re-split the whole text once per
    # gram position — O(n²) in token count on long documents
    def _positioned(ltoks):
        n = F.size(ltoks)
        count = F.greatest(n - F.lit(k - 1), F.lit(1))
        idx = F.sequence(F.lit(0), count - 1)
        return F.transform(
            idx, lambda i: F.struct(
                i.alias("s"),
                F.array_join(F.slice(ltoks, i + 1, k), " ").alias("gram")))

    positioned = bind(
        F.split(F.trim(F.lower(F.col(text_col))), _WS), _positioned)
    grams = (corpus
             .select(F.col(id_col), F.explode(positioned).alias("pg"))
             .select(id_col, F.col("pg.s").alias("s"),
                     F.col("pg.gram").alias("gram"))
             .filter(F.col("gram") != ""))
    bg = benchmark_grams(benchmark, text_col=text_col, k=k) \
        .filter(F.col("gram") != "")
    if broadcast_bench:
        bg = F.broadcast(bg)
    starts = (grams.join(bg, "gram")
              .groupBy(id_col)
              .agg(F.sort_array(F.collect_list("s")).alias("_starts")))
    j = corpus.join(starts, id_col, "left")
    st = F.coalesce(F.col("_starts"),
                    F.array().cast("array<int>"))
    in_span = (lambda jx: F.exists(
        st, lambda s: (jx >= s - pad) & (jx < s + k + pad)))
    kept = F.filter(otoks, lambda x, jx: ~in_span(jx))
    return (j.select(
        F.col(id_col),
        F.size(st).cast("long").alias("n_matched"),
        (F.size(otoks) - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text")))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  k: int = 5, min_overlap: int = 1,
                  broadcast_bench: bool = True) -> DataFrame:
    """Corpus rows whose benchmark overlap is < ``min_overlap`` grams
    (the clean keep-set), schema-preserving.

    The contaminated-id set is tiny (docs that actually hit), so the
    anti-join broadcasts it — the corpus is scanned once and never
    shuffled."""
    bg = benchmark_grams(benchmark, text_col=text_col, k=k)
    hits = (contamination_hits(corpus, bg, id_col=id_col,
                               text_col=text_col, k=k,
                               broadcast_bench=broadcast_bench)
            .filter(F.col("n_hits") >= min_overlap)
            .select(id_col))
    return corpus.join(F.broadcast(hits), id_col, "left_anti")


def bloom_gate(corpus: DataFrame, bench_grams: DataFrame,
               id_col: str = "doc_id", text_col: str = "text",
               k: int = 5, n_hashes: int = 4, m_bits: int = 65536,
               min_overlap: int = 1, salt: str = ":bf") -> DataFrame:
    """Bloom-filter contamination pre-gate → (id, n_grams,
    n_bloom_hits, n_exact_hits, bloom_flagged).

    At 100 TB the exact gram probe broadcasts the whole benchmark
    gram SET (10⁵..10⁷ strings); this gate broadcasts only the
    filter's OCCUPIED BIT POSITIONS — at most ``m_bits`` ints however
    large the eval suite grows — and a gram passes when all
    ``n_hashes`` of its md5 positions are occupied. Bloom one-sided
    error: every exact hit passes (no false negatives, so the gate is
    safe as a PRE-filter — only flagged docs ever reach the exact
    probe), false positives only add docs to the expensive side.
    n_exact_hits rides along here as the false-positive audit; the
    production pipeline computes it only for flagged docs.

    All integer md5 arithmetic (portable-hash replica), so the DuckDB
    oracle reproduces the filter, the probe, and both counts exactly.
    """
    def _positions(frame: DataFrame, col: str) -> DataFrame:
        return frame.select(col, F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     (hash_u32_col(F.col(col), f"{salt}{d}")
                      % m_bits).alias("pos"))
            for d in range(n_hashes)])).alias("_dp")) \
            .select(col, F.col("_dp.d").alias("d"),
                    F.col("_dp.pos").alias("pos"))

    # the filter: occupied positions, ≤ m_bits rows whatever the
    # benchmark size — the bounded broadcast this gate exists for
    occupied = (_positions(bench_grams, "gram")
                .select("pos").distinct())
    # fan the CPU-bound shingle stage out explicitly (same rationale
    # as minhash_candidates: a 1-file parquet input would otherwise
    # pin it to one task)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    src = corpus.select(F.col(id_col), F.col(text_col))
    if par:
        src = src.repartition(par, F.col(id_col))
    # ONE shingle explode feeds everything (cached: the probe's
    # distinct and the final aggregate both read it; every doc has
    # ≥1 shingle, so n_grams = its per-doc row count)
    cg = cache_df(src.select(
        F.col(id_col),
        F.explode(_shingle_array_expr(text_col, k)).alias("gram")))
    passing = (_positions(cg.select("gram").distinct(), "gram")
               .join(F.broadcast(occupied), "pos")
               .groupBy("gram").agg(F.count("*").alias("_nd"))
               .filter(F.col("_nd") == n_hashes)
               .select("gram", F.lit(1).alias("_p")))
    # exact membership rides on the pass set (bloom has no false
    # negatives, so exact ⊆ passing) — one broadcast gram table
    # carries both flags, one join + one aggregate produce all counts
    gate = passing.join(
        bench_grams.select("gram").distinct().withColumn("_e", F.lit(1)),
        "gram", "left")
    agg = (cg.join(F.broadcast(gate), "gram", "left")
           .groupBy(id_col)
           .agg(F.count("*").cast("long").alias("n_grams"),
                F.sum(F.coalesce(F.col("_p"), F.lit(0))).cast("long")
                .alias("n_bloom_hits"),
                F.sum(F.coalesce(F.col("_e"), F.lit(0))).cast("long")
                .alias("n_exact_hits")))
    return agg.select(
        id_col, "n_grams", "n_bloom_hits", "n_exact_hits",
        (F.col("n_bloom_hits") >= min_overlap).alias("bloom_flagged"))
