#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}

The headline is the flagship extraction pipeline (salted repartition →
fused parse/extract kernel → ordering window) over transcripts
synthesized from the documents table (each doc fans out into turns of
quirk-grammar HTML), sized to be kernel-dominated. Auxiliary queries
cover the training-data operators.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
TURNS_PER_DOC = int(os.environ.get("SPARK_GRAFT_TURNS_PER_DOC", "60"))


def _burn(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def vm_health_probe() -> dict:
    """Self-interpreting bench (round-3 verdict): this shared VM has
    multi-minute degraded windows (±30-50%), so the recorded numbers
    carry their own health context. Two probes, ~3 s total:

    - ``single_thread_mops``: fixed integer loop throughput on one
      core — healthy boxes measure ~the same value run-to-run; a
      degraded window shows directly as a lower number.
    - ``ceiling_2_8``: pure-CPU multiprocessing efficiency 2→8 procs
      (best-of-2 interleaved) — the hardware bound any parallel
      measurement here is subject to (healthy ~0.94-0.96, degraded
      ~0.82; see BASELINE.md).

    Readers compare these against the values recorded next to the
    BASELINE.md reference runs before interpreting per-query deltas."""
    import multiprocessing as mp

    t0 = time.time()
    _burn(20_000_000)
    mops = round(20_000_000 / (time.time() - t0) / 1e6, 1)

    def tput(procs: int) -> float:
        with mp.Pool(procs) as p:
            t0 = time.time()
            p.map(_burn, [4_000_000] * procs * 4)
            return procs * 4 * 4_000_000 / (time.time() - t0)

    tput(2)  # warm forks
    best = {2: 0.0, 8: 0.0}
    for _ in range(2):
        for procs in (2, 8):
            best[procs] = max(best[procs], tput(procs))
    return {"single_thread_mops": mops,
            "ceiling_2_8": round((best[8] / best[2]) / 4, 3)}

# quirk-grammar fragments appended per turn so every tokenizer path is
# hot in the benchmark, not just <p>text</p>
_FRAGS = (
    "<script>if(a</b>){x;}</script>",
    "<ul><li>one</li><li>two</li><li>three</li></ul>",
    '<a href="x" href="y">dup</a><!--a-b-->',
    "<div><p>unclosed<br><img src=pic.png>",
    "<DiV CLASS='MiXeD'>case</DiV><!DOCTYPE html>",
    "<table><tr><td>cell</td></tr></table><textarea>raw <b>x</b></textarea>",
)


def build_transcripts(spark, sf_dir: str, turns_per_doc: int):
    """documents × turns_per_doc quirk-grammar turns; deterministic."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    turns = spark.range(turns_per_doc).select(
        F.col("id").cast("int").alias("turn_off"))
    frag = F.element_at(
        F.array(*[F.lit(f) for f in _FRAGS]),
        ((F.col("doc_id") + F.col("turn_off")) % len(_FRAGS) + 1).cast("int"))
    return (docs.crossJoin(turns)
            .select(
                F.concat(F.lit("conv-"), (F.col("doc_id") % 500).cast("string"))
                .alias("conv_id"),
                ((F.col("doc_id") / 500).cast("int") * turns_per_doc
                 + F.col("turn_off")).alias("turn_idx"),
                F.lit("user").alias("role"),
                F.concat(F.lit('<html><body><div class="m"><p>'),
                         F.col("text"), F.lit("</p>"), frag,
                         F.lit("</div></body></html>")).alias("text"),
                F.lit("").alias("tool"),
                F.lit(None).cast("timestamp").alias("ts")))


def main() -> int:
    from htmlparser_spark.session import get_spark
    from htmlparser_spark.operators.extract import extract_transcripts
    from htmlparser_spark import queries as Q

    probe_before = vm_health_probe()
    spark = get_spark(app="htmlparser-bench", cores=CPUS,
                      shuffle_partitions=max(CPUS, 16))
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}

    # headline: extraction pipeline, kernel-dominated. The synthesized
    # crossJoin collapses to 1 partition — spread it like a real
    # multi-file table before timing (ingest layout, not pipeline work).
    # MATERIALIZED to parquet (untimed), not .persist(): the aux loop
    # clears the cache before every sample, which would silently evict
    # a cached tr and make the headline's later interleaved reps pay
    # regeneration; a real table scan is also the honest baseline.
    import shutil
    import tempfile
    tr_dir = tempfile.mkdtemp(prefix="hps_bench_tr_")
    build_transcripts(spark, SF_DIR, TURNS_PER_DOC) \
        .repartition(CPUS * 2).write.mode("overwrite").parquet(tr_dir)
    tr = spark.read.parquet(tr_dir)
    n_turns = tr.count()
    n_bytes = tr.agg(F.sum(F.length("text"))).collect()[0][0]
    # warm the Python workers (one tiny UDF pass) so the headline
    # measures steady-state throughput, not interpreter spawn time
    extract_transcripts(tr.limit(CPUS * 4), include_raw=False,
                        order=False).write.format("noop") \
        .mode("overwrite").save()
    # All numbers are best-of-N with reps INTERLEAVED across the
    # whole suite (headline + aux once, then again): this VM has
    # multi-minute degraded windows (±30%), so back-to-back samples
    # of one query land in the same window and best-of rejects
    # nothing — samples a full suite apart are far more independent
    # (same policy as the scaling harness's interleaved reps; see
    # BASELINE.md).
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    from htmlparser_spark.kernel import extract_text

    def headline_extract():
        t0 = time.time()
        # input already spread over CPUS*2 partitions above — the parse
        # kernel is row-independent, so no salt shuffle needed here
        out = extract_transcripts(tr, strip=True, include_raw=True,
                                  order=True)
        agg = out.agg(F.count("*"), F.sum(F.length("extracted_text")),
                      F.sum("n_nodes"), F.sum("n_errors")).collect()[0]
        assert agg[0] == n_turns
        return time.time() - t0

    def headline_kernel():
        # kernel-only: parse + to_text, no raw/ordering/shuffle — the
        # apples-to-apples unit the reference's single-thread anchor
        # measures (BASELINE.md)
        t0 = time.time()
        extract_text(tr, strip=False, include_raw=False) \
            .select("conv_id", F.length("extracted_text")) \
            .write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def bench_minhash(s, d):
        # same planted corpus as the oracle query, but at the operator
        # DEFAULT banding (16×4): the oracle query deliberately runs
        # 32×2 for structural recall at the threshold (queries.py),
        # which doubles band rows — the bench measures the production
        # configuration, comparable with rounds 1-2
        from htmlparser_spark.operators.dedup import minhash_dedup_pairs
        docs = s.read.parquet(f"{d}/documents.parquet") \
            .select("doc_id", "text")
        planted = docs.filter(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"))
        return minhash_dedup_pairs(docs.unionAll(planted), threshold=0.5,
                                   exact_counts=True)

    # dedup_incremental split into build vs probe legs (round-4
    # verdict): the combined query hid the recurring production cost
    # (probe-only — the per-re-crawl work) inside the one-time index
    # build. The build leg writes the persisted index and returns an
    # empty frame (its timed work IS its own parquet writes); the
    # probe leg runs the full production tiers (exact + normalized +
    # near, threshold 0.8) against the index the build leg left
    # behind. Ordering in `aux` guarantees build runs first.
    import tempfile
    idx_dir = tempfile.mkdtemp(prefix="hps_bench_idx_")

    def _incr_halves(s, d):
        docs = s.read.parquet(f"{d}/documents.parquet") \
            .select("doc_id", "text")
        old = docs.filter(F.col("doc_id") % 2 == 0)
        new = docs.filter(F.col("doc_id") % 2 == 1).unionAll(
            old.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"))
        return old, new

    def bench_incr_build(s, d):
        from htmlparser_spark.operators.incremental import \
            build_dedup_index
        old, _ = _incr_halves(s, d)
        build_dedup_index(old, idx_dir)
        return s.range(0)

    def bench_incr_probe(s, d):
        from htmlparser_spark.operators.incremental import \
            dedup_against_index
        _, new = _incr_halves(s, d)
        return dedup_against_index(new, idx_dir, threshold=0.8)

    aux = [
        ("dedup_exact", Q.q_dedup_exact),
        ("minhash_pairs", bench_minhash),
        ("simhash_pairs", Q.q_simhash_pairs),
        ("ngram_jaccard", Q.q_ngram_jaccard),
        ("ann_brute_topk", Q.q_ann_brute_topk),
        ("ann_lsh_topk", Q.q_ann_lsh_topk),
        ("ann_ivf_topk", Q.q_ann_ivf_topk),
        ("dup_components", Q.q_dup_components),
        ("dedup_incremental_build", bench_incr_build),
        ("dedup_incremental_probe", bench_incr_probe),
        ("corpus_curation", Q.q_corpus_curation),
        ("bpe_token_count", Q.q_bpe_token_count),
        ("token_quality_lang",
         lambda s, d: Q.q_quality_counts(s, d).join(
             Q.q_lang_id(s, d), "doc_id")),
        ("events_order", Q.q_events_order),
        ("selector_li_count", Q.q_selector_li_count),
        ("raw_html_roundtrip", Q.q_raw_html_roundtrip),
        ("decontam_ngrams", Q.q_decontam_ngrams),
        ("paragraph_dedup", Q.q_paragraph_dedup),
        ("chunk_overlap", Q.q_chunk_overlap),
        ("inverted_index", Q.q_inverted_index),
        ("lm_familiarity", Q.q_lm_familiarity),
        ("dsir_weights", Q.q_dsir_weights),
        # media tier: real container decode + 64-bit signatures
        ("image_ahash", Q.q_image_ahash),
        ("audio_fingerprint", Q.q_audio_fingerprint),
        ("video_scene_cuts", Q.q_video_scene_cuts),
        # round-4 structured-extraction tier
        ("extract_tables", Q.q_extract_tables),
        ("page_meta", Q.q_page_meta),
        ("extract_links", Q.q_extract_links),
        ("link_pagerank", Q.q_link_pagerank),
        ("template_lines", Q.q_template_lines),
        ("to_markdown", Q.q_to_markdown),
        ("warc_extract", Q.q_warc_extract),
        ("web_pipeline", Q.q_web_pipeline),
        # round-5 transcripts-training tier + sketches
        ("sft_pairs", Q.q_sft_pairs),
        ("conv_dedup", Q.q_conv_dedup),
        ("bloom_gate", Q.q_bloom_gate),
        ("hll_distinct", Q.q_hll_distinct),
        ("preference_pairs", Q.q_preference_pairs),
        ("prefix_dups", Q.q_prefix_dups),
    ]
    # Reps are INTERLEAVED across the suite (all queries once, then
    # again), not back-to-back per query: this VM's degraded windows
    # last minutes, so consecutive samples of one query land in the
    # same window and best-of rejects nothing — samples a full suite
    # apart are far more independent (same policy as the scaling
    # harness's interleaved reps).
    t_extract = t_kernel = float("inf")
    for _ in range(reps):
        t_extract = min(t_extract, headline_extract())
        results["extract_pipeline"] = round(t_extract, 3)
        t_kernel = min(t_kernel, headline_kernel())
        results["extract_kernel_only"] = round(t_kernel, 3)
        for name, fn in aux:
            # identical plans would reuse the previous rep's internal
            # .cache()s (dedup signature/candidate frames) — clear so
            # every sample measures a COLD run, and best-of only
            # rejects degraded-VM noise, never cache warmth
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            results[name] = round(min(results.get(name, dt), dt), 3)

    shutil.rmtree(tr_dir, ignore_errors=True)
    shutil.rmtree(idx_dir, ignore_errors=True)
    total = round(sum(results.values()), 3)
    probe_after = vm_health_probe()
    line = {
        "metric": "headline suite wall-clock (extract pipeline + "
                  "training-data ops)",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        "cpus": CPUS,
        "turns": n_turns,
        "input_mb": round((n_bytes or 0) / 1e6, 1),
        "turns_per_sec": round(n_turns / t_extract, 1),
        "extract_mb_per_sec": round((n_bytes or 0) / 1e6 / t_extract, 1),
        "kernel_turns_per_sec": round(n_turns / t_kernel, 1),
        "kernel_mb_per_sec": round((n_bytes or 0) / 1e6 / t_kernel, 1),
        # self-interpreting context: VM health probes bracketing the
        # run + the sampling policy (see vm_health_probe docstring;
        # healthy reference values recorded in BASELINE.md)
        "ceiling_probe": {"before": probe_before, "after": probe_after},
        "reps": reps,
        "policy": "best-of-%d, reps interleaved across the suite, "
                  "cold (clearCache before every sample)" % reps,
    }
    spark.stop()
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
