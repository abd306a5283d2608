"""Incremental dedup against a persisted index — the 100-TB production
shape: "dedup this week's crawl against the historical corpus" without
reprocessing history.

``build_dedup_index`` runs over the historical corpus ONCE and persists
three narrow parquet tables (plus a JSON manifest pinning the hash
parameters):

- ``exact/``   (h, ln, keep_id)            — 64-bit text hash + length
  → min historical doc id; one row per distinct text, ~20 B each.
- ``normset/`` (nh, keep_id)               — xxhash64 of the SORTED
  distinct word-shingle set: catches case/whitespace-normalized
  duplicates that raw-text hashing misses.
- ``bands/``   (band_id, band_hash, doc_id) — the MinHash LSH band
  table, partitioned by band_id for partition pruning.
- ``sigs/``    (doc_id, sig)               — full MinHash signatures,
  for signature-agreement verification of band candidates.

``dedup_against_index`` then dedups a NEW batch by joining against
those tables: the historical side is **scanned, never re-shingled** —
no Python UDF ever runs over history again (asserted by a plan test).
Index tables shuffle 8-16 B keys; only the new batch (typically ≪
history) pays signature computation.

Intra-batch duplicates are out of scope by design — compose with
``exact_dedup`` / ``minhash_dedup_pairs`` on the new batch first; this
operator answers only "is this new doc a duplicate OF HISTORY".

Dup tiers, checked in priority order (a doc gets the strongest match):

1. ``exact``      — identical raw text (hash + length equi-join).
2. ``normalized`` — identical word-shingle SET (lowercased, whitespace
   collapsed): deterministic, so it is oracle-checkable in SQL.
3. ``near``       — shares ≥1 LSH band with a historical doc AND
   MinHash signature agreement ≥ ``threshold``. Probabilistic (seeded
   signatures), so the driver oracle runs with this tier disabled and
   the tier is pinned by pytest on planted perturbed docs instead.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .caching import cache_df
from .dedup import _shingle_array_expr, band_struct_cols, make_minhash_udf

__all__ = ["build_dedup_index", "dedup_against_index",
           "corpus_diff"]

_MANIFEST = "index_manifest.json"


def _norm_hash_expr(text_col: str, shingle_k: int):
    """64-bit hash of the sorted distinct shingle set — equal iff the
    normalized token-shingle content is equal (modulo a 2^-64 hash
    collision). JVM-side: sort_array + array_join + xxhash64."""
    sh = _shingle_array_expr(text_col, shingle_k)
    return F.xxhash64(F.array_join(F.sort_array(sh), "\x1f"))


def build_dedup_index(df: DataFrame, path: str, *,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 5,
                      parallelism: int | None = None) -> dict:
    """One pass over the historical corpus → persisted dedup index.

    The signature UDF (the only Python stage) runs exactly once per
    historical doc, here at build time; every later batch joins
    against the written parquet. Band table is partitioned by band_id
    (16 partitions) so a probe that needs one band prunes the rest;
    rows are repartitioned to one file per band to keep the file count
    O(bands), not O(tasks × bands)."""
    udf = make_minhash_udf(num_perm=num_perm, shingle_k=shingle_k)
    src = df.select(F.col(id_col), F.col(text_col))
    if parallelism:
        src = src.repartition(parallelism, F.col(id_col))

    (src.select(F.xxhash64(F.col(text_col)).alias("h"),
                F.length(F.col(text_col)).alias("ln"),
                F.col(id_col))
        .groupBy("h", "ln").agg(F.min(id_col).alias("keep_id"))
        .write.mode("overwrite").parquet(f"{path}/exact"))

    (src.select(_norm_hash_expr(text_col, shingle_k).alias("nh"),
                F.col(id_col))
        .groupBy("nh").agg(F.min(id_col).alias("keep_id"))
        .write.mode("overwrite").parquet(f"{path}/normset"))

    sig = cache_df(src.select(F.col(id_col),
                              udf(F.col(text_col)).alias("sig")))
    sig.write.mode("overwrite").parquet(f"{path}/sigs")
    band_cols = band_struct_cols("sig", num_perm, bands)
    (sig.select(id_col, F.explode(F.array(*band_cols)).alias("bk"))
        .select(id_col, "bk.band_id", "bk.band_hash")
        .repartition(bands, "band_id")
        .write.mode("overwrite").partitionBy("band_id")
        .parquet(f"{path}/bands"))
    n_docs = sig.count()
    sig.unpersist()

    manifest = {"num_perm": num_perm, "bands": bands,
                "shingle_k": shingle_k, "n_docs": n_docs}
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def dedup_against_index(df: DataFrame, path: str, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float | None = 0.8,
                        parallelism: int | None = None) -> DataFrame:
    """Annotate a new batch against a persisted index: one output row
    per input row with ``dup_kind`` ('exact' | 'normalized' | 'near' |
    'none') and ``matched_old`` (the historical keep_id, null for
    'none'). Filter ``dup_kind = 'none'`` to keep only novel docs.

    Scale shape: three equi-joins against parquet scans of the index
    (8-16 B keys — AQE picks broadcast or shuffle join by actual index
    size); the ONLY Python stage is the new batch's own signature UDF,
    and that stage is skipped entirely when ``threshold`` is None
    (exact + normalized tiers only — the deterministic subset the
    driver oracle checks)."""
    spark: SparkSession = df.sparkSession
    with open(os.path.join(path, _MANIFEST)) as f:
        m = json.load(f)

    src = df.select(F.col(id_col), F.col(text_col))
    if parallelism:
        src = src.repartition(parallelism, F.col(id_col))
    keyed = src.select(
        F.col(id_col),
        F.col(text_col),
        F.xxhash64(F.col(text_col)).alias("h"),
        F.length(F.col(text_col)).alias("ln"),
        _norm_hash_expr(text_col, m["shingle_k"]).alias("nh"))
    keyed = cache_df(keyed)

    exact_idx = spark.read.parquet(f"{path}/exact")
    norm_idx = spark.read.parquet(f"{path}/normset")
    ex = (keyed.join(exact_idx, ["h", "ln"])
          .groupBy(id_col).agg(F.min("keep_id").alias("m_exact")))
    nm = (keyed.join(norm_idx, "nh")
          .groupBy(id_col).agg(F.min("keep_id").alias("m_norm")))

    out = (keyed.select(id_col)
           .join(ex, id_col, "left").join(nm, id_col, "left"))

    if threshold is not None:
        udf = make_minhash_udf(num_perm=m["num_perm"],
                               shingle_k=m["shingle_k"])
        sig_new = cache_df(
            keyed.select(F.col(id_col),
                         udf(F.col(text_col)).alias("sig")))
        band_cols = band_struct_cols("sig", m["num_perm"], m["bands"])
        banded = (sig_new
                  .select(id_col,
                          F.explode(F.array(*band_cols)).alias("bk"))
                  .select(id_col, "bk.band_id", "bk.band_hash"))
        bands_idx = (spark.read.parquet(f"{path}/bands")
                     .select(F.col("doc_id").alias("old_id"),
                             F.col("band_id").cast("int").alias("band_id"),
                             "band_hash"))
        cand = (banded.join(bands_idx, ["band_id", "band_hash"])
                .select(id_col, "old_id").distinct())
        sigs_idx = (spark.read.parquet(f"{path}/sigs")
                    .select(F.col("doc_id").alias("old_id"),
                            F.col("sig").alias("old_sig")))
        # signature agreement: fraction of equal components — the
        # standard unbiased Jaccard estimate; pure codegen zip_with
        agree = (F.size(F.filter(
            F.zip_with("sig", "old_sig", lambda x, y: x == y),
            lambda b: b)).cast("double") / F.lit(float(m["num_perm"])))
        nr = (cand.join(sig_new, id_col).join(sigs_idx, "old_id")
              .withColumn("agree", agree)
              .filter(F.col("agree") >= threshold)
              .groupBy(id_col).agg(F.min("old_id").alias("m_near")))
        out = out.join(nr, id_col, "left")
    else:
        out = out.withColumn("m_near", F.lit(None).cast("long"))

    kind = (F.when(F.col("m_exact").isNotNull(), F.lit("exact"))
            .when(F.col("m_norm").isNotNull(), F.lit("normalized"))
            .when(F.col("m_near").isNotNull(), F.lit("near"))
            .otherwise(F.lit("none")))
    matched = F.coalesce("m_exact", "m_norm", "m_near")
    return out.select(F.col(id_col), kind.alias("dup_kind"),
                      matched.alias("matched_old"))


def corpus_diff(old: DataFrame, new: DataFrame,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Snapshot delta → (id, status ∈ added|removed|changed|same):
    the audit step between two corpus versions (what did this week's
    crawl/recuration actually change?). Compares md5 fingerprints,
    never texts: each side reduces to (id, 16-byte hash) before the
    ONE full-outer join — at 100 TB the shuffle is fingerprint-sized,
    and the text columns are pruned out of both scans."""
    o = old.select(F.col(id_col),
                   F.md5(F.encode(F.col(text_col), "UTF-8"))
                   .alias("_ho"))
    n = new.select(F.col(id_col),
                   F.md5(F.encode(F.col(text_col), "UTF-8"))
                   .alias("_hn"))
    j = o.join(n, id_col, "full_outer")
    status = (F.when(F.col("_ho").isNull(), "added")
              .when(F.col("_hn").isNull(), "removed")
              .when(F.col("_ho") != F.col("_hn"), "changed")
              .otherwise("same"))
    return j.select(id_col, status.alias("status"))
