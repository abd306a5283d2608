"""Structured Streaming plane: same kernel, same bytes.

- file-source stream drained with availableNow → parquet sink must be
  byte-equal to the batch kernel on the same rows
- custom stateful operator (applyInPandasWithState) accumulates
  per-conversation running lineage across micro-batches
- watermarked windowed aggregation plans without error
"""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from htmlparser_spark.htmldom import parse, to_text_stripped
from htmlparser_spark.sources.transcripts import generate_pandas
from htmlparser_spark.streaming import (
    conv_running_state,
    dedup_stream,
    extract_stream,
    read_transcripts_stream,
    turn_rates,
    write_extracted_stream,
)

N_TURNS = 120


@pytest.fixture()
def input_dir(spark, tmp_path):
    """Two parquet files → two file-source micro-batch candidates."""
    pdf = generate_pandas(n_convs=10, n_turns=N_TURNS, seed=5,
                          mega_text=False)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark reads micros
    d = tmp_path / "in"
    d.mkdir()
    pdf.iloc[: N_TURNS // 2].to_parquet(d / "part-0.parquet", index=False)
    pdf.iloc[N_TURNS // 2:].to_parquet(d / "part-1.parquet", index=False)
    return d, pdf


def test_stream_extraction_matches_batch_kernel(spark, tmp_path, input_dir):
    d, pdf = input_dir
    sdf = read_transcripts_stream(spark, str(d), max_files_per_trigger=1)
    assert sdf.isStreaming
    out = extract_stream(sdf, strip=True)
    q = write_extracted_stream(out, str(tmp_path / "out"),
                               str(tmp_path / "ck"))
    q.awaitTermination(120)
    got = {(r.conv_id, r.turn_idx): r.extracted_text
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert len(got) == N_TURNS
    for row in pdf.itertuples(index=False):
        exp = to_text_stripped(parse(row.text))
        assert got[(row.conv_id, row.turn_idx)] == exp


def test_stateful_conv_running_state(spark, tmp_path, input_dir):
    d, pdf = input_dir
    sdf = read_transcripts_stream(spark, str(d))
    extracted = extract_stream(sdf, strip=True)
    state = conv_running_state(extracted)
    q = (state.writeStream.format("memory").queryName("conv_state")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql(
        "select conv_id, max(n_turns) n, max(max_turn_idx) mx "
        "from conv_state group by conv_id").collect()
    exp = pdf.groupby("conv_id").agg(
        n=("turn_idx", "size"), mx=("turn_idx", "max"))
    assert len(rows) == len(exp)
    for r in rows:
        assert r.n == int(exp.loc[r.conv_id, "n"]), r.conv_id
        assert r.mx == int(exp.loc[r.conv_id, "mx"]), r.conv_id

    # content_hash parity with the BATCH lineage hash: the streaming
    # record must XOR to the same xxhash64 value a batch run computes
    # over the same extracted rows (operators.checkpoint.lineage_rows
    # semantics), making streaming output verifiable against a batch
    # manifest.
    final_stream = {
        r.conv_id: r.content_hash for r in spark.sql(
            "select conv_id, content_hash from ("
            "  select conv_id, content_hash, row_number() over ("
            "    partition by conv_id order by n_turns desc) rn"
            "  from conv_state) where rn = 1").collect()}
    batch = spark.createDataFrame(
        [(row.conv_id, int(row.turn_idx),
          to_text_stripped(parse(row.text)))
         for row in pdf.itertuples(index=False)],
        "conv_id string, turn_idx int, extracted_text string")
    batch_hash = {r.conv_id: r.h for r in batch.groupBy("conv_id").agg(
        F.bit_xor(F.xxhash64("conv_id", "turn_idx", "extracted_text"))
        .alias("h")).collect()}
    assert final_stream == batch_hash
    spark.catalog.dropTempView("conv_state")


def test_dedup_stream_drops_duplicate_deliveries(spark, tmp_path):
    """Duplicated rows (at-least-once redelivery) across micro-batch
    files are dropped by content hash within the watermark."""
    pdf = generate_pandas(n_convs=4, n_turns=40, seed=17,
                          mega_text=False)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "in"
    d.mkdir()
    pdf.to_parquet(d / "part-0.parquet", index=False)
    pdf.iloc[:20].to_parquet(d / "part-1.parquet", index=False)  # dups
    sdf = read_transcripts_stream(spark, str(d))
    out = dedup_stream(sdf, watermark="1 hour")
    q = (out.writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 40
    assert got.select("conv_id", "turn_idx").distinct().count() == 40


def test_watermarked_turn_rates_plans(spark, input_dir):
    d, _ = input_dir
    sdf = read_transcripts_stream(spark, str(d))
    agg = turn_rates(sdf, window="1 minute", watermark="5 minutes")
    # streaming aggregation with watermark must be startable
    q = (agg.writeStream.format("memory").queryName("rates")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # windows older than watermark close; with availableNow the final
    # watermark commit may keep the tail window open — presence of the
    # view is the contract here
    assert spark.table("rates").columns == ["window", "role",
                                            "n_turns", "n_bytes"]
    spark.catalog.dropTempView("rates")


def test_stream_near_dup_matches_batch_keepset(spark, tmp_path):
    """Streaming MinHash band-state dedup vs the batch dedup family:
    a stream with planted near-dups (exact copies + one-word-appended
    copies) must drop exactly the docs the batch minhash_dedup_pairs
    keep-one would drop on the same rows — the drop sets (and hence
    the keep sets) are byte-equal. Stream arrival order == id order
    (ts increases with doc_id), matching the batch min-id keep rule;
    two input files + maxFilesPerTrigger=1 force the near-dup pairs
    to be detected ACROSS micro-batches, through the band state."""
    import pandas as pd

    from htmlparser_spark.operators.dedup import minhash_dedup_pairs
    from htmlparser_spark.streaming import near_dup_detect_stream

    base = [(i, f"unique document number {i} carrying words alpha{i} "
                f"beta{i} gamma{i} delta{i} epsilon{i} zeta{i} eta{i}")
            for i in range(30)]
    copies = [(100 + i, base[i][1]) for i in range(0, 30, 3)]
    tails = [(200 + i, base[i][1] + " tail") for i in range(0, 30, 5)]
    rows = base + copies + tails
    ts0 = pd.Timestamp("2026-01-01")
    pdf = pd.DataFrame({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows],
        "ts": [(ts0 + pd.Timedelta(seconds=float(r[0])))
               for r in rows]})
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "in"
    d.mkdir()
    pdf.iloc[:30].to_parquet(d / "part-0.parquet", index=False)
    pdf.iloc[30:].to_parquet(d / "part-1.parquet", index=False)

    sdf = (spark.readStream
           .schema("doc_id long, text string, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(str(d)))
    out = near_dup_detect_stream(sdf, threshold=0.5, watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("neardup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    stream_dropped = {r.doc_id for r in spark.sql(
        "select distinct doc_id from neardup").collect()}
    spark.catalog.dropTempView("neardup")

    batch = spark.createDataFrame(pdf[["doc_id", "text"]])
    pairs = minhash_dedup_pairs(batch, threshold=0.5, parallelism=4)
    batch_dropped = {r.id_b for r in pairs.collect()}
    assert stream_dropped == batch_dropped
    all_ids = set(pdf["doc_id"])
    assert (all_ids - stream_dropped) == (all_ids - batch_dropped)
    # every planted dup was caught, every base doc kept
    assert {r[0] for r in copies + tails} <= stream_dropped
    assert stream_dropped.isdisjoint({r[0] for r in base})


def test_near_dup_state_evicts_past_watermark(spark, tmp_path):
    """The band-state store must actually SHRINK once event time moves
    past watermark + TTL — the streaming near-dup path provably does
    not grow unboundedly (round-3 verdict item). Three files hours
    apart; each doc's distinct text creates `bands` fresh band buckets
    (16/doc), so file 0 adds ~160 state rows whose timeouts (max ts +
    10 min TTL) are long expired by the time file 2's batch runs
    (watermark = file-1 time - 10 min ≫ file-0 time + TTL) — those
    rows must be removed, and the final state total must be far below
    the ~480 rows ever created."""
    import pandas as pd

    from htmlparser_spark.streaming import near_dup_detect_stream

    ts0 = pd.Timestamp("2026-01-01")
    d = tmp_path / "evict_in"
    d.mkdir()
    for f, hours in enumerate((0, 2, 4)):
        ids = range(f * 10, f * 10 + 10)
        pdf = pd.DataFrame({
            "doc_id": list(ids),
            "text": [f"wholly distinct doc {i} tokens a{i} b{i} c{i} "
                     f"d{i} e{i} f{i} g{i} h{i}" for i in ids],
            "ts": [ts0 + pd.Timedelta(hours=hours, seconds=i)
                   for i in ids]})
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(d / f"part-{f}.parquet", index=False)

    sdf = (spark.readStream
           .schema("doc_id long, text string, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(str(d)))
    out = near_dup_detect_stream(sdf, threshold=0.5,
                                 watermark="10 minutes",
                                 state_ttl_ms=600_000)
    q = (out.writeStream.format("memory").queryName("evict")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    progress = [p for p in q.recentProgress if p.get("stateOperators")]
    spark.catalog.dropTempView("evict")
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progress]
    removed = sum(p["stateOperators"][0].get("numRowsRemoved", 0)
                  for p in progress)
    # state grew while everything was in-horizon...
    assert max(totals) >= 300, totals
    # ...then the expired buckets were physically removed
    assert removed >= 150, (removed, totals)
    assert totals[-1] <= max(totals) - 150, totals


def test_session_window_matches_batch_sessionize(spark, tmp_path):
    """Streaming session_window and batch sessionize must agree on
    session boundaries and sizes for the same 30-minute gap: group
    the batch per-event labels into sessions and compare (key, start,
    n) sets; streaming session end = last event + gap."""
    from datetime import datetime, timedelta
    from htmlparser_spark.operators.relational import sessionize
    from htmlparser_spark.streaming.pipeline import session_stats_stream

    t0 = datetime(2024, 1, 1, 8, 0, 0)
    rows = []
    eid = 0
    # user 1: two sessions (burst, 2h gap, burst); user 2: one session
    for mins in (0, 5, 10, 130, 135):
        rows.append((eid, 1, t0 + timedelta(minutes=mins))); eid += 1
    for mins in (0, 20, 40):
        rows.append((eid, 2, t0 + timedelta(minutes=mins))); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    d = tmp_path / "sess_in"
    df.coalesce(1).write.parquet(str(d))

    sdf = spark.readStream.schema(df.schema).parquet(str(d))
    out = session_stats_stream(sdf, gap="30 minutes")
    # complete mode: a finite availableNow run never advances the
    # watermark past the final sessions, so append would hold them in
    # state; production streams use append + watermark eviction
    q = (out.writeStream.format("memory").queryName("sess")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.session_start, r.n_events)
           for r in spark.sql("SELECT * FROM sess").collect()}

    batch = sessionize(df, gap_seconds=1800)
    exp = {(r.user_id, r.start, r.n)
           for r in batch.groupBy("user_id", "session_idx")
           .agg(F.min("ts").alias("start"),
                F.count("*").cast("long").alias("n")).collect()}
    assert got == exp and len(got) == 3
    # streaming session end = last event + gap
    ends = {(r.user_id, r.session_start): r.session_end
            for r in spark.sql("SELECT * FROM sess").collect()}
    for r in (batch.groupBy("user_id", "session_idx")
              .agg(F.min("ts").alias("start"), F.max("ts").alias("last"))
              .collect()):
        assert ends[(r.user_id, r.start)] == \
            r.last + timedelta(minutes=30)


def test_stream_media_dedup_by_signature(spark, tmp_path):
    """Streaming × media: duplicate image deliveries collapse by
    64-bit perceptual signature — decode runs as the same map-only
    Arrow stage inside the micro-batch (mapInPandas is
    streaming-legal), then dedup_stream keys its bounded
    (hash, length) state on the aHash instead of text. Four planted
    classes over 12 deliveries across two files → exactly 4
    survivors whose signatures equal the batch replay."""
    import numpy as np
    import pandas as pd

    from htmlparser_spark.operators.multimodal import (ahash_bits,
                                                       image_ahash)
    from htmlparser_spark.streaming.pipeline import dedup_stream

    def ppm(s):
        w, h = s % 13 + 4, s % 11 + 4
        px = (s * 7 + 31 * np.arange(w * h * 3, dtype=np.int64)) % 256
        return (b"P6\n%d %d\n255\n" % (w, h)
                + px.astype(np.uint8).tobytes())

    pdf = pd.DataFrame(
        [(i, pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i),
          ppm(i % 4)) for i in range(12)],
        columns=["doc_id", "ts", "blob"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "in"
    d.mkdir()
    pdf.iloc[:8].to_parquet(d / "p0.parquet", index=False)
    pdf.iloc[8:].to_parquet(d / "p1.parquet", index=False)

    sdf = (spark.readStream
           .schema("doc_id long, ts timestamp, blob binary")
           .format("parquet").load(str(d)))
    sigs = image_ahash(sdf, key_cols=("doc_id", "ts"))
    out = dedup_stream(sigs, watermark="1 hour", key_cols=("ahash",))
    q = (out.writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "out")).collect()
    assert len(got) == 4
    expect = set()
    for s in range(4):
        w, h = s % 13 + 4, s % 11 + 4
        px = (s * 7 + 31 * np.arange(w * h * 3, dtype=np.int64)) % 256
        expect.add(ahash_bits(w, h, px))
    assert {r.ahash for r in got} == expect
