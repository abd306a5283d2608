"""BPE tokenizer training (operators/tokenizer.py): merge-order
goldens, leftmost-first non-overlap semantics, determinism under
repartitioning, and encode parity between train-time and apply-time.
"""

from __future__ import annotations

from pyspark.sql import Row

from htmlparser_spark.operators.tokenizer import (bpe_learn,
                                                  bpe_token_counts,
                                                  merge_word)


def test_merge_word_leftmost_nonoverlapping():
    assert merge_word(list("aaaa"), ("a", "a")) == ["aa", "aa"]
    assert merge_word(list("aaa"), ("a", "a")) == ["aa", "a"]
    # freshly merged symbol never re-merges within the step
    assert merge_word(["aa", "a", "a"], ("a", "a")) == ["aa", "aa"]
    assert merge_word(list("abab"), ("a", "b")) == ["ab", "ab"]
    assert merge_word(list("x"), ("a", "b")) == ["x"]
    assert merge_word([], ("a", "b")) == []


def test_bpe_learn_hand_golden(spark):
    # corpus: 'low' x5, 'lower' x2, 'newest' x6
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=" ".join(["low"] * 5 + ["lower"] * 2)),
         Row(doc_id=1, text=" ".join(["newest"] * 6))])
    out = bpe_learn(docs, n_merges=3).collect()
    got = [(r["merge_idx"], r["left"], r["right"], r["pair_count"])
           for r in out]
    # pair counts step 0: lo=7, ow=7, we=2+... e-s 6, s-t 6, n-e 6,
    # e-w 8 (lower 2 + newest 6)... recompute: 'lower': l-o,o-w,w-e,e-r
    # x2; 'low': l-o,o-w x5; 'newest': n-e,e-w,w-e,e-s,s-t x6.
    # lo=7 ow=7 we=2+6=8 er=2 ne=6 ew=6 es=6 st=6 -> best (w,e,8)
    assert got[0] == (0, "w", "e", 8)
    # step 1: 'lower'-> l o we r (o-we 2, we-r 2); 'newest'->
    # n e we s t (e-we 6, we-s 6); lo=7 ow=5? no: 'lower' now
    # l,o,we,r so o-w gone for lower; 'low' unchanged l,o,w.
    # lo = 5+2 = 7 ; ow = 5 ; best = (l,o,7)
    assert got[1] == (1, "l", "o", 7)
    # step 2: 'low'-> lo w x5; 'lower'-> lo we r x2; 'newest'
    # unchanged. pairs: lo-w 5, lo-we 2, we-r 2, n-e 6, e-we 6,
    # we-s 6, s-t 6 -> count 6 tie among (e,we),(n,e),(s,t),(we,s)
    # -> lexicographic min (e,we)
    assert got[2] == (2, "e", "we", 6)


def test_bpe_learn_deterministic_across_partitioning(spark):
    rows = [Row(doc_id=i, text=f"token{i % 7} shared shared word{i % 3}")
            for i in range(60)]
    a = spark.createDataFrame(rows).repartition(1)
    b = spark.createDataFrame(rows).repartition(13, "doc_id")
    ma = [tuple(r) for r in bpe_learn(a, n_merges=6).collect()]
    mb = [tuple(r) for r in bpe_learn(b, n_merges=6).collect()]
    assert ma == mb and len(ma) == 6


def test_bpe_learn_top_words_cap_is_deterministic(spark):
    rows = [Row(doc_id=i, text=f"w{i} w{i} common") for i in range(50)]
    df = spark.createDataFrame(rows)
    m1 = [tuple(r) for r in bpe_learn(df, n_merges=2,
                                      top_words=10).collect()]
    m2 = [tuple(r) for r in bpe_learn(df.repartition(7), n_merges=2,
                                      top_words=10).collect()]
    assert m1 == m2


def test_bpe_token_counts_applies_merges(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="low low newest"),
         Row(doc_id=1, text=""),
         Row(doc_id=2, text="zzz")])
    merges = [("l", "o"), ("lo", "w"), ("n", "e"), ("w", "e"),
              ("s", "t"), ("e", "we"), ("ewe", "s")]
    out = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_counts(docs, merges).collect()}
    # 'low' -> lo -> low : 1 token; 'newest': n e w e s t ->
    # ne, we, st -> ne ewe? rank order: (n,e)=2 first -> ne w e s t;
    # (w,e)=3 -> ne we s t; (s,t)=4 -> ne we st; (e,we) no 'e';
    # -> 3 tokens. doc0 = 1+1+3 = 5
    assert out[0] == 5
    assert out[1] == 0
    assert out[2] == 3  # no merges apply to zzz


def test_bpe_roundtrip_learned_merges_compress(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="the the the quick brown the")
         for i in range(5)])
    merges = [(r["left"], r["right"])
              for r in bpe_learn(docs, n_merges=4).collect()]
    out = bpe_token_counts(docs, merges).collect()
    chars = len("thethethequickbrownthe")
    for r in out:
        assert 0 < r["n_bpe_tokens"] < chars


def test_perceptron_train_hand_golden(spark):
    from htmlparser_spark.operators.cluster import perceptron_train
    # dim 2; two docs: y=+1 x=[2,0], y=-1 x=[0,3]
    df = spark.createDataFrame(
        [Row(doc_id=0, features=[2, 0], label=1),
         Row(doc_id=1, features=[0, 3], label=-1)])
    # iter1: w0=0 -> both misclassified -> w1 = [2,0] - [0,3] = [2,-3]
    # iter2: margins: doc0 4 (ok), doc1 -9 -> y*m = 9 > 0 (ok)
    # -> no update; w2 = [2,-3]
    out = {r["pos"]: r["weight"]
           for r in perceptron_train(df, dim=2, iters=2).collect()}
    assert out == {0: 2, 1: -3}


def test_perceptron_train_separates_planted_labels(spark):
    from htmlparser_spark.operators.cluster import perceptron_train
    from pyspark.sql import functions as F
    # positives concentrate on dims 0-1, negatives on dims 2-3
    rows = []
    for i in range(40):
        pos = i % 2 == 0
        f = [3 + i % 3, 2, 0, 1] if pos else [0, 1, 3 + i % 3, 2]
        rows.append(Row(doc_id=i, features=f, label=1 if pos else -1))
    df = spark.createDataFrame(rows)
    w = [r["weight"] for r in perceptron_train(df, dim=4, iters=3)
         .orderBy("pos").collect()]
    margins = df.select(
        "label",
        F.aggregate(
            F.zip_with("features",
                       F.array(*[F.lit(v).cast("long") for v in w]),
                       lambda a, b: a * b),
            F.lit(0).cast("long"), lambda acc, x: acc + x).alias("m")) \
        .collect()
    acc = sum(1 for r in margins if r["label"] * r["m"] > 0) / len(margins)
    assert acc == 1.0  # linearly separable by construction


def test_semantic_dedup_drops_planted_copies(spark):
    from htmlparser_spark.operators.cluster import semantic_dedup
    from pyspark.sql import functions as F
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    out = semantic_dedup(emb.unionAll(planted), k=10, iters=2,
                         scale=128, thr_ppm=950_000)
    rows = {r["vec_id"]: r for r in out.collect()}
    n_planted = planted.count()
    assert n_planted > 0
    for r in rows.values():
        if r["vec_id"] >= 100000:
            orig = rows[r["vec_id"] - 100000]
            # exact copy: same cluster; the larger id is dropped
            assert r["cid"] == orig["cid"]
            assert r["kept"] == 0
    # keep-smallest: every cluster retains at least one member
    kept_cids = {r["cid"] for r in rows.values() if r["kept"] == 1}
    all_cids = {r["cid"] for r in rows.values()}
    assert kept_cids == all_cids


def test_new_ops_plan_hygiene(spark):
    """No row-at-a-time Python UDF in any of the round-4 additions;
    the DSIR ratio table (256 rows by construction) broadcasts."""
    from pyspark.sql import functions as F
    from htmlparser_spark.operators.cluster import semantic_dedup
    from htmlparser_spark.operators.sample import dsir_weights
    from htmlparser_spark.operators.audit import conversation_stats
    from htmlparser_spark.plans import (assert_no_python_row_udf,
                                        explain_string)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta w{i}") for i in range(8)])
    d = dsir_weights(docs, docs.filter(F.col("doc_id") % 2 == 0))
    assert_no_python_row_udf(d)
    assert "BroadcastHashJoin" in explain_string(d)
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 3)] * 64) for i in range(12)])
    s = semantic_dedup(emb, k=2, iters=1)
    assert_no_python_row_udf(s)
    tr = spark.createDataFrame(
        [Row(conv_id="c", role="user", tool="", extracted_text="x",
             ts="2026-01-01 00:00:00")]).withColumn(
        "ts", F.to_timestamp("ts"))
    assert_no_python_row_udf(conversation_stats(tr))


def test_bpe_encode_pieces(spark):
    from htmlparser_spark.operators.tokenizer import bpe_encode
    merges = [("l", "o"), ("lo", "w")]
    df = spark.createDataFrame(
        [(1, "low lower 7"), (2, ""), (3, None)],
        "doc_id long, text string")
    got = [(r.doc_id, r.token_idx, r.piece)
           for r in bpe_encode(df, merges)
           .orderBy("doc_id", "token_idx").collect()]
    # "low" -> [low]; "lower" -> [low, e, r]; "7" -> [7]
    assert got == [(1, 0, "low"), (1, 1, "low"), (1, 2, "e"),
                   (1, 3, "r"), (1, 4, "7")]


def test_bpe_encode_matches_token_counts(spark):
    from htmlparser_spark.operators.tokenizer import (
        bpe_encode, bpe_token_counts)
    merges = [("a", "b"), ("ab", "c"), ("e", "e")]
    df = spark.createDataFrame(
        [(1, "abc abcd eeee xyz"), (2, "ab ab ab")],
        "doc_id long, text string")
    from pyspark.sql import functions as F
    n1 = {r.doc_id: r.n for r in bpe_encode(df, merges)
          .groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    n2 = {r.doc_id: r.n_bpe_tokens
          for r in bpe_token_counts(df, merges).collect()}
    assert n1 == n2


def test_bpe_encode_roundtrip_concat(spark):
    # concatenating a word's pieces recovers the word exactly
    from htmlparser_spark.operators.tokenizer import encode_word
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("e", "r"): 2}
    for w in ["lower", "lowlow", "xyz", "l", ""]:
        assert "".join(encode_word(w, ranks)) == w
