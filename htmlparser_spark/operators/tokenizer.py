"""BPE tokenizer training + application over the corpus.

``bpe_learn`` follows the shape every production tokenizer trainer
(SentencePiece, HuggingFace tokenizers) uses, because the merge loop
is inherently sequential but is a pure function of the word-frequency
table: ONE distributed pass aggregates (word, count) — bounded by
Heaps'-law vocabulary growth, further capped by ``top_words`` — and
the driver runs the classic merge loop over that table. The corpus is
touched exactly once, regardless of how many merges are learned.

``bpe_token_counts`` applies a learned merge list to every document
with an Arrow-batched pandas UDF (the per-word merge application is
the standard rank-table encode; vectorized over the batch, never
per-row Python).

Merge semantics (pinned by tests): per step, the highest-count
adjacent symbol pair wins, ties broken by lexicographic (left, right);
within a word the pair merges leftmost-first, non-overlapping (so
'aaaa' under ('a','a') becomes ['aa','aa'], and the freshly merged
symbol does not re-merge in the same step). Words are whitespace
tokens with the shared engine split class; symbols start as single
characters.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

__all__ = ["bpe_learn", "bpe_token_counts", "bpe_encode",
           "merge_word", "encode_word"]

_SPLIT_RE = r"[ \t\n\x0b\f\r]+"


def merge_word(syms: list, pair: tuple) -> list:
    """Apply one (left, right) merge to a symbol list, leftmost-first
    non-overlapping — the per-word kernel of both train and encode."""
    left, right = pair
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    t = F.trim(F.col(text_col))
    toks = F.when(t == "", F.array().cast("array<string>")) \
        .otherwise(F.split(t, _SPLIT_RE))
    return (docs.select(F.explode(toks).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").cast("long").alias("cnt")))


def bpe_learn(docs: DataFrame, n_merges: int = 16,
              text_col: str = "text", min_word_count: int = 1,
              top_words: int = 100_000) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns a
    DataFrame (merge_idx, left, right, pair_count) in learning order —
    the merges.txt artifact a tokenizer ships.

    Scale shape (100 TB): the corpus pays ONE map-side-combined
    groupBy(word); everything after runs on the driver over a table
    bounded by min(vocabulary, ``top_words``) rows (the cap keeps the
    collect bounded the same way the IVF k-means fit bounds its
    sample — rare words can't win a merge anyway, their pair mass is
    negligible by construction). The merge loop itself is O(top_words
    × n_merges) pure Python on small lists — milliseconds next to the
    corpus pass."""
    wc = _word_counts(docs, text_col) \
        .filter(F.col("cnt") >= min_word_count)
    # deterministic cap: highest-count words, ties by word — a total
    # order, so any cluster size collects the identical table
    rows = (wc.orderBy(F.col("cnt").desc(), "word")
            .limit(top_words).collect())
    vocab = {r["word"]: r["cnt"] for r in rows}
    words = {w: [c for c in w] for w in vocab}

    merges = []
    for step in range(n_merges):
        pair_counts: dict = {}
        for w, syms in words.items():
            cnt = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        # count desc, then lexicographic (left, right) asc
        best_cnt = max(pair_counts.values())
        best_pair = min(p for p, c in pair_counts.items()
                        if c == best_cnt)
        merges.append((step, best_pair[0], best_pair[1], best_cnt))
        for w in words:
            words[w] = merge_word(words[w], best_pair)

    spark = docs.sparkSession
    schema = StructType([
        StructField("merge_idx", LongType()),
        StructField("left", StringType()),
        StructField("right", StringType()),
        StructField("pair_count", LongType()),
    ])
    return spark.createDataFrame(
        [(int(i), l, r, int(c)) for i, l, r, c in merges], schema)


def encode_word(word: str, ranks: dict) -> list:
    """Rank-table BPE encode of one word: repeatedly merge the
    lowest-rank adjacent pair (training order) until none applies.
    Returns the symbol list — the per-word kernel of every encode
    surface here."""
    syms = [c for c in word]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        syms = merge_word(syms, best_pair)
    return syms


def _encode_len(word: str, ranks: dict) -> int:
    return len(encode_word(word, ranks))


def bpe_token_counts(docs: DataFrame, merges: Iterable[tuple],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge list: per-document token count under the
    trained tokenizer (id, n_bpe_tokens). Standard rank-table encode
    (lowest-rank pair first — reproduces the training merge order on
    unseen words). Arrow-batched mapInPandas with a per-batch word
    cache — hot words (Zipf) encode once per batch, not once per
    occurrence; the merge table broadcasts via closure capture."""
    import re
    ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
    split = re.compile(_SPLIT_RE)
    fields = [f for f in docs.schema.fields if f.name in (id_col,)]
    schema = StructType(fields + [StructField("n_bpe_tokens", LongType())])

    def fn(batches):
        for pdf in batches:
            cache: dict = {}

            def doc_len(text: str) -> int:
                total = 0
                for w in split.split(text.strip()):
                    if not w:
                        continue
                    n = cache.get(w)
                    if n is None:
                        n = _encode_len(w, ranks)
                        cache[w] = n
                    total += n
                return total

            out = pd.DataFrame({
                id_col: pdf[id_col],
                "n_bpe_tokens": pdf["text"].map(doc_len).astype("int64"),
            })
            yield out

    return docs.select(id_col, F.col(text_col).alias("text")) \
        .mapInPandas(fn, schema)


def bpe_encode(docs: DataFrame, merges: Iterable[tuple],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Full BPE encode: one row per emitted piece, in document order —
    (id, token_idx, piece). The materialized-tokens cousin of
    ``bpe_token_counts`` (which only counts), feeding packing /
    vocab-audit / detokenization-roundtrip stages. Same rank-table
    encode and the same per-batch word cache (Zipf: hot words encode
    once per batch); word boundaries never emit a piece, matching the
    whitespace pre-tokenization of the trainer.

    Scale shape: ONE map-only Arrow stage, fan-out ~tokens/doc — the
    writer's exchange absorbs it; the merge table rides closure
    capture (broadcast), nothing shuffles here."""
    import re
    ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
    split = re.compile(_SPLIT_RE)
    fields = [f for f in docs.schema.fields if f.name in (id_col,)]
    schema = StructType(fields + [
        StructField("token_idx", LongType()),
        StructField("piece", StringType()),
    ])

    def fn(batches):
        for pdf in batches:
            cache: dict = {}
            ids, idxs, pieces = [], [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                if text is None:
                    continue
                i = 0
                for w in split.split(text.strip()):
                    if not w:
                        continue
                    ps = cache.get(w)
                    if ps is None:
                        ps = encode_word(w, ranks)
                        cache[w] = ps
                    for p in ps:
                        ids.append(did)
                        idxs.append(i)
                        pieces.append(p)
                        i += 1
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                "token_idx": pd.Series(idxs, dtype="int64"),
                "piece": pd.Series(pieces, dtype="object"),
            })

    return docs.select(id_col, F.col(text_col).alias("text")) \
        .mapInPandas(fn, schema)
