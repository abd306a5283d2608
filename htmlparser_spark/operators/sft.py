"""Transcripts → supervised training examples.

The extraction pipeline (operators/extract.py) ends with per-turn
extracted text in turn order; these operators are the next stage of a
transcript training-data build: turning ordered turns into
(prompt, completion) SFT pairs, accounting the loss-mask token budget,
and auditing tool usage — the ops a conversation-corpus pipeline runs
right after main-content extraction (north_rule: multi-turn
conversation / agent transcripts with (conv_id, turn_idx, role, text,
tool, ts)).

Scale notes (10^12 turns):
- every operator here is ONE keyed shuffle on conv_id (the same key —
  and therefore the same hash partitioning — as the pipeline's
  ordering window, so when chained after it AQE/Catalyst can reuse the
  exchange) plus, for tool_stats, a second tiny aggregate keyed by the
  bounded tool vocabulary;
- per-task memory bound = one conversation's turns, identical to the
  ordering window's documented bound (BASELINE.md), with the same
  two-phase escape hatch upstream;
- sft_pairs with the default bounded context (``last_k``) emits
  O(k · len(turn)) bytes per example — the full-context variant
  (last_k=None) emits O(n²) bytes per conversation, which is inherent
  to full-context SFT, not to this implementation; bound it with
  ``last_k`` or cap conversations upstream (assemble max_turns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_stats import token_count_col

__all__ = ["sft_pairs", "loss_mask_budget", "tool_stats",
           "prefix_containment"]


def sft_pairs(df: DataFrame, conv_col: str = "conv_id",
              idx_col: str = "turn_idx", role_col: str = "role",
              text_col: str = "text",
              assistant_role: str = "assistant",
              sep: str = "\n\n",
              last_k: int | None = None) -> DataFrame:
    """One SFT example per assistant turn: ``prompt`` = the turns
    before it rendered "role: text" joined by ``sep`` (the last
    ``last_k`` of them when given — the context-window truncation a
    real pipeline applies), ``completion`` = the assistant turn's
    text. ``n_ctx_turns`` always counts ALL prior turns, so
    downstream can see how much history the truncation dropped.

    ONE keyed shuffle (the window on conv_id). Context is collected
    with a running window frame — ``ROWS BETWEEN last_k PRECEDING AND
    1 PRECEDING`` when bounded, so a bounded-context run never
    materializes more than k turns per row regardless of conversation
    length. Window frames are processed in ORDER BY order, so the
    collected array is in turn order by construction (turn_idx is
    unique per conversation — the integrity audit enforces that).

    First-turn assistant rows (no prior context) get prompt = ''.
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    if last_k is None:
        ctx_frame = w.rowsBetween(Window.unboundedPreceding, -1)
    else:
        ctx_frame = w.rowsBetween(-int(last_k), -1)
    rendered = F.concat(F.col(role_col), F.lit(": "), F.col(text_col))
    out = (df.withColumn("_ctx", F.collect_list(rendered).over(ctx_frame))
           .withColumn("_nprior",
                       F.count("*").over(
                           w.rowsBetween(Window.unboundedPreceding, -1)))
           .filter(F.col(role_col) == assistant_role))
    return out.select(
        F.col(conv_col),
        F.col(idx_col).cast("long").alias(idx_col),
        F.col("_nprior").cast("long").alias("n_ctx_turns"),
        F.array_join("_ctx", sep).alias("prompt"),
        F.col(text_col).alias("completion"))


def loss_mask_budget(df: DataFrame, conv_col: str = "conv_id",
                     role_col: str = "role", text_col: str = "text",
                     target_role: str = "assistant") -> DataFrame:
    """Per-conversation loss-mask accounting: how many (whitespace)
    tokens the conversation contributes to the loss (the
    ``target_role`` turns) vs. how many ride along as context only —
    the number a mixture builder needs to weigh transcript corpora
    against plain-text ones (plain docs are 100% supervised;
    transcripts are not).

    ONE map-side-combined aggregate keyed on conv_id — no window, no
    second shuffle. completion_ratio_ppm is integer (floor) ppm, so
    cross-engine exact."""
    ntok = token_count_col(F.col(text_col))
    is_tgt = (F.col(role_col) == target_role).cast("long")
    g = df.groupBy(conv_col).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(is_tgt).cast("long").alias("n_target_turns"),
        F.sum(ntok * (1 - is_tgt)).cast("long").alias("prompt_tokens"),
        F.sum(ntok * is_tgt).cast("long").alias("completion_tokens"))
    total = F.col("prompt_tokens") + F.col("completion_tokens")
    return g.withColumn(
        "completion_ratio_ppm",
        F.when(total > 0,
               F.expr("completion_tokens * 1000000L div "
                      "(prompt_tokens + completion_tokens)"))
        .otherwise(F.lit(0)).cast("long"))


def tool_stats(df: DataFrame, conv_col: str = "conv_id",
               idx_col: str = "turn_idx", role_col: str = "role",
               tool_col: str = "tool",
               assistant_role: str = "assistant") -> DataFrame:
    """Per-tool usage audit over a transcripts table: call volume,
    conversation reach, where in conversations the tool fires (mean
    turn index, floor), and how often the call is followed by an
    assistant turn (the result actually flowed back into a response —
    agent-trace health, a high miss rate means truncated traces).

    One window keyed on conv_id (lead of role — computed BEFORE
    filtering to tool rows, so the follower can be any role), then one
    tiny aggregate keyed by the bounded tool vocabulary. Tool rows are
    identified by a non-empty tool column."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    nxt = F.lead(role_col).over(w)
    calls = (df.withColumn("_next_role", nxt)
             .filter(F.col(tool_col).isNotNull() & (F.col(tool_col) != "")))
    return (calls.groupBy(tool_col)
            .agg(F.count("*").cast("long").alias("n_calls"),
                 F.countDistinct(conv_col).cast("long").alias("n_convs"),
                 # integer (floor) mean — `div`, not float division, so
                 # the value is exact however large the sums get
                 F.expr(f"sum(cast({idx_col} as bigint)) div count(*)")
                 .alias("mean_turn_idx"),
                 F.sum((F.col("_next_role") == assistant_role)
                       .cast("long")).cast("long")
                 .alias("n_followed_by_assistant")))


def prefix_containment(df: DataFrame, conv_col: str = "conv_id",
                       idx_col: str = "turn_idx", role_col: str = "role",
                       text_col: str = "text") -> DataFrame:
    """Exact conversation-prefix containment: one row per conversation
    whose ordered (role, text) turn sequence is a strict prefix of
    another conversation's (a truncated re-crawl / abandoned retry of
    the same session) or an exact duplicate of one. Fuzzy conv-level
    dedup (MinHash over assembled text) misses short prefixes — a
    5-turn fragment of a 50-turn session has Jaccard ~0.1 against its
    container — so a transcript corpus needs this exact structural
    pass alongside it.

    Mechanics: per conversation, a rolling md5 hash chain over the
    turns in ``idx_col`` order (chain[i] = md5(chain[i-1] || md5(role
    ": " text)), seed ''), so chain[i] identifies the whole prefix
    0..i. Conversation A (nA turns, full hash hA) is contained in B
    iff B's chain at position nA-1 equals hA and (nB > nA, or nB == nA
    and B's key < A's — exact duplicates collapse onto the min key,
    one direction only). Among multiple containers the min key wins
    (``min``/``min_by`` — deterministic under retries).

    Plan shape: ONE keyed shuffle on conv_id builds the chains
    (higher-order ``aggregate`` over the sorted turn-hash array —
    per-task memory = one conversation, the pipeline's documented
    bound), then ONE equi-join on (32-hex chain hash, position): the
    probe side is |convs| rows, the build side |turns| rows of
    (conv, pos, hash) — text never reaches the join. Hash-equality
    skew is bounded by the duplicate-group cardinality, the same class
    as exact content dedup. md5 collisions are accepted as
    negligible (2^-64 birthday scale at 10^12 prefixes). Turn
    role/text must be non-null (the integrity audit enforces that
    upstream).

    Returns (contained, container, n_contained, n_container,
    is_exact). The keep-set is ``df`` anti-joined on ``contained``.
    """
    turns = df.select(
        F.col(conv_col).alias("conv"), F.col(idx_col).alias("i"),
        F.md5(F.concat(F.col(role_col), F.lit(": "),
                       F.col(text_col))).alias("th"))
    chains = (turns.groupBy("conv")
              .agg(F.expr("transform(array_sort(collect_list("
                          "struct(i, th))), s -> s.th)").alias("hs"))
              .select("conv", F.expr(
                  "slice(aggregate(hs, array(''), (acc, x) -> "
                  "concat(acc, array(md5(concat(element_at(acc, -1), "
                  "x))))), 2, size(hs))").alias("chain")))
    prefixes = chains.select(
        "conv", F.size("chain").cast("long").alias("n"),
        F.posexplode("chain").alias("pos", "ph"))
    full = (prefixes.filter(F.col("pos") == F.col("n") - 1)
            .select(F.col("conv").alias("a_conv"),
                    F.col("n").alias("a_n"),
                    (F.col("n") - 1).alias("a_pos"),
                    F.col("ph").alias("a_h")))
    cand = (full.join(prefixes,
                      (F.col("a_h") == F.col("ph"))
                      & (F.col("a_pos") == F.col("pos")))
            .filter((F.col("conv") != F.col("a_conv"))
                    & ((F.col("n") > F.col("a_n"))
                       | ((F.col("n") == F.col("a_n"))
                          & (F.col("conv") < F.col("a_conv"))))))
    return (cand.groupBy(F.col("a_conv").alias("contained"),
                         F.col("a_n").alias("n_contained"))
            .agg(F.min("conv").alias("container"),
                 F.expr("min_by(n, conv)").cast("long")
                 .alias("n_container"))
            .select("contained", "container", "n_contained",
                    "n_container",
                    (F.col("n_contained") == F.col("n_container"))
                    .alias("is_exact")))
