"""Candidate completions → preference data (RLHF/DPO shapes).

After SFT extraction (operators/sft.py), the next training-data stage
a transcript pipeline runs is preference construction: several sampled
completions exist per prompt (best-of-n sampling, A/B'd sessions,
regenerated turns) and the builder must reduce each group to either a
(chosen, rejected) pair with a score margin (DPO / reward-model data)
or the single best completion (rejection sampling / best-of-n SFT).

Scale notes (10^9 prompts × n candidates):
- both operators are ONE map-side-combined aggregate keyed on the
  prompt id — no window, no self-join; ``max_by``/``min_by`` are
  declarative aggregates, so partial aggregation runs in the scan
  stage and only ONE candidate struct per group per direction crosses
  the shuffle (the group's current winner), never the full candidate
  set;
- completions ride inside the agg buffer (2 per group max), so the
  shuffle volume is O(#prompts · avg completion), independent of n;
- ties are broken deterministically (max score → MIN candidate id;
  min score → MAX candidate id) via a composite ordering struct, so
  the output is stable under re-partitioning and retries — candidate
  ids must therefore be numeric (the struct negates them to flip the
  tie direction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["preference_pairs", "best_of_n"]


def _ends(cands: DataFrame, prompt_col: str, cand_col: str,
          text_col: str, score_col: str) -> DataFrame:
    """Shared aggregate: per prompt group, the score-max candidate
    (ties → min id) and the score-min candidate (ties → max id), each
    as one struct, plus the group size. ONE exchange."""
    pick = (f"named_struct('id', {cand_col}, 'score', {score_col}, "
            f"'text', {text_col})")
    return cands.groupBy(prompt_col).agg(
        F.count("*").cast("long").alias("n_cands"),
        F.expr(f"max_by({pick}, named_struct('s', {score_col}, "
               f"'t', -{cand_col}))").alias("_hi"),
        F.expr(f"min_by({pick}, named_struct('s', {score_col}, "
               f"'t', -{cand_col}))").alias("_lo"))


def preference_pairs(cands: DataFrame, prompt_col: str = "prompt_id",
                     cand_col: str = "sample_id",
                     text_col: str = "completion",
                     score_col: str = "score") -> DataFrame:
    """One (chosen, rejected) preference pair per prompt group:
    chosen = highest-scored candidate (ties → lowest ``cand_col``),
    rejected = lowest-scored (ties → highest ``cand_col``), with the
    integer score margin. Groups with no signal — a single candidate,
    or all candidates tied — emit nothing (margin would be 0; DPO
    needs a strict preference).

    ``cand_col`` must be numeric (tie-break negates it); ``score_col``
    is any orderable numeric (higher = better)."""
    g = _ends(cands, prompt_col, cand_col, text_col, score_col)
    return (g.filter(F.col("_hi.score") > F.col("_lo.score"))
            .select(
                F.col(prompt_col), "n_cands",
                F.col("_hi.id").cast("long").alias("chosen_id"),
                F.col("_lo.id").cast("long").alias("rejected_id"),
                F.col("_hi.score").cast("long").alias("chosen_score"),
                F.col("_lo.score").cast("long").alias("rejected_score"),
                (F.col("_hi.score") - F.col("_lo.score")).cast("long")
                .alias("margin"),
                F.col("_hi.text").alias("chosen"),
                F.col("_lo.text").alias("rejected")))


def best_of_n(cands: DataFrame, prompt_col: str = "prompt_id",
              cand_col: str = "sample_id", text_col: str = "completion",
              score_col: str = "score",
              min_score: int | None = None) -> DataFrame:
    """Rejection sampling: keep the single best candidate per prompt
    (ties → lowest ``cand_col``), optionally dropping prompts whose
    best score is below ``min_score`` (the reward threshold). Same
    one-aggregate plan as :func:`preference_pairs`."""
    g = _ends(cands, prompt_col, cand_col, text_col, score_col)
    if min_score is not None:
        g = g.filter(F.col("_hi.score") >= int(min_score))
    return g.select(
        F.col(prompt_col), "n_cands",
        F.col("_hi.id").cast("long").alias("best_id"),
        F.col("_hi.score").cast("long").alias("best_score"),
        F.col("_hi.text").alias("completion"))
