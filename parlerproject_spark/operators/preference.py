"""Pairwise-preference modeling — the RLHF/eval side of a training-
data pipeline: given human (or judge-model) A-vs-B comparisons,
recover per-item strengths and win statistics.

The reference has no preference module; this extends the engine's
evaluation pillar the same way the r6 eval suite did, with the
standard public algorithm: the Bradley-Terry model fit by the MM
(minorization-maximization) update of Hunter (2004),

    p_i  <-  W_i / SUM_j  n_ij / (p_i + p_j)

which is also what open RLHF stacks use to turn preference pairs
into reward-model calibration targets and what Chatbot-Arena-style
leaderboards fit (their logistic "Elo" is the same likelihood).

Scale shape: comparisons collapse ONCE to a per-ordered-pair matchup
table (one groupBy, bounded by distinct item pairs, never raw
comparisons); each MM iteration is two keyed joins of that table
against the item-sized strengths frame plus one aggregation —
nothing driver-side, fixed iteration count, and the strengths frame
is localCheckpoint()ed per round (the standard iterative-lineage
cut, as in graph.label_propagation). Determinism across engines
comes from the round_c contract used by topics.lloyd_centroids:
strengths re-round to `round_c` decimals after every normalized
update, re-synchronizing float state so an unrolled-CTE oracle
replays the fit exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pairwise_matchups(comparisons: DataFrame, *,
                      winner_col: str = "winner",
                      loser_col: str = "loser",
                      smoothing: float = 0.5) -> DataFrame:
    """Directed matchup table from raw comparisons: one row per
    ORDERED item pair (i, j) that ever met, with `w` = wins of i
    over j plus `smoothing` pseudo-wins and `n` = total (smoothed)
    games of the pair. The Laplace pseudo-count keeps every item's
    total win mass positive, so an all-losing item gets a small
    positive strength instead of a hard zero that would divide the
    next MM update by p_i + p_j = 0.

    One aggregation over the comparison stream + one self-union —
    output is bounded by distinct pairs. Columns: i, j, w, n.
    """
    d = (comparisons
         .groupBy(F.col(winner_col).alias("i"), F.col(loser_col).alias("j"))
         .agg(F.count(F.lit(1)).cast("double").alias("__w")))
    rev = d.select(F.col("j").alias("i"), F.col("i").alias("j"),
                   F.col("__w").alias("__l"))
    return (d.join(rev, ["i", "j"], "full_outer")
            .select("i", "j",
                    (F.coalesce("__w", F.lit(0.0)) + smoothing).alias("w"),
                    (F.coalesce("__w", F.lit(0.0))
                     + F.coalesce("__l", F.lit(0.0))
                     + 2 * smoothing).alias("n")))


def bradley_terry(comparisons: DataFrame, *,
                  winner_col: str = "winner", loser_col: str = "loser",
                  iters: int = 3, smoothing: float = 0.5,
                  round_c: int = 6) -> DataFrame:
    """Bradley-Terry strengths from pairwise comparisons via `iters`
    MM updates (Hunter 2004), mean-normalized and rounded to
    `round_c` decimals each iteration (the cross-engine float
    re-sync contract — see module docstring).

    Strengths start at 1.0 for every item that appears in any
    comparison. After each raw update p'_i = W_i / Σ_j n_ij/(p_i+p_j)
    the vector renormalizes to mean 1 (p''_i = p'_i · N / Σ p'),
    which pins the MM fit's free scale so iteration counts, not
    drift, decide the output.

    Columns: item, strength (round_c), n_wins, n_games — win/game
    counts are the UNSMOOTHED observed integers.
    """
    m = pairwise_matchups(comparisons, winner_col=winner_col,
                          loser_col=loser_col, smoothing=smoothing) \
        .localCheckpoint(eager=True)
    wtot = m.groupBy("i").agg(F.sum("w").alias("__W"))
    p = wtot.select(F.col("i").alias("item"), F.lit(1.0).alias("p"))
    for _ in range(iters):
        den = (m
               .join(p.select(F.col("item").alias("i"),
                              F.col("p").alias("__pi")), "i")
               .join(p.select(F.col("item").alias("j"),
                              F.col("p").alias("__pj")), "j")
               .groupBy("i")
               .agg(F.sum(F.col("n") / (F.col("__pi") + F.col("__pj")))
                    .alias("__D")))
        raw = (wtot.join(den, "i")
               .select(F.col("i").alias("item"),
                       (F.col("__W") / F.col("__D")).alias("__r")))
        # r14: the mean-1 renormalization scalar rides a GLOBAL
        # window over the raw update instead of a separate
        # agg + crossJoin(broadcast) — the broadcast build was one
        # extra driver-synchronized job PER MM update (the r13
        # verdict's last 2-jobs/round trainer). The single-partition
        # window is safe here by the same bounded-model contract as
        # the strength table itself (items, not rows, bound it).
        w_all = Window.partitionBy()
        z = F.count(F.lit(1)).over(w_all) / F.sum("__r").over(w_all)
        # LAZY checkpoint (r13): nothing probes between MM updates,
        # so the consumer's single action materializes the iteration
        # chain in order — the eager form cost one driver-
        # synchronized job per update for the same bounded table.
        p = (raw.select("item",
                        F.round(F.col("__r") * z, round_c).alias("p"))
             .localCheckpoint(eager=False))
    obs_w = (comparisons.groupBy(F.col(winner_col).alias("item"))
             .agg(F.count(F.lit(1)).alias("__ow")))
    obs_l = (comparisons.groupBy(F.col(loser_col).alias("item"))
             .agg(F.count(F.lit(1)).alias("__ol")))
    return (p.join(obs_w, "item", "left").join(obs_l, "item", "left")
            .select("item", F.col("p").alias("strength"),
                    F.coalesce("__ow", F.lit(0)).cast("long")
                    .alias("n_wins"),
                    (F.coalesce("__ow", F.lit(0))
                     + F.coalesce("__ol", F.lit(0))).cast("long")
                    .alias("n_games")))


def preference_pairs(ratings: DataFrame, *,
                     group_col: str = "prompt_id",
                     item_col: str = "item_id",
                     score_col: str = "score",
                     margin: float = 0.0) -> DataFrame:
    """Chosen/rejected pair construction from per-item ratings — the
    step that turns raw scores into DPO/reward-model training rows:
    per group (prompt), pair the BEST-scored item against the
    WORST-scored one and keep the pair only when the score gap
    clears `margin` (low-margin pairs are label noise; every public
    preference-data recipe filters them).

    Deterministic pick: chosen = rank 1 by (score DESC, item ASC),
    rejected = rank 1 by (score ASC, item ASC); groups with one item
    or chosen == rejected are dropped. Best-vs-worst (rather than
    all-pairs) is the standard high-signal pairing and keeps output
    one row per group.

    Scale shape: two row_number windows partitioned by the group key
    over the same exchange — group cardinality bounds partition
    size (responses per prompt), nothing global. Columns:
    <group_col>, chosen_id, rejected_id, chosen_score,
    rejected_score, margin (round 6).
    """
    from pyspark.sql import Window

    g = ratings.select(F.col(group_col).alias("__g"),
                       F.col(item_col).alias("__i"),
                       F.col(score_col).cast("double").alias("__s"))
    w_best = Window.partitionBy("__g").orderBy(F.col("__s").desc(),
                                               F.col("__i").asc())
    w_worst = Window.partitionBy("__g").orderBy(F.col("__s").asc(),
                                                F.col("__i").asc())
    ranked = (g.withColumn("__rb", F.row_number().over(w_best))
              .withColumn("__rw", F.row_number().over(w_worst)))
    best = (ranked.filter(F.col("__rb") == 1)
            .select("__g", F.col("__i").alias("chosen_id"),
                    F.col("__s").alias("chosen_score")))
    worst = (ranked.filter(F.col("__rw") == 1)
             .select("__g", F.col("__i").alias("rejected_id"),
                     F.col("__s").alias("rejected_score")))
    out = (best.join(worst, "__g")
           .filter(F.col("chosen_id") != F.col("rejected_id"))
           .withColumn("margin",
                       F.round(F.col("chosen_score")
                               - F.col("rejected_score"), 6))
           .filter(F.col("margin") >= F.lit(float(margin))))
    return out.select(F.col("__g").alias(group_col),
                      "chosen_id", "rejected_id",
                      F.round("chosen_score", 6).alias("chosen_score"),
                      F.round("rejected_score", 6).alias("rejected_score"),
                      "margin")
