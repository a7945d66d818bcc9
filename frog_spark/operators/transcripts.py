"""Transcript-native curation operators: per-conversation session
stats, bigram-LM surprisal scoring, and canned-response mining.

The engine's payload is multi-turn conversation transcripts
(conv_id, turn_idx, role, text, tool, ts — BASELINE.json input_hint);
these operators curate at that grain, complementing the document-grain
X21-X30 set. All pure JVM (built-in pyspark.sql.functions, no Python
UDFs), each with a full ANSI-SQL oracle in __spark_entry__:

* ``conv_stats`` — per-conversation health/shape metrics for transcript
  QA: turn counts by role, tool-call count, token totals, role-
  alternation violations (consecutive same-role turns under the stable
  (conv_id, turn_idx) ordering — the reference's turn-order invariant),
  and missing-turn gaps. The lag window and the aggregate share ONE
  conv_id partitioning, so the whole operator is a single shuffle.
* ``bigram_surprisal`` — the two-pass conditional-LM upgrade of X24's
  unigram score: mean -log2 P(w_i | w_{i-1}) under the corpus's own
  add-k-smoothed bigram model. Pass 1 counts bigrams; the left-word
  denominator c(w1) is DERIVED from the bigram counts (sum over w2),
  not a third corpus scan, and the scoring join shuffles the exploded
  bigrams on the same key as the count aggregate, so AQE collapses it
  onto a ReusedExchange (gated in tests).
* ``canned_turns`` — template/canned-response mining: normalized turn
  texts appearing in >= min_convs DISTINCT conversations (the
  transcript-grain analogue of exact dedup — spam templates, canned
  support replies, injected boilerplate). One (text-hash) shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from frog_spark.operators.textstats import _words

ADD_K = 0.5


def conv_stats(tdf: DataFrame) -> DataFrame:
    """Per-conversation transcript stats.

    Output: (conv_id, n_turns, n_user, n_assistant, n_tool_calls,
    n_tokens, mean_turn_tokens, alternation_violations, missing_turns),
    one row per conversation. missing_turns counts holes in the
    turn_idx range (max - min + 1 - n_turns).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = tdf.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col("tool").isNotNull().alias("has_tool"),
        F.size(_words(F.col("text"))).cast("long").alias("turn_tokens"),
    ).withColumn("prev_role", F.lag("role").over(w))
    return (
        turns.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias(
                "n_user"
            ),
            F.sum(
                F.when(F.col("role") == "assistant", 1).otherwise(0)
            ).alias("n_assistant"),
            F.sum(F.when(F.col("has_tool"), 1).otherwise(0)).alias(
                "n_tool_calls"
            ),
            F.sum("turn_tokens").alias("n_tokens"),
            F.round(F.avg("turn_tokens"), 6).alias("mean_turn_tokens"),
            F.sum(
                F.when(F.col("prev_role") == F.col("role"), 1).otherwise(0)
            ).alias("alternation_violations"),
            (
                F.max("turn_idx") - F.min("turn_idx") + 1 - F.count("*")
            ).alias("missing_turns"),
        )
    )


def bigram_surprisal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mean bigram surprisal -log2 P(w_i|w_{i-1}) per document, add-k
    smoothed (k=0.5) with V = the corpus's left-word vocabulary size.

    P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k*V), where c(w1) is the count
    of w1 in non-final positions (the exact conditional denominator,
    derived by summing the bigram counts over w2 — never a third
    corpus pass). Documents with < 2 tokens report n_bigrams 0 and
    surprisal 0.0.

    Shuffle shape: the ONLY corpus-grain shuffle is the
    (doc, bigram) pre-aggregation (map-side combined); the global
    bigram/left-word/vocab model tables all derive from its output,
    and scoring is a join of the per-doc-distinct rows against the
    model plus a weighted average — the naive occurrence-grain
    formulation (score every bigram token row, then avg) shuffles the
    corpus three times and was rejected.
    """
    # the word array is bound as an attribute (see dedup.gram_sets: an
    # interpreted transform lambda re-evaluates inlined subtrees per
    # element), and built from ``text_col`` — the old SQL-string form
    # hardcoded the literal column name 'text'
    wdf = docs.select(F.col(id_col), _words(F.col(text_col)).alias("_w"))
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("_w") - 2),
        lambda i: F.concat(
            F.element_at("_w", i + 1), F.lit(" "), F.element_at("_w", i + 2)
        ),
    )
    # plain explode (not outer): a doc with < 2 tokens contributes no
    # rows and is recovered by the id-column left join at the end. A
    # null-bigram carrier row instead would make Catalyst push an
    # IsNotNull filter into only ONE of the two db consumers, breaking
    # the subplan identity AQE needs to reuse the (doc, bigram) shuffle
    exploded = wdf.select(
        F.col(id_col),
        F.explode(F.when(F.size("_w") >= 2, bigrams)).alias("bigram"),
    )
    # per-doc distinct-bigram counts: corpus-grain shuffle #1 (and last).
    # Eagerly materialized (the repo's union-branch lesson, see
    # BENCH/BASELINE.md and kg/triples.py): four consumers derive from
    # db (bigram counts, left-word counts, vocab size, scoring join),
    # and per-branch column pruning defeats AQE exchange reuse, so the
    # declarative form re-reads the corpus four times. Checkpointing the
    # much-smaller counts relation makes the corpus a single scan.
    db = (
        exploded.groupBy(id_col, "bigram")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    bc = (
        db.groupBy("bigram")
        .agg(F.sum("cnt").alias("c12"))
        .withColumn("w1", F.split("bigram", " ")[0])
    )
    w1_counts = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # w1_counts already has one row per distinct left word
    vocab = w1_counts.agg(F.count("*").alias("v"))
    model = (
        bc.join(w1_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            (
                -F.log2(
                    (F.col("c12") + F.lit(ADD_K))
                    / (F.col("c1") + F.lit(ADD_K) * F.col("v"))
                )
            ).alias("s"),
        )
    )
    agg = (
        db.join(model, "bigram")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.round(
                F.sum(F.col("cnt") * F.col("s")) / F.sum("cnt"), 6
            ).alias("avg_bigram_surprisal"),
        )
    )
    return docs.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        F.coalesce("avg_bigram_surprisal", F.lit(0.0)).alias(
            "avg_bigram_surprisal"
        ),
    )


def canned_turns(tdf: DataFrame, min_convs: int = 3) -> DataFrame:
    """Normalized turn texts appearing in >= min_convs distinct
    conversations — template/boilerplate mining at turn grain.

    Output: (text_fp, n_convs, n_turns, example_text) where text_fp is
    md5 of the whitespace-normalized lowercased text and example_text
    the lexicographically smallest raw text in the group. One shuffle
    on the fingerprint; the group key is a hash, never the full text.
    """
    norm = F.trim(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return (
        tdf.select(
            F.md5(norm).alias("text_fp"), "conv_id", F.col("text")
        )
        .groupBy("text_fp")
        .agg(
            F.countDistinct("conv_id").alias("n_convs"),
            F.count("*").alias("n_turns"),
            F.min("text").alias("example_text"),
        )
        .filter(F.col("n_convs") >= F.lit(min_convs))
    )


def context_windows(
    tdf: DataFrame, max_tokens: int = 512, overhead: int = 4
) -> DataFrame:
    """Per-conversation context-window assembly for SFT/agent training
    (X39): turns stream head-to-tail in the stable (conv_id, turn_idx)
    order, each costing ``overhead`` tokens (role header / separator)
    plus its text tokens, and the stream slices into windows of
    ``max_tokens`` — pack_documents' closed-form stream-offset
    assignment (turns may straddle a boundary) at conversation grain,
    where the conversation itself is the packing unit so no hash
    bucketing is needed.

    Output, one row per (conv_id, window_id): n_turns, first/last
    turn_idx, content n_tokens, total cost, fill = cost/max_tokens
    (only the last window of a conversation under-fills; interior
    straddle windows show fill >= 1). One conv_id shuffle shared by the
    running-sum window and the aggregate — deterministic under any
    partitioning at 10^12 turns.
    """
    cost = (F.size(_words(F.col("text"))) + F.lit(overhead)).cast("long")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = tdf.select("conv_id", "turn_idx", cost.alias("cost")).withColumn(
        "offset",
        F.coalesce(
            F.sum("cost").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ),
    )
    return (
        turns.withColumn(
            "window_id", F.floor(F.col("offset") / max_tokens).cast("long")
        )
        .groupBy("conv_id", "window_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
            F.sum("cost").alias("cost_tokens"),
            F.round(F.sum("cost") / F.lit(max_tokens), 6).alias("fill"),
        )
    )


def tool_transitions(tdf: DataFrame) -> DataFrame:
    """Agent-action Markov mining (X40): transition counts and
    probabilities between consecutive turn ACTIONS, where a turn's
    action is its tool name if it called one else its role — "after a
    search the assistant answers 78% of the time" analytics over agent
    transcripts.

    Output: (from_action, to_action, n, p) with p = n / sum(n) over
    from_action, rounded to 6. Conversation boundaries never produce a
    transition (lag is per-conv). One conv_id shuffle for the lag, one
    pair-key shuffle for the count; the probability normalizer is a
    window over the tiny per-pair relation.
    """
    action = F.coalesce(F.col("tool"), F.col("role"))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (
        tdf.select("conv_id", "turn_idx", action.alias("to_action"))
        .withColumn("from_action", F.lag("to_action").over(w))
        .where(F.col("from_action").isNotNull())
    )
    counts = pairs.groupBy("from_action", "to_action").agg(
        F.count("*").alias("n")
    )
    norm = Window.partitionBy("from_action")
    return counts.select(
        "from_action",
        "to_action",
        "n",
        F.round(F.col("n") / F.sum("n").over(norm), 6).alias("p"),
    )
