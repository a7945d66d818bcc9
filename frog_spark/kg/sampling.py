"""KG training-data export: deterministic neighbor sampling,
hash-ring negative sampling, and a DeepWalk-style random-walk corpus
(X57-X59).

A KG materialized from 10^12 turns is not an endpoint — it feeds
representation learning (GraphSAGE/KG-embedding training), and the two
exports every such trainer needs are (a) a bounded per-node neighbor
sample (fan-out capping, or a celebrity node's 10^6-row adjacency
blows up every minibatch that touches it) and (b) corrupted negative
triples. Both are pure-JVM DataFrame plans, deterministic BY HASH (no
RNG state, so any partition can be regenerated independently — the
property that makes the export resumable and the DuckDB oracle exact).

Scale notes (what holds at 1000 executors):

* ``neighbor_sample`` — one node-keyed shuffle + per-node window over
  the hash-ordered adjacency; the md5 order is a uniform
  without-replacement draw fixed by the edge identity, so re-runs and
  backfills sample identically. A celebrity node costs its
  deg·log(deg) sort inside its own partition — for graphs where one
  node's adjacency exceeds a partition, pre-aggregate with the salted
  two-stage top-k in functions/skew.py (same contract, two shuffles).
* ``random_walks`` — the walk state is one row per walker, and each
  step is one node-keyed join (compute the draw from the out-degree)
  plus one (node, rank) EQUALITY join into the ranked adjacency — a
  celebrity node contributes one row per walker per step, never a
  deg-wide fan-out. Hash draws mean no RNG state: any walk can be
  regenerated from (start, step) alone, so the export is resumable
  and the oracle unrolls the same k steps.
* ``negative_samples`` — the classic scale trap is "pick a uniformly
  random node", which naively needs a globally indexed node table
  (one giant sort). Here the global dense rank is computed the
  zipWithIndex way: per-bucket ranks (256 md5-prefix buckets, window
  partitioned by bucket) plus a 256-row cumulative-offset table the
  driver aggregates and broadcasts — the only driver state is those
  256 counts. The corrupt pick g = md5(fact) mod |V| then joins facts
  to nodes on the rank: one rank-keyed shuffle join. Draws that hit
  the true object (~1/|V| of rows) are DROPPED, not re-drawn — exact
  reproducibility beats completeness there, and the drop rate is
  reported by the caller comparing counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# cross-engine md5-hex-to-long (see functions/skew.py md5_bucket; the
# oracle recipe is ('0x'||substr(md5(x),1,15))::BIGINT)
_SEP = "\x1f"


def _md5_long(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def neighbor_sample(
    edges: DataFrame,
    k: int,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """At most ``k`` out-neighbors per node, drawn deterministically by
    md5 order over the distinct directed adjacency.

    Output: (node, nbr, sample_rank) with sample_rank in 1..k — the
    GraphSAGE-style fan-out cap. The draw is uniform
    without-replacement in the edge-identity hash, identical across
    re-runs, partitionings and engines (distinct pairs give distinct
    md5 keys, so the order is total).
    """
    e = edges.select(
        F.col(src).cast("string").alias("node"),
        F.col(dst).cast("string").alias("nbr"),
    ).distinct()
    key = F.md5(F.concat(F.col("node"), F.lit(_SEP), F.col("nbr")))
    w = Window.partitionBy("node").orderBy(key.alias("k"))
    return (
        e.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def random_walks(
    edges: DataFrame,
    k: int,
    src: str = "subj",
    dst: str = "obj",
    sources: DataFrame | None = None,
) -> DataFrame:
    """DeepWalk-style walk corpus: one k-step uniform random walk per
    start node, deterministic by hash (no RNG state).

    Step i moves from node v to the neighbor whose md5-order adjacency
    rank equals 1 + md5(walk_id, i, v) mod outdeg(v) — a fresh draw
    per (walk, step, node), so revisits re-draw rather than loop.
    Walks stop early at sinks (no out-edges). Output:
    (walk_id, step, node) with step 0..k; walk_id is the start node.

    Per step: one node-keyed join against the out-degree table to
    compute the draw, then one (node, rank)-keyed EQUALITY join
    against the ranked adjacency — a celebrity node's 10^6-row
    adjacency contributes exactly one row per walker, never a deg-wide
    fan-out that a join-then-filter formulation would materialize.
    Frontier lineage is localCheckpoint-truncated per step (khop
    precedent). ``sources`` (one-column) defaults to every node with
    an out-edge.
    """
    e = edges.select(
        F.col(src).cast("string").alias("node"),
        F.col(dst).cast("string").alias("nbr"),
    ).distinct()
    w = Window.partitionBy("node").orderBy(
        F.md5(F.concat(F.col("node"), F.lit(_SEP), F.col("nbr")))
    )
    adj = e.withColumn("rank", F.row_number().over(w)).localCheckpoint(
        eager=True
    )  # consumed every step
    deg = adj.groupBy("node").agg(F.max("rank").alias("outdeg"))
    if sources is None:
        starts = deg.select("node")
    else:
        starts = sources.select(
            F.col(sources.columns[0]).cast("string").alias("node")
        ).distinct()
    cur = starts.withColumn("walk_id", F.col("node")).select("walk_id", "node")
    out = cur.withColumn("step", F.lit(0).cast("long"))
    for i in range(1, k + 1):
        draw = F.lit(1) + F.pmod(
            _md5_long(
                F.concat(
                    F.col("walk_id"), F.lit(_SEP), F.lit(str(i)), F.lit(_SEP),
                    F.col("node"),
                )
            ),
            F.col("outdeg"),
        )
        cur = (
            cur.join(deg, "node")
            .withColumn("rank", draw)
            .join(adj, ["node", "rank"])
            .select("walk_id", F.col("nbr").alias("node"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            cur.withColumn("step", F.lit(i).cast("long"))
        )
    return out


def negative_samples(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    pred: str = "pred",
) -> DataFrame:
    """One corrupted-object negative per distinct fact, drawn from the
    node vocabulary by hash ring: neg_obj = the node whose global
    md5-order dense rank equals md5(fact) mod |V|.

    Output: (subj, pred, obj, neg_obj) with neg_obj != obj (true-object
    hits are dropped — ~1/|V| of rows, see module docstring). Fully
    deterministic: same input, same negatives, on any engine.
    """
    facts = (
        edges.select(
            F.col(src).cast("string").alias("s"),
            F.col(pred).cast("string").alias("p"),
            F.col(dst).cast("string").alias("o"),
        )
        .distinct()
        # consumed 3x (node derivation -> rank build + the counts
        # collect, then the pick join): materialize or the upstream
        # edge derivation re-executes per consumer
        .localCheckpoint(eager=True)
    )
    nodes = (
        facts.select(F.col("s").alias("node"))
        .unionAll(facts.select(F.col("o").alias("node")))
        .distinct()
        .withColumn("nmd5", F.md5(F.col("node")))
    )
    # global dense rank without a global sort: per-bucket window ranks
    # + a 256-row offset table (bucket = first 2 hex chars, so bucket
    # order is the md5 order's own prefix)
    nodes = nodes.withColumn("bucket", F.substring("nmd5", 1, 2))
    wb = Window.partitionBy("bucket").orderBy("nmd5")
    ranked = nodes.withColumn("brank", F.row_number().over(wb))
    counts = sorted(
        (r["bucket"], r["n"])
        for r in ranked.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    )  # <= 256 rows of driver state
    total, offsets = 0, []
    for b, n in counts:
        offsets.append((b, total))
        total += n
    if total == 0:
        return facts.select(
            F.col("s").alias("subj"),
            F.col("p").alias("pred"),
            F.col("o").alias("obj"),
            F.lit(None).cast("string").alias("neg_obj"),
        ).limit(0)
    off_df = ranked.sparkSession.createDataFrame(offsets, "bucket string, off long")
    ranked = ranked.join(F.broadcast(off_df), "bucket").select(
        "node", (F.col("off") + F.col("brank") - 1).alias("grank")
    )
    g = F.pmod(
        _md5_long(
            F.concat(
                F.col("s"), F.lit(_SEP), F.col("p"), F.lit(_SEP), F.col("o"),
                F.lit("#neg"),
            )
        ),
        F.lit(total),
    )
    picked = facts.withColumn("g", g).join(
        ranked, F.col("g") == F.col("grank")
    )
    return (
        picked.where(F.col("node") != F.col("o"))
        .select(
            F.col("s").alias("subj"),
            F.col("p").alias("pred"),
            F.col("o").alias("obj"),
            F.col("node").alias("neg_obj"),
        )
    )
