"""Graph pattern & constraint mining over the constructed KG:
triangle-closing link prediction, predicate functionality profiling,
inverse/symmetric predicate detection, role-signature schema
induction (X49-X51, X53).

The reference pipeline emits triples and stops (its tst.sh golden
diffs annotation output, reference/src/tst.sh:1-4); a KG materialized
from 10^12 turns of noisy transcripts immediately needs the mining
layer every production KG build runs next: which missing edges are
implied by the graph's own structure (link prediction feeds the
entity-linking reviewer queue), which predicates behave as functions
of their subject (functionality constraints catch extraction errors —
a person with 40 birth dates), and which predicate pairs are inverses
or symmetric (schema alignment: 'buys_from' vs 'sold_to' emitted by
different extractor versions describe the same fact). All three are
pure-JVM DataFrame plans with exact DuckDB oracles in __spark_entry__.

Scale notes (what holds at 1000 executors):

* ``link_prediction`` — the wedge join through common neighbors is
  quadratic in neighbor-node degree, so neighbors above
  ``max_neighbor_degree`` are excluded BEFORE the join (the same
  hub-bounding move as triangle_count's orientation): a celebrity node
  with 10^6 neighbors would alone generate 10^12 wedge rows, and its
  Adamic-Adar weight 1/log2(10^6) ~ 0.05 contributes ~nothing to the
  score it would have dominated the cost of. With cap c the fan-out is
  <= c per adjacency row, and every shuffle key is a node id. The
  float hazard of a cross-engine sum is handled the pagerank way:
  per-neighbor weights are rounded to 12 decimals before the sum, the
  sum to 6 after, so both engines add identical values.
* ``pred_profile`` — one partial-aggregated groupBy on the predicate
  (after a (s,p,o) distinct keyed on the triple): predicate
  cardinality is tiny, the aggregate is map-side combined, and the
  output is bounded by the schema size, not the data.
* ``role_signatures`` — two node-keyed shuffles to build each node's
  distinct role set, then a groupBy on the signature string whose
  cardinality is the number of DISCOVERED CONCEPTS (schema-sized, not
  data-sized). The signature string's length is bounded by the
  predicate count, not the node's edge count.
* ``inverse_preds`` — the edge table self-joined on the REVERSED node
  pair: join key (subj, obj) vs (obj, subj), one pair-keyed shuffle
  each side, then a groupBy on (pred, pred) whose cardinality is the
  square of the (tiny) predicate count. No per-predicate fan-out
  beyond the true reversed-pair matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frog_spark.kg.analytics import _undirected


def link_prediction(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    max_neighbor_degree: int = 64,
    top_k: int | None = None,
) -> DataFrame:
    """Triangle-closing link prediction over the undirected simple
    graph of ``edges`` (direction, predicate and multiplicity ignored).

    For every unordered node pair (a < b) NOT already connected that
    shares >= 1 common neighbor of degree <= ``max_neighbor_degree``,
    output (a, b, common_neighbors, aa_score) where aa_score is the
    Adamic-Adar index sum_z 1/log2(deg(z)) over those common neighbors
    (log2 for consistency with cooccurrence_pmi; a degree-1 node can
    never be a common neighbor, so the weight's denominator is never
    log2(1) = 0). ``top_k`` keeps the k best under the total order
    (aa_score DESC, a, b) — a distributed TakeOrdered, not a global
    sort.
    """
    und = _undirected(edges, src, dst).localCheckpoint(eager=True)
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy(F.col("nbr")).agg(F.count("*").alias("nbr_deg"))
    # hub exclusion BEFORE the wedge join — see module docstring
    adj_n = adj.join(deg, "nbr").where(
        F.col("nbr_deg") <= F.lit(max_neighbor_degree)
    )
    w1 = adj_n.select(F.col("nbr"), F.col("node").alias("a"), "nbr_deg")
    w2 = adj_n.select(F.col("nbr"), F.col("node").alias("b"))
    scores = (
        w1.join(w2, "nbr")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.round(
                F.sum(F.round(F.lit(1.0) / F.log2("nbr_deg"), 12)), 6
            ).alias("aa_score"),
        )
    )
    out = scores.join(und, ["a", "b"], "left_anti")
    if top_k is not None:
        out = out.orderBy(
            F.col("aa_score").desc(), F.col("a"), F.col("b")
        ).limit(top_k)
    return out


def pred_profile(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    pred: str = "pred",
) -> DataFrame:
    """Per-predicate cardinality / functionality profile over the
    distinct (subj, pred, obj) fact set.

    Output per predicate: n_facts (distinct s-o pairs), n_subj, n_obj,
    functionality = n_subj/n_facts and inv_functionality =
    n_obj/n_facts (both rounded to 6; the YAGO-style statistic — a
    functionality near 1.0 means the predicate maps each subject to
    ~one object, so multi-valued subjects under it are extraction
    errors worth a review queue).
    """
    e = edges.select(
        F.col(src).cast("string").alias("s"),
        F.col(pred).cast("string").alias("p"),
        F.col(dst).cast("string").alias("o"),
    ).distinct()
    return e.groupBy(F.col("p").alias("pred")).agg(
        F.count("*").alias("n_facts"),
        F.countDistinct("s").alias("n_subj"),
        F.countDistinct("o").alias("n_obj"),
        F.round(F.countDistinct("s") / F.count("*"), 6).alias("functionality"),
        F.round(F.countDistinct("o") / F.count("*"), 6).alias(
            "inv_functionality"
        ),
    )


def role_signatures(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    pred: str = "pred",
) -> DataFrame:
    """Schema induction by role signature: group nodes by the exact
    set of predicate roles they play (out:p for subjects of p, in:p
    for objects), i.e. the concepts a typeless KG's structure implies —
    'nodes that supply parts and get bought from' is a discovered
    entity type without any ontology input.

    Output per distinct signature (the sorted comma-joined role set):
    (signature, n_nodes, sample_node = min node id). Two node-keyed
    shuffles (role distinct + per-node collect), then a groupBy on the
    signature string whose cardinality is the concept count, not the
    node count. Role strings are ASCII-sorted identically by Spark's
    sort_array and the oracle's ORDER BY (both binary collation).
    """
    e = edges.select(
        F.col(src).cast("string").alias("s"),
        F.col(pred).cast("string").alias("p"),
        F.col(dst).cast("string").alias("o"),
    )
    roles = (
        e.select(
            F.col("s").alias("node"), F.concat(F.lit("out:"), F.col("p")).alias("role")
        )
        .unionAll(
            e.select(
                F.col("o").alias("node"),
                F.concat(F.lit("in:"), F.col("p")).alias("role"),
            )
        )
        .distinct()
    )
    sig = roles.groupBy("node").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("role"))).alias("signature")
    )
    return sig.groupBy("signature").agg(
        F.count("*").alias("n_nodes"), F.min("node").alias("sample_node")
    )


def inverse_preds(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    pred: str = "pred",
    min_overlap: int = 1,
) -> DataFrame:
    """Inverse / symmetric predicate pair mining over the distinct
    (subj, pred, obj) fact set.

    For predicate pairs (p <= q): overlap = |{(s,o) : p(s,o) and
    q(o,s)}| and score = overlap / min(|p|, |q|) (rounded to 6) — the
    AMIE-style confidence that q states p's facts reversed. p == q
    detects symmetric predicates (each symmetric fact pair then counts
    twice, once per direction — the oracle counts identically).
    Output: (p, q, overlap, n_p, n_q, score), overlap >= min_overlap.
    """
    e = (
        edges.select(
            F.col(src).cast("string").alias("s"),
            F.col(pred).cast("string").alias("p"),
            F.col(dst).cast("string").alias("o"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # consumed 3x: both join sides + sizes
    )
    sizes = e.groupBy("p").agg(F.count("*").alias("n"))
    rev = e.select(
        F.col("o").alias("s"), F.col("p").alias("q"), F.col("s").alias("o")
    )
    ov = (
        e.join(rev, ["s", "o"])
        .where(F.col("p") <= F.col("q"))
        .groupBy("p", "q")
        .agg(F.count("*").alias("overlap"))
        .where(F.col("overlap") >= F.lit(min_overlap))
    )
    return (
        ov.join(F.broadcast(sizes.select(F.col("p"), F.col("n").alias("n_p"))), "p")
        .join(
            F.broadcast(
                sizes.select(F.col("p").alias("q"), F.col("n").alias("n_q"))
            ),
            "q",
        )
        .select(
            "p",
            "q",
            "overlap",
            "n_p",
            "n_q",
            F.round(
                F.col("overlap") / F.least("n_p", "n_q").cast("double"), 6
            ).alias("score"),
        )
    )
