"""Distributed IGTree/MBT/MBLEM training — training as a Spark job.

The reference trains its shipped models on corpora far beyond a driver
loop: a 10.9M-token POS corpus, the 595k-entry e-Lex lemma lexicon and
3.2M CELEX-derived MBMA instances (/root/reference/docs/source/
advanced.rst:121-191,260-287 — froggen drives Timbl/Mbt over these
files single-node). This module re-expresses that training stage as
Spark jobs so the same pipeline scales to cluster-sized corpora:

  * instance extraction is row/sentence-local (pandas UDFs over the
    corpus DataFrame — the same per-sentence independence the annotation
    pass exploits);
  * gain-ratio feature weighting is two JVM-side aggregations over the
    melted (feature, value, class) relation — no Python in the loop and
    nothing larger than #features rows ever reaches the driver;
  * the IGTree trie itself is built by PARTITIONED RECURSION: instances
    are shuffled once on their top-k feature-value prefix (the first
    levels of the trie in gain order), every prefix group builds its
    subtree independently inside applyInPandas, and the driver only
    assembles the top k levels from pickled subtrees + per-prefix class
    counts. The assembled tree is bit-for-bit the tree the single-node
    trainer produces (tests/test_train_distributed.py asserts parity)
    because IGTree's compression rule is local: a child is kept iff it
    has children of its own or disagrees with its parent's label.

Driver memory stays bounded by the COMPRESSED model size (which must be
broadcast for classification anyway), never by the instance count.
"""

from __future__ import annotations

import math
import pickle
from collections import Counter
from typing import Iterator  # noqa: UP035 — pyspark typehint resolution

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from frog_spark.models.igtree import IGTree, _Node

__all__ = [
    "gain_ratios_distributed",
    "mbt_instances",
    "train_mbt_distributed",
    "train_igtree_distributed",
    "mblem_instances",
    "train_mblem_distributed",
    "mbma_word_rows",
    "train_mbma_distributed",
    "synthetic_lexicon",
    "dep_instances",
    "train_depparser_distributed",
    "gold_sentences_df",
]


# --------------------------------------------------------------------------
# gain-ratio feature ordering as two Spark aggregations
# --------------------------------------------------------------------------

def gain_ratios_distributed(inst: DataFrame, feats_col: str = "feats", cls_col: str = "cls") -> list[float]:
    """Gain ratio per feature, computed JVM-side.

    H terms use the log-sum identity H = log2(n) - sum(c*log2(c))/n so a
    single groupBy((feat,value,class)) + groupBy((feat,value)) +
    groupBy(feat) cascade yields every conditional entropy; only
    #features rows are collected.
    """
    n_feat = inst.select(F.size(feats_col).alias("k")).first()["k"]
    total = inst.count()
    base_rows = inst.groupBy(cls_col).count().collect()
    base = _entropy_from_counts([r["count"] for r in base_rows])

    melted = inst.select(
        F.col(cls_col).alias("cls"),
        F.posexplode(F.col(feats_col)).alias("feat", "val"),
    )
    c3 = melted.groupBy("feat", "val", "cls").agg(F.count("*").alias("c"))
    lg2 = math.log(2.0)
    per_fv = c3.groupBy("feat", "val").agg(
        F.sum("c").alias("n_v"),
        F.sum(F.col("c") * F.log("c") / F.lit(lg2)).alias("clogc"),
    )
    # H(C|f=v) = log2(n_v) - clogc/n_v ; rem(f) = sum_v n_v/N * H(C|f=v)
    per_f = (
        per_fv.withColumn(
            "h_v", F.log("n_v") / F.lit(lg2) - F.col("clogc") / F.col("n_v")
        )
        .groupBy("feat")
        .agg(
            F.sum(F.col("n_v") * F.col("h_v")).alias("rem_num"),
            F.sum(F.col("n_v") * (F.log("n_v") / F.lit(lg2))).alias("nlogn"),
            F.sum("n_v").alias("n"),
        )
        .collect()
    )
    gains = [0.0] * n_feat
    for r in per_f:
        rem = r["rem_num"] / total
        # split info = entropy of the value-count distribution
        split_info = math.log2(total) - r["nlogn"] / total
        gain = base - rem
        gains[r["feat"]] = gain / split_info if split_info > 0 else 0.0
    return gains


def _entropy_from_counts(counts: list[int]) -> float:
    total = sum(counts)
    if total == 0:
        return 0.0
    return sum(-(c / total) * math.log2(c / total) for c in counts if c)


# --------------------------------------------------------------------------
# partitioned trie build
# --------------------------------------------------------------------------

def train_igtree_distributed(
    inst: DataFrame,
    feats_col: str = "feats",
    cls_col: str = "cls",
    feature_order: list[int] | None = None,
    prefix_depth: int = 2,
    hash_bucket_groups: int | None = None,
    input_cached: bool = False,
) -> IGTree:
    """Build an IGTree from a DataFrame of (features array, class) rows.

    One shuffle on the top-``prefix_depth`` feature-value prefix; each
    prefix group recurses independently (IGTree._build, the exact
    single-node code path) inside applyInPandas and returns a pickled
    subtree. ``prefix_depth=2`` bounds group skew: the hottest single
    top value (e.g. final character 'n' over a Dutch lexicon — the -en
    suffix) is split by its second feature into many groups.

    ``hash_bucket_groups``: when the top feature is HIGH-CARDINALITY
    (MBT's known-word tree keys on the word itself — one group per
    vocabulary entry would mean millions of tiny applyInPandas
    invocations), set this to hash the prefix into that many COARSE
    groups instead; each group builds every distinct prefix's subtree it
    received in one pandas pass. The assembled tree is identical either
    way — only the shuffle granularity changes.
    """
    # the instance relation feeds several jobs (root counts, inner-level
    # counts, the subtree build — plus gain ratios when the order is
    # derived); an un-cached UDF-produced lineage would re-run the
    # extraction once per job (branch re-execution), so cache it for the
    # duration of training unless the caller already did.
    # ``input_cached``: set when ``inst`` is a cheap projection/filter of
    # a relation the CALLER has persisted (the fused MBT/parser instance
    # caches) — persisting again here would copy the data into a second
    # cache and, at 10^7-instance scale, push the combined footprint
    # into disk spill (measured +50% wall at 10.9M tokens).
    we_persisted = False
    if not inst.is_cached and not input_cached:
        inst = inst.persist(StorageLevel.MEMORY_AND_DISK)
        we_persisted = True
    first = inst.first()
    if first is None:
        # empty instance base (e.g. an all-punctuation corpus's unknown-
        # word base) — mirror IGTree.train's empty-tree return
        if we_persisted:
            inst.unpersist()
        return IGTree(feature_order or [], _Node("", {}))
    if feature_order is not None:
        # mirror IGTree.train's permutation guard: an out-of-range index
        # in a fixed order makes F.col(feats)[i] yield null prefix keys
        # and silently mis-trains
        n_feat = len(first[feats_col])
        if sorted(feature_order) != list(range(n_feat)):
            if we_persisted:
                inst.unpersist()  # don't leak the cache on the error path
            raise ValueError(
                f"feature_order {feature_order} is not a permutation of "
                f"0..{n_feat - 1} — a feature added to the extractor "
                "without updating the order would silently never be read"
            )
    if feature_order is None:
        gains = gain_ratios_distributed(inst, feats_col, cls_col)
        feature_order = sorted(range(len(gains)), key=lambda f: -gains[f])
    d = max(1, min(prefix_depth, len(feature_order)))
    top = feature_order[:d]
    order = list(feature_order)

    # per-prefix-level class counts for the driver-assembled INNER levels
    # (1..d-1 only: depth-d nodes arrive as pickled subtrees that carry
    # their own distributions, so level-d counts would be redundant
    # driver traffic)
    level_counts: list[list] = []
    for j in range(d - 1):
        keys = [F.col(feats_col)[top[i]].alias(f"k{i}") for i in range(j + 1)]
        level_counts.append(
            inst.groupBy(*keys, F.col(cls_col).alias("cls"))
            .agg(F.count("*").alias("c"))
            .collect()
        )
    root_rows = inst.groupBy(F.col(cls_col).alias("cls")).agg(F.count("*").alias("c")).collect()

    key_cols = [f"k{i}" for i in range(d)]
    sub_schema = ", ".join([f"k{i} string" for i in range(d)] + ["subtree binary"])

    def build_group(pdf: pd.DataFrame) -> pd.DataFrame:
        insts = pdf[feats_col].tolist()
        classes = pdf[cls_col].tolist()
        node = IGTree._build(insts, classes, order, d)
        out = {f"k{i}": [str(pdf[f"k{i}"].iloc[0])] for i in range(d)}
        out["subtree"] = [pickle.dumps(node, protocol=4)]
        return pd.DataFrame(out)

    def build_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # one coarse hash bucket holds MANY distinct prefixes: build each
        # prefix's subtree with the same recursion, one output row per
        # prefix (identical trees, fewer/larger shuffle groups)
        out_keys: list[list[str]] = [[] for _ in range(d)]
        blobs = []
        for key, sub in pdf.groupby(key_cols, sort=False, dropna=False):
            key = key if isinstance(key, tuple) else (key,)
            node = IGTree._build(
                sub[feats_col].tolist(), sub[cls_col].tolist(), order, d
            )
            for i in range(d):
                out_keys[i].append(str(key[i]))
            blobs.append(pickle.dumps(node, protocol=4))
        out = {f"k{i}": out_keys[i] for i in range(d)}
        out["subtree"] = blobs
        return pd.DataFrame(out)

    keyed = inst.select(
        feats_col,
        cls_col,
        *[F.col(feats_col)[top[i]].alias(f"k{i}") for i in range(d)],
    )
    if hash_bucket_groups:
        bucketed = keyed.withColumn(
            "_g",
            F.pmod(F.xxhash64(*key_cols), F.lit(hash_bucket_groups)),
        )
        sub_rows = (
            bucketed.groupBy("_g")
            .applyInPandas(build_bucket, schema=sub_schema)
            .collect()
        )
    else:
        sub_rows = (
            keyed.groupBy(*key_cols)
            .applyInPandas(build_group, schema=sub_schema)
            .collect()
        )
    if we_persisted:
        inst.unpersist()

    # assemble the top d levels from the collected aggregates
    def node_from(counter: Counter) -> _Node:
        label = min(counter.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        node = _Node(label, dict(counter))
        node.support = sum(counter.values())
        return node

    root = node_from(Counter({r["cls"]: r["c"] for r in root_rows}))
    # prefix -> node for levels 1..d-1 (inner), d (subtrees)
    by_prefix: dict[tuple, _Node] = {(): root}
    for j in range(d - 1):
        agg: dict[tuple, Counter] = {}
        for r in level_counts[j]:
            key = tuple(str(r[f"k{i}"]) for i in range(j + 1))
            agg.setdefault(key, Counter())[r["cls"]] = r["c"]
        for key, counter in agg.items():
            by_prefix[key] = node_from(counter)

    for r in sub_rows:
        key = tuple(str(r[f"k{i}"]) for i in range(d))
        # the subtree IS the depth-d node (dist included in the pickle)
        by_prefix[key] = pickle.loads(bytes(r["subtree"]))

    # attach children bottom-up with IGTree's compression rule; pruned
    # values at LOW-SUPPORT parents are recorded in ``seen`` exactly as
    # the driver trainer does (IGTree._build), so classify's
    # partial-match backtrack behaves identically on both trees
    k_min = IGTree.SEEN_RECORD_SUPPORT
    pruned_at: dict[tuple, set] = {}
    for j in range(d, 0, -1):
        for key, node in list(by_prefix.items()):
            if len(key) != j:
                continue
            parent = by_prefix[key[:-1]]
            if node.children or node.label != parent.label:
                parent.children[key[-1]] = node
            elif sum(parent.dist.values()) < k_min:
                pruned_at.setdefault(key[:-1], set()).add(key[-1])
    for key, vals in pruned_at.items():
        by_prefix[key].seen = frozenset(vals)
    return IGTree(feature_order, root)


# --------------------------------------------------------------------------
# MBLEM training as a Spark job (L1/L2 at e-Lex scale)
# --------------------------------------------------------------------------

def mblem_instances(lexicon: DataFrame) -> DataFrame:
    """(word, tag, lemma) rows -> (word, feats array<string>, cls) —
    one row per distinct word, class = '|'-joined sorted edit-rule
    alternatives. Everything except the edit-class derivation (a pandas
    UDF over Arrow batches) is JVM-side."""
    from frog_spark.operators.lemmatizer import WINDOW, _edit_class, _instance

    @F.pandas_udf("string")
    def edit_class(word: pd.Series, tag: pd.Series, lemma: pd.Series) -> pd.Series:
        return pd.Series(
            [_edit_class(w, t, le) for w, t, le in zip(word, tag, lemma)],
            dtype=object,
        )

    @F.pandas_udf("array<string>")
    def char_window(word: pd.Series) -> pd.Series:
        return pd.Series([_instance(w) for w in word], dtype=object)

    # classification lowercases (Mblem.train does the same): surfaces
    # are lowered BEFORE edit-class derivation and windowing so the
    # memory shortcut and the exact-match leaf stay reachable for
    # capitalized training rows
    lowered = lexicon.select(
        F.lower(F.col("word")).alias("word"), F.col("tag"), F.col("lemma")
    )
    per_word = (
        lowered.select(
            F.col("word"), edit_class("word", "tag", "lemma").alias("ec")
        )
        .groupBy("word")
        .agg(F.concat_ws("|", F.array_sort(F.collect_set("ec"))).alias("cls"))
    )
    return per_word.select("word", char_window("word").alias("feats"), "cls")


def train_mblem_distributed(spark: SparkSession, lexicon: DataFrame):
    """Full Mblem from a lexicon DataFrame: memory map + IGTree, both via
    Spark jobs. Alternative classes are sorted (deterministic under any
    partitioning — first-seen order does not exist in a distributed
    input). Returns an operators.lemmatizer.Mblem ready for
    FrogPipeline."""
    from frog_spark.operators.lemmatizer import WINDOW, Mblem

    inst = mblem_instances(lexicon).persist(StorageLevel.MEMORY_AND_DISK)
    # the memory (exact-match shortcut) is the same relation the
    # instances come from — one pass, fetched as Arrow batches (toPandas;
    # row-by-row py4j collect of half a million rows costs more than the
    # whole training job), materialized as the word->class dict Timbl's
    # instance base stores. The persist covers the memory fetch AND every
    # training job (unpersisted before return — no cache outlives the
    # call).
    mem_pdf = inst.select("word", "cls").toPandas()
    memory = dict(zip(mem_pdf["word"], mem_pdf["cls"]))
    order = list(range(WINDOW - 1, -1, -1))  # right-aligned suffix window
    tree = train_igtree_distributed(inst, feature_order=order, prefix_depth=2)
    inst.unpersist()
    return Mblem(tree, memory)


# --------------------------------------------------------------------------
# MBT (POS tagger) training as a Spark job (P1 at 10.9M-token-corpus scale)
# --------------------------------------------------------------------------

def mbt_instances(sent_df: DataFrame, ambitag, unk_words=None) -> DataFrame:
    """Tagged-sentence DataFrame (words array, tags array) -> ONE fused
    (kind 'known'|'unk', feats, cls) instance relation. Extraction is
    sentence-local (training contexts use GOLD previous tags,
    tagger_base.cxx training mode); emitting both bases from a single
    mapInPandas pass halves corpus I/O versus the earlier one-pass-per-
    base layout — the corpus is the big thing at 10.9M tokens, the
    instances are skinny. ``ambitag`` may be a plain dict or an
    ``sc.broadcast`` handle — pass the broadcast at corpus scale so the
    vocabulary-sized map ships once per executor instead of being
    pickled into every task. ``unk_words``: the unknown-base word set
    (MBTagger._unknown_base_words — rare, open-class), plain or
    broadcast; None admits every word (pre-round-4 behavior)."""
    from frog_spark.models.mbt import (
        BOUNDARY,
        MBTagger,
        _unknown_feats,
        _word_key,
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        amb = ambitag.value if hasattr(ambitag, "value") else ambitag
        unk = unk_words.value if hasattr(unk_words, "value") else unk_words
        for b in batches:
            kinds, feats, cls = [], [], []
            for words, tags in zip(b["words"], b["tags"]):
                prev_tag = prev2_tag = BOUNDARY
                n = len(words)
                for i in range(n):
                    word, tag = words[i], tags[i]
                    next_ambi = (
                        amb.get(_word_key(words[i + 1]), BOUNDARY)
                        if i + 1 < n
                        else BOUNDARY
                    )
                    kinds.append("known")
                    feats.append([prev2_tag, prev_tag, _word_key(word), next_ambi])
                    cls.append(tag)
                    if (unk is None or _word_key(word) in unk) and any(
                        ch.isalnum() for ch in word
                    ):
                        kinds.append("unk")
                        feats.append(_unknown_feats(prev_tag, word, next_ambi))
                        cls.append(tag)
                        # rare-NEXT __UNK__ copy, mirroring the driver
                        # trainer (MBTagger.train): builds the
                        # unknown-neighbor branches the test-time walk
                        # needs when the following word is out of every
                        # lexicon
                        if (
                            unk is not None
                            and i + 1 < n
                            and _word_key(words[i + 1]) in unk
                        ):
                            kinds.append("unk")
                            feats.append(
                                _unknown_feats(prev_tag, word, MBTagger.UNK_AMBI)
                            )
                            cls.append(tag)
                    prev2_tag, prev_tag = prev_tag, tag
            yield pd.DataFrame(
                {
                    "kind": pd.Series(kinds, dtype=object),
                    "feats": pd.Series(feats, dtype=object),
                    "cls": pd.Series(cls, dtype=object),
                }
            )

    return sent_df.mapInPandas(
        extract, schema="kind string, feats array<string>, cls string"
    )


def train_mbt_distributed(
    spark: SparkSession, sent_df: DataFrame, hash_bucket_groups: int = 256,
    ext_lexicon: dict[str, list[str]] | None = None,
):
    """MBTagger trained by Spark jobs: lexicon/ambitag from one groupBy
    over exploded (word, tag) pairs, both case bases via the partitioned
    IGTree build with MBT's fixed feature orders (models/mbt.py:93-96).
    The collected lexicon is the model's own broadcastable state — the
    instance relation itself never reaches the driver.  ``ext_lexicon``
    (the inflection lexicon's word -> tags map) rides along unchanged;
    the tag-transition bigram the ambiguity tie-break needs is one more
    JVM-side aggregation over the same corpus."""
    from frog_spark.models.mbt import BOUNDARY, KNOWN_ORDER, UNKNOWN_ORDER, MBTagger, _word_key

    @F.pandas_udf("string")
    def word_key(w: pd.Series) -> pd.Series:
        return pd.Series([_word_key(x) for x in w], dtype=object)

    pairs = sent_df.select(
        F.explode(F.arrays_zip("words", "tags")).alias("p")
    ).select(word_key(F.col("p.words")).alias("w"), F.col("p.tags").alias("t"))
    # Arrow fetch: the lexicon is vocabulary-sized (tens of thousands of
    # rows) — row-by-row py4j collect() costs more than the aggregation
    lex_pdf = pairs.groupBy("w", "t").agg(F.count("*").alias("c")).toPandas()
    lexicon: dict[str, Counter] = {}
    for w, t, c in zip(lex_pdf["w"], lex_pdf["t"], lex_pdf["c"]):
        lexicon.setdefault(w, Counter())[t] = int(c)
    ambitag = {w: "|".join(sorted(cnt)) for w, cnt in lexicon.items()}

    # (prev_tag, tag) transition counts, JVM-side: prepend the boundary
    # marker and zip each tag with its predecessor
    bg_pdf = (
        sent_df.select(
            F.explode(
                F.arrays_zip(
                    F.concat(
                        F.array(F.lit(BOUNDARY)),
                        F.slice(F.col("tags"), 1, F.greatest(F.size("tags") - 1, F.lit(0))),
                    ),
                    F.col("tags"),
                )
            ).alias("p")
        )
        .where(F.col("p")["tags"].isNotNull())  # empty-sentence zip padding
        .groupBy(F.col("p")["0"].alias("prev"), F.col("p")["tags"].alias("t"))
        .agg(F.count("*").alias("c"))
        .toPandas()
    )
    bigram = {
        (p, t): int(c) for p, t, c in zip(bg_pdf["prev"], bg_pdf["t"], bg_pdf["c"])
    }

    # cache the FUSED relation and materialize it with one count(): the
    # corpus is scanned exactly once; the per-base filters below (and
    # the caches train_igtree_distributed layers on them) read from this
    # cache, never re-running the extraction UDF (branch re-execution)
    inst = mbt_instances(
        sent_df,
        spark.sparkContext.broadcast(ambitag),
        spark.sparkContext.broadcast(MBTagger._unknown_base_words(lexicon)),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    inst.count()
    known = inst.filter(F.col("kind") == "known").select("feats", "cls")
    unk = inst.filter(F.col("kind") == "unk").select("feats", "cls")
    # the known tree keys on the WORD: per-value groups would mean one
    # applyInPandas invocation per vocabulary entry, so hash the prefix
    # into coarse buckets (identical tree, bounded group count)
    known_tree = train_igtree_distributed(
        known, feature_order=list(KNOWN_ORDER), prefix_depth=2,
        hash_bucket_groups=hash_bucket_groups, input_cached=True,
    )
    unknown_tree = train_igtree_distributed(
        unk, feature_order=list(UNKNOWN_ORDER), prefix_depth=2,
        hash_bucket_groups=hash_bucket_groups, input_cached=True,
    )
    inst.unpersist()
    return MBTagger(
        lexicon, known_tree, unknown_tree,
        ext_lexicon=ext_lexicon, bigram=bigram,
    )


# --------------------------------------------------------------------------
# MBMA training as a Spark job (M2 at CELEX scale — 3.2M instances,
# reference advanced.rst:182-191)
# --------------------------------------------------------------------------

def mbma_word_rows(lexicon: DataFrame) -> DataFrame:
    """(word, tag, morph) rows -> per-word training rows via the SAME
    rule the driver trainer applies (Mbma.train_word_row: class
    synthesis + full rule-engine round-trip verification, all row-local
    Python inside Arrow batches). Output: (kind 'mem'|'exc', key,
    classes array — engine classes for mem, [morph] for exc)."""
    from frog_spark.operators.morpho import Mbma

    # input order is the convention-dominance signal (corpus rows and
    # the lexicon's per-surface primary reading come first): pin it to
    # an explicit column BEFORE any shuffle so the per-key resolution
    # can replay the driver's first-seen rule
    with_ord = lexicon.withColumn("ord", F.monotonically_increasing_id())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ords, kinds, keys, tags, morphs, payloads = [], [], [], [], [], []
            for word, tag, morph, o in zip(
                b["word"], b["tag"], b["morph"], b["ord"]
            ):
                row = Mbma.train_word_row(word, tag, morph, set())
                if row is None:
                    continue
                kind, key, payload = row
                ords.append(o)
                kinds.append(kind)
                keys.append(key)
                tags.append(tag)
                morphs.append(morph)
                payloads.append(payload if kind == "mem" else [payload])
            yield pd.DataFrame(
                {
                    "ord": pd.Series(ords, dtype="int64"),
                    "kind": pd.Series(kinds, dtype=object),
                    "key": pd.Series(keys, dtype=object),
                    "tag": pd.Series(tags, dtype=object),
                    "morph": pd.Series(morphs, dtype=object),
                    "classes": pd.Series(payloads, dtype=object),
                }
            )

    return with_ord.mapInPandas(
        run,
        schema=(
            "ord long, kind string, key string, tag string, "
            "morph string, classes array<string>"
        ),
    )


def train_mbma_distributed(spark: SparkSession, lexicon: DataFrame):
    """Full Mbma from a (word, tag, morph) lexicon DataFrame.

    Class synthesis + rule-engine round-trip run distributed
    (mbma_word_rows); the per-char 6+1+6 instance windows explode in a
    second Arrow pass; the IGTree builds via the partitioned recursion
    with MBMA's center-out feature order. Deviation from the driver
    trainer: duplicate surface words resolve by min(tag, morph) instead
    of input order (a distributed input has no first-seen order)."""
    from frog_spark.operators.morpho import CONTEXT, PAD, Mbma

    # all rows of one cleaned key meet in one group (two raw words can
    # normalize to the same key across partitions); the shared
    # Mbma.resolve_key_rows policy then replays the driver trainer
    # exactly — first row (by pinned input order) wins, additional
    # readings merge into per-char alternative classes when the
    # homograph merge round-trips
    grouped = (
        mbma_word_rows(lexicon)
        .groupBy("key")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ord", "kind", "tag", "morph", "classes"))
            ).alias("rs")
        )
    )

    def resolve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            kinds, keys, payloads = [], [], []
            for key, rs in zip(b["key"], b["rs"]):
                kind, payload = Mbma.resolve_key_rows(
                    key,
                    [(r["kind"], r["tag"], r["morph"],
                      r["classes"] if r["kind"] == "mem" else r["classes"][0])
                     for r in rs],
                )
                kinds.append(kind)
                keys.append(key)
                payloads.append(payload if kind == "mem" else [payload])
            yield pd.DataFrame(
                {
                    "kind": pd.Series(kinds, dtype=object),
                    "key": pd.Series(keys, dtype=object),
                    "classes": pd.Series(payloads, dtype=object),
                }
            )

    rows = grouped.mapInPandas(
        resolve, schema="kind string, key string, classes array<string>"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    mem_pdf = rows.filter(F.col("kind") == "mem").select("key", "classes").toPandas()
    memory = {k: list(v) for k, v in zip(mem_pdf["key"], mem_pdf["classes"])}
    exc_pdf = rows.filter(F.col("kind") == "exc").select("key", "classes").toPandas()
    exceptions: dict[str, tuple[str, str]] = {}
    for k, v in zip(exc_pdf["key"], exc_pdf["classes"]):
        exceptions[k] = (v[0], "0")
        exceptions[k.lower()] = (v[0], "0")

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        span = 2 * CONTEXT + 1
        for b in batches:
            feats, cls = [], []
            for base, classes in zip(b["key"], b["classes"]):
                lb = base.lower()
                padded = PAD * CONTEXT + lb + PAD * CONTEXT
                for i, c in enumerate(classes):
                    feats.append(list(padded[i : i + span]))
                    cls.append(c)
            yield pd.DataFrame(
                {"feats": pd.Series(feats, dtype=object), "cls": pd.Series(cls, dtype=object)}
            )

    inst = rows.filter(F.col("kind") == "mem").mapInPandas(
        windows, schema="feats array<string>, cls string"
    )
    tree = train_igtree_distributed(
        inst, feature_order=Mbma.feature_order(), prefix_depth=2
    )
    rows.unpersist()
    return Mbma(tree, memory, exceptions)


# --------------------------------------------------------------------------
# CSI-DP parser training as a Spark job (D1-D7 at treebank scale —
# the reference trains pairs/dir/rels from a multi-million-word treebank,
# /root/reference/docs/source/advanced.rst; froggen drives Timbl there)
# --------------------------------------------------------------------------

TREEBANK_SCHEMA = (
    "words array<string>, tags array<string>, lemmas array<string>, "
    "dep_units array<int>, dep_heads array<int>, dep_rels array<string>"
)


def gold_sentences_df(spark: SparkSession, gold) -> DataFrame:
    """GoldSentence list -> the treebank DataFrame shape (token arrays +
    unit-space dep arrays), so gold and generated sentences union into
    one training relation."""
    rows = []
    for s in gold:
        items = sorted(s.deps.items())
        rows.append(
            (
                [t.word for t in s.tokens],
                [t.pos for t in s.tokens],
                [t.lemma for t in s.tokens],
                [u for u, _ in items],
                [h for _, (h, _r) in items],
                [r for _, (_h, r) in items],
            )
        )
    return spark.createDataFrame(rows, schema=TREEBANK_SCHEMA)


def dep_instances(sent_df: DataFrame, mwu_lexicon: dict | None = None) -> DataFrame:
    """Treebank rows -> (kind 'pairs'|'dir'|'rels', feats, cls) — the
    exact instance/class construction of DepParser.train
    (operators/parser.py), sentence-local inside one mapInPandas pass.
    The 3-entry MWU lexicon ships in the task closure."""
    from frog_spark.operators.mwu import resolve_mwus
    from frog_spark.operators.parser import (
        dir_instances,
        pair_instances,
        prepare,
        rel_instances,
    )
    from frog_spark.sources.resources import load_mwu_lexicon

    lexicon = mwu_lexicon if mwu_lexicon is not None else load_mwu_lexicon()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            kinds, feats, cls = [], [], []
            for words, tags, lemmas, du, dh, dr in zip(
                b["words"], b["tags"], b["lemmas"],
                b["dep_units"], b["dep_heads"], b["dep_rels"],
            ):
                deps = {int(u): (int(h), r) for u, h, r in zip(du, dh, dr)}
                units = resolve_mwus(
                    list(words), list(tags), [1.0] * len(words), list(lemmas), lexicon
                )
                ws, hs, ms = prepare(units)
                pi, keys = pair_instances(ws, hs, ms)
                for inst, (dep, head) in zip(pi, keys):
                    gold_head, rel = deps.get(dep + 1, (-1, ""))
                    if head is None:
                        c = rel if gold_head == 0 else "__"
                    else:
                        c = rel if gold_head == head + 1 else "__"
                    kinds.append("pairs"); feats.append(inst); cls.append(c)
                for i, inst in enumerate(dir_instances(ws, hs, ms)):
                    gold_head, _rel = deps.get(i + 1, (-1, ""))
                    if gold_head == 0:
                        c = "ROOT"
                    elif gold_head > 0:
                        c = "LEFT" if gold_head - 1 < i else "RIGHT"
                    else:
                        c = "ROOT"
                    kinds.append("dir"); feats.append(inst); cls.append(c)
                for i, inst in enumerate(rel_instances(ws, hs, ms)):
                    _gh, rel = deps.get(i + 1, (0, "ROOT"))
                    kinds.append("rels"); feats.append(inst); cls.append(rel or "ROOT")
            yield pd.DataFrame(
                {
                    "kind": pd.Series(kinds, dtype=object),
                    "feats": pd.Series(feats, dtype=object),
                    "cls": pd.Series(cls, dtype=object),
                }
            )

    return sent_df.mapInPandas(
        extract, schema="kind string, feats array<string>, cls string"
    )


def train_depparser_distributed(
    spark: SparkSession, sent_df: DataFrame, hash_bucket_groups: int = 256
):
    """Full DepParser (pairs + dir + rels IGTrees) from a treebank
    DataFrame, each tree built by the partitioned recursion with its
    gain-ratio order computed as Spark aggregations — structural parity
    with DepParser.train on the same sentences is test-asserted.
    ``hash_bucket_groups``: the gain-ratio order may rank a word-valued
    feature first (vocabulary-sized value set), so prefixes hash into
    coarse groups (identical tree, bounded group count)."""
    from frog_spark.operators.parser import (
        DIR_ORDER,
        PAIRS_ORDER,
        RELS_ORDER,
        DepParser,
    )

    inst = dep_instances(sent_df).persist(StorageLevel.MEMORY_AND_DISK)
    inst.count()  # materialize ONCE before the three per-kind consumers
    trees = {}
    for kind, order in (
        ("pairs", PAIRS_ORDER), ("dir", DIR_ORDER), ("rels", RELS_ORDER)
    ):
        trees[kind] = train_igtree_distributed(
            inst.filter(F.col("kind") == kind).select("feats", "cls"),
            feature_order=list(order),
            prefix_depth=2,
            hash_bucket_groups=hash_bucket_groups,
            input_cached=True,
        )
    inst.unpersist()
    return DepParser(trees["pairs"], trees["dir"], trees["rels"])


# --------------------------------------------------------------------------
# synthetic e-Lex-scale lexicon (deterministic, generated IN Spark)
# --------------------------------------------------------------------------

_ONSETS = ["b", "d", "f", "g", "h", "k", "l", "m", "n", "p", "r", "s", "t", "v", "w", "z", "st", "sl", "kr", "br"]
_NUCLEI = ["a", "e", "i", "o", "u", "aa", "ee", "oo", "eu", "ie", "oe", "ui", "ij"]
_CODAS = ["k", "l", "m", "n", "p", "r", "s", "t", "g", "f", "nk", "rt", "ts", "nd"]

# (surface suffix, CGN tag, lemma rule, morph segmentation) — mirroring
# real Dutch inflection classes so both the suffix-window MBLEM tree and
# the char-window MBMA tree learn real edit/segmentation structure
_FORMS = [
    ("", "N(soort,ev,basis,zijd,stan)", "stem", ["stem"]),          # noun sg
    ("en", "N(soort,mv,basis)", "stem", ["stem", "en"]),            # noun pl
    ("je", "N(soort,ev,dim,onz,stan)", "stem", ["stem", "je"]),     # diminutive
    ("en", "WW(inf,vrij,zonder)", "stem+en", ["stem", "en"]),       # infinitive
    ("t", "WW(pv,tgw,met-t)", "stem+en", ["stem", "t"]),            # 3sg present
    ("te", "WW(pv,verl,ev)", "stem+en", ["stem", "te"]),            # past sg
    ("ge~d", "WW(vd,vrij,zonder)", "stem+en", ["ge", "stem", "d"]), # participle
    ("e", "ADJ(prenom,basis,met-e,stan)", "stem", ["stem", "e"]),   # inflected adj
]


def synthetic_lexicon(spark: SparkSession, n_rows: int = 595_000) -> DataFrame:
    """Deterministic (word, tag, lemma) lexicon of ``n_rows`` rows sized
    like e-Lex (595k entries, reference/docs/source/advanced.rst:121-136),
    generated DISTRIBUTED from spark.range — no driver loop, no files.
    Row i maps arithmetically to (stem_idx, form_idx); stems are CVC+CVC
    syllable pairs, forms follow real Dutch inflection classes, so the
    trained tree faces realistic suffix->edit-rule structure."""
    n_forms = len(_FORMS)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        on, nu, co = _ONSETS, _NUCLEI, _CODAS
        n_syl = len(on) * len(nu) * len(co)
        for b in batches:
            ids = b["id"].to_numpy()
            stem_idx = ids // n_forms
            form_idx = ids % n_forms
            # Knuth multiplicative hash is a bijection mod 2^31 (odd
            # multiplier), then the hash indexes the syllable PAIR space
            # (n_syl^2 ≈ 13.2M) — distinct stem indices map to distinct
            # stems up to rare birthday collisions, unlike two linear
            # congruences mod n_syl whose joint period is only n_syl
            h = (stem_idx * 2654435761) % (1 << 31)
            s1 = h % n_syl
            s2 = (h // n_syl) % n_syl
            def syl(s):
                return [
                    on[v // (len(nu) * len(co))]
                    + nu[(v // len(co)) % len(nu)]
                    + co[v % len(co)]
                    for v in s
                ]
            stems = [a + b2 for a, b2 in zip(syl(s1), syl(s2))]
            words, tags, lemmas, morphs = [], [], [], []
            for st, fi in zip(stems, form_idx):
                suf, tag, rule, segs = _FORMS[fi]
                if suf == "ge~d":
                    w = "ge" + st + "d"
                else:
                    w = st + suf
                words.append(w)
                tags.append(tag)
                lemmas.append(st + "en" if rule == "stem+en" else st)
                morphs.append("".join(f"[{st if p == 'stem' else p}]" for p in segs))
            yield pd.DataFrame(
                {"word": words, "tag": tags, "lemma": lemmas, "morph": morphs}
            )

    return (
        spark.range(n_rows)
        .repartition(max(2, spark.sparkContext.defaultParallelism))
        .mapInPandas(gen, schema="word string, tag string, lemma string, morph string")
    )


def synthetic_tagged_corpus(
    spark: SparkSession, n_sentences: int = 100_000, words_per_sentence: int = 12,
    vocab_rows: int = 64_000,
) -> DataFrame:
    """Deterministic (words array, tags array) corpus sized like a POS
    training set (the reference's tagger trains on a 10.9M-token corpus,
    advanced.rst:260-287). Words+tags sample the synthetic lexicon by
    hashed indices — generated distributed from spark.range, like
    synthetic_lexicon."""
    lex = synthetic_lexicon(spark, n_rows=vocab_rows).collect()
    vocab = [(r["word"], r["tag"]) for r in lex]
    bc = spark.sparkContext.broadcast(vocab)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = bc.value
        n = len(v)
        for b in batches:
            words_out, tags_out = [], []
            for sid in b["id"]:
                base = int(sid) * 2654435761
                idxs = [((base + 40503 * j) % (1 << 31)) % n for j in range(words_per_sentence)]
                words_out.append([v[i][0] for i in idxs])
                tags_out.append([v[i][1] for i in idxs])
            yield pd.DataFrame(
                {"words": pd.Series(words_out, dtype=object), "tags": pd.Series(tags_out, dtype=object)}
            )

    return (
        spark.range(n_sentences)
        .repartition(max(2, spark.sparkContext.defaultParallelism))
        .mapInPandas(gen, schema="words array<string>, tags array<string>")
    )
