"""IGTree: information-gain-ordered decision-tree-compressed instance base.

Re-implements the classifier semantics Frog gets from Timbl ``-a1``
(reference: model loads at /root/reference/src/mblem_mod.cxx:230-240,
/root/reference/src/mbma_mod.cxx:268-283, /root/reference/src/Parser.cxx:113-117;
algorithm published as Daelemans, van den Bosch & Weijters 1997,
"IGTree: using trees for compression and classification in lazy learning").

Training: order features by information gain; build a trie on feature values
in that order; each node stores the majority class (and class distribution)
of its instance subset; branches that do not change the prediction are
pruned. Classification: walk the trie with the instance's feature values in
gain order; the deepest matched node's distribution is the answer — O(#features)
per instance, independent of training-set size.

Scale posture: a trained IGTree is a small picklable object broadcast once
per application (``sc.broadcast``); executors evaluate whole Arrow batches
against it inside pandas UDFs (no per-row Python<->JVM crossings).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from dataclasses import dataclass, field
from typing import Iterable, Sequence


@dataclass
class _Node:
    label: str
    dist: dict[str, int]
    children: dict[str, "_Node"] = field(default_factory=dict)
    norm_dist: dict[str, float] | None = None  # lazy normalized cache
    #: cached sum(dist.values()) — the partial-match backtrack loops
    #: (here and in operators/parser.py) test node support once per
    #: mismatch stop, which profiled as ~2.5M sum() calls per bench
    #: corpus; set at build time, recomputed lazily if absent
    support: int | None = None
    #: at LOW-SUPPORT nodes only (< IGTree.MIN_PARTIAL_SUPPORT): feature
    #: values training saw here but pruned away (child agreed with the
    #: majority) or never split (unambiguous leaf). classify trusts the
    #: node for these values (exact training reproduction) and backtracks
    #: for genuinely unseen ones. None elsewhere — bounded memory: a
    #: low-support node has at most MIN_PARTIAL_SUPPORT-1 values.
    seen: frozenset | None = None


def _entropy(counts: Iterable[int]) -> float:
    total = sum(counts)
    if total == 0:
        return 0.0
    h = 0.0
    for c in counts:
        if c:
            p = c / total
            h -= p * math.log2(p)
    return h


def _gain_ratio(column: Sequence[str], classes: Sequence[str]) -> float:
    """Gain ratio = information gain / split info — Timbl's default feature
    weighting (-w GR) for IGTree. Raw IG overrates near-unique features
    (word identity); the split-info denominator penalizes them, which is
    what makes tag-context features outrank word features on small data."""
    base = _entropy(Counter(classes).values())
    by_val: dict[str, Counter] = defaultdict(Counter)
    for v, c in zip(column, classes):
        by_val[v][c] += 1
    n = len(classes)
    rem = sum((sum(ctr.values()) / n) * _entropy(ctr.values()) for ctr in by_val.values())
    gain = base - rem
    split_info = _entropy([sum(ctr.values()) for ctr in by_val.values()])
    if split_info <= 0.0:
        return 0.0
    return gain / split_info


class IGTree:
    """Train once on the driver, broadcast, classify Arrow batches."""

    def __init__(self, feature_order: list[int], root: _Node):
        self.feature_order = feature_order
        self.root = root

    # -- training ----------------------------------------------------------

    @classmethod
    def train(
        cls,
        instances: Sequence[Sequence[str]],
        classes: Sequence[str],
        feature_order: list[int] | None = None,
    ) -> "IGTree":
        if not instances:
            return cls([], _Node("", {}))
        n_feat = len(instances[0])
        if feature_order is not None and sorted(feature_order) != list(range(n_feat)):
            raise ValueError(
                f"feature_order {feature_order} is not a permutation of "
                f"0..{n_feat - 1} — a feature added to the extractor "
                "without updating the order would silently never be read"
            )
        if feature_order is None:
            gains = [
                _gain_ratio([inst[f] for inst in instances], classes)
                for f in range(n_feat)
            ]
            feature_order = sorted(range(n_feat), key=lambda f: -gains[f])
        root = cls._build(instances, classes, feature_order, 0)
        return cls(feature_order, root)

    @classmethod
    def _build(
        cls,
        instances: Sequence[Sequence[str]],
        classes: Sequence[str],
        order: list[int],
        depth: int,
    ) -> _Node:
        dist = dict(Counter(classes))
        # majority with deterministic tie-break (count desc, then label asc)
        label = min(dist.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        node = _Node(label, dist)
        node.support = sum(dist.values())
        small = node.support < cls.SEEN_RECORD_SUPPORT
        if depth >= len(order) or len(dist) == 1:
            # unambiguous or out of features -> leaf (pruned). A SMALL
            # unambiguous leaf still records which next-feature values
            # training actually saw, so classify can tell a trained
            # instance stopping here (exact reproduction) from an
            # unseen-value mismatch (backtrack candidate).
            if small and depth < len(order):
                f = order[depth]
                node.seen = frozenset(inst[f] for inst in instances)
            return node
        f = order[depth]
        by_val: dict[str, list[int]] = defaultdict(list)
        for i, inst in enumerate(instances):
            by_val[inst[f]].append(i)
        seen: set[str] = set()
        for v, idxs in by_val.items():
            sub_inst = [instances[i] for i in idxs]
            sub_cls = [classes[i] for i in idxs]
            child = cls._build(sub_inst, sub_cls, order, depth + 1)
            # IGTree compression: drop child subtrees that agree with the
            # parent prediction and have no descendants of their own.
            if child.children or child.label != label:
                node.children[v] = child
            elif small:
                seen.add(v)
        if seen:
            node.seen = frozenset(seen)
        return node

    # -- classification ----------------------------------------------------

    #: on a PARTIAL match (the walk stopped at an unseen feature value
    #: that training never saw at that node), distributions carried by
    #: fewer than this many training instances are not trusted: the
    #: walk backs up to the nearest ancestor at or above the threshold.
    #: A 1-instance word-feature leaf ('kosten' next to 'vergelijken',
    #: trained once as __) otherwise overrides a 140-instance
    #: tag-context distribution — the round-5c failure class on
    #: never-seen text. Trained instances always stop at values in the
    #: node's ``seen`` set (or full leaves), so exact training
    #: reproduction is preserved at any threshold.
    #:
    #: Class default 1 = OFF (plain IGTree semantics): the
    #: character-window trees (MBLEM, MBMA, MBT-unknown) *rely* on
    #: low-support suffix nodes for generalization. The dependency
    #: parser opts in per tree (operators/parser.py) where the tail
    #: features are word identities and a low-support partial match is
    #: noise, not signal. Must not exceed SEEN_RECORD_SUPPORT.
    MIN_PARTIAL_SUPPORT = 1

    #: ``seen`` sets are recorded at train time for nodes below this
    #: support regardless of the runtime threshold, so a pickled tree
    #: supports any MIN_PARTIAL_SUPPORT <= this without retraining.
    SEEN_RECORD_SUPPORT = 4

    #: optional label filter for the backtrack: when set (a frozenset),
    #: only stops whose node label is IN the set are distrusted. The
    #: pairs tree uses {'__'}: a low-support 'no relation' default
    #: suppressing a real edge is the measured failure mode, while
    #: low-support REAL-relation nodes are usually right.
    BACKTRACK_LABELS: frozenset | None = None

    #: opt-in (parser pairs tree): on a genuine-mismatch stop at a node
    #: whose label survived the backtrack filter, scale the returned
    #: confidence by support/(support+1). A 1-instance real-label leaf
    #: then scores 0.5 instead of 1.0, so a competing well-supported
    #: edge wins the CKY ('jongeren' -> 'van' obj1 at 0.91 beats the
    #: fabricated 'jongeren' -> once-seen-verb edge), while an
    #: uncontested low-support edge still stands (h14-class recall).
    PARTIAL_SHRINK = False

    def _walk_ex(self, features: Sequence[str]) -> tuple["_Node", bool]:
        node = self.root
        path: list[_Node] = []
        mismatch = False
        for f in self.feature_order:
            v = features[f]
            nxt = node.children.get(v)
            if nxt is None:
                # stop. Trust the node when training itself stopped
                # here for this value: a high-support node, or a
                # low-support node whose ``seen`` set contains the
                # value (pruned-agreeing child / unambiguous leaf) —
                # exact training reproduction. Otherwise the value is
                # genuinely unseen at a low-support node: backtrack.
                mismatch = node.seen is None or v not in node.seen
                break
            path.append(node)
            node = nxt
        if mismatch and (
            self.BACKTRACK_LABELS is None or node.label in self.BACKTRACK_LABELS
        ):
            k = self.MIN_PARTIAL_SUPPORT
            while path:
                sup = node.support
                if sup is None:
                    sup = node.support = sum(node.dist.values())
                if sup >= k:
                    break
                node = path.pop()
        return node, mismatch

    def _walk(self, features: Sequence[str]) -> "_Node":
        return self._walk_ex(features)[0]

    def classify(self, features: Sequence[str]) -> tuple[str, float]:
        node, mismatch = self._walk_ex(features)
        nd = node.norm_dist
        if nd is None:
            # cached per node (shared with distribution()): the hot parser
            # path classifies ~150x per sentence and the per-call dist-sum
            # dominated the walk itself
            total = sum(node.dist.values()) or 1
            nd = node.norm_dist = {k: v / total for k, v in node.dist.items()}
        conf = nd.get(node.label, 0.0)
        if mismatch and self.PARTIAL_SHRINK:
            sup = node.support
            if sup is None:
                sup = node.support = sum(node.dist.values())
            conf *= sup / (sup + 1.0)
        return node.label, conf

    def distribution(self, features: Sequence[str]) -> dict[str, float]:
        node = self._walk(features)
        cached = node.norm_dist
        if cached is None:
            total = sum(node.dist.values()) or 1
            cached = node.norm_dist = {k: v / total for k, v in node.dist.items()}
        return cached

    def classify_with_dist(
        self, features: Sequence[str]
    ) -> tuple[str, dict[str, float]]:
        """classify() + distribution() in ONE walk: both stop at the same
        node, so callers needing the label and the full normalized dist
        (the parser's rels batch) pay a single trie descent."""
        node = self._walk(features)
        cached = node.norm_dist
        if cached is None:
            total = sum(node.dist.values()) or 1
            cached = node.norm_dist = {k: v / total for k, v in node.dist.items()}
        return node.label, cached

    def classify_batch(
        self, batch: Sequence[Sequence[str]]
    ) -> tuple[list[str], list[float]]:
        labels: list[str] = []
        confs: list[float] = []
        for feats in batch:
            lab, conf = self.classify(feats)
            labels.append(lab)
            confs.append(conf)
        return labels, confs

    # -- stats -------------------------------------------------------------

    def node_count(self) -> int:
        def cnt(n: _Node) -> int:
            return 1 + sum(cnt(c) for c in n.children.values())

        return cnt(self.root)
