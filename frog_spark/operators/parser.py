"""Constraint-based dependency parser, CSI-DP style (SURVEY.md §2.9, D1-D8).

Faithful port of the reference:
  * instance builders with the FULL feature sets —
    pairs 16 features (/root/reference/src/Parser.cxx:328-475),
    dir 20 features (Parser.cxx:477-692, incl. the n=1/2/3 special paddings
    which reduce to '__' for out-of-range word^tag conjunctions),
    rels 15 features (Parser.cxx:694-879);
  * prepareParse unit extraction with '_'-joined MWU heads/mods and the
    empty-mods HACK (Parser.cxx:902-984);
  * formulateWCSP constraint generation — pairs contribute only their TOP
    class + confidence, dir contributes its full distribution, rels splits
    its top class over the summed distribution
    (/root/reference/src/csidp.cxx:55-163);
  * the constraint-satisfaction-aware Eisner CKY with the -0.5 default
    edge, ROOT scoring, and satisfied-constraint sets threaded through the
    chart (/root/reference/src/ckyparser.cxx:86-346).

The three classifiers are IGTrees (the reference uses Timbl -a1 +D) that
run inside one pandas-UDF call per sentence; the reference evaluates them
in OpenMP parallel sections — independent computations either way.
"""

from __future__ import annotations

from frog_spark.models.igtree import IGTree
from frog_spark.operators.mwu import Unit, resolve_mwus
from frog_spark.sources.resources import GoldSentence, load_mwu_lexicon

MAX_DEP_SPAN = 20  # /root/reference/src/Parser.cxx:118-119
MAX_PARSER_TOKENS = 500  # /root/reference/include/frog/FrogAPI.h:160-163
DEFAULT_EDGE = -0.5  # ckyparser.cxx:169 (bestEdge default)

# Fixed tag-first feature orders for the three IGTrees: structural
# features (distance/direction, tag conjunctions, tags, mods) BEFORE
# word-identity features. IGTree stops walking at the first unseen
# branch, so with gain-learned orders an unseen word ends the walk
# before any structural evidence is read — on small/medium treebanks
# the classifiers then regress to shallow priors exactly on the unseen
# vocabulary they most need to generalize over. (The reference's Timbl
# uses gain-ratio ordering, but over a multi-million-instance treebank
# where word features genuinely carry; at this training size the fixed
# order measured held-out heads 0.91 -> 0.95, triple recall 0.69 ->
# 0.78 at byte-identical gold-corpus output.) Feature index maps:
# pairs (16): w-1 w0 w1 wh-1 wh0 wh1 t-1 t0 t1 th-1 th0 th1 t^th
#             dir dist mods^mods  (Parser.cxx:328-475)
# Within the word block, the HEAD word (f4) before the DEP word (f1):
# candidate heads are verbs, prepositions, and auxiliaries — far more
# often in-vocabulary than the open-class dependent — so an unseen dep
# word must not end the walk before the head word is read (same
# truncation argument as RELS_ORDER's left-context-first word block).
PAIRS_ORDER = [13, 14, 12, 7, 10, 6, 8, 9, 11, 15, 4, 1, 0, 2, 3, 5]
# dir (20): w-2..w+2 (0-4), t-2..t+2 (5-9), w^t-2..w^t+2 (10-14),
#           t-1^t0 (15), t0^t+1 (16), m-1 m0 m+1 (17-19)
DIR_ORDER = [7, 15, 16, 5, 6, 8, 9, 17, 18, 19, 12, 10, 11, 13, 14, 0, 1, 2, 3, 4]
# rels (15): w-2..w+2 (0-4), mods (5), t-2..t+2 (6-10), t-1^t0 (11),
#            t0^t+1 (12), t-2^t-1^t0 (13), t0^t+1^t+2 (14)
# Within the word block, LEFT-CONTEXT words before the focus word:
# w-2/w-1 are usually closed-class (determiners, the governing verb's
# clitics) and nearly always seen, while w0 is the open-class focus —
# an unseen focus word would end the walk before the 'de' (mid-sentence
# object) vs 'De' (sentence-initial subject) capitalization evidence
# that separates su from obj1 in det-ADJ-N windows where the verb lies
# outside the +/-2 context (measured: h07-class recall).
RELS_ORDER = [8, 11, 12, 13, 14, 6, 7, 9, 10, 5, 0, 1, 2, 3, 4]


def extract_tag(tv: str) -> tuple[str, str]:
    """Split a CGN tag into (head, mods); mods '|'-joined, '' when absent
    (the HACK at Parser.cxx:902-927 — '' here, '__' patched later)."""
    if "(" in tv:
        head, rest = tv.split("(", 1)
        inner = rest.rstrip(")")
        return head, inner.replace(",", "|") if inner else ""
    return tv, ""


def _filter_spaces(w: str) -> str:
    return "_".join(w.split())


def prepare(units: list[Unit]) -> tuple[list[str], list[str], list[str]]:
    """prepareParse (Parser.cxx:929-984): per parse unit (MWU-collapsed)
    word / head / mods, MWU members '_'-joined (heads AND raw mods — the
    reference appends empty member mods there, replicated)."""
    words, heads, mods = [], [], []
    for u in units:
        if u.is_mwu and u.member_tags:
            mw, mh, mm = [], [], []
            for k, t in enumerate(u.member_tags):
                h, m = extract_tag(t)
                mh.append(h)
                mm.append(m)
            words.append(_filter_spaces(u.word))
            heads.append("_".join(mh))
            mods.append("_".join(mm))
        else:
            h, m = extract_tag(u.tag)
            words.append(_filter_spaces(u.word))
            heads.append(h)
            mods.append(m if m else "__")  # the mods-HACK (Parser.cxx:944-950)
    return words, heads, mods


# --- instance builders -------------------------------------------------------


def pair_instances(
    words: list[str], heads: list[str], mods: list[str]
) -> tuple[list[list[str]], list[tuple[int, int | None]]]:
    """createPairInstances (Parser.cxx:328-475). Returns (instances, keys)
    where keys[i] = (dep0, head0|None-for-ROOT); order matches
    formulateWCSP's consumption: n ROOT instances, then (dep outer, head
    inner) pairs within maxDepSpan."""
    n = len(words)
    # padded arrays replace per-access bounds checks (hot path: the
    # O(n * span) candidate loop below)
    wp = ["__"] + words + ["__"]  # w(j) == wp[j + 1]
    tp = ["__"] + heads + ["__"]

    instances: list[list[str]] = []
    keys: list[tuple[int, int | None]] = []
    if n == 1:
        instances.append(
            [
                "__", words[0], "__", "ROOT", "ROOT", "ROOT", "__", heads[0],
                "__", "ROOT", "ROOT", "ROOT", words[0] + "^ROOT", "ROOT",
                "ROOT", "ROOT^" + heads[0],
            ]
        )
        keys.append((0, None))
        return instances, keys
    for i in range(n):
        instances.append(
            [
                wp[i], wp[i + 1], wp[i + 2], "ROOT", "ROOT", "ROOT",
                tp[i], tp[i + 1], tp[i + 2], "ROOT", "ROOT", "ROOT",
                tp[i + 1] + "^ROOT", "ROOT", "ROOT", "ROOT^" + mods[i],
            ]
        )
        keys.append((i, None))
    for wpos in range(n):
        w_1, w0, w1 = wp[wpos], wp[wpos + 1], wp[wpos + 2]
        t_1, t0, t1 = tp[wpos], tp[wpos + 1], tp[wpos + 2]
        m0 = mods[wpos]
        lo = max(0, wpos - MAX_DEP_SPAN)
        hi = min(n, wpos + MAX_DEP_SPAN + 1)
        for pos in range(lo, hi):
            if pos == wpos:
                continue
            if wpos > pos:
                direction, dist = "LEFT", str(wpos - pos)
            else:
                direction, dist = "RIGHT", str(pos - wpos)
            instances.append(
                [
                    w_1, w0, w1,
                    wp[pos], wp[pos + 1], wp[pos + 2],
                    t_1, t0, t1,
                    tp[pos], tp[pos + 1], tp[pos + 2],
                    t0 + "^" + tp[pos + 1],
                    direction, dist,
                    mods[pos] + "^" + m0,
                ]
            )
            keys.append((wpos, pos))
    return instances, keys


def dir_instances(
    words: list[str], heads: list[str], mods: list[str]
) -> list[list[str]]:
    """createDirInstances (Parser.cxx:477-692): 20 features per unit. The
    reference's n=1/2/3 special cases differ from the general case only in
    padding out-of-range word^tag conjunctions with '__' (instead of
    '__^__'), which this builder does uniformly."""
    n = len(words)

    def w(j: int) -> str:
        return words[j] if 0 <= j < n else "__"

    def t(j: int) -> str:
        return heads[j] if 0 <= j < n else "__"

    def m(j: int) -> str:
        return mods[j] if 0 <= j < n else "__"

    def wt(j: int) -> str:
        return words[j] + "^" + heads[j] if 0 <= j < n else "__"

    out = []
    for i in range(n):
        out.append(
            [
                w(i - 2), w(i - 1), w(i), w(i + 1), w(i + 2),
                t(i - 2), t(i - 1), t(i), t(i + 1), t(i + 2),
                wt(i - 2), wt(i - 1), wt(i), wt(i + 1), wt(i + 2),
                t(i - 1) + "^" + t(i), t(i) + "^" + t(i + 1),
                m(i - 1), m(i), m(i + 1),
            ]
        )
    return out


def rel_instances(
    words: list[str], heads: list[str], mods: list[str]
) -> list[list[str]]:
    """createRelInstances (Parser.cxx:694-879): 15 features per unit; the
    n=1/2/3 special cases reduce to the general composed padding."""
    n = len(words)

    def w(j: int) -> str:
        return words[j] if 0 <= j < n else "__"

    def t(j: int) -> str:
        return heads[j] if 0 <= j < n else "__"

    out = []
    for i in range(n):
        out.append(
            [
                w(i - 2), w(i - 1), w(i), w(i + 1), w(i + 2),
                mods[i],
                t(i - 2), t(i - 1), t(i), t(i + 1), t(i + 2),
                t(i - 1) + "^" + t(i), t(i) + "^" + t(i + 1),
                t(i - 2) + "^" + t(i - 1) + "^" + t(i),
                t(i) + "^" + t(i + 1) + "^" + t(i + 2),
            ]
        )
    return out


# --- constraints (formulateWCSP, csidp.cxx:75-163) ---------------------------


class _Constraint:
    __slots__ = ("weight", "rel", "direction")

    def __init__(self, weight: float, rel: str = "", direction: str = ""):
        self.weight = weight
        self.rel = rel
        self.direction = direction


class Constraints:
    """edge[dep][head] -> [HasDependency], in_dep[i] -> [HasIncomingRel],
    out_dep[i] -> [DependencyDirection]; 1-based unit ids, head 0 = ROOT."""

    def __init__(self, n: int):
        self.edge: list[list[list[_Constraint]]] = [
            [[] for _ in range(n + 1)] for _ in range(n + 1)
        ]
        self.in_dep: list[list[_Constraint]] = [[] for _ in range(n + 1)]
        self.out_dep: list[list[_Constraint]] = [[] for _ in range(n + 1)]


def split_dist(dist: dict[str, float]) -> dict[str, float]:
    """csidp.cxx:55-73 — '|'-ambiguous classes spread their weight."""
    out: dict[str, float] = {}
    for s, val in dist.items():
        for tag in s.split("|"):
            out[tag] = out.get(tag, 0.0) + val
    return out


class DepParser:
    def __init__(self, pairs: IGTree, dirs: IGTree, rels: IGTree):
        self.pairs = pairs
        self.dirs = dirs
        self.rels = rels

    # -- training -------------------------------------------------------------

    @classmethod
    def train(cls, gold: list[GoldSentence]) -> "DepParser":
        lexicon = load_mwu_lexicon()
        p_inst, p_cls = [], []
        d_inst, d_cls = [], []
        r_inst, r_cls = [], []
        for s in gold:
            toks = s.tokens
            mus = resolve_mwus(
                [t.word for t in toks],
                [t.pos for t in toks],
                [1.0] * len(toks),
                [t.lemma for t in toks],
                lexicon,
            )
            words, heads, mods = prepare(mus)
            pi, keys = pair_instances(words, heads, mods)
            for inst, (dep, head) in zip(pi, keys):
                gold_head, rel = s.deps.get(dep + 1, (-1, ""))
                if head is None:
                    p_cls.append(rel if gold_head == 0 else "__")
                else:
                    p_cls.append(rel if gold_head == head + 1 else "__")
                p_inst.append(inst)
            for i, inst in enumerate(dir_instances(words, heads, mods)):
                gold_head, _rel = s.deps.get(i + 1, (-1, ""))
                if gold_head == 0:
                    d_cls.append("ROOT")
                elif gold_head > 0:
                    d_cls.append("LEFT" if gold_head - 1 < i else "RIGHT")
                else:
                    d_cls.append("ROOT")
                d_inst.append(inst)
            for i, inst in enumerate(rel_instances(words, heads, mods)):
                _gh, rel = s.deps.get(i + 1, (0, "ROOT"))
                r_cls.append(rel or "ROOT")
                r_inst.append(inst)
        return cls(
            IGTree.train(p_inst, p_cls, feature_order=list(PAIRS_ORDER)),
            IGTree.train(d_inst, d_cls, feature_order=list(DIR_ORDER)),
            IGTree.train(r_inst, r_cls, feature_order=list(RELS_ORDER)),
        )

    # -- constraint generation -------------------------------------------------

    def constraints(self, units: list[Unit]) -> Constraints:
        words, heads, mods = prepare(units)
        n = len(words)
        c = Constraints(n)
        p_inst, keys = pair_instances(words, heads, mods)
        # D5: three classifier batches (OpenMP sections in the reference)
        for inst, (dep, head) in zip(p_inst, keys):
            top, conf = self.pairs.classify(inst)
            if top != "__":
                hid = 0 if head is None else head + 1
                c.edge[dep + 1][hid].append(_Constraint(conf, rel=top))
        for i, inst in enumerate(dir_instances(words, heads, mods)):
            for direction, val in self.dirs.distribution(inst).items():
                c.out_dep[i + 1].append(_Constraint(val, direction=direction))
        for i, inst in enumerate(rel_instances(words, heads, mods)):
            top, _conf = self.rels.classify(inst)
            if top != "__":
                splits = split_dist(self.rels.distribution(inst))
                for rel in top.split("|"):
                    c.in_dep[i + 1].append(
                        _Constraint(splits.get(rel, 0.0), rel=rel)
                    )
        return c

    # -- CKY (ckyparser.cxx:208-346) -------------------------------------------

    def parse_units(self, units: list[Unit]) -> list[tuple[int, str]]:
        """Return per-unit (head 1-based; 0=ROOT, -1=skipped, rel)."""
        n = len(units)
        if n == 0:
            return []
        if n > MAX_PARSER_TOKENS:  # hard cap, FrogAPI.cxx:2189-2203
            return [(-1, "")] * n
        c = self.constraints(units)
        pr = _cky_parse(n, c)
        return pr

    def parse(
        self,
        words: list[str],
        tags: list[str],
        confs: list[float],
        lemmas: list[str],
        lexicon: dict[str, list[tuple[list[str], str]]],
    ) -> tuple[list[Unit], list[tuple[int, str]]]:
        units = resolve_mwus(words, tags, confs, lemmas, lexicon)
        parsed = self.parse_units(units)
        return units, parsed


_EMPTY_SAT: frozenset = frozenset()  # shared; satisfied sets are never
# mutated in place (every update binds a fresh union), so empties can
# alias one frozen instance


class _SubTree:
    __slots__ = ("score", "r", "label", "satisfied")

    def __init__(self, score: float = 0.0, r: int = -1, label: str = ""):
        self.score = score
        self.r = r
        self.label = label
        self.satisfied = _EMPTY_SAT


_DEFAULT_SUBTREE = _SubTree()  # shared read-only cell (score 0, r -1)


def _edge_plan(c: Constraints, head: int, dep: int):
    """Per-(head, dep) precomputation for the bestEdge inner loop.

    _best_edge is called once per SPLIT POINT, but (head, dep) — and
    therefore the edge/in/out constraint lists — are fixed per chart
    cell; only the satisfied-sets vary with the split. Three shapes come
    out of hoisting the r-independent work (profiled ~1.35x on the whole
    parser module at identical output):

      ('const', label, score, cons) — the result does not depend on the
          split at all: the head-0 (ROOT) case never consults the
          satisfied-sets, and an empty edge-constraint list (every
          dep/head pair outside the classifier's span-20 window) always
          yields (None, DEFAULT_EDGE, {}).
      ('cand', cands, outs) — per edge constraint, the in_dep candidates
          with a matching relation, plus the direction-filtered out_dep
          list (shared by all candidates); the split loop then only does
          satisfied-set membership checks and float adds, and the winning
          id-set is rebuilt once per cell instead of allocated per
          candidate per split.
    """
    if head == 0:
        best_score = 0.0
        best: set[int] = set()
        for con in c.out_dep[dep]:
            if con.direction == "ROOT":
                best_score = con.weight  # last ROOT-direction wins
                best.add(id(con))
        label = "ROOT"
        for con in c.edge[dep][0]:
            best_score += con.weight
            best.add(id(con))
            label = con.rel
        return ("const", label, best_score, best)
    econs = c.edge[dep][head]
    if not econs:
        return ("const", "None", DEFAULT_EDGE, set())
    outs = [
        con
        for con in c.out_dep[dep]
        if (con.direction == "LEFT" and head < dep)
        or (con.direction == "RIGHT" and head > dep)
    ]
    ins_all = c.in_dep[head]
    cands = [
        (econ, [con for con in ins_all if con.rel == econ.rel]) for econ in econs
    ]
    return ("cand", cands, outs)


def _edge_eval(plan, lsat, rsat) -> tuple[str, float, int]:
    """Score the best edge under one split's satisfied-sets (no set
    allocation — the winner's constraint set is rebuilt by
    _edge_winner_set only for the cell's final best split). Returns the
    winning candidate INDEX so the rebuild targets exactly the
    constraint the unhoisted bestEdge would have kept (first strict
    maximum, same scan order)."""
    _, cands, outs = plan
    out_sum = 0.0
    for con in outs:
        cid = id(con)
        if cid not in lsat and cid not in rsat:
            out_sum += con.weight
    best_score = DEFAULT_EDGE
    best_label = "None"
    best_idx = -1
    for i, (econ, ins) in enumerate(cands):
        sc = econ.weight + out_sum
        for con in ins:
            cid = id(con)
            if cid not in lsat and cid not in rsat:
                sc += con.weight
        if sc > best_score:
            best_score = sc
            best_label = econ.rel
            best_idx = i
    return best_label, best_score, best_idx


def _edge_winner_set(plan, idx: int, lsat, rsat) -> set[int]:
    """Rebuild the contributing-constraint id-set for the winning
    candidate (same filters _edge_eval applied; identical to what the
    unhoisted bestEdge accumulated for the winner)."""
    if idx < 0:
        return set()
    _, cands, outs = plan
    econ, ins = cands[idx]
    cons = {id(econ)}
    for con in ins:
        cid = id(con)
        if cid not in lsat and cid not in rsat:
            cons.add(cid)
    for con in outs:
        cid = id(con)
        if cid not in lsat and cid not in rsat:
            cons.add(cid)
    return cons


def _cky_parse(n: int, c: Constraints) -> list[tuple[int, str]]:
    """parse + backtrace (ckyparser.cxx:208-346): 4-item Eisner chart with
    satisfied-constraint sets threaded through. Untouched cells share ONE
    immutable default SubTree — allocating (n+1)^2 x 4 fresh cells showed
    up as ~40% of parse time in profiling and the lower triangle is never
    written. Edge scoring is hoisted per chart cell (_edge_plan) so the
    split loop does no list filtering and no set allocation."""
    NEG = -10e45
    d = _DEFAULT_SUBTREE
    l_true = [[d] * (n + 1) for _ in range(n + 1)]
    r_true = [[d] * (n + 1) for _ in range(n + 1)]
    l_false = [[d] * (n + 1) for _ in range(n + 1)]
    r_false = [[d] * (n + 1) for _ in range(n + 1)]
    for k in range(1, n + 2):
        for s in range(0, n + 1 - k):
            t = s + k
            rts = r_true[s]
            # STEPS 1+2 share the same split cells (r_true[s][r],
            # l_true[r+1][t]) — one fused loop loads each pair once for
            # both the l_False (head=t, dep=s) and r_False (head=s,
            # dep=t) maxima
            plan1 = _edge_plan(c, t, s)
            plan2 = _edge_plan(c, s, t)
            const1 = plan1[0] == "const"
            const2 = plan2[0] == "const"
            b1_score, b1_i, b1_l, b1_ci = NEG, -1, "__", -1
            b2_score, b2_i, b2_l, b2_ci = NEG, -1, "__", -1
            if const1:
                _, c1_l, c1_edge, c1_set = plan1
            if const2:
                _, c2_l, c2_edge, c2_set = plan2
            for r in range(s, t):
                lt = rts[r]
                rt = l_true[r + 1][t]
                base = lt.score + rt.score
                if const1:
                    score = base + c1_edge
                    if score > b1_score:
                        b1_score, b1_i = score, r
                else:
                    label, edge_score, ci = _edge_eval(plan1, lt.satisfied, rt.satisfied)
                    score = base + edge_score
                    if score > b1_score:
                        b1_score, b1_i, b1_l, b1_ci = score, r, label, ci
                if const2:
                    score = base + c2_edge
                    if score > b2_score:
                        b2_score, b2_i = score, r
                else:
                    label, edge_score, ci = _edge_eval(plan2, lt.satisfied, rt.satisfied)
                    score = base + edge_score
                    if score > b2_score:
                        b2_score, b2_i, b2_l, b2_ci = score, r, label, ci
            sa1, sb1 = rts[b1_i].satisfied, l_true[b1_i + 1][t].satisfied
            if const1:
                b1_l, b1_c = c1_l, c1_set
            else:
                b1_c = _edge_winner_set(plan1, b1_ci, sa1, sb1)
            st = _SubTree(b1_score, b1_i, b1_l)
            if sa1 or sb1 or b1_c:
                st.satisfied = set(sa1) | sb1 | b1_c
            l_false[s][t] = st
            sa2, sb2 = rts[b2_i].satisfied, l_true[b2_i + 1][t].satisfied
            if const2:
                b2_l, b2_c = c2_l, c2_set
            else:
                b2_c = _edge_winner_set(plan2, b2_ci, sa2, sb2)
            st = _SubTree(b2_score, b2_i, b2_l)
            if sa2 or sb2 or b2_c:
                st.satisfied = set(sa2) | sb2 | b2_c
            r_false[s][t] = st
            # STEP 3: l_True
            lts = l_true[s]
            best_score, best_i = NEG, -1
            for r in range(s, t):
                score = lts[r].score + l_false[r][t].score
                if score > best_score:
                    best_score, best_i = score, r
            st = _SubTree(best_score, best_i, "")
            sa, sb = lts[best_i].satisfied, l_false[best_i][t].satisfied
            if sa or sb:
                st.satisfied = set(sa) | sb
            lts[t] = st
            # STEP 4: r_True
            rfs = r_false[s]
            best_score, best_i = NEG, -1
            for r in range(s + 1, t + 1):
                score = rfs[r].score + r_true[r][t].score
                if score > best_score:
                    best_score, best_i = score, r
            st = _SubTree(best_score, best_i, "")
            sa, sb = rfs[best_i].satisfied, r_true[best_i][t].satisfied
            if sa or sb:
                st.satisfied = set(sa) | sb
            rts[t] = st

    pr: list[tuple[int, str]] = [(0, "")] * n

    def right_complete(s: int, t: int) -> None:
        r = r_true[s][t].r
        if r >= 0:
            right_incomplete(s, r)
            right_complete(r, t)

    def right_incomplete(s: int, t: int) -> None:
        cell = r_false[s][t]
        if cell.r >= 0:
            pr[t - 1] = (s, cell.label)
            right_complete(s, cell.r)
            left_complete(cell.r + 1, t)

    def left_complete(s: int, t: int) -> None:
        r = l_true[s][t].r
        if r >= 0:
            left_complete(s, r)
            left_incomplete(r, t)

    def left_incomplete(s: int, t: int) -> None:
        cell = l_false[s][t]
        if cell.r >= 0:
            pr[s - 1] = (t, cell.label)
            right_complete(s, cell.r)
            left_complete(cell.r + 1, t)

    right_complete(0, n)
    return pr
