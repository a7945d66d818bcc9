"""Constraint-based dependency parser, CSI-DP style (SURVEY.md §2.9, D1-D8).

Reference: /root/reference/src/Parser.cxx (instance builders 328-879,
maxDepSpan=20 candidate pruning at 118-119/399-407, timbl calls 987-1004),
/root/reference/src/csidp.cxx (formulateWCSP 75-163), and
/root/reference/src/ckyparser.cxx (Eisner chart 86-112, bestEdge 138-206
with default edge score -0.5, parse 208-307, backtrace 309-346).

Three classifiers (pairs / dir / rels), each an IGTree returning a class
DISTRIBUTION, feed weighted constraints:
  HasDependency(dep, head, rel, w)   from pairs
  DependencyDirection(dep, dir, w)   from dir
  HasIncomingRel(dep, rel, w)        from rels
which score a projective Eisner CKY. The reference evaluates its three
Timbls in OpenMP parallel sections — in Spark these are independent
computations inside one UDF call, parallelism comes from rows.

Feature sets are trimmed (≈8 features vs 17-21) but keep the reference's
shape: word/tag context of dependent and head, tag^tag conjunction,
direction x distance, mods ('__' when empty, the Parser.cxx:944-950 hack).
"""

from __future__ import annotations

from dataclasses import dataclass

from frog_spark.models.igtree import IGTree
from frog_spark.operators.mwu import Unit, resolve_mwus
from frog_spark.sources.resources import GoldSentence, load_mwu_lexicon

MAX_DEP_SPAN = 20  # /root/reference/src/Parser.cxx:118-119
MAX_PARSER_TOKENS = 500  # /root/reference/include/frog/FrogAPI.h:160-163
DEFAULT_EDGE = -0.5  # ckyparser.cxx bestEdge default


def _head_tag(tag: str) -> str:
    return tag.split("(", 1)[0]


def _mods(tag: str) -> str:
    if "(" in tag:
        inner = tag.split("(", 1)[1].rstrip(")")
        return inner.replace(",", "|") if inner else "__"
    return "__"  # the mods="__" hack, Parser.cxx:944-950


def _dist_bucket(d: int) -> str:
    if d <= 2:
        return str(d)
    if d <= 5:
        return "3-5"
    return ">5"


def pair_features(
    units: list[tuple[str, str]], dep: int, head: int | None
) -> list[str]:
    """head=None means the candidate-ROOT instance (Parser.cxx:328-475)."""
    w_d, t_d = units[dep]
    if head is None:
        w_h, t_h, pos = "ROOT", "ROOT", "ROOT"
    else:
        w_h, t_h = units[head]
        d = abs(dep - head)
        pos = ("LEFT" if head < dep else "RIGHT") + _dist_bucket(d)
    return [
        w_d.lower(),
        _head_tag(t_d),
        w_h.lower(),
        _head_tag(t_h),
        f"{_head_tag(t_d)}^{_head_tag(t_h)}",
        pos,
        _mods(t_d),
        _mods(t_h) if head is not None else "__",
    ]


def dir_features(units: list[tuple[str, str]], i: int) -> list[str]:
    n = len(units)

    def tag(j: int) -> str:
        return _head_tag(units[j][1]) if 0 <= j < n else "_"

    return [tag(i - 2), tag(i - 1), tag(i), tag(i + 1), tag(i + 2),
            units[i][0].lower(), _mods(units[i][1])]


def rel_features(units: list[tuple[str, str]], i: int) -> list[str]:
    n = len(units)

    def tag(j: int) -> str:
        return _head_tag(units[j][1]) if 0 <= j < n else "_"

    def word(j: int) -> str:
        return units[j][0].lower() if 0 <= j < n else "_"

    return [word(i), tag(i), tag(i - 1), tag(i + 1), word(i - 1), word(i + 1),
            _mods(units[i][1])]


@dataclass
class Constraints:
    # (dep, head or 0=ROOT) -> {rel: weight}; 1-based unit positions
    dep_w: dict[tuple[int, int], dict[str, float]]
    dir_w: list[dict[str, float]]  # per dep (1-based idx-1): dir -> w
    inrel_w: list[dict[str, float]]  # per dep: rel -> w


class DepParser:
    def __init__(self, pairs: IGTree, dirs: IGTree, rels: IGTree):
        self.pairs = pairs
        self.dirs = dirs
        self.rels = rels

    # -- training -----------------------------------------------------------

    @classmethod
    def train(cls, gold: list[GoldSentence]) -> "DepParser":
        lexicon = load_mwu_lexicon()
        p_inst, p_cls = [], []
        d_inst, d_cls = [], []
        r_inst, r_cls = [], []
        for s in gold:
            words = [t.word for t in s.tokens]
            tags = [t.pos for t in s.tokens]
            lemmas = [t.lemma for t in s.tokens]
            confs = [1.0] * len(words)
            mus = resolve_mwus(words, tags, confs, lemmas, lexicon)
            units = [(u.word, u.tag) for u in mus]
            n = len(units)
            for dep1, (head1, rel) in s.deps.items():
                dep = dep1 - 1
                # candidate-ROOT instance
                p_inst.append(pair_features(units, dep, None))
                p_cls.append(rel if head1 == 0 else "__")
                for h in range(max(0, dep - MAX_DEP_SPAN), min(n, dep + MAX_DEP_SPAN + 1)):
                    if h == dep:
                        continue
                    p_inst.append(pair_features(units, dep, h))
                    p_cls.append(rel if head1 == h + 1 else "__")
                d_inst.append(dir_features(units, dep))
                if head1 == 0:
                    d_cls.append("ROOT")
                else:
                    d_cls.append("LEFT" if head1 - 1 < dep else "RIGHT")
                r_inst.append(rel_features(units, dep))
                r_cls.append(rel)
        return cls(
            IGTree.train(p_inst, p_cls),
            IGTree.train(d_inst, d_cls),
            IGTree.train(r_inst, r_cls),
        )

    # -- constraint generation (formulateWCSP) --------------------------------

    def constraints(self, units: list[tuple[str, str]]) -> Constraints:
        n = len(units)
        # precompute per-unit feature primitives once (the O(n * span)
        # pair loop below reuses them; profiling shows repeated
        # lower()/split() otherwise dominates)
        wl = [w.lower() for w, _ in units]
        ht = [_head_tag(t) for _, t in units]
        md = [_mods(t) for _, t in units]
        pairs_dist = self.pairs.distribution
        dep_w: dict[tuple[int, int], dict[str, float]] = {}
        dir_w: list[dict[str, float]] = []
        inrel_w: list[dict[str, float]] = []
        for dep in range(n):
            w_d, t_d, m_d = wl[dep], ht[dep], md[dep]
            # must mirror pair_features(units, dep, None) exactly
            dist = pairs_dist(
                [w_d, t_d, "root", "ROOT", f"{t_d}^ROOT", "ROOT", m_d, "__"]
            )
            for rel, w in dist.items():
                if rel != "__" and w > 0:
                    dep_w.setdefault((dep + 1, 0), {})[rel] = w
            for h in range(max(0, dep - MAX_DEP_SPAN), min(n, dep + MAX_DEP_SPAN + 1)):
                if h == dep:
                    continue
                d = h - dep
                pos = ("RIGHT" if d > 0 else "LEFT") + _dist_bucket(abs(d))
                dist = pairs_dist(
                    [w_d, t_d, wl[h], ht[h], f"{t_d}^{ht[h]}", pos, m_d, md[h]]
                )
                for rel, w in dist.items():
                    if rel != "__" and w > 0:
                        dep_w.setdefault((dep + 1, h + 1), {})[rel] = w
            dir_w.append(self.dirs.distribution(dir_features(units, dep)))
            inrel_w.append(self.rels.distribution(rel_features(units, dep)))
        return Constraints(dep_w, dir_w, inrel_w)

    # -- Eisner CKY -----------------------------------------------------------

    def _edge(self, c: Constraints, head: int, dep: int) -> tuple[float, str]:
        """Best (score, rel) for head->dep; positions 1-based, 0=ROOT.
        Mirrors bestEdge (ckyparser.cxx:138-206): HasDependency weight plus
        matching HasIncomingRel and DependencyDirection weights; -0.5 default."""
        rels = c.dep_w.get((dep, head), {})
        direction = "ROOT" if head == 0 else ("LEFT" if head < dep else "RIGHT")
        dirw = c.dir_w[dep - 1].get(direction, 0.0)
        best_s, best_r = DEFAULT_EDGE + dirw, "ROOT" if head == 0 else "mod"
        for rel, w in rels.items():
            s = w + c.inrel_w[dep - 1].get(rel, 0.0) + dirw
            if s > best_s:
                best_s, best_r = s, rel
        return best_s, best_r

    def parse_units(self, units: list[tuple[str, str]]) -> list[tuple[int, str]]:
        """Return per-unit (head_index 1-based; 0=ROOT, -1=skipped, rel)."""
        n = len(units)
        if n == 0:
            return []
        if n > MAX_PARSER_TOKENS:  # hard cap, FrogAPI.cxx:2189-2203
            return [(-1, "")] * n
        c = self.constraints(units)
        score = [[DEFAULT_EDGE] * (n + 1) for _ in range(n + 1)]
        rel = [["" for _ in range(n + 1)] for _ in range(n + 1)]
        for d in range(1, n + 1):
            for h in range(0, n + 1):
                if h == d:
                    continue
                s, r = self._edge(c, h, d)
                score[h][d], rel[h][d] = s, r
        heads = _eisner(n, score)
        return [(heads[d], rel[heads[d]][d] if heads[d] >= 0 else "") for d in range(1, n + 1)]

    def parse(
        self,
        words: list[str],
        tags: list[str],
        confs: list[float],
        lemmas: list[str],
        lexicon: dict[str, list[tuple[list[str], str]]],
    ) -> tuple[list[Unit], list[tuple[int, str]]]:
        units = resolve_mwus(words, tags, confs, lemmas, lexicon)
        parsed = self.parse_units([(u.word, u.tag) for u in units])
        return units, parsed


def _eisner(n: int, score: list[list[float]]) -> list[int]:
    """Projective Eisner decoding. score[h][d] over 0..n (0 = ROOT).
    Chart items mirror ckyparser.cxx:86-112 (l/r x complete/incomplete).
    Returns heads[1..n] (0 = ROOT)."""
    NEG = float("-inf")
    # [s][t]: I incomplete, C complete; 0 = left-headed (t head), 1 = right(s head)
    I = [[[NEG, NEG] for _ in range(n + 1)] for _ in range(n + 1)]
    C = [[[NEG, NEG] for _ in range(n + 1)] for _ in range(n + 1)]
    bI = [[[0, 0] for _ in range(n + 1)] for _ in range(n + 1)]
    bC = [[[0, 0] for _ in range(n + 1)] for _ in range(n + 1)]
    for s in range(n + 1):
        C[s][s][0] = C[s][s][1] = 0.0
    for length in range(1, n + 1):
        for s in range(0, n + 1 - length):
            t = s + length
            # incomplete
            for r in range(s, t):
                q = C[s][r][1] + C[r + 1][t][0]
                if q == NEG:
                    continue
                if q + score[t][s] > I[s][t][0]:
                    I[s][t][0] = q + score[t][s]
                    bI[s][t][0] = r
                if q + score[s][t] > I[s][t][1]:
                    I[s][t][1] = q + score[s][t]
                    bI[s][t][1] = r
            # complete
            for r in range(s, t):
                q = C[s][r][0] + I[r][t][0]
                if q > C[s][t][0]:
                    C[s][t][0] = q
                    bC[s][t][0] = r
            for r in range(s + 1, t + 1):
                q = I[s][r][1] + C[r][t][1]
                if q > C[s][t][1]:
                    C[s][t][1] = q
                    bC[s][t][1] = r
    heads = [-1] * (n + 1)

    def rec_I(s: int, t: int, d: int) -> None:
        if s == t:
            return
        r = bI[s][t][d]
        if d == 0:
            heads[s] = t
        else:
            heads[t] = s
        rec_C(s, r, 1)
        rec_C(r + 1, t, 0)

    def rec_C(s: int, t: int, d: int) -> None:
        if s == t:
            return
        r = bC[s][t][d]
        if d == 0:
            rec_C(s, r, 0)
            rec_I(r, t, 0)
        else:
            rec_I(s, r, 1)
            rec_C(r, t, 1)

    rec_C(0, n, 1)
    heads[0] = -1
    return heads
