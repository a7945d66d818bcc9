"""MBMA rule engine (SURVEY.md §2.5, M3-M6): a faithful Python port of the
reference's per-word rule machinery.

Reference semantics, cited per function:
  * CLEX tag/inflection alphabet         /root/reference/src/clex.cxx:45-259
  * RulePart parse (edits, RHS, inflect) /root/reference/src/mbma_rule.cxx:103-235
  * performEdits (delete/insert/hide/
    replace with char validation)        /root/reference/src/mbma_rule.cxx:317-417
  * reduceZeroNodes                      /root/reference/src/mbma_rule.cxx:286-299
  * resolve_inflections                  /root/reference/src/mbma_rule.cxx:420-483
  * getCleanInflect (te2I -> te1 keyed
    on next_tag = the V2I handling)      /root/reference/src/mbma_rule.cxx:484-543
  * resolveBrackets pipeline             /root/reference/src/mbma_rule.cxx:545-587
  * generate_all_perms (M3)              /root/reference/src/mbma_mod.cxx:355-406
  * execute + check_next                 /root/reference/src/mbma_mod.cxx:446-510
  * filterHeadTag conf ladder (M5)       /root/reference/src/mbma_mod.cxx:565-648
  * filterSubTags top-k + longest (M6)   /root/reference/src/mbma_mod.cxx:650-813
  * BracketLeaf/Nest, statuses,
    affix/glue/noun resolution,
    getFinalTag, put()                   /root/reference/src/mbma_brackets.cxx:243-1376
  * speculateCompoundType (M7)           /root/reference/src/mbma_brackets.cxx:529-773
  * flatten                              /root/reference/src/mbma_mod.cxx:939-971

All work is per word (bounded, in-UDF); nothing here touches Spark.
"""

from __future__ import annotations

# --- CLEX alphabet (clex.cxx) ----------------------------------------------

UNASS = "/"
NEUTRAL = "0"
AFFIX = "*"
XAFFIX = "x"
GLUE = "^"

_BASIC = set("ABCDINOPQVXZ")  # is_CELEX_base, clex.cxx:169-192
_SINGLE_TAGS = set("NAQVDOBPCIXZ")

# inflection code -> description presence (clex.cxx iNames, 69-92);
# 'X' maps to the empty description on purpose (suppressed in put()).
INFLECT_NAMES = {
    "X": "", "s": "separated", "e": "singular", "m": "plural",
    "d": "diminutive", "G": "genitive", "D": "dative", "P": "positive",
    "C": "comparative", "S": "superlative", "E": "suffix-e",
    "i": "infinitive", "p": "participle", "t": "present-tense",
    "v": "past-tense", "1": "1st-person-verb", "2": "2nd-person-verb",
    "3": "3rd-person-verb", "I": "inversed", "g": "imperative",
    "a": "subjunctive",
}


def to_clex(s: str) -> str:
    """clex.cxx:94-121 (string overload; also serves the char overload)."""
    if s in _SINGLE_TAGS or s in ("PN", "SPEC", "LET"):
        return s
    if s == "*":
        return AFFIX
    if s == "x":
        return XAFFIX
    if s == "^":
        return GLUE
    if s == "0":
        return NEUTRAL
    return UNASS


def is_basic(t: str) -> bool:
    return t in _BASIC


def select_tag(ch: str) -> str:
    """clex.cxx:194-227 — inflection char -> implied CELEX base."""
    if ch in "medGD":
        return "N"
    if ch in "PCSE":
        return "A"
    if ch in "iptvga":
        return "V"
    return UNASS


# --- Status / Compound enums (mbma_brackets.h:41-64) ------------------------

INFO, PARTICLE, PARTICIPLE, STEM, COMPLEX, INFLECTION, DERIVATIONAL, FAILED = (
    "info", "particle", "participle", "stem", "complex", "inflection",
    "derivational", "failed",
)

_COMPOUNDS = {
    "NN", "NA", "NB", "NP", "NV", "AN", "AA", "AB", "AP", "AV",
    "BN", "BA", "BB", "BP", "BV", "PN", "PA", "PB", "PP", "PV",
    "VN", "VA", "VB", "VP", "VV", "NNN", "NVN",
}
NONE = "none"


def construct_compound(tags: list[str]) -> str:
    """mbma_brackets.cxx:529-558 — concatenate tags, validate."""
    s = "".join(tags)
    return s if s in _COMPOUNDS else NONE


# --- RulePart (mbma_rule.cxx:103-235) ---------------------------------------


class RulePart:
    __slots__ = (
        "result_class", "right_hand", "uchar", "ins", "del_", "hide",
        "inflect", "morpheme", "is_affix", "is_glue", "is_participle",
    )

    def _get_edits(self, edit: str) -> None:
        """mbma_rule.cxx:103-119 — note the inverted naming: a 'D' op fills
        ins (chars to ADD to the morpheme), an 'I' op fills del (chars to
        REMOVE from the surface)."""
        if edit[0] == "D":
            self.ins = edit[1:]
        elif edit[0] == "I":
            self.del_ = edit[1:]
        elif edit[0] == "H":
            self.hide = edit[1:]
        elif edit[0] == "R":
            pos = edit.index(">")
            self.ins = edit[1:pos]
            self.del_ = edit[pos + 1 :]

    def __init__(self, rs: str, kar: str, first: bool):
        self.result_class = UNASS
        self.right_hand: list[str] = []
        self.uchar = kar
        self.ins = ""
        self.del_ = ""
        self.hide = ""
        self.inflect = ""
        self.morpheme = ""
        self.is_affix = False
        self.is_glue = False
        self.is_participle = False
        s = rs
        ppos = rs.find("+")
        if ppos != -1:
            spos = rs.find("/")
            if spos != -1:
                self.inflect = rs[spos + 1 :]
                edit = rs[ppos + 1 : spos]
            else:
                edit = rs[ppos + 1 :]
            if edit:
                self._get_edits(edit)
            s = rs[:ppos]
            self.is_participle = "pv" in s and self.del_ == "ge"
        upos = s.find("_")
        if upos != -1:
            self.result_class = to_clex(s[0])
            if upos == 1:
                rhs = s[upos + 1 :]
                spos = rhs.find("/")
                if spos != -1:
                    self.inflect = rhs[spos + 1 :]
                    rhs = rhs[:spos]
                for i, ch in enumerate(rhs):
                    tag = to_clex(ch)
                    if tag == UNASS:
                        continue
                    self.right_hand.append(tag)
                    if tag in (AFFIX, XAFFIX):
                        self.is_affix = True
                    elif tag == GLUE:
                        if i != 0:
                            continue
                        self.is_glue = True
        else:
            tag0 = to_clex(s[0]) if s else UNASS
            if not first and tag0 == "C":
                # a C tag can only be at first position; otherwise it is a
                # C inflection (mbma_rule.cxx:199-204)
                self.inflect = "C"
            else:
                spos = s.find("/")
                tag = to_clex(s)
                if spos != -1:
                    ts = s[:spos]
                    tag = to_clex(ts)
                    if tag0 != UNASS:
                        # cases like 0/e, 0/te2I
                        self.result_class = tag
                        self.inflect = s[spos + 1 :]
                    else:
                        # E/P (suffix-e / positive inflection)
                        self.inflect = s
                elif tag != UNASS:
                    self.result_class = tag
                else:
                    self.inflect = s

    def is_basic(self) -> bool:
        return is_basic(self.result_class)


# --- Brackets (mbma_brackets.cxx) -------------------------------------------


class BracketLeaf:
    nested = False

    def __init__(self, p: RulePart):
        self.cls = p.result_class
        self.right_hand = list(p.right_hand)
        self.morph = p.morpheme
        self.inflect = ""
        self.orig = ""
        self.glue = False
        self.ifpos = -1
        self._compound = NONE
        if p.inflect:
            self.inflect = p.inflect
            self.status = INFLECTION if p.result_class == UNASS else INFO
        elif not self.right_hand:
            self.orig = self.cls
            if p.result_class in ("N", "V", "A") and self.morph in (
                "be", "ge", "ver", "ex",
            ):
                self.status = PARTICLE
            else:
                self.status = STEM
        else:
            self.orig = self.cls + "_" + "".join(self.right_hand)
            self.glue = p.is_glue
            for i, rh in enumerate(self.right_hand):
                if rh == AFFIX:
                    self.ifpos = i
            if self.morph in ("be", "ge", "ver", "ex"):
                self.status = PARTICIPLE
            else:
                self.status = DERIVATIONAL

    def tag(self) -> str:
        return self.cls

    def compound(self) -> str:
        return self._compound

    def infixpos(self) -> int:
        return self.ifpos

    def isglue(self) -> bool:
        return self.glue

    def speculate_compound_type(self) -> str:
        return NONE

    def put(self, shrt: bool = True) -> str:
        """mbma_brackets.cxx:360-414 (short form only)."""
        result = f"[{self.morph}]" if self.morph else ""
        if self.glue:
            pos = self.orig.find("^")
            result += self.orig[pos + 1]
        if (
            self.status not in (PARTICIPLE, PARTICLE, DERIVATIONAL, FAILED)
            and self.cls not in (UNASS, NEUTRAL)
        ):
            result += self.cls
        elif shrt and self.orig:
            result += self.orig
        for i, ch in enumerate(self.inflect):
            # only chars with a non-empty description print ('X' maps to ""
            # and is skipped, like get_inflect_descr in the reference); the
            # "/" separator appears only before index 0 in short form
            if INFLECT_NAMES.get(ch):
                if i == 0:
                    result += "/"
                result += ch
        return result


class BracketNest:
    nested = True

    def __init__(self, t: str, compound: str = NONE):
        self.cls = t
        self.right_hand: list[str] = []
        self.parts: list = []
        self._compound = compound
        self.status = COMPLEX
        self.inflect = ""
        self.morph = ""

    def tag(self) -> str:
        return self.cls

    def compound(self) -> str:
        return self._compound

    def infixpos(self) -> int:
        return -1

    def isglue(self) -> bool:
        return False

    def append(self, b) -> None:
        self.parts.append(b)

    # -- affix resolution (mbma_brackets.cxx:464-529, 1066-1122) -------------

    def _test_match(self, result: list, rpos: int) -> tuple[bool, int]:
        node = result[rpos]
        ln = len(node.right_hand)
        if ln == 0 or ln > len(result):
            return False, len(result)
        start = rpos - node.infixpos()
        j = 0
        it = start
        while j < ln and 0 <= it < len(result):
            rh = node.right_hand[j]
            if rh in (XAFFIX, AFFIX):
                j += 1
                it += 1
                continue
            if rh != result[it].tag():
                node.status = FAILED
                return False, it
            j += 1
            it += 1
        if j < ln:
            return False, len(result)
        return True, start

    def _resolve_affix(self, result: list, rpos: int) -> int:
        matched, start = self._test_match(result, rpos)
        if not matched:
            return rpos + 1
        node = result[rpos]
        ln = len(node.right_hand)
        if ln == len(result):
            return rpos + 1
        tmp = BracketNest(node.tag())
        for sub in result[start : start + ln]:
            tmp.append(sub)
        del result[start : start + ln]
        # the reference assigns the CHILD's speculated type to the PARENT
        # nest here (mbma_brackets.cxx:1110) — replicated
        self._compound = tmp.speculate_compound_type()
        result.insert(start, tmp)
        return start + 1

    def _glue(self, result: list, rpos: int) -> int:
        """mbma_brackets.cxx:1167-1237."""
        node = result[rpos]
        ln = len(node.right_hand)
        matched = True
        match_tags: list[str] = []
        if ln == 0 or ln > len(result):
            matched = False
        else:
            j = 0
            it = rpos
            while j < ln and it < len(result):
                rh = node.right_hand[j]
                if rh == GLUE:
                    j += 1
                    match_tags.append(node.right_hand[j])
                    j += 1
                    it += 1
                    continue
                if rh != result[it].tag():
                    node.status = FAILED
                    matched = False
                match_tags.append(rh)
                j += 1
                it += 1
        if not matched:
            return rpos + 1
        tmp = BracketNest(node.tag())
        for sub in result[rpos : rpos + ln - 1]:
            tmp.append(sub)
        del result[rpos : rpos + ln - 1]
        tmp._compound = construct_compound(match_tags)
        result.insert(rpos, tmp)
        return rpos + 1

    def resolve_glue(self) -> None:
        i = 0
        while i < len(self.parts):
            if self.parts[i].isglue():
                i = self._glue(self.parts, i)
            else:
                i += 1

    def resolve_lead(self) -> None:
        i = 0
        while i < len(self.parts):
            p = self.parts[i]
            if p.nested:
                p.resolve_lead()
                i += 1
            elif p.infixpos() == 0:
                i = self._resolve_affix(self.parts, i)
            else:
                i += 1

    def resolve_tail(self) -> None:
        i = 0
        while i < len(self.parts):
            p = self.parts[i]
            if p.nested:
                p.resolve_tail()
                i += 1
            else:
                ln = len(p.right_hand)
                if p.infixpos() > 0 and p.infixpos() == ln - 1:
                    i = self._resolve_affix(self.parts, i)
                else:
                    i += 1

    def resolve_middle(self) -> None:
        i = 0
        while i < len(self.parts):
            p = self.parts[i]
            if p.nested:
                p.resolve_middle()
                i += 1
            else:
                ln = len(p.right_hand)
                if 0 < p.infixpos() < ln - 1:
                    i = self._resolve_affix(self.parts, i)
                else:
                    i += 1

    def resolve_nouns(self) -> None:
        """mbma_brackets.cxx:1123-1165 — adjacent N + N(STEM) -> NN nest."""
        i = 1
        while i < len(self.parts):
            prev, cur = self.parts[i - 1], self.parts[i]
            if (
                prev.tag() == "N"
                and len(prev.right_hand) == 0
                and cur.tag() == "N"
                and cur.status == STEM
                and len(cur.right_hand) == 0
            ):
                newt = "NNN" if prev.compound() == "NN" else "NN"
                tmp = BracketNest("N", newt)
                tmp.append(prev)
                tmp.append(cur)
                self.parts[i - 1 : i + 1] = [tmp]
                # i now indexes the element after tmp
            else:
                i += 1

    def get_final_tag(self) -> str:
        """mbma_brackets.cxx:1343-1376 — last taggable part wins, P defers
        to the left, X_*Y lead rules contribute their own tag."""
        result_cls = UNASS
        n = len(self.parts)
        for ri in range(n - 1, -1, -1):
            p = self.parts[ri]
            if p.nested or (not p.inflect and p.morph):
                result_cls = p.tag()
                if result_cls != "P":
                    if ri - 1 >= 0 and self.parts[ri - 1].infixpos() == 0:
                        result_cls = self.parts[ri - 1].tag()
                    break
        self.cls = result_cls
        return result_cls

    def put(self, shrt: bool = True) -> str:
        """mbma_brackets.cxx:416-449."""
        result = ""
        cnt = 0
        for idx, p in enumerate(self.parts):
            tmp = p.put(shrt)
            if tmp and tmp[0] != "/" and idx != 0 and result and result[-1] != "]":
                result += " "
            if tmp.startswith("["):
                cnt += 1
            result += tmp
        if cnt > 1:
            result = "[" + result + "]"
            if self.cls not in (UNASS, NEUTRAL):
                result += self.cls
        return result

    def speculate_compound_type(self) -> str:
        """mbma_brackets.cxx:560-773 — the full heuristic table."""
        result = NONE
        parts = self.parts
        if len(parts) == 1:
            result = parts[0].speculate_compound_type()
        elif len(parts) == 2:
            t1, c1, s1 = parts[0].tag(), parts[0].compound(), parts[0].status
            t2, c2, s2 = parts[1].tag(), parts[1].compound(), parts[1].status
            if s1 not in (FAILED, PARTICLE, PARTICIPLE) and s2 != FAILED:
                if t1 in ("N", "A"):
                    if s1 == DERIVATIONAL:
                        result = c2
                    elif s2 == STEM:
                        result = construct_compound([t1, t2])
                    elif s2 in (DERIVATIONAL, INFO, INFLECTION):
                        result = c1
                elif t1 == "B":
                    if s2 == STEM:
                        result = construct_compound([t1, t2])
                elif t1 == "P":
                    if s2 == STEM:
                        result = construct_compound([t1, t2])
                    elif t2 in (NEUTRAL, UNASS):
                        result = c1
                elif t1 == "V":
                    if s1 == DERIVATIONAL:
                        result = c2
                    elif s2 == STEM:
                        result = construct_compound([t1, t2])
        elif len(parts) > 2:
            t1, c1, s1 = parts[0].tag(), parts[0].compound(), parts[0].status
            t2, c2, s2 = parts[1].tag(), parts[1].compound(), parts[1].status
            t3, c3, s3 = parts[2].tag(), parts[2].compound(), parts[2].status
            if (
                s1 not in (FAILED, PARTICLE, PARTICIPLE)
                and s2 != FAILED
                and s3 != FAILED
            ):
                if t1 == "N":
                    if (
                        s2 in (STEM, COMPLEX) and t2 == "N"
                        and s3 in (STEM, COMPLEX) and t3 == "N"
                    ):
                        result = "NNN"
                    elif s1 != DERIVATIONAL and s2 == STEM and (
                        s3 == INFLECTION or t3 == NEUTRAL
                    ):
                        result = construct_compound([t1, t2])
                    elif s1 in (STEM, COMPLEX):
                        if t2 == "N" and s2 in (STEM, COMPLEX) and (
                            t3 == NEUTRAL or s3 == INFLECTION
                        ):
                            result = "NN"
                        elif t2 == "V" and s2 == STEM and t3 == "N" and s3 == STEM:
                            result = "NVN"
                        elif (
                            t2 == "A" and s2 in (STEM, COMPLEX)
                            and t3 == "A" and s3 == DERIVATIONAL
                        ):
                            result = "NA"
                        elif s2 == DERIVATIONAL and t3 == NEUTRAL:
                            result = c1
                        elif s2 == INFLECTION and (
                            t3 == NEUTRAL or s3 == INFLECTION
                        ):
                            result = c1
                        elif s2 == DERIVATIONAL and t3 == "N":
                            result = "NNN" if c3 in ("NN", "NNN") else "NN"
                        elif s3 == DERIVATIONAL and t3 == "N":
                            result = "NN"
                elif t1 == "A":
                    if s2 == STEM and (s3 == INFLECTION or t3 == NEUTRAL):
                        result = construct_compound([t1, t2])
                    elif s1 in (STEM, COMPLEX):
                        if t2 == "N" and t3 in (NEUTRAL, UNASS):
                            result = "AN"
                        elif t2 == "A" and t3 in (NEUTRAL, UNASS):
                            result = "AA"
                        elif s2 == INFLECTION and s3 == INFLECTION:
                            result = c1
                elif t1 == "P":
                    if s2 == STEM and (s3 == INFLECTION or t3 == NEUTRAL):
                        result = construct_compound([t1, t2])
                    elif s2 == COMPLEX:
                        result = c2
                    elif t3 == NEUTRAL:
                        result = construct_compound([t1, t2])
                    elif s3 == DERIVATIONAL:
                        result = construct_compound([t1, t3])
                elif t1 == "B":
                    if s1 == STEM:
                        if s2 == STEM and (s3 == INFLECTION or t3 == NEUTRAL):
                            result = construct_compound([t1, t2])
                        elif s2 == COMPLEX:
                            result = "BN" if t2 == "N" else c2
                elif t1 == "V":
                    if s2 == STEM and (s3 == INFLECTION or t3 == NEUTRAL):
                        result = construct_compound([t1, t2])
                    elif s3 == STEM and s2 == INFLECTION:
                        result = construct_compound([t1, t3])
        self._compound = result
        return result


# --- flatten (mbma_mod.cxx:939-971) -----------------------------------------


def flatten(s: str) -> str:
    result = []
    n = len(s)
    bpos = 0
    while bpos < n and s[bpos] in " [":
        bpos += 1
    while bpos < n:
        epos = s.find("]", bpos)
        if epos == -1:
            break
        result.append("[" + s[bpos:epos] + "]")
        bpos = s.find("[", epos + 1)
        if bpos == -1:
            break
        while bpos < n and s[bpos] in " [":
            bpos += 1
    return "".join(result) if result else s


# --- Rule (mbma_rule.cxx:236-587) -------------------------------------------


class Rule:
    def __init__(self, parts: list[str], word: str):
        self.rules = [
            RulePart(cls, word[k], k == 0) for k, cls in enumerate(parts)
        ]
        self.tag = UNASS
        self.orig_word = word
        self.inflection = ""
        self.compound = NONE
        self.brackets: BracketNest | None = None
        self.confidence = 0.0
        self.ID = 0
        self.sort_key = ""

    def extract_morphemes(self) -> list[str]:
        return [r.morpheme for r in self.rules if r.morpheme]

    def perform_edits(self) -> bool:
        """mbma_rule.cxx:317-417."""
        rules = self.rules
        last: RulePart | None = None
        for k, cur in enumerate(rules):
            if last is None:
                last = cur
            is_replace = False
            if cur.del_:
                for j, dch in enumerate(cur.del_):
                    if k + j < len(rules):
                        if rules[k + j].uchar != dch:
                            return False  # deletion impossible: reject rule
                    else:
                        return False  # deleting beyond end of the rule
                is_replace = bool(cur.ins)
            if not cur.is_participle:
                for j in range(len(cur.del_)):
                    rules[k + j].uchar = ""
            inserted = False
            part = ""
            if cur.hide:
                last.morpheme += cur.uchar
                cur.uchar = ""
                last = cur
            elif cur.is_basic():
                # a real POS tag starts a new morpheme; inserts append to
                # the previous one except for Replace edits; a 'ge' insert
                # is buffered for THIS node (participle ge-insertion)
                if not is_replace:
                    if cur.ins == "ge":
                        part = cur.ins
                    else:
                        last.morpheme += cur.ins
                    inserted = True
                last = cur
            elif cur.result_class != NEUTRAL:
                # an inflection (E, C, S...) also starts a new morpheme
                last = cur
            if not inserted or cur.hide:
                last.morpheme += cur.ins + cur.hide
            elif part:
                last.morpheme += part
            last.morpheme += cur.uchar
        return True

    def reduce_zero_nodes(self) -> None:
        self.rules = [
            r
            for r in self.rules
            if not (r.result_class == NEUTRAL and not r.morpheme and not r.inflect)
        ]

    def resolve_inflections(self) -> None:
        """mbma_rule.cxx:420-483 — the FIRST inflection hint retags the
        nearest preceding basic morpheme (except P; PN never demoted to N)."""
        rules = self.rules
        for i in range(1, len(rules)):
            inf = rules[i].inflect
            if inf and not rules[i].is_participle:
                new_tag = UNASS
                for ch in inf:
                    new_tag = select_tag(ch)
                    if new_tag != UNASS:
                        break
                if new_tag != UNASS:
                    for k in range(i - 1, -1, -1):
                        if rules[k].is_basic() and rules[k].result_class != "P":
                            if not (
                                rules[k].result_class == "PN" and new_tag == "N"
                            ):
                                rules[k].result_class = new_tag
                            return

    def get_clean_inflect(self, next_is_vnw_2: bool) -> None:
        """mbma_rule.cxx:484-543 — last inflection, unknown chars become X,
        te2I demoted to te1 unless the next word is a 2nd-person VNW."""
        self.inflection = ""
        for r in reversed(self.rules):
            if r.inflect:
                new_inflect = ""
                for ch in r.inflect:
                    if ch != "/":
                        if INFLECT_NAMES.get(ch, None) is None:
                            new_inflect += "X"
                        else:
                            new_inflect += ch
                if "te2I" in new_inflect and not next_is_vnw_2:
                    new_inflect = "te1"
                    r.inflect = new_inflect
                self.inflection = new_inflect
                return

    def resolve_brackets(self) -> None:
        """mbma_rule.cxx:545-587."""
        self.brackets = BracketNest(UNASS)
        for r in self.rules:
            leaf = BracketLeaf(r)
            if leaf.status == STEM and not leaf.morph:
                continue
            self.brackets.append(leaf)
        self.brackets.resolve_glue()
        self.brackets.resolve_lead()
        self.brackets.resolve_tail()
        self.brackets.resolve_middle()
        self.brackets.resolve_nouns()
        self.tag = self.brackets.get_final_tag()
        self.sort_key = flatten(self.pretty_string())

    def pretty_string(self, shrt: bool = True) -> str:
        assert self.brackets is not None
        return self.brackets.put(shrt)

    def get_key(self, deep: bool = False) -> str:
        return self.sort_key + (self.inflection if deep else "")


# --- execute (M3 + M4; mbma_mod.cxx:355-510) ---------------------------------


def generate_all_perms(classes: list[str]) -> list[list[str]]:
    """mbma_mod.cxx:355-406 — expand '|'-ambiguous per-char classes into
    per-rank analysis variants, padding short lists with their last item."""
    largest = 1
    class_parts: list[list[str]] = []
    for uclass in classes:
        parts = uclass.split("|")
        if len(parts) > 1:
            class_parts.append(parts)
            largest = max(largest, len(parts))
        else:
            class_parts.append([uclass])
    result = []
    for step in range(largest):
        item = []
        for cp in class_parts:
            if largest > 1 and len(cp) > 1:
                item.append(cp[step] if len(cp) > step else cp[-1])
            else:
                item.append(cp[0])
        result.append(item)
    return result


def check_next(tag: str) -> bool:
    """mbma_mod.cxx:446-457 — true when next word is a VNW WITHOUT ',2,'."""
    for sep in "()":
        tag = tag.replace(sep, "\x00")
    v = [p for p in tag.split("\x00") if p != ""]
    if len(v) != 2 or v[0] != "VNW":
        return False
    return ",2," not in v[1]


def match_rule(ana: list[str], word: str, keep_v2i: bool) -> Rule | None:
    """mbma_mod.cxx:414-444."""
    rule = Rule(ana, word)
    if not rule.perform_edits():
        return None
    rule.reduce_zero_nodes()
    rule.resolve_inflections()
    rule.get_clean_inflect(keep_v2i)
    rule.resolve_brackets()
    return rule


def execute(word: str, next_tag: str, classes: list[str]) -> list[Rule]:
    """mbma_mod.cxx:459-510."""
    all_parts = generate_all_perms(classes)
    both_v2_and_v2i = any(
        "te2|" in cls and "te2I" in cls for cls in classes
    )
    keep_v2i = False if both_v2_and_v2i else check_next(next_tag)
    accepted = []
    for idx, ana in enumerate(all_parts):
        rule = match_rule(ana, word, keep_v2i)
        if rule is not None:
            rule.ID = idx
            accepted.append(rule)
    # renumber like the reference (IDs are assigned in acceptance order)
    for i, r in enumerate(accepted):
        r.ID = i
    return accepted


# --- CGN -> CELEX translation (init_cgn, mbma_mod.cxx:104-159) ---------------
# The reference loads these from frogdata's cgntags.main/cgntags.sub; the
# tables below are the same public CGN->CELEX correspondence, synthesized to
# be consistent with the training-class synthesis in morpho.py.

TAG_MAIN = {
    "N": "N", "ADJ": "A", "WW": "V", "TW": "Q", "VNW": "O", "LID": "D",
    "VZ": "P", "VG": "C", "BW": "B", "TSW": "I", "SPEC": "SPEC", "LET": "LET",
}

TAG_SUB = {
    # CGN feature -> CELEX inflection code (cgntags.sub analogue)
    "ev": "e", "mv": "m", "tgw": "t", "verl": "v", "inf": "i", "vd": "p",
    "od": "p", "met-t": "t", "dim": "d", "comp": "C", "sup": "S",
    "met-e": "E", "gen": "G", "dat": "D",
}


def filter_head_tag(analyses: list[Rule], head: str) -> list[Rule]:
    """M5 (mbma_mod.cxx:565-648): keep analyses whose CELEX tag matches the
    CGN head, with the forgiveness ladder
    exact -> 1.0, N~PN -> 1.0, A~B -> 0.8, A~V -> 0.5."""
    celex_tag = TAG_MAIN.get(head)
    if celex_tag is None:
        return []
    out = []
    for rule in analyses:
        mbma_tag = rule.tag
        if celex_tag == mbma_tag:
            rule.confidence = 1.0
        elif celex_tag == "N" and mbma_tag == "PN":
            rule.confidence = 1.0
        elif (celex_tag == "B" and mbma_tag == "A") or (
            celex_tag == "A" and mbma_tag == "B"
        ):
            rule.confidence = 0.8
        elif celex_tag == "A" and mbma_tag == "V":
            rule.confidence = 0.5
        else:
            continue
        out.append(rule)
    return out


def filter_sub_tags(analyses: list[Rule], feats: list[str]) -> list[Rule]:
    """M6 (mbma_mod.cxx:650-813): max inflection-feature matches, then max
    confidence, then dedup on the flattened key (first ID wins), then sort
    longest-segmentation-first ([ge][maak][t] beats [gemaak][t])."""
    if not analyses:
        return analyses
    best_matches: list[Rule] = []  # kept in ID order like the ordered set
    max_count = 0
    for q in analyses:
        if not q.inflection:
            best_matches.append(q)
            continue
        match_count = 0
        for feat in feats:
            c = TAG_SUB.get(feat)
            if c is not None and c in q.inflection:
                match_count += 1
        if match_count >= max_count:
            if match_count > max_count:
                max_count = match_count
                best_matches = []
            best_matches.append(q)
    best_matches.sort(key=lambda r: r.ID)
    best_conf = -0.1
    high_conf: list[Rule] = []
    for r in best_matches:
        if r.confidence >= best_conf:
            if r.confidence > best_conf:
                best_conf = r.confidence
                high_conf = []
            high_conf.append(r)
    # dedup on flattened key; like std::map::emplace the FIRST (lowest ID)
    # rule per key wins
    unique: dict[str, Rule] = {}
    for r in high_conf:
        unique.setdefault(r.get_key(), r)
    kept = set(id(r) for r in unique.values())
    result = [r for r in analyses if id(r) in kept]
    # longest segmentation preferred; ID breaks ties deterministically
    result.sort(key=lambda r: (-len(r.get_key()), r.ID))
    return result
