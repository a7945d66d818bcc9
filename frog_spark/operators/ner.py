"""NER stage (SURVEY.md §2.6, N1-N7).

Reference: /root/reference/src/ner_tagger_mod.cxx —
  gazetteer load into length-indexed n-gram maps (105-231, max 20 tokens);
  per-position longest-match marking (251-289) with ambiguous sets
  serialized ``cat1+cat2+`` (233-249); enriched classification with
  prev/next POS + gazetteer features (303-421); BIO repair (390-414);
  span assembly with MEAN confidence assigned back to members (423-503);
  gazetteer-only mode (325-348).

The classifier here is an IGTree over the same enrichment features the
reference feeds MBT; it is trained from the gold corpus and broadcast.
"""

from __future__ import annotations

from frog_spark.models.igtree import IGTree
from frog_spark.sources.resources import GoldSentence, load_gazetteer

MAX_NER_SIZE = 20  # /root/reference/src/ner_tagger_mod.cxx:51-63


class Gazetteer:
    def __init__(self, cats: dict[str, set[str]]):
        # length-indexed: n_tokens -> {ngram_lower: set(cat)}
        self.by_len: list[dict[str, set[str]]] = [dict() for _ in range(MAX_NER_SIZE + 1)]
        for cat, names in cats.items():
            for name in names:
                words = name.split()
                if not 1 <= len(words) <= MAX_NER_SIZE:
                    continue
                key = " ".join(w.lower() for w in words)
                self.by_len[len(words)].setdefault(key, set()).add(cat)

    def mark(self, words: list[str]) -> list[str]:
        """Per-token gazetteer mark: 'cat1+cat2+' or 'O'
        (create_ner_list + serialize, ner_tagger_mod.cxx:233-289)."""
        n = len(words)
        lw = [w.lower() for w in words]
        marks: list[set[str]] = [set() for _ in range(n)]
        for i in range(n):
            for size in range(min(MAX_NER_SIZE, n - i), 0, -1):
                key = " ".join(lw[i : i + size])
                cats = self.by_len[size].get(key)
                if cats:
                    for j in range(i, i + size):
                        marks[j] |= cats
                    break
        return ["".join(f"{c}+" for c in sorted(m)) if m else "O" for m in marks]

    def bio(self, words: list[str]) -> list[str]:
        """N7 gazetteer-only mode: BIO straight from longest matches."""
        n = len(words)
        lw = [w.lower() for w in words]
        tags = ["O"] * n
        i = 0
        while i < n:
            matched = 0
            cat = None
            for size in range(min(MAX_NER_SIZE, n - i), 0, -1):
                cats = self.by_len[size].get(" ".join(lw[i : i + size]))
                if cats:
                    matched, cat = size, sorted(cats)[0]
                    break
            if matched:
                tags[i] = f"B-{cat}"
                for j in range(i + 1, i + matched):
                    tags[j] = f"I-{cat}"
                i += matched
            else:
                i += 1
        return tags


def repair_bio(tags: list[str]) -> list[str]:
    """Rewrite illegal I-x starts / label switches to B-x
    (ner_tagger_mod.cxx:390-414; same logic for IOB chunks)."""
    out = list(tags)
    prev = "O"
    for i, t in enumerate(out):
        if t.startswith("I-"):
            label = t[2:]
            if prev == "O" or (prev != "O" and prev[2:] != label):
                out[i] = "B-" + label
        prev = out[i]
    return out


def spans_with_conf(
    tags: list[str], confs: list[float]
) -> tuple[list[tuple[int, int, str, float]], list[float]]:
    """Group B-/I- runs into spans; span confidence = MEAN of members,
    written back to every member (addEntity, ner_tagger_mod.cxx:423-503).
    Returns ([(start, end_incl, cat, conf)], member_confs)."""
    spans: list[tuple[int, int, str, float]] = []
    out_conf = list(confs)
    i = 0
    n = len(tags)
    while i < n:
        if tags[i].startswith("B-"):
            cat = tags[i][2:]
            j = i
            while j + 1 < n and tags[j + 1] == f"I-{cat}":
                j += 1
            mean = sum(confs[i : j + 1]) / (j - i + 1)
            spans.append((i, j, cat, mean))
            for k in range(i, j + 1):
                out_conf[k] = mean
            i = j + 1
        else:
            i += 1
    return spans, out_conf


#: tag-first fixed order over _feats below (gazetteer marks, POS
#: context, word LAST): an IGTree walk stops at the first unseen
#: branch, so a gain-learned order that reads the word early regresses
#: to shallow priors on exactly the unseen names this tree must
#: generalize over (held-out NER 0.985 -> 0.996 at gold parity; same
#: finding as the parser's PAIRS_ORDER)
NER_ORDER = [5, 2, 4, 6, 1, 3, 0]


def _feats(
    words: list[str], pos: list[str], gaz: list[str], i: int
) -> list[str]:
    n = len(words)
    return [
        words[i].lower(),
        pos[i - 1] if i > 0 else "<s>",
        pos[i],
        pos[i + 1] if i + 1 < n else "</s>",
        gaz[i - 1] if i > 0 else "O",
        gaz[i],
        gaz[i + 1] if i + 1 < n else "O",
    ]


def merge_override(
    tags: list[str],
    confs: list[float],
    words: list[str],
    override: Gazetteer,
    unconditional: bool = True,
    pos_tags: list[str] | None = None,
) -> tuple[list[str], list[float]]:
    """N5: a second gazetteer FORCES its tags (merge_override,
    /root/reference/src/ner_tagger_mod.cxx:542-617).

    Faithful port: per-token override labels come from the gazetteer mark
    (ambiguous ``cat1+cat2+`` labels resolve to "O" — to_tag,
    ner_tagger_mod.cxx:511-540); consecutive identical labels become an
    I- continuation; replacing the middle of an existing I- run wipes the
    whole run (back to its B-, which the reference loop never reaches at
    index 0 — replicated bug-for-bug, plus the forward I- wipe). With
    ``unconditional=False`` existing non-O tags win; with ``pos_tags``
    given, only tokens whose POS starts with ``N(`` or ``SPEC(`` may be
    overridden (the only-on-N/SPEC mode)."""
    overrides = override.mark(words)
    out_t, out_c = list(tags), list(confs)
    n = len(words)
    label = ""
    for i in range(n):
        ov = overrides[i]
        if ov != "O" and (
            not pos_tags
            or pos_tags[i].startswith("SPEC(")
            or pos_tags[i].startswith("N(")
        ):
            if out_t[i][0] != "O" and not unconditional:
                continue  # don't tamper with existing tags
            inside = label == ov
            parts = [p for p in ov.split("+") if p]
            replace = "O" if len(parts) > 1 else ("I-" if inside else "B-") + parts[0]
            if replace != "O":
                if out_t[i][0] == "I" and not inside:
                    if i == 0:
                        # starting with an I tag is impossible; fix on the fly
                        out_t[i] = "B" + out_t[i][1:]
                        continue
                    for j in range(i - 1, 0, -1):
                        if out_t[j][0] == "B":
                            out_t[j] = "O"
                            break
                        out_t[j] = "O"
                    for j in range(i + 1, n):
                        if out_t[j][0] != "I":
                            break
                        out_t[j] = "O"
                out_t[i] = replace
                out_c[i] = 1.0
                if not inside:
                    label = ov
        else:
            label = ""
    return out_t, out_c


def gazetteer_spans_relational(
    docs,
    entries: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_n: int = 3,
):
    """N1/N2 at scale, relationally: gazetteer n-gram matching as a
    broadcast hash join instead of the in-UDF rolling scan (the survey's
    'at huge gazetteer scale switch to broadcast join' path,
    /root/reference/src/ner_tagger_mod.cxx:251-289 relationalized).

    Tokens are the whitespace words of the normalized text; every
    position's n-grams (n=1..max_n) join against the broadcast gazetteer
    and only the LONGEST match per (doc, position) survives — the
    per-position greedy semantics of create_ner_list. Pure DataFrame ops:
    posexplode -> lead windows -> broadcast join -> windowed max filter.
    Output: (doc_id, pos, span_text, cat, n).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    gaz = spark.createDataFrame(
        sorted({(cat, name.lower()) for cat, name in entries}),
        "cat string, name string",
    )
    words = F.split(
        F.trim(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))), " "
    )
    toks = docs.select(
        F.col(id_col), F.posexplode(words).alias("pos", "w")
    )
    # ONE window pass computes all leads, then every position's 1..max_n
    # grams explode from a single projection — a per-n union would
    # re-shuffle the token relation max_n times
    w = W.partitionBy(id_col).orderBy("pos")
    with_leads = toks.select(
        F.col(id_col),
        "pos",
        "w",
        *[F.lead("w", k).over(w).alias(f"w{k}") for k in range(1, max_n)],
    )
    leads = [F.col("w")] + [F.col(f"w{k}") for k in range(1, max_n)]
    gram_structs = []
    for n in range(1, max_n + 1):
        gram_structs.append(
            F.when(
                leads[n - 1].isNotNull(),
                F.struct(
                    F.lit(n).alias("n"),
                    F.concat_ws(" ", *leads[:n]).alias("ngram"),
                ),
            )
        )
    grams = (
        with_leads.select(
            F.col(id_col),
            "pos",
            F.explode(
                F.filter(F.array(*gram_structs), lambda s: s.isNotNull())
            ).alias("g"),
        )
        .select(id_col, "pos", "g.n", "g.ngram")
    )
    matched = grams.join(
        F.broadcast(gaz), grams["ngram"] == gaz["name"]
    ).select(id_col, "pos", F.col("ngram").alias("span_text"), "cat", "n")
    longest = W.partitionBy(id_col, "pos")
    return (
        matched.withColumn("max_n", F.max("n").over(longest))
        .filter(F.col("n") == F.col("max_n"))
        .drop("max_n")
    )


class NerTagger:
    def __init__(
        self,
        gazetteer: Gazetteer,
        tree: IGTree,
        only_gazets: bool = False,
        override: Gazetteer | None = None,
        override_unconditional: bool = True,
        override_only_n_spec: bool = False,
    ):
        self.gazetteer = gazetteer
        self.tree = tree
        self.only_gazets = only_gazets
        self.override = override
        self.override_unconditional = override_unconditional
        self.override_only_n_spec = override_only_n_spec

    @classmethod
    def train(
        cls,
        gold: list[GoldSentence],
        gazetteer: Gazetteer | None = None,
        override: Gazetteer | None = None,
        override_unconditional: bool = True,
        override_only_n_spec: bool = False,
    ) -> "NerTagger":
        gaz = gazetteer or Gazetteer(load_gazetteer())
        instances: list[list[str]] = []
        classes: list[str] = []
        for s in gold:
            words = [t.word for t in s.tokens]
            pos = [t.pos for t in s.tokens]
            marks = gaz.mark(words)
            for i, t in enumerate(s.tokens):
                instances.append(_feats(words, pos, marks, i))
                classes.append(t.ner)
        return cls(
            gaz,
            IGTree.train(instances, classes, feature_order=list(NER_ORDER)),
            override=override,
            override_unconditional=override_unconditional,
            override_only_n_spec=override_only_n_spec,
        )

    def tag(
        self, words: list[str], pos: list[str]
    ) -> tuple[list[str], list[float], list[tuple[int, int, str, float]]]:
        if self.only_gazets:
            tags = self.gazetteer.bio(words)
            confs = [1.0] * len(words)
        else:
            marks = self.gazetteer.mark(words)
            tags, confs = [], []
            for i in range(len(words)):
                t, c = self.tree.classify(_feats(words, pos, marks, i))
                tags.append(t)
                confs.append(c)
        tags = repair_bio(tags)
        if self.override is not None:
            tags, confs = merge_override(
                tags,
                confs,
                words,
                self.override,
                unconditional=self.override_unconditional,
                pos_tags=pos if self.override_only_n_spec else None,
            )
        spans, confs = spans_with_conf(tags, confs)
        return tags, confs, spans
