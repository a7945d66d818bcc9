"""Mechanical linter for gold/held-out corpus files.

Checks every sentence for the errors hand annotation actually makes:
  * tokenizer round-trip: the repo tokenizer must produce exactly the
    annotated token sequence from the sentence text (otherwise the
    evaluation's zip() silently misaligns);
  * dep completeness over POST-MWU units (glue runs + lexicon MWUs),
    single ROOT, heads in range, acyclic, projective;
  * BIO chain validity for ner and chunk columns;
  * morph column is a well-formed [seg][seg] bracket string;
  * POS tags drawn from the tag inventory of the main gold corpus
    (catches typos like a missing paren).

Usage: python scripts/lint_corpus.py resources/heldout_corpus.tsv
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from frog_spark.operators.mwu import resolve_mwus  # noqa: E402
from frog_spark.operators.tokenizer import split_sentences, tokenize_text  # noqa: E402
from frog_spark.sources.resources import load_gold_corpus, load_mwu_lexicon  # noqa: E402


def ancestors(deps, u, limit=100):
    out = []
    while u != 0 and limit:
        u = deps.get(u, (0, ""))[0]
        out.append(u)
        limit -= 1
    return out


def lint(path: str) -> int:
    lex = load_mwu_lexicon()
    tag_inventory = {t.pos for s in load_gold_corpus() for t in s.tokens}
    errs = 0

    def report(sid, msg):
        nonlocal errs
        errs += 1
        print(f"{sid}: {msg}")

    for s in load_gold_corpus(path):
        toks = s.tokens
        # tokenizer round-trip
        sents = split_sentences(tokenize_text(s.text))
        if len(sents) != 1:
            report(s.sent_id, f"text splits into {len(sents)} sentences")
            continue
        got = [t.word for t in sents[0]]
        want = [t.word for t in toks]
        if got != want:
            report(s.sent_id, f"tokenizer mismatch: {got} != {want}")
            continue
        # tag inventory (new tags are allowed but flagged for eyeballing)
        for t in toks:
            if t.pos not in tag_inventory:
                print(f"{s.sent_id}: NOTE new tag {t.pos!r} ({t.word})")
            if not re.fullmatch(r"(\[[^][]+\])+", t.morph):
                report(s.sent_id, f"bad morph {t.morph!r} ({t.word})")
            else:
                # surface convention: segments concatenate back to the
                # written word ([grot][e], [resultat][en]); the ONE
                # sanctioned exception is suppletion carrying the bare
                # lemma as a single segment (is -> [zijn])
                segs = re.findall(r"\[([^\]]*)\]", t.morph)
                joined = "".join(segs)
                suppletive = len(segs) == 1 and segs[0] == t.lemma
                if joined.lower() != t.word.lower() and not suppletive:
                    report(
                        s.sent_id,
                        f"morph segments {t.morph!r} do not concatenate "
                        f"to surface {t.word!r}",
                    )
        # BIO chains
        for col in ("ner", "chunk"):
            prev = "O"
            for t in toks:
                v = getattr(s.tokens[t.idx - 1], col)
                if v.startswith("I-") and not (
                    prev.startswith(("B-", "I-")) and prev[2:] == v[2:]
                ):
                    report(s.sent_id, f"{col} I- without head at {t.word} ({v} after {prev})")
                prev = v
        # units + deps
        units = resolve_mwus(
            [t.word for t in toks], [t.pos for t in toks],
            [1.0] * len(toks), [t.lemma for t in toks], lex,
        )
        n = len(units)
        if set(s.deps.keys()) != set(range(1, n + 1)):
            report(
                s.sent_id,
                f"deps cover {sorted(s.deps)} but units are 1..{n} "
                f"({[u.word for u in units]})",
            )
            continue
        roots = [u for u, (h, _r) in s.deps.items() if h == 0]
        if len(roots) != 1:
            report(s.sent_id, f"roots={roots}")
        for d, (h, _r) in s.deps.items():
            if h == d or h < 0 or h > n:
                report(s.sent_id, f"bad head {d}->{h}")
            if d in ancestors(s.deps, d):
                report(s.sent_id, f"cycle at {d}")
                continue
            if h == 0:
                continue
            for m in range(min(d, h) + 1, max(d, h)):
                if h not in ([m] + ancestors(s.deps, m)):
                    report(s.sent_id, f"non-projective edge {h}->{d} crossing {m}")
                    break
    return errs


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "resources/heldout_corpus.tsv"
    n = lint(path)
    print(f"{n} errors")
    sys.exit(1 if n else 0)
