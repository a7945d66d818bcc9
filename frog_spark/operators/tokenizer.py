"""Ucto-style rule tokenizer (SURVEY.md §2.2, T1-T3).

Reference behavior: /root/reference/src/ucto_tokenizer_mod.cxx:105-214 (init),
527-616 (tokenize_*): ordered regex rules split punctuation, keep
abbreviations and dates, assign token classes, detect sentence boundaries
with quote-level tracking, honor ``<utt>`` as a forced sentence break
(/root/reference/test/problems.txt). Sentence assembly per
/root/reference/src/FrogAPI.cxx:1988-2029 (extract_fd).

Spark-first shape: the rule engine is a pure function over ONE turn's text;
the Spark stage applies it over Arrow batches via ``mapInPandas`` and emits
one row per token keyed (conv_id, turn_idx, sent_idx, token_idx). All
downstream stages are keyed on those four columns, so window features can be
computed either in-UDF (within a sentence batch) or relationally with
``Window.partitionBy``.

Invariant (FIXTURES.md F1): detokenize(tokenize(text)) == normalized text,
with ``no_space`` computed from true character offsets
(cf. frog_data::sentence, /root/reference/src/FrogData.cxx:185-201).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# --- rule set (ordered, Ucto-style) ---------------------------------------

ABBREVIATIONS = {
    "a.u.b.", "bijv.", "bv.", "ca.", "dhr.", "dr.", "drs.", "d.w.z.", "e.d.",
    "enz.", "etc.", "ir.", "jl.", "m.a.w.", "mevr.", "mr.", "nl.", "nr.",
    "o.a.", "prof.", "st.", "t.a.v.", "t/m", "z.g.", "zgn.", "o.m.", "i.p.v.",
}

# Ordered alternatives; first match at each position wins — mirrors Ucto's
# ordered rule list semantics.
_RULES: list[tuple[str, str]] = [
    ("URL", r"(?:https?://|www\.)[^\s]*[^\s.,!?;:]"),
    # EMAIL must END on a word character or a sentence-final period would
    # be swallowed into the address ('Mail me@x.nl. Daarna' lost its
    # sentence boundary)
    ("EMAIL", r"[\w.+-]+@[\w-]+\.[\w.-]*\w"),
    # dotted abbreviation sequences (o.a., t.a.v., d.w.z.) scan as ONE
    # token — letter-by-letter splitting made every multi-dot entry in
    # ABBREVIATIONS unreachable and each internal period a false
    # sentence-break candidate
    ("ABBREV-DOTTED", r"(?:[^\W\d_]{1,3}\.){2,}"),
    ("DATE", r"\d{1,2}-\d{1,2}-\d{2,4}"),
    ("SMILEY", r"[:;=][-o^]?[)(DpP/\\|]"),
    ("NUMBER-ORDINAL", r"\d+(?:ste|de|e)\b"),
    ("NUMBER", r"\d+(?:[.,]\d+)*"),
    ("CURRENCY", r"[€$£¥]"),
    # possessive suffixes (Ucto classes consumed by MBLEM's token-strip
    # rules, /root/reference/src/mblem_mod.cxx:75-116): Jan's -> strip 2,
    # Alex' -> strip 1
    ("WORD-WITHSUFFIX", r"[^\W\d_]+['’]s(?![^\W\d_])"),
    ("QUOTE-SUFFIX", r"[^\W\d_]+['’](?![^\W\d_])"),
    # word with internal apostrophe/hyphen/diacritics: zo'n, user-based, 's
    ("WORD", r"[^\W\d_]+(?:[-'’][^\W\d_]+)*|['’][^\W\d_]+"),
    # ellipsis / repeated terminators are ONE token ('...' as three dots
    # produced two spurious empty sentences per ellipsis)
    ("PUNCTUATION-MULTI", r"\.{2,}|[!?]{2,}"),
    ("PUNCTUATION", r"[^\s\w]"),
    ("SYMBOL", r"[_]+"),
]

_SCANNER = re.compile(
    "|".join(f"(?P<{name.replace('-', '_')}>{pat})" for name, pat in _RULES),
    re.UNICODE,
)
_CLASS_BY_GROUP = {name.replace("-", "_"): name for name, _ in _RULES}

_EOS_PUNCT = {".", "!", "?"}
_QUOTE_SPAN_MAX = 40  # tokens an open quote may suppress breaks for
_OPEN_QUOTES = {'"', "“", "«", "‘"}
_CLOSE_QUOTES = {'"', "”", "»", "’"}
_UTT = re.compile(r"<utt>")


@dataclass
class Token:
    word: str
    token_class: str
    no_space: bool
    new_paragraph: bool
    eos: bool


def _classify(match: re.Match) -> str:
    return _CLASS_BY_GROUP[match.lastgroup]


def tokenize_text(text: str) -> list[Token]:
    """Tokenize one turn; pure, deterministic, no model needed."""
    tokens: list[Token] = []
    # <utt> is a hard sentence break marker, consumed (problems.txt usage).
    segments: list[str] = []
    pos = 0
    for m in _UTT.finditer(text):
        segments.append(text[pos : m.start()])
        pos = m.end()
    segments.append(text[pos:])

    para_pending = True
    for seg_i, seg in enumerate(segments):
        seg_tokens: list[tuple[Token, int, int]] = []
        for m in _SCANNER.finditer(seg):
            word = m.group(0)
            cls = _classify(m)
            if cls == "ABBREV-DOTTED":
                cls = "ABBREVIATION"
            elif cls == "PUNCTUATION-MULTI":
                cls = "PUNCTUATION"
            elif cls == "WORD" and word.lower() in ABBREVIATIONS:
                cls = "ABBREVIATION"
            seg_tokens.append(
                (Token(word, cls, False, False, False), m.start(), m.end())
            )
        # merge "word ." into ABBREVIATION when joined form is known, e.g.
        # the scanner splits "ca." into WORD "ca" + "."; rejoin if listed.
        merged: list[tuple[Token, int, int]] = []
        i = 0
        while i < len(seg_tokens):
            tok, s, e = seg_tokens[i]
            if (
                i + 1 < len(seg_tokens)
                and seg_tokens[i + 1][0].word == "."
                and seg_tokens[i + 1][1] == e
                and (tok.word + ".").lower() in ABBREVIATIONS
            ):
                nxt = seg_tokens[i + 1]
                merged.append(
                    (Token(tok.word + ".", "ABBREVIATION", False, False, False), s, nxt[2])
                )
                i += 2
            else:
                merged.append((tok, s, e))
                i += 1
        seg_tokens = merged

        quote_depth = 0
        straight_open = False  # straight '"' toggles its OWN flag — it must
        # not zero typographic nesting it did not open
        since_open = 0  # tokens since any quote opened (bounded suppression)
        prev_end = None
        for j, (tok, s, e) in enumerate(seg_tokens):
            tok.no_space = prev_end is not None and s == prev_end
            prev_end = e
            if para_pending:
                tok.new_paragraph = True
                para_pending = False
            if quote_depth > 0 or straight_open:
                since_open += 1
            if tok.word in _OPEN_QUOTES and tok.word in _CLOSE_QUOTES:
                straight_open = not straight_open
                if straight_open:
                    since_open = 0
            elif tok.word in _OPEN_QUOTES:
                quote_depth += 1
                since_open = 0
            elif tok.word in _CLOSE_QUOTES and quote_depth > 0:
                quote_depth -= 1
            elif (
                tok.token_class == "PUNCTUATION"
                and set(tok.word) <= _EOS_PUNCT
            ):
                nxt = seg_tokens[j + 1][0] if j + 1 < len(seg_tokens) else None
                if (quote_depth > 0 or straight_open) and since_open > _QUOTE_SPAN_MAX:
                    # unbalanced quote: a stray '"' must not suppress
                    # sentence breaks for the rest of the turn (the
                    # reference bounds quote lookahead the same way)
                    quote_depth = 0
                    straight_open = False
                if quote_depth == 0 and not straight_open and (
                    nxt is None
                    or nxt.word[:1].isupper()
                    or nxt.word in _OPEN_QUOTES
                    or not nxt.word[:1].isalpha()
                ):
                    tok.eos = True
            tokens.append(tok)
        # hard break after each <utt>-delimited segment
        if tokens and seg_i < len(segments) - 1:
            tokens[-1].eos = True
    if tokens:
        tokens[-1].eos = True
    return tokens


def detokenize(tokens: list[Token]) -> str:
    """Inverse of tokenize_text modulo whitespace normalization."""
    out: list[str] = []
    for i, t in enumerate(tokens):
        if i > 0 and not t.no_space:
            out.append(" ")
        out.append(t.word)
    return "".join(out)


def split_sentences(tokens: list[Token]) -> list[list[Token]]:
    sents: list[list[Token]] = []
    cur: list[Token] = []
    for t in tokens:
        cur.append(t)
        if t.eos:
            sents.append(cur)
            cur = []
    if cur:
        sents.append(cur)
    return sents


# --- Spark stage -----------------------------------------------------------

TOKEN_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("token_idx", IntegerType(), False),
        StructField("word", StringType(), False),
        StructField("token_class", StringType(), False),
        StructField("no_space", BooleanType(), False),
        StructField("new_paragraph", BooleanType(), False),
        StructField("eos", BooleanType(), False),
        StructField("lang", StringType(), True),
    ]
)


def tokenize_turns(df: DataFrame) -> DataFrame:
    """Transcript turns -> token rows, one Arrow-batched pass, no shuffle.

    Narrow transformation: each input partition maps to one output
    partition, so a downstream ``groupBy(conv_id, turn_idx, sent_idx)``
    is the first (and only) shuffle of the annotation pipeline.
    """
    cols = [f.name for f in TOKEN_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for conv_id, turn_idx, text in zip(b["conv_id"], b["turn_idx"], b["text"]):
                toks = tokenize_text(text or "")
                for si, sent in enumerate(split_sentences(toks)):
                    for ti, t in enumerate(sent):
                        rows.append(
                            (
                                conv_id,
                                int(turn_idx),
                                si,
                                ti,
                                t.word,
                                t.token_class,
                                t.no_space,
                                t.new_paragraph,
                                t.eos,
                                "nl",
                            )
                        )
            if rows:
                yield pd.DataFrame(rows, columns=cols)
            else:
                yield pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})

    return df.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=TOKEN_SCHEMA
    )
