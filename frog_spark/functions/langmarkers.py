"""The ONE language-marker table (NL/EN stopword votes).

Three consumers used to carry private copies that had to agree by hand
(VERDICT r2 #5): the relational lang-id operator
(operators/textstats.py), the DuckDB oracle SQL generator
(__spark_entry__.py) — these two MUST be identical or the txt_* oracle
hashes diverge — and the per-sentence T3 language gate
(plans/pipeline.py), which extends the Dutch set with words that are
safe sentence-level but too weak for the 10-word relational vote.

Marker sets are kept disjoint ACROSS languages: words spelled the same
in both (is, of, in) appear in at most one list, or Dutch sentences
leak to 'en'.
"""

from __future__ import annotations

# canonical 10/11-word vote lists — the relational operator AND its SQL
# oracle both derive from these
NL_MARKERS: list[str] = ["de", "het", "een", "en", "van", "ik", "je", "dat", "niet", "op"]
EN_MARKERS: list[str] = ["the", "a", "an", "and", "of", "i", "you", "that", "not", "on", "is"]

# sentence-gate extension (T3): extra Dutch function words that make the
# per-sentence vote robust on short sentences; 'a'/'of'/'i'/'on'/'is'
# are dropped from the EN side there because they collide with Dutch
NL_SENTENCE_EXTRA: list[str] = [
    "om", "te", "met", "hij", "zijn", "naar", "voor", "bij",
]
EN_SENTENCE_ONLY: list[str] = [
    "the", "an", "and", "you", "that", "not", "this", "with", "are", "for",
]


def sql_list(words: list[str]) -> str:
    """Render a marker list as a DuckDB array literal for oracle SQL."""
    inner = ",".join(f"'{w}'" for w in words)
    return f"[{inner}]"
