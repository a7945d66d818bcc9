"""CGN tagset utilities (SURVEY.md §2.3 P5).

Reference: getSubSet (/root/reference/src/cgn_tagger_mod.cxx:179-229) maps
each feature value of a fine CGN tag like ``N(soort,ev,basis,zijd,stan)``
to its feature subset (ntype, getal, graad, ...), with head-specific
constraints resolving ambiguous values (``ev`` is ``getal`` on nouns but
``pvagr`` on finite verbs). The subset tables (cgn_tagger_mod.cxx:50-116)
are reproduced here for the tagset the pipeline emits.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType

# value -> subset (default)
FEATURE_SUBSETS: dict[str, str] = {
    "soort": "ntype", "eigen": "ntype",
    "ev": "getal", "mv": "getal", "getal": "getal",
    "basis": "graad", "comp": "graad", "sup": "graad", "dim": "graad",
    "zijd": "genus", "onz": "genus", "masc": "genus", "fem": "genus",
    "stan": "naamval", "obl": "naamval", "nomin": "naamval", "gen": "naamval",
    "pv": "wvorm", "inf": "wvorm", "od": "wvorm", "vd": "wvorm",
    "tgw": "pvtijd", "verl": "pvtijd", "conj": "pvtijd",
    "met-t": "pvagr",
    "prenom": "positie", "postnom": "positie", "nom": "positie", "vrij": "positie",
    "zonder": "buiging", "met-e": "buiging", "met-s": "buiging",
    "agr": "npagr", "rest": "npagr", "evon": "npagr", "evz": "npagr",
    "mv-n": "buiging", "zonder-n": "buiging",
    "bep": "lwtype", "onbep": "lwtype",
    "init": "vztype", "fin": "vztype", "versm": "vztype",
    "neven": "conjtype", "onder": "conjtype",
    "hoofd": "numtype", "rang": "numtype",
    "deeleigen": "spectype", "symb": "spectype", "afk": "spectype",
    "aanw": "vwtype", "pers": "vwtype", "bez": "vwtype", "refl": "vwtype",
    "recip": "vwtype", "vrag": "vwtype", "betr": "vwtype", "excl": "vwtype",
    "grad": "vwtype",
    "pron": "pdtype", "det": "pdtype", "adv-pron": "pdtype",
    "vol": "status", "red": "status", "nadr": "status",
    "1": "persoon", "2": "persoon", "2v": "persoon", "2b": "persoon",
    "3": "persoon", "3o": "persoon", "3p": "persoon", "3m": "persoon", "3v": "persoon",
}

# (head, value) -> subset overrides (the head constraints of
# cgn_tagger_mod.cxx:50-116)
HEAD_CONSTRAINTS: dict[tuple[str, str], str] = {
    ("WW", "ev"): "pvagr",
    ("WW", "mv"): "pvagr",
    ("TW", "mv-n"): "numgetal",
    ("VNW", "onbep"): "vwtype",
    ("LID", "onbep"): "lwtype",
}


def split_tag(tag: str) -> tuple[str, list[str]]:
    """'N(soort,ev,...)' -> ('N', ['soort', 'ev', ...])."""
    if "(" not in tag:
        return tag, []
    head, _, rest = tag.partition("(")
    feats = rest.rstrip(")")
    return head, [f for f in feats.split(",") if f]


def expand_tag(tag: str) -> dict[str, str]:
    """Fine CGN tag -> {subset: value} (getSubSet semantics)."""
    head, feats = split_tag(tag)
    out: dict[str, str] = {}
    for v in feats:
        subset = HEAD_CONSTRAINTS.get((head, v)) or FEATURE_SUBSETS.get(v)
        if subset is not None and subset not in out:
            out[subset] = v
    return out


def cgn_head(col: Column) -> Column:
    """Main tag before '(' — pure JVM expression."""
    return F.split(col, r"\(").getItem(0)


@F.pandas_udf(MapType(StringType(), StringType()))
def cgn_features(tags: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Vectorized subset expansion: pos_tag -> map<subset, value>."""
    for s in tags:
        yield s.map(expand_tag, na_action='ignore')
