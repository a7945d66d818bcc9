"""Tests for the systematic Dutch inflection lexicon (sources/inflect.py).

The spelling rules are the load-bearing part: each class of Dutch
orthographic alternation (undoubling, open-syllable lengthening, f/v-s/z
devoicing, 't kofschip, ge-participles, separable particles) gets a
round-trip check, plus structural invariants over the whole generated
lexicon.
"""

from __future__ import annotations

import pytest

from frog_spark.sources.inflect import (
    adj_forms,
    inflection_morph_rows,
    inflection_rows,
    noun_forms,
    verb_forms,
    verb_stem,
)


@pytest.mark.parametrize(
    "inf,stem",
    [
        ("werken", "werk"),      # plain
        ("zwemmen", "zwem"),     # undouble
        ("bestellen", "bestel"),
        ("spelen", "speel"),     # open-syllable lengthening
        ("maken", "maak"),
        ("lopen", "loop"),
        ("wandelen", "wandel"),  # unstressed -el: no lengthening
        ("veranderen", "verander"),
        ("tekenen", "teken"),
        ("geloven", "geloof"),   # v -> f
        ("verhuizen", "verhuis"),  # z -> s (long vowel, no lengthening)
        ("blijven", "blijf"),    # ij counts as a long vowel group
        ("duwen", "duw"),        # never double/lengthen before w
        ("draaien", "draai"),
    ],
)
def test_verb_stem_spelling_rules(inf, stem):
    assert verb_stem(inf) == stem


@pytest.mark.parametrize(
    "entry,form,tag,lemma",
    [
        # weak past -de/-te by 't kofschip
        ("werken", "werkte", "WW(pv,verl,ev)", "werken"),
        ("spelen", "speelde", "WW(pv,verl,ev)", "spelen"),
        ("ver|huizen", "verhuisde", "WW(pv,verl,ev)", "verhuizen"),
        ("praten", "praatte", "WW(pv,verl,ev)", "praten"),
        ("branden", "brandde", "WW(pv,verl,ev)", "branden"),
        # participles: ge- except after unstressed prefixes;
        # separable particles wrap the ge-
        ("spelen", "gespeeld", "WW(vd,vrij,zonder)", "spelen"),
        ("ver|beteren", "verbeterd", "WW(vd,vrij,zonder)", "verbeteren"),
        ("aan|passen", "aangepast", "WW(vd,vrij,zonder)", "aanpassen"),
        ("ont|wikkelen", "ontwikkeld", "WW(vd,vrij,zonder)", "ontwikkelen"),
        # 3sg: +t, no double t
        ("starten", "start", "WW(pv,tgw,met-t)", "starten"),
        ("ont|wikkelen", "ontwikkelt", "WW(pv,tgw,met-t)", "ontwikkelen"),
        (("studeren", "studeer"), "studeert", "WW(pv,tgw,met-t)", "studeren"),
    ],
)
def test_verb_forms(entry, form, tag, lemma):
    assert (form, tag, lemma) in {(w, t, le) for w, t, le, _ in verb_forms(entry)}


def test_irregular_verbs_in_lexicon():
    rows = set(inflection_rows())
    for want in [
        ("is", "WW(pv,tgw,ev)", "zijn"),
        ("heeft", "WW(pv,tgw,met-t)", "hebben"),
        ("kan", "WW(pv,tgw,ev)", "kunnen"),
        ("staat", "WW(pv,tgw,met-t)", "staan"),
        ("zagen", "WW(pv,verl,mv)", "zien"),
        ("gewonnen", "WW(vd,vrij,zonder)", "winnen"),
        ("verloren", "WW(vd,vrij,zonder)", "verliezen"),
        ("vertrekt", "WW(pv,tgw,met-t)", "vertrekken"),
    ]:
        assert want in rows, want


def test_noun_and_adj_forms():
    rows = {(w, t, le) for w, t, le, _ in noun_forms("kind", "kinderen", "het")}
    assert ("kinderen", "N(soort,mv,basis)", "kind") in rows
    rows = {(w, t, le) for w, t, le, _ in noun_forms("kaart|je", "kaartjes", "het")}
    assert ("kaartjes", "N(soort,mv,dim)", "kaartje") in rows
    rows = {(w, t, le) for w, t, le, _ in adj_forms("groot")}
    assert ("grote", "ADJ(prenom,basis,met-e,stan)", "groot") in rows
    assert ("groter", "ADJ(vrij,comp,zonder)", "groot") in rows
    assert ("grootst", "ADJ(vrij,sup,zonder)", "groot") in rows
    rows = {(w, t, le) for w, t, le, _ in adj_forms("boos")}
    assert ("boze", "ADJ(prenom,basis,met-e,stan)", "boos") in rows
    rows = {(w, t, le) for w, t, le, _ in adj_forms("dik")}
    assert ("dikke", "ADJ(prenom,basis,met-e,stan)", "dik") in rows


def test_morph_segmentations_follow_gold_conventions():
    # the DOMINANT (first-emitted) reading per surface carries the
    # convention; homograph alternates follow it in the row stream
    morphs: dict = {}
    for w, _t, m in inflection_morph_rows():
        morphs.setdefault(w, m)
    for word, want in [
        ("speelt", "[speel][t]"),
        ("gespeeld", "[ge][speel][d]"),
        ("ontwikkelt", "[ont][wikkel][t]"),
        ("bespreken", "[be][sprek][en]"),
        ("kinderen", "[kind][eren]"),
        ("ziekenhuis", "[zieken][huis]"),
        ("kaartjes", "[kaart][je][s]"),
        ("snelheid", "[snel][heid]"),
        ("verloren", "[ver][loren]"),  # vd reading wins over past-mv
        ("zagen", "[zag][en]"),
    ]:
        assert morphs.get(word) == want, (word, morphs.get(word), want)


def test_lexicon_structural_invariants():
    rows = inflection_rows()
    assert len(rows) > 4000
    # concatenated morph segments reproduce the surface, EXCEPT the
    # vowel-undoubling adjective class where the corpus convention keeps
    # the underlying stem ([groot][e] for 'grote', [heel][e] for 'hele')
    # — there the concatenation differs exactly by collapsing a doubled
    # long vowel at a segment boundary
    import re

    for w, _t, m in inflection_morph_rows():
        segs = re.findall(r"\[([^]]*)\]", m)
        joined = "".join(segs)
        if joined == w:
            continue
        undoubled = False
        for i, seg in enumerate(segs[:-1]):
            if len(seg) >= 3 and seg[-2] == seg[-3] and seg[-2] in "aeou":
                collapsed = "".join(segs[:i]) + seg[:-2] + seg[-1] + "".join(segs[i + 1:])
                if collapsed == w:
                    undoubled = True
                    break
        assert undoubled, (w, m)
    # every row's lemma is itself a surface somewhere for open classes
    # (the infinitive / singular / base form rows exist)
    surfaces = {r[0] for r in rows}
    missing = {lem for _w, _t, lem in rows if lem not in surfaces}
    assert not missing, sorted(missing)[:20]


def test_lexicon_df_matches_rows(spark):
    from frog_spark.sources.inflect import inflection_lexicon_df

    df = inflection_lexicon_df(spark)
    got = {(r["word"], r["tag"], r["lemma"]) for r in df.collect()}
    assert got == set(inflection_rows())


def test_adjective_review_findings():
    """Round-5 self-review findings: suppletive comparatives, -ieel
    diaeresis, invariant unstressed -en adjectives."""
    rows = {(w, t, le) for w, t, le, _ in adj_forms("goed")}
    assert ("beter", "ADJ(vrij,comp,zonder)", "goed") in rows
    assert ("betere", "ADJ(prenom,comp,met-e,stan)", "goed") in rows
    assert ("best", "ADJ(vrij,sup,zonder)", "goed") in rows
    surfaces = {w for w, *_ in rows}
    assert "goeder" not in surfaces and "goedst" not in surfaces
    rows = {w for w, *_ in adj_forms("officieel")}
    assert "officiële" in rows and "officieele" not in rows
    rows = {w for w, *_ in adj_forms("open")}
    assert "opene" not in rows and "opener" in rows
    # morphs of suppletive forms are whole-form
    morphs = {w: m for w, _t, _le, m in adj_forms("goed")}
    assert morphs["beter"] == "[beter]" and morphs["betere"] == "[beter][e]"


def test_treebank_agreement_review_findings():
    """Ordinal determiners agree in gender; existential indefinite
    neuter NPs take the uninflected adjective (no 'een grote schip' /
    'de 3e apparaat' in generated training data)."""
    from frog_spark.sources.treebank import _NOUNS, synthetic_treebank

    het_sg = {sg for sg, _pl, g, _lem in _NOUNS if g == "het"}
    e_adjs = {ae for _ab, ae, _lem in __import__("frog_spark.sources.treebank", fromlist=["_ADJS"])._ADJS}
    for s in synthetic_treebank(4000):
        words = [t.word for t in s.tokens]
        for i in range(len(words) - 2):
            if words[i].lower() == "de" and words[i + 2] in het_sg:
                tag = s.tokens[i + 1].pos
                assert not tag.startswith("TW(rang"), s.text
            if words[i] == "een" and words[i + 1] in e_adjs and words[i + 2] in het_sg:
                raise AssertionError(f"inflected adj before het-noun: {s.text}")
