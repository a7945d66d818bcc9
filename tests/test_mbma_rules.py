"""Unit tests for the MBMA rule engine (M3-M6), mirroring reference
behavior documented in /root/reference/src/mbma_mod.cxx,
mbma_rule.cxx and mbma_brackets.cxx."""

from frog_spark.operators import mbma_rules as mr
from frog_spark.operators.morpho import Mbma, synthesize_classes


def test_generate_all_perms_reference_example():
    """The docstring example at mbma_mod.cxx:355-380 ('gek')."""
    classes = ["A|N|V", "0", "0/P|0/e|0/te1|0/te2I"]
    perms = mr.generate_all_perms(classes)
    assert perms == [
        ["A", "0", "0/P"],
        ["N", "0", "0/e"],
        ["V", "0", "0/te1"],
        ["V", "0", "0/te2I"],
    ]


def test_perms_single_class_no_expansion():
    assert mr.generate_all_perms(["V", "0", "0"]) == [["V", "0", "0"]]


def test_delete_validation_rejects_rule():
    """performEdits validates deletions against actual chars
    (mbma_rule.cxx:330-357): a del whose chars don't match is rejected."""
    # class at char 0 deletes 'ge' but the word starts 'ma'
    rules = mr.execute("maak", "", ["V+Ige", "0", "0", "0"])
    assert rules == []


def test_replace_edit_produces_nonsurface_morpheme():
    """R edits delete surface chars and insert morpheme chars
    (get_edits, mbma_rule.cxx:113-118): is -> [zijn]."""
    rules = mr.execute("is", "", ["V+Rzijn>is", "0"])
    assert len(rules) == 1
    assert mr.flatten(rules[0].pretty_string()) == "[zijn]"
    assert rules[0].tag == "V"


def test_hide_edit_appends_hidden_morpheme():
    """H edits keep the char on the previous morpheme and open a hidden
    one (performEdits, mbma_rule.cxx:368-373)."""
    rules = mr.execute("kat", "", ["N", "0", "0+Hje"])
    assert len(rules) == 1
    morphs = rules[0].extract_morphemes()
    assert morphs == ["kat", "je"]


def test_inflection_starts_new_morpheme():
    """A bare inflection class (UNASS result + inflect) starts a new
    morpheme: [bezoek][t]."""
    rules = mr.execute("bezoekt", "", ["V", "0", "0", "0", "0", "0", "t"])
    assert len(rules) == 1
    assert mr.flatten(rules[0].pretty_string()) == "[bezoek][t]"
    assert rules[0].inflection == "t"


def test_resolve_inflections_retags_stem():
    """An inflection hint retags the preceding basic morpheme
    (mbma_rule.cxx:420-483): 'm' (plural) selects N."""
    rules = mr.execute("fietsen", "", ["A", "0", "0", "0", "0", "m", "0"])
    assert len(rules) == 1
    # stem was A, the plural inflection rewrites it to N
    assert rules[0].tag == "N"


def test_v2i_demoted_without_2nd_person_next():
    """getCleanInflect (mbma_rule.cxx:509-530): te2I becomes te1 unless
    the next word is a VNW without ',2,' (check_next,
    mbma_mod.cxx:446-457)."""
    classes = ["V", "0", "0/te2I"]
    r_plain = mr.execute("gek", "", classes)[0]
    assert r_plain.inflection == "te1"
    # next tag is a VNW whose features lack ",2," -> keep te2I
    r_keep = mr.execute("gek", "VNW(pers,pron,nomin,vol,2v,ev)", classes)[0]
    assert r_keep.inflection == "te2I"
    # a VNW with ",2," present -> demote
    r_demote = mr.execute("gek", "VNW(pers,pron,nomin,vol,2,ev)", classes)[0]
    assert r_demote.inflection == "te1"


def test_both_v2_and_v2i_disables_keep():
    """execute (mbma_mod.cxx:470-490): when a class carries both te2 and
    te2I alternatives, keep_V2I is forced off."""
    classes = ["V", "0", "0/te2|0/te2I"]
    rules = mr.execute("gek", "VNW(pers,pron,nomin,vol,2v,ev)", classes)
    assert all(r.inflection != "te2I" for r in rules)


def test_filter_head_tag_confidence_ladder():
    """M5 ladder (mbma_mod.cxx:565-648): exact/PN 1.0, A~B 0.8, A~V 0.5,
    otherwise dropped."""
    def rule_with_tag(tag):
        r = mr.execute("boek", "", [tag, "0", "0", "0"])[0]
        return r

    exact = mr.filter_head_tag([rule_with_tag("N")], "N")
    assert exact and exact[0].confidence == 1.0
    pn = mr.filter_head_tag([rule_with_tag("PN")], "N")
    # PN needs the multi-char class; single char parse gives P. Build
    # via direct attribute to test the ladder arm.
    r = rule_with_tag("N")
    r.tag = "PN"
    pn = mr.filter_head_tag([r], "N")
    assert pn and pn[0].confidence == 1.0
    ab = mr.filter_head_tag([rule_with_tag("A")], "BW")
    assert ab and ab[0].confidence == 0.8
    av = mr.filter_head_tag([rule_with_tag("V")], "ADJ")
    assert av and av[0].confidence == 0.5
    dropped = mr.filter_head_tag([rule_with_tag("N")], "WW")
    assert dropped == []


def test_filter_sub_tags_prefers_longest_segmentation():
    """M6 (mbma_mod.cxx:793-800): [ge][maak][t] preferred over
    [gemaak][t] by key length."""
    long_seg = mr.execute("gemaakt", "", ["V", "0", "V", "0", "0", "0", "t"])[0]
    short_seg = mr.execute("gemaakt", "", ["V", "0", "0", "0", "0", "0", "t"])[0]
    long_seg.ID, short_seg.ID = 0, 1
    long_seg.confidence = short_seg.confidence = 1.0
    out = mr.filter_sub_tags([short_seg, long_seg], ["pv", "tgw"])
    assert mr.flatten(out[0].pretty_string()) == "[ge][maak][t]"


def test_filter_sub_tags_feature_match_scoring():
    """Analyses whose inflection matches more translated CGN features
    win (mbma_mod.cxx:678-718)."""
    match = mr.execute("fietsen", "", ["N", "0", "0", "0", "0", "m", "0"])[0]
    nomatch = mr.execute("fietsen", "", ["N", "0", "0", "0", "0", "i", "0"])[0]
    match.ID, nomatch.ID = 0, 1
    match.confidence = nomatch.confidence = 1.0
    out = mr.filter_sub_tags([nomatch, match], ["soort", "mv", "basis"])
    assert out[0].inflection == "m"
    assert all(r.inflection == "m" for r in out)


def test_derivational_suffix_nests_and_retags():
    """X_Y* rewrite rules nest the base stem and assign the result tag
    (resolveTail + resolveAffix, mbma_brackets.cxx:1066-1122,1282-1313)."""
    classes = synthesize_classes(
        "verzekering", ["ver", "zeker", "ing"], "N"
    )
    rules = mr.execute("verzekering", "", classes)
    assert len(rules) == 1
    r = rules[0]
    assert mr.flatten(r.pretty_string()) == "[ver][zeker][ing]"
    assert r.tag == "N"  # final tag from the derivational nest
    assert r.brackets.speculate_compound_type() == mr.NONE  # not a compound


def test_noun_noun_compound():
    """resolveNouns (mbma_brackets.cxx:1123-1165) + compound typing."""
    classes = synthesize_classes("zoekmachine", ["zoek", "machine"], "N")
    r = mr.execute("zoekmachine", "", classes)[0]
    assert r.brackets.speculate_compound_type() == "NN"


def test_triple_noun_compound():
    """resolveNouns nests left-to-right, marking the inner nest NNN; the
    final speculate pass re-derives the (nest+leaf) pair as NN — exactly
    what the reference computes (2-part N arm, st2==STEM ->
    construct(N,N)), so the inner NNN is visible on the child nest only."""
    classes = synthesize_classes(
        "zoekmachinekamer", ["zoek", "machine", "kamer"], "N"
    )
    r = mr.execute("zoekmachinekamer", "", classes)[0]
    inner = r.brackets.parts[0]
    assert inner.nested and inner.compound() == "NNN"
    assert r.brackets.speculate_compound_type() == "NN"


def test_preposition_prefix_compound():
    """P + N stem -> PN compound (speculateCompoundType P arm)."""
    classes = synthesize_classes("aanpak", ["aan", "pak"], "N")
    r = mr.execute("aanpak", "", classes)[0]
    assert r.brackets.speculate_compound_type() == "PN"


def test_mbma_train_roundtrip_no_exceptions():
    """Every gold word must reproduce its gold morph through the ENGINE
    (not a lookup table): the exceptions dict stays empty."""
    from frog_spark.sources.resources import load_gold_corpus, morph_training

    m = Mbma.train(morph_training(load_gold_corpus(None)))
    assert m.exceptions == {}
    assert len(m.memory) > 100


def test_analyze_next_tag_plumbing():
    """P3 consumption: next_tag reaches the V2I cleanup through analyze."""
    m = Mbma.train([("gek", "ADJ(vrij,basis,zonder)", "[gek]")])
    # force classifier-independent path via memory with an ambiguous class
    m.memory["gek"] = ["V", "0", "0/te2I"]
    morph_plain, _ = m.analyze("gek", "WW(pv,tgw,met-t)", "WORD", "")
    morph_keep, _ = m.analyze(
        "gek", "WW(pv,tgw,met-t)", "WORD", "VNW(pers,pron,nomin,vol,2v,ev)"
    )
    assert morph_plain == "[gek]" and morph_keep == "[gek]"
    # inflections differ though the flattened string is identical
    r_plain = mr.execute("gek", "", ["V", "0", "0/te2I"])[0]
    r_keep = mr.execute(
        "gek", "VNW(pers,pron,nomin,vol,2v,ev)", ["V", "0", "0/te2I"]
    )[0]
    assert (r_plain.inflection, r_keep.inflection) == ("te1", "te2I")


def test_analyze_memo_transparent_and_unpickled():
    """The per-token memo must be output-transparent, keyed on all four
    args (next_tag included — the V2I path depends on it), and dropped
    on pickling so broadcast size stays deterministic."""
    import pickle

    m = Mbma.train([("gek", "ADJ(vrij,basis,zonder)", "[gek]")])
    a1 = m.analyze("gek", "ADJ(vrij,basis,zonder)")
    a2 = m.analyze("gek", "ADJ(vrij,basis,zonder)")  # memo hit
    assert a1 == a2 == m._analyze_uncached("gek", "ADJ(vrij,basis,zonder)")
    # distinct next_tag -> distinct memo entries, not a stale hit
    keys = set(m._memo)
    m.analyze("gek", "ADJ(vrij,basis,zonder)", "WORD", "WW(pv,tgw,ev)")
    assert len(m._memo) == len(keys) + 1
    m2 = pickle.loads(pickle.dumps(m))
    assert not hasattr(m2, "_memo")
    assert m2.analyze("gek", "ADJ(vrij,basis,zonder)") == a1
