"""IGTree + MBT model substrate tests."""

from frog_spark.models.igtree import IGTree
from frog_spark.models.mbt import MBTagger


def test_igtree_exact_reproduction():
    inst = [["a", "x"], ["a", "y"], ["b", "x"], ["b", "y"]]
    cls = ["1", "2", "3", "3"]
    t = IGTree.train(inst, cls)
    for i, c in zip(inst, cls):
        assert t.classify(i)[0] == c


def test_igtree_default_fallback():
    inst = [["a", "x"], ["a", "y"], ["b", "x"]]
    cls = ["1", "1", "2"]
    t = IGTree.train(inst, cls)
    # unseen value falls back to deepest matched node's majority
    lab, conf = t.classify(["zz", "zz"])
    assert lab == "1"  # global majority
    assert 0 < conf <= 1


def test_igtree_distribution_sums_to_one():
    inst = [["a"], ["a"], ["b"]]
    cls = ["1", "2", "2"]
    t = IGTree.train(inst, cls)
    d = t.distribution(["a"])
    assert abs(sum(d.values()) - 1.0) < 1e-9


def test_igtree_compression_prunes():
    # all same class -> single node
    t = IGTree.train([["a", "b"], ["c", "d"]], ["x", "x"])
    assert t.node_count() == 1


def test_mbt_disambiguates_by_context():
    # 'zijn' is WW after a pronoun-verb context, VNW(bez) before a noun
    sents = [
        [("dat", "VG"), ("wij", "VNW"), ("zijn", "WW"), ("gegaan", "WW2")],
        [("hij", "VNW"), ("ziet", "WWt"), ("zijn", "VNWbez"), ("fiets", "N")],
    ]
    m = MBTagger.train(sents)
    tags1 = [t for t, _ in m.tag_sentence(["dat", "wij", "zijn", "gegaan"])]
    tags2 = [t for t, _ in m.tag_sentence(["hij", "ziet", "zijn", "fiets"])]
    assert tags1[2] == "WW"
    assert tags2[2] == "VNWbez"


def test_mbt_unknown_word_by_suffix():
    sents = [
        [("de", "LID"), ("werker", "N")],
        [("de", "LID"), ("denker", "N")],
        [("wij", "VNW"), ("lopen", "WW")],
        [("wij", "VNW"), ("kopen", "WW")],
    ]
    m = MBTagger.train(sents)
    # unseen '-er' noun and '-en' verb
    assert m.tag_sentence(["de", "bakker"])[1][0] == "N"
    assert m.tag_sentence(["wij", "rapen"])[1][0] == "WW"
