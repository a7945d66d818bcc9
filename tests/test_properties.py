"""Property-based tests (hypothesis) for the pure-function core."""

from hypothesis import given, settings
from hypothesis import strategies as st

from frog_spark.models.igtree import IGTree
from frog_spark.operators.ner import repair_bio, spans_with_conf
from frog_spark.operators.tokenizer import detokenize, split_sentences, tokenize_text

# text made of printable chars incl. unicode punctuation the tokenizer handles
_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "Zs"),
    ),
    max_size=120,
)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_tokenize_never_crashes_and_detokenize_roundtrips(text):
    toks = tokenize_text(text)
    # every non-whitespace char the scanner recognizes is preserved in order
    detok = detokenize(toks)
    assert detok == " ".join(detok.split())  # normalized whitespace
    # sentences partition the token stream
    sents = split_sentences(toks)
    assert sum(len(s) for s in sents) == len(toks)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.sampled_from(["x", "y", "z"]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_igtree_recalls_unambiguous_training(data):
    # make instances unambiguous: class = deterministic function of features
    inst = [list(t) for t in data]
    cls = [f"{a}{b}" for a, b in data]
    tree = IGTree.train(inst, cls)
    for i, c in zip(inst, cls):
        assert tree.classify(i)[0] == c


_bio = st.lists(
    st.sampled_from(["O", "B-per", "I-per", "B-org", "I-org"]),
    max_size=30,
)


@settings(max_examples=200, deadline=None)
@given(_bio)
def test_repair_bio_produces_legal_sequences(tags):
    fixed = repair_bio(tags)
    prev = "O"
    for t in fixed:
        if t.startswith("I-"):
            assert prev != "O" and prev[2:] == t[2:], (tags, fixed)
        prev = t
    # idempotent
    assert repair_bio(fixed) == fixed


@settings(max_examples=100, deadline=None)
@given(_bio)
def test_span_confidence_is_mean_of_members(tags):
    fixed = repair_bio(tags)
    confs = [0.5] * len(fixed)
    spans, out = spans_with_conf(fixed, confs)
    for start, end, cat, conf in spans:
        assert abs(conf - 0.5) < 1e-12
        assert fixed[start] == f"B-{cat}"
        assert 0 <= start <= end < len(fixed)


# --- MBMA rule engine round-trip (M3-M6) ------------------------------------

_word_chars = st.text(alphabet="abcdefghijklmnoprstuvwz", min_size=2, max_size=12)


@st.composite
def _word_and_segs(draw):
    word = draw(_word_chars)
    # random surface-aligned split into 1..4 parts
    n_cuts = draw(st.integers(0, min(3, len(word) - 1)))
    cuts = sorted(draw(st.sets(st.integers(1, len(word) - 1),
                               min_size=n_cuts, max_size=n_cuts)))
    segs, prev = [], 0
    for c in cuts:
        segs.append(word[prev:c])
        prev = c
    segs.append(word[prev:])
    tag = draw(st.sampled_from(["N", "V", "A", "B", "P", "Q"]))
    return word, segs, tag


@settings(max_examples=200, deadline=None)
@given(_word_and_segs())
def test_mbma_synthesis_roundtrips_any_segmentation(ws):
    """Any surface-aligned segmentation synthesizes classes that the rule
    engine decodes back to exactly the same bracketed segmentation."""
    from frog_spark.operators import mbma_rules as mr
    from frog_spark.operators.morpho import synthesize_classes

    word, segs, tag = ws
    classes = synthesize_classes(word, segs, tag)
    assert len(classes) == len(word)
    rules = mr.execute(word, "", classes)
    assert len(rules) == 1
    assert mr.flatten(rules[0].pretty_string()) == "".join(f"[{s}]" for s in segs)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefghijklmnoprstuvwz'", min_size=1, max_size=8),
       st.integers(1, 3))
def test_mblem_strip_never_empties(word, n):
    """Token-strip rules fall back to the word itself rather than an
    empty lemma (mblem_mod.cxx:437-441)."""
    from frog_spark.operators.lemmatizer import Mblem
    from frog_spark.models.igtree import IGTree

    m = Mblem(IGTree.train([], []), {},
              token_strip={"SPEC(deeleigen)": {"X": n}},
              one_one_tags=set())
    out = m.lemmatize(word, "SPEC(deeleigen)", "X")
    assert out and out[0] != ""
    if n < len(word):
        assert out == [word[: len(word) - n]]
