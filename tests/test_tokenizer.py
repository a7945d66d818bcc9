"""Tokenizer unit tests (SURVEY.md §5: micro-fixtures per stage)."""

from frog_spark.operators.tokenizer import (
    detokenize,
    split_sentences,
    tokenize_text,
)


def test_basic_sentence():
    toks = tokenize_text("Dit is een test van Frog op de datum 09-01-2012!")
    words = [t.word for t in toks]
    assert words == [
        "Dit", "is", "een", "test", "van", "Frog", "op", "de", "datum",
        "09-01-2012", "!",
    ]
    assert toks[9].token_class == "DATE"
    assert toks[10].token_class == "PUNCTUATION"
    assert toks[10].eos


def test_detokenize_roundtrip():
    for text in [
        "Dit is een test van Frog op de datum 09-01-2012!",
        "de kat en zo'n hond, weet je wel?",
        '"Google is goed", aldus Wales. Hij zei dat.',
        "DIT PIKT TADPOLE NIET!",
    ]:
        toks = tokenize_text(text)
        assert detokenize(toks) == " ".join(text.split())


def test_utt_marker_forces_sentence_break():
    toks = tokenize_text("de kat. <utt> en de hond")
    sents = split_sentences(toks)
    assert len(sents) == 2
    assert [t.word for t in sents[1]] == ["en", "de", "hond"]


def test_quote_suppresses_eos():
    toks = tokenize_text('"Dit is goed. Echt waar", zei hij.')
    sents = split_sentences(toks)
    # the period inside the quotes must not split
    assert len(sents) == 1


def test_abbreviation_kept():
    toks = tokenize_text("Bel dhr. Jansen morgen.")
    assert toks[1].word == "dhr."
    assert toks[1].token_class == "ABBREVIATION"
    assert len(split_sentences(toks)) == 1


def test_no_space_offsets():
    toks = tokenize_text("weet je wel?")
    assert [t.no_space for t in toks] == [False, False, False, True]


def test_all_gold_sentences_tokenize_exactly(gold):
    for s in gold:
        sents = split_sentences(tokenize_text(s.text))
        assert len(sents) == 1, s.sent_id
        assert [t.word for t in sents[0]] == [t.word for t in s.tokens], s.sent_id


def test_reference_problems_corpus_roundtrip():
    """Drive the tokenizer over the reference's own known-problem corpus
    (/root/reference/test/problems.txt: quotes, ALL-CAPS, <utt> markers,
    unicode apostrophes, accented clitics): every line must tokenize
    without error and detokenize back to its whitespace-normalized text
    (with <utt> markers consumed)."""
    import os
    import re

    from frog_spark.operators.tokenizer import detokenize, tokenize_text

    path = "/root/reference/test/problems.txt"
    if not os.path.exists(path):
        return
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    for raw in text.split("\n"):
        if not raw.strip():
            continue
        toks = tokenize_text(raw)
        norm = " ".join(re.sub(r"<utt>", " ", raw).split())
        if not norm:
            continue
        assert detokenize(toks) == norm, raw
        assert all(t.word for t in toks)


def test_dotted_abbreviations_one_token():
    """Multi-dot abbreviations scan as ONE token and their internal
    periods never break sentences (review batch 5)."""
    from frog_spark.operators.tokenizer import split_sentences, tokenize_text

    toks = tokenize_text("Gericht t.a.v. De heer Smit.")
    assert any(t.word == "t.a.v." and t.token_class == "ABBREVIATION" for t in toks)
    assert len(split_sentences(toks)) == 1


def test_email_keeps_sentence_boundary():
    from frog_spark.operators.tokenizer import split_sentences, tokenize_text

    toks = tokenize_text("Mail me@x.nl. Daarna gaan we verder.")
    assert any(t.word == "me@x.nl" and t.token_class == "EMAIL" for t in toks)
    assert len(split_sentences(toks)) == 2


def test_ellipsis_single_token_and_break():
    from frog_spark.operators.tokenizer import split_sentences, tokenize_text

    toks = tokenize_text("Dat was het... Daarna kwam meer.")
    assert any(t.word == "..." for t in toks)
    sents = split_sentences(toks)
    assert [len(s) for s in sents] == [4, 4]


def test_unbalanced_quote_suppression_is_bounded():
    """A stray quote may suppress breaks for at most _QUOTE_SPAN_MAX
    tokens — not the rest of the turn."""
    from frog_spark.operators.tokenizer import split_sentences, tokenize_text

    long_run = " ".join(f"woord{i}" for i in range(50))
    toks = tokenize_text(f'Hij zei " {long_run}. En dit is een nieuwe zin.')
    assert len(split_sentences(toks)) >= 2
