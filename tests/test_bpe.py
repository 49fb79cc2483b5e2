"""Unit tests for distributed BPE training (textops/bpe.py) — the merge
sequence, greedy-adjacency replace semantics, deterministic tiebreak, and
encode counts, all hand-computed."""

from ideacrawler_spark.textops.bpe import (
    SEP,
    SEP2,
    apply_merges,
    bpe_token_count,
    bpe_train,
    word_types,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_train_merge_sequence_and_tiebreak(spark):
    # word types: aaaa x2, abab x2, ab x1, cd x1
    # step0: (a,a)=6 wins; step1: (a,b)=5; step2: (aa,aa)=2 ties with
    # (ab,ab)=2 -> lexicographic lhs 'aa' < 'ab' wins
    docs = _docs(spark, [(0, "aaaa abab abab"), (1, "aaaa ab cd")])
    got = [(r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
           for r in bpe_train(docs, n_merges=3).orderBy("step").collect()]
    assert got == [
        (0, "a", "a", "aa", 6),
        (1, "a", "b", "ab", 5),
        (2, "aa", "aa", "aaaa", 2),
    ]


def test_bpe_greedy_adjacent_occurrences(spark):
    # the doubled-separator replace must merge BACK-TO-BACK pair
    # occurrences like list-based BPE: 'aaaa' under (a,a) -> [aa, aa]
    # (2 symbols), 'aaa' -> [aa, a] (2 symbols), never [aa, a, a]
    docs = _docs(spark, [(0, "aaaa aaa")])
    merges = [(0, "a", "a", "aa", 5)]
    out = {r["word"]: r["n_sym"]
           for r in apply_merges(word_types(docs), merges).collect()}
    assert out == {"aaaa": 2, "aaa": 2}


def test_bpe_token_count_hand_computed(spark):
    docs = _docs(spark, [(0, "aaaa abab abab"), (1, "aaaa ab cd")])
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe_token_count(docs, n_merges=3).collect()}
    # doc0: aaaa->1 tok, abab->[ab,ab]=2, abab=2 -> 5
    # doc1: aaaa->1, ab->1, cd->2 (no c/d merge learned) -> 4
    assert got == {0: (3, 5), 1: (3, 4)}


def test_bpe_separator_absent_from_corpus_words(spark):
    # the wire encoding relies on \x1f never occurring inside a word —
    # assert the synthetic corpus satisfies it (documents are ASCII words)
    docs = _docs(spark, [(0, "plain ascii words only")])
    assert SEP not in "plain ascii words only" and SEP2 == SEP + SEP
    rows = word_types(docs).collect()
    assert all(SEP not in r["word"] for r in rows)


def test_tokenizer_fertility_hand_computed(spark):
    """With zero merges every char is a token: fertility = chars per
    word x1000 exactly; langs aggregate independently."""
    from ideacrawler_spark.textops.bpe import tokenizer_fertility

    docs = spark.createDataFrame(
        [(1, "ab ab", "en"), (2, "abcd", "en"), (3, "a a a", "de")],
        "doc_id long, text string, lang string")
    got = {r["lang"]: (r["n_docs"], r["n_words"], r["n_bpe_tokens"],
                       r["fert_x1000"])
           for r in tokenizer_fertility(docs, n_merges=0).collect()}
    # en: words [ab, ab, abcd] -> 2+2+4 = 8 syms over 3 words
    # de: [a, a, a] -> 3 syms over 3 words
    assert got == {"en": (2, 3, 8, 2666), "de": (1, 3, 3, 1000)}
