"""BPE training/encoding: parity of the driver and distributed paths
with an independent naive reference, merge semantics, and corpus-wide
encoding."""

from collections import Counter

from erde_spark.scale.bpe import (bpe_encode, bpe_train, merge_symbols,
                                  merges_df, word_counts)


def _naive_bpe(word_freqs: dict, n_merges: int):
    """Straight-from-the-paper reference: full pair recount each round."""
    vocab = {tuple(w): n for w, n in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for syms, n in vocab.items():
            for p in zip(syms, syms[1:]):
                stats[p] += n
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], stats[best]))
        vocab = {tuple(merge_symbols(list(s), *best)): n
                 for s, n in vocab.items()}
    return merges


CORPUS = [
    (1, 'low low low low low'),
    (2, 'lower lower widest widest widest'),
    (3, 'newest newest newest newest newest newest'),
    (4, 'the the the the the the the the'),
    (5, 'there there then then'),
]


def _freqs():
    c = Counter()
    for _, t in CORPUS:
        c.update(t.split())
    return dict(c)


def test_merge_symbols_overlap():
    assert merge_symbols(['a', 'a', 'a', 'a'], 'a', 'a') == ['aa', 'aa']
    assert merge_symbols(['a', 'a', 'a'], 'a', 'a') == ['aa', 'a']
    assert merge_symbols(['x'], 'a', 'a') == ['x']


def test_driver_path_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, 'doc_id long, text string')
    got = bpe_train(df, n_merges=12)
    assert got == _naive_bpe(_freqs(), 12)


def test_distributed_path_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, 'doc_id long, text string')
    got = bpe_train(df, n_merges=6, collect_cap=0)  # force distributed
    assert got == _naive_bpe(_freqs(), 6)


def test_word_counts(spark):
    df = spark.createDataFrame(CORPUS, 'doc_id long, text string')
    wc = {r['word']: r['n'] for r in word_counts(df).collect()}
    assert wc == _freqs()


def test_merges_df_shape(spark):
    df = spark.createDataFrame(CORPUS, 'doc_id long, text string')
    m = bpe_train(df, n_merges=5)
    out = merges_df(spark, m).collect()
    assert [r['rank'] for r in out] == list(range(len(m)))
    assert all(r['merged'] == r['left'] + r['right'] for r in out)
    assert [r['count'] for r in out] == sorted([r['count'] for r in out],
                                               reverse=True) or len(out) <= 5


def test_encode_roundtrip(spark):
    df = spark.createDataFrame(CORPUS, 'doc_id long, text string')
    m = bpe_train(df, n_merges=20)
    enc = {r['id']: r for r in bpe_encode(df, m).collect()}
    # concatenating a doc's BPE tokens reproduces its words in order
    for did, text in CORPUS:
        assert ''.join(enc[did]['bpe_tokens']) == text.replace(' ', '')
        assert enc[did]['n_bpe_tokens'] == len(enc[did]['bpe_tokens'])
    # a fully-merged frequent word encodes as one token
    the_doc = enc[4]
    assert 'the' in the_doc['bpe_tokens']


def test_encode_empty_and_unseen(spark):
    train = spark.createDataFrame(CORPUS, 'doc_id long, text string')
    m = bpe_train(train, n_merges=10)
    test = spark.createDataFrame([(9, ''), (10, 'zzz qqq')],
                                 'doc_id long, text string')
    got = {r['id']: r for r in bpe_encode(test, m).collect()}
    assert got[9]['bpe_tokens'] == []
    assert ''.join(got[10]['bpe_tokens']) == 'zzzqqq'
