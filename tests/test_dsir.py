"""DSIR importance resampling: hashed n-gram features, log-ratio
weights, and Gumbel top-k selection."""

from pyspark.sql import functions as F

from erde_spark.scale.dsir import (dsir_logweights, dsir_topk,
                                   ngram_buckets, _word_ngrams)


def _corpus(spark):
    """Two styles: 'code'-flavored docs (0-4) and 'prose'-flavored docs
    (5-9); the target is pure prose."""
    code = 'def foo bar return value lambda static void main printf'
    prose = 'the quick brown fox jumps over the lazy dog every morning'
    rows = [(i, code + f' var{i}') for i in range(5)]
    rows += [(i, prose + f' again{i}') for i in range(5, 10)]
    raw = spark.createDataFrame(rows, 'doc_id long, text string')
    target = spark.createDataFrame(
        [(100, prose), (101, 'a lazy brown dog and a quick fox')],
        'doc_id long, text string')
    return raw, target


def test_word_ngrams_shape(spark):
    df = spark.createDataFrame([(1, 'a b c'), (2, 'solo'), (3, '')],
                               'doc_id long, text string')
    got = {r['doc_id']: r['g'] for r in
           df.select('doc_id', _word_ngrams('text').alias('g')).collect()}
    assert got[1] == ['a', 'b', 'c', 'a b', 'b c']
    assert got[2] == ['solo']
    assert got[3] == []


def test_ngram_buckets_hash_variants(spark):
    df = spark.createDataFrame([(1, 'hello world')], 'doc_id long, text string')
    md5b = ngram_buckets(df).collect()
    assert len(md5b) == 3  # 2 unigrams + 1 bigram
    assert all(len(r['bucket']) == 4 for r in md5b)
    xxb = ngram_buckets(df, hash='xxhash64').collect()
    assert len(xxb) == 3
    assert all(0 <= int(r['bucket']) < 65536 for r in xxb)


def test_dsir_weights_separate_styles(spark):
    raw, target = _corpus(spark)
    w = {r['id']: r['log_weight']
         for r in dsir_logweights(raw, target).collect()}
    assert len(w) == 10
    prose_w = [w[i] for i in range(5, 10)]
    code_w = [w[i] for i in range(5)]
    assert min(prose_w) > max(code_w)


def test_dsir_weights_xxhash_agrees_on_ranking(spark):
    raw, target = _corpus(spark)
    w = {r['id']: r['log_weight']
         for r in dsir_logweights(raw, target, hash='xxhash64').collect()}
    assert min(w[i] for i in range(5, 10)) > max(w[i] for i in range(5))


def test_dsir_empty_doc(spark):
    raw = spark.createDataFrame([(1, 'some text'), (2, '')],
                                'doc_id long, text string')
    target = raw.filter(F.col('doc_id') == 1)
    got = {r['id']: r for r in dsir_logweights(raw, target).collect()}
    assert got[2]['n_feats'] == 0 and got[2]['log_weight'] == 0.0


def test_dsir_topk(spark):
    raw, target = _corpus(spark)
    hard = dsir_topk(raw, target, 5, gumbel=False)
    assert {r['id'] for r in hard.collect()} == {5, 6, 7, 8, 9}
    g1 = [r['id'] for r in dsir_topk(raw, target, 5).collect()]
    g2 = [r['id'] for r in dsir_topk(raw, target, 5).collect()]
    assert g1 == g2  # seeded Gumbel keys are deterministic
    assert len(set(g1)) == 5
