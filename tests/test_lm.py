"""Stupid-backoff n-gram LM perplexity (erde_spark/scale/lm.py) —
closed-form arithmetic pins, backoff/OOV semantics, pruning, filter,
and the CCNet-style real-vs-gibberish separation contract."""
import math

import pytest
from pyspark.sql import functions as F

from erde_spark.scale.lm import (NgramLM, perplexity_filter,
                                 score_perplexity, train_ngram_lm)


@pytest.fixture(scope='module')
def tiny(spark):
    return spark.createDataFrame([(1, 'a b'), (2, 'a b'), (3, 'a c')],
                                 'doc_id long, text string')


def test_train_counts_closed_form(spark, tiny):
    """Corpus {a b, a b, a c}, n=2: every gram count is hand-checkable,
    plus the analytic pure-BOS context row."""
    lm = train_ngram_lm(tiny, n=2)
    cnt = {r['gram']: r['count'] for r in lm.counts.collect()}
    assert cnt == {'a': 3, 'b': 2, 'c': 1,
                   '<s>\x1fa': 3, 'a\x1fb': 2, 'a\x1fc': 1, '<s>': 3}
    assert lm.n_tokens == 6 and lm.n_docs == 3 and lm.alpha == 0.4


def test_score_exact_ieee(spark, tiny):
    """Seen path, backoff path, and double-backoff OOV all equal the
    hand-computed IEEE values bit-for-bit (fixed-depth arithmetic)."""
    lm = train_ngram_lm(tiny, n=2)
    q = spark.createDataFrame(
        [(1, 'a b'),      # S(a|<s>)=3/3, S(b|a)=2/3       (seen path)
         (9, 'b a'),      # both bigrams unseen -> 0.4*unigram
         (10, 'zz qq')],  # OOV -> 0.4*(0.4/N) per token
        'doc_id long, text string')
    got = {r['doc_id']: r for r in score_perplexity(q, lm).collect()}
    assert got[1]['avg_logprob'] == (0.0 + math.log(2 / 3)) / 2
    assert got[9]['avg_logprob'] == \
        (math.log(0.4 * 2 / 6) + math.log(0.4 * 3 / 6)) / 2
    assert abs(got[10]['avg_logprob'] - math.log(0.4 * 0.4 / 6)) < 1e-12
    for r in got.values():
        assert r['perplexity'] == pytest.approx(
            math.exp(-r['avg_logprob']))
        assert r['n_tokens'] == 2
    # monotone: seen < backoff < OOV perplexity
    assert (got[1]['perplexity'] < got[9]['perplexity']
            < got[10]['perplexity'])


def test_trigram_first_positions_use_bos_contexts(spark):
    """n=3: position 1 scores against the '<s> <s>' context and
    position 2 against '<s> w' — both must resolve without backoff
    when the corpus saw them (the analytic BOS rows supply the
    denominators)."""
    docs = spark.createDataFrame([(1, 'x y z'), (2, 'x y w')],
                                 'doc_id long, text string')
    lm = train_ngram_lm(docs, n=3)
    got = {r['doc_id']: r for r in
           score_perplexity(docs, lm).collect()}
    # doc1: S(x|<s> <s>)=2/2, S(y|<s> x)=2/2, S(z|x y)=1/2
    assert got[1]['avg_logprob'] == (0.0 + 0.0 + math.log(1 / 2)) / 3
    assert got[2]['avg_logprob'] == got[1]['avg_logprob']


def test_min_count_prunes_but_keeps_unigrams(spark, tiny):
    """min_count prunes higher-order tail grams; unigrams always
    survive (they carry N and the OOV distinction); scoring backs off
    through the pruned gap."""
    lm = train_ngram_lm(tiny, n=2, min_count=2)
    grams = {r['gram'] for r in lm.counts.collect()}
    assert 'a\x1fc' not in grams            # pruned (count 1)
    assert 'c' in grams                      # unigram survives
    got = score_perplexity(
        tiny.where(F.col('doc_id') == 3), lm).collect()[0]
    # 'a c': S(a|<s>)=3/3; S(c|a) pruned -> 0.4 * S(c)=0.4*1/6
    assert got['avg_logprob'] == (0.0 + math.log(0.4 * 1 / 6)) / 2


def test_zero_token_docs_dropped_and_validation(spark, tiny):
    docs = spark.createDataFrame([(1, 'a b'), (2, '!!!'), (3, None)],
                                 'doc_id long, text string')
    lm = train_ngram_lm(tiny, n=2)
    assert score_perplexity(docs, lm).count() == 1
    with pytest.raises(ValueError, match='n must'):
        train_ngram_lm(tiny, n=0)
    with pytest.raises(ValueError, match='alpha'):
        train_ngram_lm(tiny, alpha=0.0)
    with pytest.raises(ValueError, match='no tokens'):
        train_ngram_lm(spark.createDataFrame([('?!',)], 'text string'))


def test_unigram_model(spark, tiny):
    """n=1 degenerates to the unigram MLE with OOV floor — no BOS rows,
    no backoff chain."""
    lm = train_ngram_lm(tiny, n=1)
    grams = {r['gram'] for r in lm.counts.collect()}
    assert grams == {'a', 'b', 'c'}
    got = {r['doc_id']: r for r in score_perplexity(
        spark.createDataFrame([(1, 'a'), (2, 'zz')],
                              'doc_id long, text string'), lm).collect()}
    assert got[1]['avg_logprob'] == math.log(3 / 6)
    assert got[2]['avg_logprob'] == math.log(0.4 / 6)


def test_perplexity_filter_threshold(spark):
    """The filter keeps exactly the at-or-below-threshold documents and
    returns original rows (semi join)."""
    docs = spark.createDataFrame(
        [(i, 'the cat sat on the mat') for i in range(4)]
        + [(9, 'qqq www eee rrr ttt yyy')],
        'doc_id long, text string')
    lm = train_ngram_lm(docs.where(F.col('doc_id') < 4), n=2)
    scored = {r['doc_id']: r['perplexity']
              for r in score_perplexity(docs, lm).collect()}
    cut = (scored[0] + scored[9]) / 2
    kept = perplexity_filter(docs, lm, cut,
                             broadcast_counts=True).collect()
    assert {r['doc_id'] for r in kept} == {0, 1, 2, 3}
    assert {r['text'] for r in kept} == {'the cat sat on the mat'}


def test_real_vs_gibberish_separation(spark):
    """The gate contract at corpus scale: an LM trained on the real
    documents must give every real document lower perplexity than its
    deterministic hex-salad twin (all-OOV tokens score alpha^2/N per
    position under the trigram model)."""
    docs = (spark.read.parquet('/root/testdata/sf0.001/documents.parquet')
            .select('doc_id', 'text').where(F.col('text').isNotNull())
            .limit(200))
    lm = train_ngram_lm(docs, n=3, min_count=2)
    gib = F.concat_ws(' ', F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda i: F.substring(
            F.md5(F.concat_ws('-', F.col('doc_id').cast('string'),
                              i.cast('string'))), 1, 8)))
    twins = docs.select((F.col('doc_id') + 10**6).alias('doc_id'),
                        gib.alias('text'))
    scored = score_perplexity(docs.unionByName(twins), lm,
                              broadcast_counts=True)
    real = scored.where(F.col('doc_id') < 10**6) \
        .select('doc_id', F.col('perplexity').alias('p_real'))
    twin = scored.where(F.col('doc_id') >= 10**6) \
        .select((F.col('doc_id') - 10**6).alias('doc_id'),
                F.col('perplexity').alias('p_twin'))
    bad = real.join(twin, 'doc_id') \
        .where(F.col('p_real') >= F.col('p_twin')).count()
    assert bad == 0


def test_scoring_plan_is_jvm_only(spark, tiny):
    """No Python evaluation anywhere in the scoring plan — the backoff
    chain is CASE/arithmetic codegen."""
    lm = train_ngram_lm(tiny, n=3)
    plan = score_perplexity(tiny, lm)._jdf.queryExecution() \
        .executedPlan().toString()
    assert 'BatchEvalPython' not in plan
    assert 'ArrowEval' not in plan
    assert 'Cartesian' not in plan


def test_perplexity_buckets_rank_exact(spark):
    """Rank method: 9 docs per language split exactly 3/3/3 by
    ascending perplexity with id tie-breaks; single-doc languages land
    in head (percent_rank 0)."""
    from erde_spark.scale.lm import perplexity_buckets
    rows = [(i, 'en', float(i)) for i in range(9)]
    rows += [(100 + i, 'fr', 5.0) for i in range(3)]  # all-tied
    rows += [(200, 'sw', 42.0)]
    df = spark.createDataFrame(
        rows, 'doc_id long, lang string, perplexity double')
    got = {r['doc_id']: r['ppl_bucket']
           for r in perplexity_buckets(df).collect()}
    assert [got[i] for i in range(9)] == ['head'] * 3 + \
        ['middle'] * 3 + ['tail'] * 3
    # ties broken by doc_id: 100 head, 101 middle, 102 tail
    assert (got[100], got[101], got[102]) == ('head', 'middle', 'tail')
    assert got[200] == 'head'


def test_perplexity_buckets_threshold_scale_path(spark):
    """Threshold method agrees with rank away from cut ties, puts a
    whole tie-class in the lower bucket together, and its plan carries
    a broadcast join (no full-data sort)."""
    from erde_spark.scale.lm import perplexity_buckets
    df = spark.createDataFrame(
        [(i, 'en', float(i % 30)) for i in range(90)],
        'doc_id long, lang string, perplexity double')
    got = perplexity_buckets(df, method='threshold')
    by_ppl = {(r['perplexity'], r['ppl_bucket'])
              for r in got.collect()}
    # 30 distinct values x3 docs: head = ppl 0-9, middle 10-19, tail rest
    assert {b for p, b in by_ppl if p <= 9} == {'head'}
    assert {b for p, b in by_ppl if 10 <= p <= 19} == {'middle'}
    assert {b for p, b in by_ppl if p >= 20} == {'tail'}
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert 'BroadcastHashJoin' in plan
    rank = perplexity_buckets(df, method='rank')
    agree = rank.join(
        got.withColumnRenamed('ppl_bucket', 'b2'), 'doc_id') \
        .where('ppl_bucket = b2').count()
    assert agree == 90  # no tie straddles a cut here -> exact agreement
    import pytest as _p
    with _p.raises(ValueError, match='method'):
        perplexity_buckets(df, method='nope')
    with _p.raises(ValueError, match='cuts'):
        perplexity_buckets(df, cuts=(0.9, 0.1))


def test_perplexity_buckets_end_to_end_lm(spark):
    """Composition: train -> score -> bucket. Gibberish twins must
    never out-bucket their real counterparts (tail vs head)."""
    from erde_spark.scale.lm import (perplexity_buckets, score_perplexity,
                                     train_ngram_lm)
    real = ['the cat sat on the mat', 'the dog sat on the mat',
            'a cat and a dog', 'the cat and the dog sat']
    gib = ['zqx vbn mlp qwe rty uio', 'xzc vbq plm wer tyu oiu',
           'qpz mxn vbl ewq ytr uoi', 'zxq bnv lmp qew rty iou']
    trusted = spark.createDataFrame(
        [(i, t) for i, t in enumerate(real)], 'doc_id long, text string')
    lm = train_ngram_lm(trusted, n=2)
    docs = spark.createDataFrame(
        [(i, 'en', t) for i, t in enumerate(real + gib)],
        'doc_id long, lang string, text string')
    scored = score_perplexity(docs, lm).join(
        docs.select('doc_id', 'lang'), 'doc_id')
    out = {r['doc_id']: r['ppl_bucket']
           for r in perplexity_buckets(scored).collect()}
    order = {'head': 0, 'middle': 1, 'tail': 2}
    assert max(order[out[i]] for i in range(4)) <= \
        min(order[out[i]] for i in range(4, 8))


class TestKneserNey:
    """Interpolated KN bigrams vs hand-computed values (Chen & Goodman
    eq. 4.28 on a 3-doc corpus; worked by hand in the round-10 notes)."""

    def test_hand_worked_values_and_unit_mass(self, spark):
        from erde_spark.scale.lm import kneser_ney_bigrams
        docs = spark.createDataFrame(
            [(0, 'a b a c'), (1, 'a b b'), (2, 'c a b')],
            'doc_id long, text string')
        rows = {(r['w1'], r['w2']): r for r in
                kneser_ney_bigrams(docs).collect()}
        # c(a.)=4, N1+(a.)=2, T=7, N1+(.b)=2:
        # P(b|a) = (3-.75)/4 + .75*2/4 * 2/7
        assert rows[('a', 'b')]['c'] == 3
        assert abs(rows[('a', 'b')]['p_kn']
                   - ((3 - .75) / 4 + .75 * 2 / 4 * 2 / 7)) < 1e-12
        assert abs(rows[('a', 'c')]['p_kn']
                   - ((1 - .75) / 4 + .75 * 2 / 4 * 2 / 7)) < 1e-12
        # interpolation must conserve mass: sum over the FULL vocab of
        # P(.|a) = observed terms + unseen ('a','a') continuation term
        unseen_aa = .75 * 2 / 4 * 3 / 7
        s = sum(r['p_kn'] for (w1, _), r in rows.items() if w1 == 'a')
        assert abs(s + unseen_aa - 1.0) < 1e-12

    def test_discount_validates(self, spark):
        import pytest as _pt
        from erde_spark.scale.lm import kneser_ney_bigrams
        docs = spark.createDataFrame([(0, 'a b')], 'doc_id long, text string')
        with _pt.raises(ValueError, match='discount'):
            kneser_ney_bigrams(docs, discount=1.5)

    def test_plan_no_python(self, spark):
        from erde_spark.plans.inspect import count_python_udf_passes
        from erde_spark.scale.lm import kneser_ney_bigrams
        docs = spark.createDataFrame([(0, 'a b c a b')],
                                     'doc_id long, text string')
        assert count_python_udf_passes(kneser_ney_bigrams(docs)) == 0
