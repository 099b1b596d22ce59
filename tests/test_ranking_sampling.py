"""BM25 ranking and deterministic sampling (scale/ranking.py,
scale/sampling.py): exact-formula oracles, determinism under
repartitioning, and plan-shape assertions (map-only sampling, TakeOrdered
top-k)."""

import math

import pytest
from pyspark.sql import functions as F

from erde_spark.plans.inspect import count_shuffles, physical_plan
from erde_spark.scale.ranking import bm25_scores, bm25_topk
from erde_spark.scale.sampling import (hash_sample, hash_split, sample_key,
                                       stratified_sample, top_n_sample)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, 'spark spark spark joins the table', 'en'),
        (1, 'vector search with a vector index', 'en'),
        (2, 'hash join beats sort merge join on small tables', 'en'),
        (3, 'the quick brown fox jumps over the lazy dog', 'en'),
        (4, 'spark vector hash all in one doc', 'en'),
    ]
    return spark.createDataFrame(rows, 'doc_id long, text string, lang string')


def _ref_bm25(corpus, terms, k1=1.2, b=0.75):
    """Independent pure-Python BM25 for the oracle."""
    toks = {i: t.lower().split() for i, t, _ in corpus}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if not tf or not df[t]:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s:
            out[i] = round(s, 4)
    return out


def test_bm25_matches_reference_formula(spark, docs):
    got = {r['doc_id']: r['score']
           for r in bm25_scores(docs, ['spark', 'vector', 'hash']).collect()}
    want = _ref_bm25([(r['doc_id'], r['text'], r['lang'])
                      for r in docs.collect()], ['spark', 'vector', 'hash'])
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-4)


def test_bm25_topk_order_and_plan(spark, docs):
    top = bm25_topk(docs, ['spark'], k=2)
    rows = top.collect()
    # doc 0 has tf=3 of a rarer-than-nothing term; it must rank first
    assert rows[0]['doc_id'] == 0
    assert len(rows) == 2
    assert 'TakeOrderedAndProject' in physical_plan(top)


def test_bm25_empty_terms_raises(spark, docs):
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_hash_sample_deterministic_and_maponly(spark):
    df = spark.range(0, 5000).withColumnRenamed('id', 'doc_id')
    s1 = {r['doc_id'] for r in hash_sample(df, 'doc_id', 0.2).collect()}
    s2 = {r['doc_id'] for r in
          hash_sample(df.repartition(13), 'doc_id', 0.2).collect()}
    assert s1 == s2                       # repartition-proof
    assert 0.15 < len(s1) / 5000 < 0.25   # ~fraction
    assert count_shuffles(hash_sample(df, 'doc_id', 0.2)) == 0


def test_hash_sample_salt_independence(spark):
    df = spark.range(0, 2000).withColumnRenamed('id', 'doc_id')
    a = {r['doc_id'] for r in hash_sample(df, 'doc_id', 0.3, salt='a').collect()}
    b = {r['doc_id'] for r in hash_sample(df, 'doc_id', 0.3, salt='b').collect()}
    # independent samples: overlap ~ p^2, far from either sample alone
    assert len(a & b) < 0.6 * min(len(a), len(b))


def test_hash_split_partition_of_unity(spark):
    df = spark.range(0, 3000).withColumnRenamed('id', 'doc_id')
    out = hash_split(df, 'doc_id', {'train': 0.8, 'val': 0.1, 'test': 0.1})
    counts = {r['split']: r['n'] for r in
              out.groupBy('split').agg(F.count(F.lit(1)).alias('n')).collect()}
    assert None not in counts and sum(counts.values()) == 3000
    assert counts['train'] > counts['val'] and counts['train'] > counts['test']
    # each split equals the matching hash_sample range boundary behavior:
    # train is exactly hash_sample(0.8)
    train = {r['doc_id'] for r in
             out.filter(F.col('split') == 'train').collect()}
    assert train == {r['doc_id'] for r in
                     hash_sample(df, 'doc_id', 0.8).collect()}


def test_hash_split_full_fraction_includes_ffff_keys(spark):
    # fraction 1.0 must keep EVERY row, including keys sorting at 'ffff'
    df = spark.range(0, 4000).withColumnRenamed('id', 'doc_id')
    out = hash_split(df, 'doc_id', {'all': 1.0})
    assert out.filter(F.col('split').isNull()).count() == 0


def test_hash_split_overcommit_raises(spark):
    df = spark.range(0, 10).withColumnRenamed('id', 'doc_id')
    with pytest.raises(ValueError):
        hash_split(df, 'doc_id', {'a': 0.7, 'b': 0.7})


def test_stratified_exact_n_per_stratum(spark):
    df = (spark.range(0, 1000).withColumnRenamed('id', 'doc_id')
          .withColumn('lang', F.when(F.col('doc_id') % 3 == 0, 'en')
                      .when(F.col('doc_id') % 3 == 1, 'de').otherwise('fr')))
    out = stratified_sample(df, 'lang', 'doc_id', 7)
    counts = {r['lang']: r['n'] for r in
              out.groupBy('lang').agg(F.count(F.lit(1)).alias('n')).collect()}
    assert counts == {'en': 7, 'de': 7, 'fr': 7}
    # deterministic under repartitioning
    a = {r['doc_id'] for r in out.collect()}
    b = {r['doc_id'] for r in
         stratified_sample(df.repartition(11), 'lang', 'doc_id', 7).collect()}
    assert a == b


def test_stratified_small_stratum_keeps_all(spark):
    df = spark.createDataFrame([(1, 'en'), (2, 'en'), (3, 'xx')],
                               'doc_id long, lang string')
    out = stratified_sample(df, 'lang', 'doc_id', 5)
    assert out.count() == 3


def test_top_n_sample_plan_and_determinism(spark):
    df = spark.range(0, 5000).withColumnRenamed('id', 'doc_id')
    t = top_n_sample(df, 'doc_id', 25)
    assert 'TakeOrderedAndProject' in physical_plan(t)
    a = [r['doc_id'] for r in t.collect()]
    b = [r['doc_id'] for r in
         top_n_sample(df.repartition(17), 'doc_id', 25).collect()]
    assert sorted(a) == sorted(b) and len(a) == 25


def test_sample_key_is_portable_md5(spark):
    # the contract the DuckDB oracle relies on: first 4 hex chars of
    # md5(str(id))
    import hashlib
    df = spark.createDataFrame([(42,), (7,)], 'doc_id long')
    got = {r['doc_id']: r['k']
           for r in df.select('doc_id',
                              sample_key('doc_id').alias('k')).collect()}
    for i in (42, 7):
        assert got[i] == hashlib.md5(str(i).encode()).hexdigest()[:4]


def test_target_mix_proportions_and_binding_group(spark):
    """The binding group (smallest n/w) is kept whole; every other group
    is cut to floor(w * T); output proportions track the weights."""
    import pyspark.sql.functions as F
    from erde_spark.scale.sampling import target_mix
    rows = ([(i, 'en') for i in range(80)] + [(100 + i, 'de') for i in range(40)]
            + [(200 + i, 'zh') for i in range(10)])
    df = spark.createDataFrame(rows, ['doc_id', 'lang'])
    # zh binds: T = 10/0.1 = 100 -> quotas en 50, de 40, zh 10
    out = target_mix(df, 'lang', 'doc_id',
                     {'en': 0.5, 'de': 0.4, 'zh': 0.1})
    got = {r['lang']: r['n'] for r in
           out.groupBy('lang').agg(F.count('*').alias('n')).collect()}
    assert got == {'en': 50, 'de': 40, 'zh': 10}
    # deterministic across runs
    again = target_mix(df, 'lang', 'doc_id', {'en': 0.5, 'de': 0.4, 'zh': 0.1})
    assert sorted(r['doc_id'] for r in out.collect()) == \
        sorted(r['doc_id'] for r in again.collect())


def test_target_mix_drops_unlisted_and_validates(spark):
    import pytest
    from erde_spark.scale.sampling import target_mix
    df = spark.createDataFrame(
        [(1, 'en'), (2, 'de'), (3, 'xx')], ['doc_id', 'lang'])
    out = target_mix(df, 'lang', 'doc_id', {'en': 0.5, 'de': 0.5})
    assert {r['lang'] for r in out.collect()} == {'en', 'de'}
    with pytest.raises(ValueError):
        target_mix(df, 'lang', 'doc_id', {})
    with pytest.raises(ValueError):
        target_mix(df, 'lang', 'doc_id', {'en': 0.5, 'absent': 0.5})


def test_shuffle_deterministic_matches_single_sort(spark):
    """The bucketed two-phase position equals the brute-force global
    md5 sort exactly (dense 0..n-1, same permutation), is stable
    across repartitioning, salt changes the order, and DuckDB's
    ROW_NUMBER over the same md5 reproduces it engine-portably."""
    import duckdb

    from erde_spark.scale.sampling import shuffle_deterministic
    df = spark.createDataFrame([(i,) for i in range(500)], 'doc_id long')
    out = shuffle_deterministic(df, 'doc_id', buckets=16)
    got = {r['doc_id']: r['shuffle_pos'] for r in out.collect()}
    assert sorted(got.values()) == list(range(500))
    brute = {r['doc_id']: r['p'] - 1 for r in df.selectExpr(
        'doc_id',
        "row_number() over (order by md5(cast(doc_id as string)), "
        'doc_id) as p').collect()}
    assert got == brute
    # repartition-proof
    got2 = {r['doc_id']: r['shuffle_pos'] for r in
            shuffle_deterministic(df.repartition(13), 'doc_id',
                                  buckets=16).collect()}
    assert got2 == got
    # engine-portable: DuckDB agrees
    duck = dict(duckdb.sql(
        'SELECT i, ROW_NUMBER() OVER (ORDER BY md5(CAST(i AS VARCHAR)), i)'
        ' - 1 FROM range(500) t(i)').fetchall())
    assert got == duck
    # a salt permutes
    salted = {r['doc_id']: r['shuffle_pos'] for r in
              shuffle_deterministic(df, 'doc_id', salt='ep1',
                                    buckets=16).collect()}
    assert sorted(salted.values()) == list(range(500))
    assert salted != got
    import pytest as _p
    with _p.raises(ValueError, match='buckets'):
        shuffle_deterministic(df, 'doc_id', buckets=0)
    # empty frame keeps the schema
    empty = shuffle_deterministic(df.where('doc_id < 0'), 'doc_id')
    assert empty.count() == 0 and 'shuffle_pos' in empty.columns


def test_unimax_allocation_waterfill():
    """The paper's worked shape: a low-resource group caps at
    max_epochs and the freed budget redistributes uniformly; exact
    Fractions; budget beyond total capacity allocates every cap."""
    from fractions import Fraction

    import pytest

    from erde_spark.scale.sampling import unimax_allocation
    # capacities: a=2*10=20, b=2*100=200, c=2*100=200; budget 300
    a = unimax_allocation({'a': 10, 'b': 100, 'c': 100}, 300, 2)
    assert a['a'] == 20                     # capped (fair share was 100)
    assert a['b'] == a['c'] == Fraction(280, 2)
    assert sum(a.values()) == 300
    # budget > total capacity: everything caps
    full = unimax_allocation({'a': 10, 'b': 100}, 10**6, 2)
    assert full == {'a': 20, 'b': 200}
    with pytest.raises(ValueError):
        unimax_allocation({}, 10, 2)
    with pytest.raises(ValueError):
        unimax_allocation({'a': 5}, 0, 2)


def test_unimax_mix_epochs_and_fraction(spark):
    """unimax_mix: the capped group gets exactly max_epochs whole
    passes (no fractional sample); the uncapped group's fractional
    epoch is the deterministic md5 sample at the exact Fraction
    threshold; materialize=True yields one row per (doc, epoch)."""
    from erde_spark.scale.sampling import sample_key, unimax_mix
    import pyspark.sql.functions as F
    rows = [(i, 'small') for i in range(10)]
    rows += [(100 + i, 'big') for i in range(70)]
    df = spark.createDataFrame(rows, 'doc_id long, lang string')
    # capacities: small 20, big 140; budget 80: small caps at 20,
    # big gets 60 -> 6/7 epoch (0 full + frac 6/7, threshold 0xdb6d)
    out = unimax_mix(df, 'lang', 'doc_id', budget=80, max_epochs=2)
    got = {r['doc_id']: (r['n_full_epochs'], r['frac_kept'])
           for r in out.collect()}
    assert all(got[i] == (2, False) for i in range(10))
    assert all(got[100 + i][0] == 0 for i in range(70))
    keys = {r['doc_id']: r['k'] for r in
            df.select('doc_id', sample_key('doc_id').alias('k')).collect()}
    assert all(got[100 + i][1] == (keys[100 + i] < 'db6d')
               for i in range(70))
    mat = unimax_mix(df, 'lang', 'doc_id', budget=80, max_epochs=2,
                     materialize=True)
    per_doc = {r['doc_id']: r['n'] for r in
               mat.groupBy('doc_id').agg(F.count('*').alias('n'))
               .collect()}
    assert all(per_doc[i] == 2 for i in range(10))
    for i in range(70):
        expect = 1 if keys[100 + i] < 'db6d' else 0
        assert per_doc.get(100 + i, 0) == expect
    # weight_col: capacities by token sums instead of row counts
    wdf = df.withColumn('toks', F.lit(10))
    wout = unimax_mix(wdf, 'lang', 'doc_id', budget=800, max_epochs=2,
                      weight_col='toks')
    wgot = {r['doc_id']: (r['n_full_epochs'], r['frac_kept'])
            for r in wout.collect()}
    assert wgot == got  # same shape scaled by 10


class TestTemperatureMix:
    def _df(self, spark):
        rows = [(i, 'small' if i < 20 else 'big') for i in range(100)]
        return spark.createDataFrame(rows, 'doc_id long, grp string')

    def test_alpha_one_keeps_natural(self, spark):
        from erde_spark.scale.sampling import temperature_mix
        out = temperature_mix(self._df(spark), 'grp', 'doc_id', alpha=1.0)
        assert out.count() == 100  # natural distribution already

    def test_alpha_zero_flattens(self, spark):
        from erde_spark.scale.sampling import temperature_mix
        out = temperature_mix(self._df(spark), 'grp', 'doc_id', alpha=0.0)
        got = {r['grp']: 0 for r in out.collect()}
        for r in out.collect():
            got[r['grp']] += 1
        # uniform targets: small (20) binds whole, big downsamples to 20
        assert got == {'small': 20, 'big': 20}

    def test_alpha_half_rational_quota(self, spark):
        from erde_spark.scale.sampling import temperature_mix
        rows = [(i, 'small' if i < 20 else 'big') for i in range(100)]
        df = spark.createDataFrame(rows, 'doc_id long, grp string')
        # shares 1/5, 4/5 -> sqrt weights 1/3, 2/3 -> big quota 40
        out = temperature_mix(df, 'grp', 'doc_id', alpha=0.5)
        counts = {}
        for r in out.collect():
            counts[r['grp']] = counts.get(r['grp'], 0) + 1
        assert counts == {'small': 20, 'big': 40}

    def test_deterministic(self, spark):
        from erde_spark.scale.sampling import temperature_mix
        d = self._df(spark)
        a = sorted(r['doc_id'] for r in
                   temperature_mix(d, 'grp', 'doc_id', 0.3).collect())
        b = sorted(r['doc_id'] for r in temperature_mix(
            d.repartition(7), 'grp', 'doc_id', 0.3).collect())
        assert a == b

    def test_bad_alpha(self, spark):
        import pytest as _pytest
        from erde_spark.scale.sampling import temperature_mix
        with _pytest.raises(ValueError):
            temperature_mix(self._df(spark), 'grp', 'doc_id', alpha=1.5)

    def test_nulls_dropped(self, spark):
        from erde_spark.scale.sampling import temperature_mix
        df = spark.createDataFrame(
            [(1, 'a'), (2, None), (3, 'a')], 'doc_id long, grp string')
        out = temperature_mix(df, 'grp', 'doc_id', alpha=0.5)
        assert sorted(r['doc_id'] for r in out.collect()) == [1, 3]


class TestWeightedSample:
    """Efraimidis-Spirakis A-ES weighted sampling without replacement."""

    def _df(self, spark, n=2000):
        return spark.range(n).select(
            F.col('id'),
            # weights 1 and 10, interleaved
            F.when(F.col('id') % 2 == 0, 1.0).otherwise(10.0).alias('w'))

    def test_exact_n_deterministic_repartition_proof(self, spark):
        from erde_spark.scale.sampling import weighted_sample
        df = self._df(spark)
        a = sorted(r['id'] for r in weighted_sample(df, 'id', 'w', 200).collect())
        b = sorted(r['id'] for r in
                   weighted_sample(df.repartition(17), 'id', 'w', 200).collect())
        assert len(a) == 200 and a == b

    def test_weight_proportionality(self, spark):
        from erde_spark.scale.sampling import weighted_sample
        # 10x-weighted rows must dominate the sample (A-ES first-draw
        # probability proportional to weight; with n=200 of 2000 the
        # heavy half should take the large majority of slots)
        got = weighted_sample(self._df(spark), 'id', 'w', 200).collect()
        heavy = sum(1 for r in got if r['id'] % 2 == 1)
        assert heavy > 150, heavy

    def test_infinite_relative_weight_always_wins(self, spark):
        from erde_spark.scale.sampling import weighted_sample
        df = spark.range(1000).select(
            F.col('id'),
            F.when(F.col('id') == 77, 1e12).otherwise(1e-6).alias('w'))
        for salt in ('', 'a', 'b'):
            got = {r['id'] for r in
                   weighted_sample(df, 'id', 'w', 5, salt=salt).collect()}
            assert 77 in got

    def test_nonpositive_weights_excluded_and_plan(self, spark):
        from erde_spark.scale.sampling import weighted_sample
        df = spark.range(100).select(
            F.col('id'),
            F.when(F.col('id') < 90, F.lit(None).cast('double'))
             .otherwise(F.when(F.col('id') < 95, -1.0).otherwise(2.0))
             .alias('w'))
        q = weighted_sample(df, 'id', 'w', 50)
        got = sorted(r['id'] for r in q.collect())
        assert got == list(range(95, 100))  # only the 5 positive-weight rows
        assert 'TakeOrderedAndProject' in physical_plan(q)
        assert count_shuffles(q) == 0

    def test_salts_draw_independent_samples(self, spark):
        from erde_spark.scale.sampling import weighted_sample
        df = self._df(spark)
        a = {r['id'] for r in weighted_sample(df, 'id', 'w', 200, 'e1').collect()}
        b = {r['id'] for r in weighted_sample(df, 'id', 'w', 200, 'e2').collect()}
        # independent draws: expected overlap ~ sum p_i^2 ~ 35 of 200
        assert a != b and 0 < len(a & b) < 120


class TestInvertedIndex:
    """build_postings / postings_lookup (scale/ranking.py)."""

    @pytest.fixture()
    def corpus(self, spark):
        rows = [(0, 'alpha beta gamma'),
                (1, 'alpha alpha delta'),
                (2, 'beta beta beta gamma'),
                (3, 'delta epsilon'),
                (4, 'alpha beta')]
        return spark.createDataFrame(rows, 'doc_id long, text string')

    def test_postings_exact(self, spark, corpus):
        from erde_spark.scale.ranking import build_postings
        idx = {r['term']: (r['df'], [(p['id'], p['tf']) for p in r['postings']])
               for r in build_postings(corpus).collect()}
        assert idx['alpha'] == (3, [(0, 1), (1, 2), (4, 1)])
        assert idx['beta'] == (3, [(0, 1), (2, 3), (4, 1)])
        assert idx['epsilon'] == (1, [(3, 1)])

    def test_df_pruning(self, spark, corpus):
        from erde_spark.scale.ranking import build_postings
        terms = {r['term'] for r in
                 build_postings(corpus, min_df=2, max_df_frac=0.5).collect()}
        # df>=2 kills epsilon; max_df 0.5*5=2.5 kills alpha/beta (df 3)
        assert terms == {'gamma', 'delta'}

    def test_lookup_any_all(self, spark, corpus):
        from erde_spark.scale.ranking import build_postings, postings_lookup
        idx = build_postings(corpus)
        any_ = sorted(r['id'] for r in
                      postings_lookup(idx, ['alpha', 'delta']).collect())
        assert any_ == [0, 1, 3, 4]
        all_ = sorted(r['id'] for r in
                      postings_lookup(idx, ['alpha', 'delta'], 'all').collect())
        assert all_ == [1]

    def test_lookup_validates(self, spark, corpus):
        from erde_spark.scale.ranking import build_postings, postings_lookup
        idx = build_postings(corpus)
        with pytest.raises(ValueError):
            postings_lookup(idx, [])
        with pytest.raises(ValueError):
            postings_lookup(idx, ['a'], mode='phrase')

    def test_plan_no_python(self, spark, corpus):
        from erde_spark.plans.inspect import count_python_udf_passes, count_shuffles
        from erde_spark.scale.ranking import build_postings
        idx = build_postings(corpus, n_docs=5)
        assert count_python_udf_passes(idx) == 0
        assert count_shuffles(idx) <= 2


def test_postings_bucketed_serving_partition_prunes(spark, tmp_path):
    """write_postings/read_postings: the term probe must land as a
    PARTITION filter (directory pruning), not a data filter — the
    serving pattern that makes a term lookup O(index/buckets) at
    100 TB."""
    import re

    from erde_spark.plans.inspect import formatted_plan
    from erde_spark.scale.ranking import (build_postings, read_postings,
                                          write_postings)
    rows = [(i, f'tok{i % 7} common filler') for i in range(50)]
    docs = spark.createDataFrame(rows, 'doc_id long, text string')
    path = str(tmp_path / 'idx')
    write_postings(build_postings(docs), path, buckets=64)
    q = read_postings(spark, path, ['tok3', 'common'], buckets=64)
    got = {r['term']: r['df'] for r in q.collect()}
    assert got == {'tok3': 7, 'common': 50}
    m = re.search(r'PartitionFilters: \[([^\]]*)\]', formatted_plan(q))
    assert m and 'bucket' in m.group(1), m
    with pytest.raises(ValueError):
        read_postings(spark, path, [])


def test_postings_bucket_mismatch_raises(spark, tmp_path):
    """A probe with the wrong bucket count must RAISE against the
    writer's _postings_meta.json sidecar — before r11 it silently
    pruned to the wrong directories, indistinguishable from 'term
    absent'. A pre-metadata index (sidecar deleted) keeps the old
    proceed-on-the-caller's-word behavior."""
    import os

    from erde_spark.scale.ranking import (build_postings, read_postings,
                                          write_postings)
    docs = spark.createDataFrame(
        [(i, f'tok{i % 3} common') for i in range(12)],
        'doc_id long, text string')
    path = str(tmp_path / 'idx')
    write_postings(build_postings(docs), path, buckets=64)
    with pytest.raises(ValueError, match='written with buckets=64'):
        read_postings(spark, path, ['common'], buckets=32)
    # matching count still serves
    assert read_postings(spark, path, ['common'], buckets=64).count() == 1
    # legacy index without the sidecar: no validation possible, probe
    # proceeds (correct count because the caller's value IS right)
    os.remove(os.path.join(path, '_postings_meta.json'))
    assert read_postings(spark, path, ['common'], buckets=64).count() == 1
