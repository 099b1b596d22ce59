"""Language identification: held-out accuracy across 30 languages /
9 scripts, exact DuckDB replay of the closed-form training + scoring,
und-handling, JVM-only plan, and downstream strata integration."""

import pytest
from pyspark.sql import functions as F


def _eval_docs(spark):
    from erde_spark.scale.langid import EVAL_SENTENCES
    rows, truth = [], {}
    for i, (lang, sents) in enumerate(sorted(EVAL_SENTENCES.items())):
        for j, s in enumerate(sents):
            rows.append((i * 10 + j, s))
            truth[i * 10 + j] = lang
    return spark.createDataFrame(rows, 'doc_id long, text string'), truth


def test_langid_heldout_accuracy(spark):
    """Every held-out sentence (3 per language, DISJOINT from the
    training corpus, covering Latin/Cyrillic/Greek/Arabic/Hebrew/
    Devanagari/Thai/Han/Kana/Hangul) is identified correctly —
    including the hard pairs da/nb, es/pt/it, ru/uk/bg, ar/fa,
    zh/ja."""
    from erde_spark.scale.langid import identify_language
    docs, truth = _eval_docs(spark)
    got = {r['id']: r['lang']
           for r in identify_language(docs).collect()}
    wrong = {i: (truth[i], got[i]) for i in truth if got[i] != truth[i]}
    assert not wrong, wrong
    # scripts sanity: the set of predicted languages spans all 30
    assert len(set(got.values())) == 30


def test_langid_out_of_register_accuracy(spark):
    """Domain-shift check: single financial-news sentences whose
    content vocabulary (central bank, interest rates) appears in
    NEITHER the training corpus nor the held-out set — the signal has
    to come from function words and script, which is what transfers
    to a real crawl. Covers the hard pairs (da/nb/sv, es/pt/it,
    ru/uk, cs/pl)."""
    from erde_spark.scale.langid import identify_language
    probes = [
        ('en', 'The central bank kept interest rates unchanged at its '
               'meeting on thursday.'),
        ('de', 'Die zentralbank ließ die zinssätze bei ihrer sitzung '
               'am donnerstag unverändert.'),
        ('fr', "La banque centrale a maintenu ses taux d'intérêt "
               'inchangés lors de sa réunion de jeudi.'),
        ('es', 'El banco central mantuvo los tipos de interés sin '
               'cambios en su reunión del jueves.'),
        ('pt', 'O banco central manteve as taxas de juros inalteradas '
               'em sua reunião de quinta-feira.'),
        ('it', 'La banca centrale ha mantenuto i tassi di interesse '
               'invariati nella riunione di giovedì.'),
        ('nl', 'De centrale bank hield de rentetarieven ongewijzigd '
               'tijdens haar vergadering van donderdag.'),
        ('sv', 'Centralbanken höll räntorna oförändrade vid sitt möte '
               'i torsdags.'),
        ('da', 'Centralbanken holdt renterne uændrede på sit møde '
               'torsdag.'),
        ('nb', 'Sentralbanken holdt rentene uendret på sitt møte '
               'torsdag.'),
        ('pl', 'Bank centralny utrzymał stopy procentowe bez zmian na '
               'czwartkowym posiedzeniu.'),
        ('cs', 'Centrální banka ponechala úrokové sazby na čtvrtečním '
               'zasedání beze změny.'),
        ('ru', 'Центральный банк оставил процентные ставки без '
               'изменений на заседании в четверг.'),
        ('uk', 'Центральний банк залишив процентні ставки без змін на '
               'засіданні в четвер.'),
        ('tr', 'Merkez bankası perşembe günkü toplantısında faiz '
               'oranlarını değiştirmedi.'),
        ('ar', 'أبقى البنك المركزي على أسعار الفائدة دون تغيير في '
               'اجتماعه يوم الخميس.'),
        ('zh', '中央银行在周四的会议上维持利率不变。'),
        ('ja', '中央銀行は木曜日の会合で金利を据え置きました。'),
        ('ko', '중앙은행은 목요일 회의에서 금리를 동결했다.'),
        ('hi', 'केंद्रीय बैंक ने गुरुवार की बैठक में ब्याज दरों को अपरिवर्तित रखा।'),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(probes)],
        'doc_id long, text string')
    got = {r['id']: r['lang'] for r in identify_language(df).collect()}
    wrong = {i: (lang, got[i]) for i, (lang, _) in enumerate(probes)
             if got[i] != lang}
    assert not wrong, wrong


def test_langid_und_and_score(spark):
    from erde_spark.scale.langid import identify_language
    docs = spark.createDataFrame(
        [(1, 'the weather should be better tomorrow than it was today'),
         (2, ''), (3, None), (4, '12345 !!! ???')],
        'doc_id long, text string')
    got = {r['id']: (r['lang'], r['lang_score'])
           for r in identify_language(docs).collect()}
    assert got[1][0] == 'en' and got[1][1] < 0
    for i in (2, 3, 4):  # empty after normalization
        assert got[i] == ('und', 0.0)


def test_langid_duckdb_training_replay(spark):
    """The whole pipeline is engine-replayable: DuckDB re-derives the
    quantized model from the same checked-in corpus (normalize ->
    char 1-3-grams -> Laplace -> ln -> milli-unit round) and re-scores
    the held-out docs with exact integer sums. Model rows must agree
    within 1 milli-unit (a 1-ulp ln() difference between libm and the
    JVM can flip a rounding) and every final language must match."""
    import duckdb

    from erde_spark.scale.langid import (LANGID_CORPUS, identify_language,
                                         train_langid)
    m = train_langid(spark)
    spark_model = m.df.toPandas().melt(
        id_vars='gram', var_name='lang', value_name='q_spark')
    spark_model['lang'] = spark_model['lang'].str.removeprefix('q_')

    con = duckdb.connect()
    con.execute('CREATE TABLE corpus (lang VARCHAR, text VARCHAR)')
    con.executemany('INSERT INTO corpus VALUES (?, ?)',
                    sorted(LANGID_CORPUS.items()))
    con.execute(r"""
      CREATE TABLE dmodel AS
      WITH norm AS (
        SELECT lang, ' ' || trim(regexp_replace(regexp_replace(
                 regexp_replace(regexp_replace(lower(text),
                   '̇', '', 'g'), 'ς', 'σ', 'g'),
                 '[^\p{L}\p{M} ]+', ' ', 'g'), ' +', ' ', 'g')) || ' '
               AS t
        FROM corpus),
      grams AS (
        SELECT lang, unnest(flatten([
          [substr(t, i, 1) FOR i IN generate_series(1, length(t))],
          [substr(t, i, 2) FOR i IN generate_series(1, length(t) - 1)],
          [substr(t, i, 3) FOR i IN generate_series(1, length(t) - 2)]
        ])) AS gram FROM norm),
      counts AS (SELECT gram, lang, COUNT(*) AS c FROM grams
                 GROUP BY gram, lang),
      tot AS (SELECT lang, SUM(c) AS n FROM counts GROUP BY lang),
      vocab AS (SELECT COUNT(DISTINCT gram) AS v FROM grams)
      SELECT g.gram, t.lang,
             CAST(round(ln((COALESCE(c.c, 0) + 0.5) / (t.n + 0.5 * v.v))
                        * 1000) AS BIGINT) AS q_duck
      FROM (SELECT DISTINCT gram FROM grams) g
      CROSS JOIN tot t CROSS JOIN vocab v
      LEFT JOIN counts c ON c.gram = g.gram AND c.lang = t.lang
    """)
    con.register('smodel', spark_model)
    diff = con.execute("""
      SELECT COUNT(*) FILTER (WHERE q_spark IS NULL OR q_duck IS NULL
                              OR abs(q_spark - q_duck) > 1) AS bad,
             COUNT(*) FILTER (WHERE q_spark <> q_duck) AS off_by_one,
             COUNT(*) AS total
      FROM smodel FULL JOIN dmodel USING (gram, lang)
    """).fetchone()
    assert diff[0] == 0, f'{diff[0]} model rows differ by >1 milli-unit'
    assert diff[1] <= diff[2] * 0.001  # 1-ulp flips are rare

    # scoring replay: per-doc integer sums + OOV constants + argmax;
    # one >200-char doc exercises the truncate-then-pad order
    docs, truth = _eval_docs(spark)
    from erde_spark.scale.langid import EVAL_SENTENCES
    long_text = ' '.join(EVAL_SENTENCES['de']) * 3
    docs = docs.union(spark.createDataFrame([(9999, long_text)],
                                            docs.schema))
    truth[9999] = 'de'
    con.register('docs', docs.toPandas())
    oov = con.execute("""
      WITH norm AS (SELECT lang, ' ' || trim(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(lower(text),
                 '\\u0307', '', 'g'), 'ς', 'σ', 'g'),
               '[^\\p{L}\\p{M} ]+', ' ', 'g'), ' +', ' ', 'g')) || ' '
             AS t FROM corpus),
      grams AS (SELECT lang, unnest(flatten([
          [substr(t, i, 1) FOR i IN generate_series(1, length(t))],
          [substr(t, i, 2) FOR i IN generate_series(1, length(t) - 1)],
          [substr(t, i, 3) FOR i IN generate_series(1, length(t) - 2)]
        ])) AS gram FROM norm),
      tot AS (SELECT lang, COUNT(*) AS n FROM grams GROUP BY lang),
      vocab AS (SELECT COUNT(DISTINCT gram) AS v FROM grams)
      SELECT lang, CAST(round(ln(0.5 / (n + 0.5 * v)) * 1000) AS BIGINT)
      FROM tot, vocab
    """).fetchall()
    con.execute('CREATE TABLE oov (lang VARCHAR, q BIGINT)')
    con.executemany('INSERT INTO oov VALUES (?, ?)', oov)
    duck = dict(con.execute(r"""
      WITH dn AS (
        -- mirror norm_for_langid exactly: normalize, TRUNCATE to the
        -- prefix, then pad one space on each side
        SELECT doc_id, ' ' || substr(trim(regexp_replace(regexp_replace(
                 regexp_replace(regexp_replace(lower(text),
                   '̇', '', 'g'), 'ς', 'σ', 'g'),
                 '[^\p{L}\p{M} ]+', ' ', 'g'), ' +', ' ', 'g')), 1, 200)
               || ' ' AS t
        FROM docs),
      dg AS (SELECT doc_id, unnest(flatten([
          [substr(t, i, 1) FOR i IN generate_series(1, length(t))],
          [substr(t, i, 2) FOR i IN generate_series(1, length(t) - 1)],
          [substr(t, i, 3) FOR i IN generate_series(1, length(t) - 2)]
        ])) AS gram FROM dn),
      scored AS (
        SELECT doc_id, o.lang,
               SUM(COALESCE(m.q_duck, o.q)) AS s
        FROM dg CROSS JOIN oov o
        LEFT JOIN dmodel m ON m.gram = dg.gram AND m.lang = o.lang
        GROUP BY doc_id, o.lang),
      best AS (SELECT doc_id, lang,
                      ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY s DESC, lang) AS rk
               FROM scored)
      SELECT doc_id, lang FROM best WHERE rk = 1
    """).fetchall())
    got = {r['id']: r['lang']
           for r in identify_language(docs, m).collect()}
    assert duck == got
    assert duck == truth


def test_langid_plan_is_jvm_only(spark):
    """Scoring must stay whole-stage-codegen: no Python/Arrow eval
    nodes, model joined via broadcast."""
    from erde_spark.scale.langid import default_langid_model, \
        identify_language
    docs = spark.createDataFrame([(1, 'hello world')],
                                 'doc_id long, text string')
    out = identify_language(docs, default_langid_model(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'Python' not in plan and 'ArrowEval' not in plan
    assert 'BroadcastHashJoin' in plan


def test_langid_feeds_corpus_mix_and_quality_filter(spark):
    """The identifier's output is a strata column downstream curation
    ops consume directly: target_mix rebalances on it and
    quality_filter composes with it."""
    from erde_spark.scale.langid import EVAL_SENTENCES, identify_language
    from erde_spark.scale.sampling import target_mix
    from erde_spark.scale.text import quality_filter
    rows = []
    k = 0
    for lang in ('en', 'de', 'fr'):
        for rep in range(8):
            for s in EVAL_SENTENCES[lang]:
                rows.append((k, (s + ' ') * 3))
                k += 1
    docs = spark.createDataFrame(rows, 'doc_id long, text string')
    tagged = docs.join(identify_language(docs).withColumnRenamed(
        'id', 'doc_id'), 'doc_id')
    mixed = target_mix(tagged, 'lang', 'doc_id',
                       {'en': 0.5, 'de': 0.25, 'fr': 0.25})
    counts = {r['lang']: r['n'] for r in
              mixed.groupBy('lang').agg(F.count('*').alias('n')).collect()}
    assert counts['en'] == 2 * counts['de'] == 2 * counts['fr']
    # quality_filter runs on the same tagged frame without interference
    qf = quality_filter(tagged, min_tokens=5)
    assert qf.count() > 0 and 'lang' in qf.columns
