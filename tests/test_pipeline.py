"""End-to-end curation pipeline (erde_spark.scale.pipeline.curate)."""

import pytest

from erde_spark.scale.pipeline import CURATE_STEPS, curate

GOOD = ('the quick brown fox jumps over the lazy dog and then walks '
        'into town where the people watch it pass with great interest '
        'and the day goes on for a while after that with more of the '
        'same kind of thing happening in the town until the evening '
        'comes and the lights turn on one by one along the old street')


def _corpus(spark):
    rows = [
        (1, GOOD),                                  # survives everything
        (2, GOOD),                                  # exact dup of 1
        (3, 'zq xv jk wp ' * 30),                   # no stopwords -> quality
        (4, 'word ' * 2000),                        # too repetitive -> compression
        (5, GOOD + ' write to me at bob@example.com for more'),
        (6, None),                                  # null text
    ]
    return spark.createDataFrame(rows, 'doc_id long, text string')


class TestCurate:
    def test_stage_order_and_survivors(self, spark):
        out, stats = curate(
            _corpus(spark), steps=('quality', 'compression', 'pii', 'dedup'),
            keep_stats=True)
        rows = {r.doc_id: r.text for r in out.collect()}
        # 1 survives; 2 deduped against 1; 3 quality-dropped;
        # 4 compression-dropped; 5 survives with the email redacted;
        # 6 dropped (null never passes quality)
        assert set(rows) == {1, 5}
        assert 'bob@example.com' not in rows[5]
        assert '[PII]' in rows[5]
        assert rows[1] == GOOD
        stages = [s for s, _ in stats]
        assert stages == ['input', 'quality', 'compression', 'pii', 'dedup']
        counts = dict(stats)
        assert counts['input'] == 6
        assert counts['quality'] == 3        # 1, 2, 5
        assert counts['dedup'] == 2

    def test_normalize_stage_rewrites_text(self, spark):
        df = spark.createDataFrame(
            [(1, 'a\r\nb  c\x00d')], 'doc_id long, text string')
        out = curate(df, steps=('normalize',)).collect()[0]
        assert out.text == 'a\nb cd'

    def test_langid_stage_filters(self, spark):
        df = spark.createDataFrame(
            [(1, 'the cat and the dog are in the house with the people'),
             (2, 'le chat et le chien sont dans la maison avec les gens')],
            'doc_id long, text string')
        out = curate(df, steps=('langid',), langs=('en',))
        assert [r.doc_id for r in out.collect()] == [1]
        tagged = curate(df, steps=('langid',), langs=None)
        langs = {r.doc_id: r.lang_pred for r in tagged.collect()}
        assert langs[1] == 'en' and langs[2] == 'fr'

    def test_minhash_dedup_mode(self, spark):
        near = GOOD + ' extra'
        df = spark.createDataFrame(
            [(1, GOOD), (2, near), (3, 'completely different text about '
              'trains and the stations where they stop for a while')],
            'doc_id long, text string')
        out = curate(df, steps=('dedup',), dedup='minhash',
                     dedup_threshold=0.7)
        assert sorted(r.doc_id for r in out.collect()) == [1, 3]

    def test_unknown_step_raises(self, spark):
        with pytest.raises(ValueError, match='unknown curate steps'):
            curate(_corpus(spark), steps=('quality', 'tokenize'))

    def test_full_default_order(self, spark):
        # all six stages compose without error on the synthetic corpus
        out = curate(_corpus(spark), steps=CURATE_STEPS, langs=None)
        ids = sorted(r.doc_id for r in out.collect())
        assert ids == [1, 5]
        assert 'lang_pred' in out.columns


def test_curate_subcommand(spark, tmp_path):
    """curate from the shell: subset steps, dedup mode, band flags."""
    from erde_spark.cli import entrypoint
    src = str(tmp_path / 'docs.parquet')
    spark.createDataFrame(
        [(1, GOOD), (2, GOOD), (3, 'zq xv jk wp ' * 30)],
        'doc_id long, text string').write.mode('overwrite').parquet(src)
    out = str(tmp_path / 'clean.parquet')
    entrypoint(['curate', src, out, '--steps', 'quality,dedup'])
    assert [r['doc_id'] for r in
            spark.read.parquet(out).collect()] == [1]


class TestLangPredContract:
    """ADVICE r10: filtering runs must NOT leak lang_pred; tag mode
    (langs=None) keeps it, and a pre-existing lang_pred collides
    loudly instead of producing an ambiguous join."""

    def test_filtering_run_keeps_caller_columns(self, spark):
        df = spark.createDataFrame(
            [(1, 'the cat and the dog are in the house with the people',
              'keep-me')],
            'doc_id long, text string, extra string')
        out = curate(df, steps=('langid',), langs=('en',))
        assert out.columns == ['doc_id', 'text', 'extra']
        assert out.collect()[0].extra == 'keep-me'

    def test_existing_lang_pred_survives_filtering(self, spark):
        df = spark.createDataFrame(
            [(1, 'the cat and the dog are in the house with the people',
              'caller-value')],
            'doc_id long, text string, lang_pred string')
        out = curate(df, steps=('langid',), langs=('en',))
        assert out.collect()[0].lang_pred == 'caller-value'

    def test_tag_mode_collision_raises(self, spark):
        import pytest as _pytest
        df = spark.createDataFrame(
            [(1, 'hello there', 'x')],
            'doc_id long, text string, lang_pred string')
        with _pytest.raises(ValueError, match='already has one'):
            curate(df, steps=('langid',), langs=None)
