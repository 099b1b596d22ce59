"""@autocli input x function x output combination matrix.

Mirrors the reference's contract (`/root/reference/erde/__init__.py:217-243`,
tested in `/root/reference/tests/test_command.py:11-100`): of the 12
input (df/stream) x function (func/generator) x output (nothing/df/stream)
combinations, generators must write to a stream, and a stream input cannot
return a single DataFrame.
"""

import pytest
from pyspark.sql import DataFrame

from erde_spark.cli import AutocliError, autocli
from erde_spark.streaming.chunks import read_stream, write_stream


@pytest.fixture()
def src(spark, tmp_path):
    path = str(tmp_path / 'in.parquet')
    spark.range(20).toDF('id').write.parquet(path)
    return path


def test_df_func_df(spark, src, tmp_path):
    out = str(tmp_path / 'out.parquet')

    @autocli
    def head10(input_data: DataFrame) -> DataFrame:
        return input_data.limit(10)

    head10.cli([src, out])
    assert spark.read.parquet(out).count() == 10


def test_df_func_nothing(spark, src):
    seen = {}

    @autocli
    def consume(input_data: DataFrame):
        seen['n'] = input_data.count()

    consume.cli([src])
    assert seen['n'] == 20


def test_df_generator_stream(spark, src, tmp_path):
    """Combo 6: one-call input, generator function, stream output — each
    yielded chunk appends into the sink."""
    out = str(tmp_path / 'out.parquet')

    @autocli
    def split(input_data: DataFrame) -> write_stream:
        yield input_data.filter('id < 5')
        yield input_data.filter('id >= 5')

    split.cli([src, out])
    assert spark.read.parquet(out).count() == 20


def test_stream_func_stream(spark, src, tmp_path):
    """Combo 9: stream input (opened by the decorator), func, stream out."""
    out = str(tmp_path / 'out.parquet')

    @autocli
    def passthrough(input_data: read_stream) -> write_stream:
        return input_data.filter('id % 2 = 0')

    passthrough.cli([src, out])
    assert spark.read.parquet(out).count() == 10


def test_stream_generator_stream(spark, src, tmp_path):
    """Combo 12: stream input, generator, stream output."""
    out = str(tmp_path / 'out.parquet')

    @autocli
    def requeue(input_data: read_stream) -> write_stream:
        yield input_data.filter('id < 3')
        yield input_data.filter('id >= 17')

    requeue.cli([src, out])
    assert spark.read.parquet(out).count() == 6


def test_stream_func_nothing(spark, src):
    """Combo 7: stream input consumed for side effects only."""
    seen = {}

    @autocli
    def consume(input_data: read_stream):
        seen['n'] = input_data.count()

    consume.cli([src])
    assert seen['n'] == 20


def test_forbidden_two_stream_inputs():
    with pytest.raises(AutocliError, match='at most one read_stream'):
        @autocli
        def bad1(a: read_stream, b: read_stream):
            pass


def test_forbidden_generator_without_stream_output():
    with pytest.raises(AutocliError, match='generator'):
        @autocli
        def bad2(input_data: DataFrame):
            yield 1

    with pytest.raises(AutocliError, match='generator'):
        @autocli
        def bad2b(input_data: DataFrame) -> DataFrame:
            yield input_data


def test_forbidden_stream_input_df_output():
    with pytest.raises(AutocliError, match='read_stream input'):
        @autocli
        def bad3(input_data: read_stream) -> DataFrame:
            return input_data


def test_stream_output_cleanup_on_failure(spark, src, tmp_path):
    """A generator that crashes mid-stream removes its partial sink
    (reference write-stream cancel semantics)."""
    import os
    out = str(tmp_path / 'out.parquet')

    @autocli
    def crash(input_data: DataFrame) -> write_stream:
        yield input_data.limit(3)
        raise ValueError('boom')

    with pytest.raises(ValueError, match='boom'):
        crash.cli([src, out])
    assert not os.path.exists(out)


def test_curation_subcommands_end_to_end(spark, tmp_path):
    """The curation extension subcommands (dedup/quality/mix/pack) run
    from the entrypoint against parquet in/out."""
    from erde_spark.cli import entrypoint
    src = str(tmp_path / 'docs.parquet')
    rows = [(i, 'the quick brown fox jumps over the lazy dog number %d '
                'with several additional words appended to pass gates '
                'and some more text for quality thresholds here' % (i % 4),
             'en' if i % 2 else 'de') for i in range(12)]
    spark.createDataFrame(rows, 'doc_id long, text string, lang string') \
        .write.mode('overwrite').parquet(src)

    out = str(tmp_path / 'dedup.parquet')
    entrypoint(['dedup', src, out, '--strategy', 'exact'])
    assert spark.read.parquet(out).count() == 4  # 4 distinct texts

    out2 = str(tmp_path / 'mix.parquet')
    entrypoint(['mix', src, 'en=0.5,de=0.5', out2])
    back = spark.read.parquet(out2)
    assert back.count() == 12  # already balanced: binding group whole

    out3 = str(tmp_path / 'pack.parquet')
    entrypoint(['pack', src, out3, '--shard-column', 'lang'])
    assert {'start_offset', 'first_seq'} <= set(spark.read.parquet(out3).columns)

    out4 = str(tmp_path / 'q.parquet')
    entrypoint(['quality', src, out4])
    assert spark.read.parquet(out4).count() <= 12


def test_extract_select_tokenize_subcommands(spark, tmp_path):
    """Round-4 curation extensions: HTML extraction, DSIR selection and
    BPE training from the entrypoint."""
    from erde_spark.cli import entrypoint
    src = str(tmp_path / 'pages.parquet')
    rows = [(i, '<html><head><title>Page %d</title></head><body>'
                '<script>var x = 1;</script><p>the quick brown fox '
                'document %d</p><a href="https://e.com/%d">l</a>'
                '</body></html>' % (i, i % 3, i)) for i in range(9)]
    spark.createDataFrame(rows, 'doc_id long, html string') \
        .write.mode('overwrite').parquet(src)

    out = str(tmp_path / 'ex.parquet')
    entrypoint(['extract', src, out])
    back = spark.read.parquet(out)
    assert back.count() == 9
    r = back.filter('doc_id = 4').first()
    assert r['title'] == 'Page 4' and r['n_links'] == 1
    assert 'var x' not in r['text'] and 'quick brown fox' in r['text']

    out1b = str(tmp_path / 'ex_text.parquet')
    entrypoint(['extract', src, out1b, '--text-only'])
    assert set(spark.read.parquet(out1b).columns) == {'doc_id', 'text'}

    docs = str(tmp_path / 'docs.parquet')
    rows = [(i, 'alpha beta gamma delta %d' % i) for i in range(6)]
    rows += [(i, 'zebra quagga okapi weird %d' % i) for i in range(6, 12)]
    spark.createDataFrame(rows, 'doc_id long, text string') \
        .write.mode('overwrite').parquet(docs)
    target = str(tmp_path / 'target.parquet')
    spark.createDataFrame([(100, 'alpha beta gamma delta ' * 10)],
                          'doc_id long, text string') \
        .write.mode('overwrite').parquet(target)

    out2 = str(tmp_path / 'sel.parquet')
    # bool-with-True-default convention: passing the flag turns it OFF
    entrypoint(['select', docs, target, '4', out2, '--gumbel'])
    picked = {r['id'] for r in spark.read.parquet(out2).collect()}
    assert picked <= set(range(6)) and len(picked) == 4

    out3 = str(tmp_path / 'merges.parquet')
    entrypoint(['tokenize', docs, out3, '--n-merges', '8'])
    m = spark.read.parquet(out3)
    assert m.count() == 8
    assert {'rank', 'left', 'right', 'merged', 'count'} <= set(m.columns)

    out4 = str(tmp_path / 'tokens.parquet')
    entrypoint(['tokenize', docs, out4, '--n-merges', '8', '--emit', 'tokens'])
    assert spark.read.parquet(out4).count() == 12


def test_fixenc_urlcanon_subcommands(spark, tmp_path):
    """Round-5 curation extensions: mojibake repair and URL
    canonicalization from the entrypoint."""
    from erde_spark.cli import entrypoint
    good = 'café ok'
    moji = good.encode('utf-8').decode('latin-1')
    src = str(tmp_path / 'docs.parquet')
    spark.createDataFrame(
        [(1, moji, 'HTTP://A.Example.com/x/?utm_source=z&q=1'),
         (2, 'plain', 'http://a.example.com/x?q=1')],
        'doc_id long, text string, url string') \
        .write.mode('overwrite').parquet(src)

    out = str(tmp_path / 'fixed.parquet')
    entrypoint(['fixenc', src, out])
    got = {r['doc_id']: r['text'] for r in spark.read.parquet(out).collect()}
    assert got[1] == good and got[2] == 'plain'

    out2 = str(tmp_path / 'canon.parquet')
    entrypoint(['urlcanon', src, out2])
    canon = {r['doc_id']: r['canon_url']
             for r in spark.read.parquet(out2).collect()}
    assert canon[1] == canon[2] == 'http://a.example.com/x?q=1'


def test_rotation_invariant_tool():
    """tools/check_rotation.py enforces the gate-rotation ledger
    mechanically: every oracled query is either driver-green in some
    recorded round or inside the current first-50 window, AND (round 9)
    the window is packed stalest-first within the K=4 freshness
    horizon."""
    import subprocess
    import sys
    r = subprocess.run([sys.executable, 'tools/check_rotation.py'],
                       capture_output=True, text=True, cwd='.')
    assert r.returncode == 0, r.stdout + r.stderr
    assert 'rotation invariants hold' in r.stdout
    assert 'stalest-first' in r.stdout


def test_boilerplate_robots_subcommands(spark, tmp_path):
    from erde_spark.cli import entrypoint
    src = str(tmp_path / 'docs.parquet')
    rows = [(i, 'Cookie banner line long\nunique body %d' % i,
             'http://h.example/%s' % ('private/x' if i % 2 else 'open'))
            for i in range(6)]
    spark.createDataFrame(rows, 'doc_id long, text string, url string') \
        .write.mode('overwrite').parquet(src)

    out = str(tmp_path / 'clean.parquet')
    entrypoint(['boilerplate', src, out, '--min-count', '3'])
    got = {r['doc_id']: r['text'] for r in spark.read.parquet(out).collect()}
    assert all(t.startswith('unique body') for t in got.values())

    rob = str(tmp_path / 'robots.parquet')
    spark.createDataFrame(
        [('h.example', 'User-agent: *\nDisallow: /private/')],
        'domain string, robots_txt string') \
        .write.mode('overwrite').parquet(rob)
    out2 = str(tmp_path / 'allowed.parquet')
    entrypoint(['robots', src, rob, out2])
    kept = sorted(r['doc_id'] for r in spark.read.parquet(out2).collect())
    assert kept == [0, 2, 4]


def test_capdomains_and_linededup_subcommands(spark, tmp_path):
    from erde_spark.cli import entrypoint
    src = str(tmp_path / 'docs.parquet')
    rows = [(i, 'nav bar\nbody %d\nnav bar' % i, 'd%d' % (i % 2))
            for i in range(40)]
    spark.createDataFrame(rows, 'doc_id long, text string, domain string') \
        .write.mode('overwrite').parquet(src)
    out = str(tmp_path / 'capped.parquet')
    entrypoint(['capdomains', src, out, '--cap', '5'])
    got = spark.read.parquet(out).collect()
    per = {}
    for r in got:
        per[r['domain']] = per.get(r['domain'], 0) + 1
    assert per == {'d0': 5, 'd1': 5}
    out2 = str(tmp_path / 'lines.parquet')
    entrypoint(['linededup', src, out2])
    texts = {r['doc_id']: r['text']
             for r in spark.read.parquet(out2).collect()}
    assert texts[3] == 'nav bar\nbody 3'


def test_langid_subcommand(spark, tmp_path):
    from erde_spark.cli import entrypoint
    from erde_spark.scale.langid import EVAL_SENTENCES
    src = str(tmp_path / 'docs.parquet')
    rows = [(0, EVAL_SENTENCES['de'][0]), (1, EVAL_SENTENCES['ja'][0]),
            (2, EVAL_SENTENCES['ar'][0]), (3, '')]
    spark.createDataFrame(rows, 'doc_id long, text string') \
        .write.mode('overwrite').parquet(src)
    out = str(tmp_path / 'tagged.parquet')
    entrypoint(['langid', src, out])
    got = {r['doc_id']: r['lang'] for r in spark.read.parquet(out).collect()}
    assert got == {0: 'de', 1: 'ja', 2: 'ar', 3: 'und'}


def test_langid_subcommand_overwrites_existing_lang(spark, tmp_path):
    """Regression (round-7 ADVICE): the documents contract already has
    a `lang` column — tagging must overwrite it, not emit a duplicate
    column that breaks the parquet write."""
    from erde_spark.cli import entrypoint
    from erde_spark.scale.langid import EVAL_SENTENCES
    src = str(tmp_path / 'docs.parquet')
    rows = [(0, EVAL_SENTENCES['de'][0], 'xx', 'web'),
            (1, EVAL_SENTENCES['fr'][0], 'yy', 'web')]
    spark.createDataFrame(
        rows, 'doc_id long, text string, lang string, source string') \
        .write.mode('overwrite').parquet(src)
    out = str(tmp_path / 'tagged.parquet')
    entrypoint(['langid', src, out])
    df = spark.read.parquet(out)
    assert df.columns.count('lang') == 1
    got = {r['doc_id']: (r['lang'], r['source']) for r in df.collect()}
    assert got == {0: ('de', 'web'), 1: ('fr', 'web')}


def test_bitext_subcommand(spark, tmp_path):
    """The bitext CLI mines planted exact translations between two
    embedding parquets (second positional input, numeric options)."""
    import numpy as np

    from erde_spark.cli import entrypoint
    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(12, 32))
    src = str(tmp_path / 'src.parquet')
    tgt = str(tmp_path / 'tgt.parquet')
    spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(8)],
        'vec_id long, embedding array<float>') \
        .write.mode('overwrite').parquet(src)
    spark.createDataFrame(
        [(100 + i, vecs[i].tolist()) for i in range(8)]
        + [(200 + j, rng.normal(size=32).tolist()) for j in range(4)],
        'vec_id long, embedding array<float>') \
        .write.mode('overwrite').parquet(tgt)
    out = str(tmp_path / 'mined.parquet')
    entrypoint(['bitext', src, tgt, out, '--k', '4',
                '--threshold', '1.5'])
    got = {(r['src_id'], r['tgt_id'])
           for r in spark.read.parquet(out).collect()}
    assert got == {(i, 100 + i) for i in range(8)}


def test_wds_and_tfexport_subcommands(spark, tmp_path):
    """The training-shard export subcommands write from the shell:
    wds emits tar shards readable by read_webdataset; tfexport emits
    CRC-framed TFRecords readable by read_tfrecord."""
    import glob

    from erde_spark.cli import entrypoint
    from erde_spark.io.tfrecord import read_tfrecord
    from erde_spark.io.wds import read_webdataset
    src = str(tmp_path / 'docs.parquet')
    spark.createDataFrame(
        [(i, f'document body {i}', i * 10) for i in range(12)],
        'doc_id long, text string, n_chars long') \
        .write.mode('overwrite').parquet(src)
    out1 = str(tmp_path / 'shards')
    entrypoint(['wds', src, out1, '--shard-size', '5'])
    assert glob.glob(out1 + '/*.tar')
    back = {int(r['key']): r['text'] for r in
            read_webdataset(spark, out1).collect()}
    assert back[3] == 'document body 3' and len(back) == 12
    out2 = str(tmp_path / 'tfr')
    entrypoint(['tfexport', src, out2])
    rows = {r['doc_id']: r for r in read_tfrecord(
        spark, out2, {'doc_id': ('int64', 'scalar'),
                      'text': ('bytes', 'scalar'),
                      'n_chars': ('int64', 'scalar')}).collect()}
    assert bytes(rows[7]['text']) == b'document body 7'
    assert rows[7]['n_chars'] == 70 and len(rows) == 12


def test_ppl_subcommand(spark, tmp_path):
    """The ppl CLI scores documents by n-gram LM perplexity (score
    table by default; filtered input with --max-perplexity; LM
    trainable on a separate --train-path corpus)."""
    from erde_spark.cli import entrypoint
    src = str(tmp_path / 'docs.parquet')
    rows = [(i, 'the cat sat on the mat again and again') for i in range(5)]
    rows.append((9, 'zxqv wjkp qqrr ttyy uuii ooppx'))
    spark.createDataFrame(rows, 'doc_id long, text string') \
        .write.mode('overwrite').parquet(src)

    scored = str(tmp_path / 'scored.parquet')
    entrypoint(['ppl', src, scored, '--n', '2', '--min-count', '1'])
    got = {r['doc_id']: r for r in spark.read.parquet(scored).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 9}
    assert all(got[i]['perplexity'] < got[9]['perplexity']
               for i in range(5))

    train = str(tmp_path / 'train.parquet')
    spark.createDataFrame(rows[:5], 'doc_id long, text string') \
        .write.mode('overwrite').parquet(train)
    cut = (got[0]['perplexity'] + got[9]['perplexity']) / 2
    kept = str(tmp_path / 'kept.parquet')
    entrypoint(['ppl', src, kept, '--n', '2', '--min-count', '1',
                '--train-path', train, '--max-perplexity', str(cut)])
    assert {r['doc_id'] for r in spark.read.parquet(kept).collect()} \
        == {0, 1, 2, 3, 4}


def test_megexport_and_shuffle_subcommands(spark, tmp_path):
    """megexport writes Megatron .bin/.idx pairs readable by
    read_megatron (dtype honored); shuffle writes a dense reproducible
    shuffle_pos column from the shell."""
    import glob

    from erde_spark.cli import entrypoint
    from erde_spark.io.megatron import read_megatron
    src = str(tmp_path / 'toks.parquet')
    spark.createDataFrame(
        [(i, list(range(i + 1))) for i in range(12)],
        'doc_id long, tokens array<long>') \
        .write.mode('overwrite').parquet(src)
    out1 = str(tmp_path / 'meg')
    entrypoint(['megexport', src, out1, '--dtype', 'uint16'])
    assert glob.glob(out1 + '/*.idx') and glob.glob(out1 + '/*.bin')
    sizes = sorted(len(r['tokens'])
                   for r in read_megatron(spark, out1).collect())
    assert sizes == list(range(1, 13))
    out2 = str(tmp_path / 'shuf.parquet')
    entrypoint(['shuffle', src, out2, '--id-column', 'doc_id',
                '--buckets', '8'])
    got = {r['doc_id']: r['shuffle_pos']
           for r in spark.read.parquet(out2).collect()}
    assert sorted(got.values()) == list(range(12))
    brute = {r['doc_id']: r['p'] - 1 for r in spark.read.parquet(src)
             .selectExpr('doc_id', 'row_number() over (order by '
                         'md5(cast(doc_id as string)), doc_id) as p')
             .collect()}
    assert got == brute


def test_unimax_subcommand(spark, tmp_path):
    """unimax from the shell: the capped group materializes exactly
    max-epochs copies per doc; the uncapped group gets its fractional
    md5 sample."""
    from erde_spark.cli import entrypoint
    src = str(tmp_path / 'docs.parquet')
    rows = [(i, 'small') for i in range(10)]
    rows += [(100 + i, 'big') for i in range(70)]
    spark.createDataFrame(rows, 'doc_id long, lang string') \
        .write.mode('overwrite').parquet(src)
    out = str(tmp_path / 'mixed.parquet')
    entrypoint(['unimax', src, '80', out,
                '--max-epochs', '2', '--materialize'])
    got = spark.read.parquet(out)
    small = got.where("lang = 'small'").groupBy('doc_id').count()
    assert {r['count'] for r in small.collect()} == {2}
    n_big = got.where("lang = 'big'").count()
    assert 0 < n_big < 70  # the 6/7 fractional epoch, sampled


def test_ppl_bucket_mode(spark, tmp_path):
    """ppl --bucket lands the CCNet head/middle/tail split from the
    shell: per-language terciles of the perplexity under the TRUSTED
    LM (--train-path, the CCNet design — a self-trained model rewards
    whatever repeats, including gibberish)."""
    from erde_spark.cli import entrypoint
    real = ['the cat sat on the mat', 'the dog sat on the mat',
            'a cat and a dog sat', 'the cat and the dog']
    trusted = str(tmp_path / 'trusted.parquet')
    spark.createDataFrame([(i, t) for i, t in enumerate(real)],
                          'doc_id long, text string') \
        .write.mode('overwrite').parquet(trusted)
    rows = [(i, 'en', real[i % 4]) for i in range(6)]
    rows += [(10 + i, 'en', 'zqx vbn mlp qwe rty uio wer')
             for i in range(3)]
    src = str(tmp_path / 'docs.parquet')
    spark.createDataFrame(rows, 'doc_id long, lang string, text string') \
        .write.mode('overwrite').parquet(src)
    out = str(tmp_path / 'b.parquet')
    entrypoint(['ppl', src, out, '--bucket', '--n', '2',
                '--train-path', trusted])
    got = {r['doc_id']: r['ppl_bucket']
           for r in spark.read.parquet(out).collect()}
    assert len(got) == 9 and set(got.values()) == {'head', 'middle', 'tail'}
    # OOV gibberish under the trusted LM lands in the tail tercile
    assert all(got[10 + i] == 'tail' for i in range(3))


def test_fim_and_entropy_subcommands(spark, tmp_path):
    """fim rewrites the md5-selected fraction as reconstructible
    PSM triples from the shell; entropy appends the zlib ratio and
    --filter-rows keeps only the in-band documents."""
    from erde_spark.cli import entrypoint
    src = str(tmp_path / 'docs.parquet')
    rows = [(i, f'document {i} where sentence number {j} talks about '
             f'topic {(i * 7 + j) % 5} in ordinary prose. '
             * 1 + ' '.join(f'word{(i * 13 + k) % 97}'
                            for k in range(60)))
            for i, j in ((i, i % 3) for i in range(20))]
    rows.append((99, 'repeat me ' * 300))
    spark.createDataFrame(rows, 'doc_id long, text string') \
        .write.mode('overwrite').parquet(src)
    out1 = str(tmp_path / 'fim.parquet')
    entrypoint(['fim', src, out1, '--rate', '1.0'])
    for r in spark.read.parquet(out1).collect():
        assert r['fim_applied'] is True
        p, rest = r['fim_text'][5:].split('<SUF>', 1)
        s, m = rest.split('<MID>', 1)
        assert p + m + s == r['text']
    out2 = str(tmp_path / 'ratio.parquet')
    entrypoint(['entropy', src, out2])
    got = {r['doc_id']: r['compression_ratio']
           for r in spark.read.parquet(out2).collect()}
    assert got[99] > 12.0 and all(v < 12.0 for k, v in got.items()
                                  if k != 99)
    out3 = str(tmp_path / 'kept.parquet')
    entrypoint(['entropy', src, out3, '--filter-rows'])
    kept = {r['doc_id'] for r in spark.read.parquet(out3).collect()}
    assert 99 not in kept and len(kept) == 20


def test_chat_subcommand_modes(spark, tmp_path):
    """chat from the shell: render (default), --spans (loss mask),
    --validate (structural filter), --max-chars (whole-turn tail
    truncation before the other modes)."""
    from erde_spark.cli import entrypoint
    src = str(tmp_path / 'convs.parquet')
    good = [{'role': 'user', 'content': 'question one'},
            {'role': 'assistant', 'content': 'answer one'},
            {'role': 'user', 'content': 'question two'},
            {'role': 'assistant', 'content': 'answer two'}]
    bad = [{'role': 'assistant', 'content': 'starts wrong'}]
    spark.createDataFrame(
        [(1, good), (2, bad)],
        'conv_id long, turns array<struct<role:string,content:string>>') \
        .write.mode('overwrite').parquet(src)
    out1 = str(tmp_path / 'rendered.parquet')
    entrypoint(['chat', src, out1])
    r1 = {r['conv_id']: r['rendered']
          for r in spark.read.parquet(out1).collect()}
    assert r1[1].startswith('<|im_start|>user\nquestion one<|im_end|>\n')
    out2 = str(tmp_path / 'spans.parquet')
    entrypoint(['chat', src, out2, '--spans'])
    spans = [(r['conv_id'], r['turn_idx'])
             for r in spark.read.parquet(out2).collect()]
    assert sorted(spans) == [(1, 1), (1, 3), (2, 0)]
    out3 = str(tmp_path / 'valid.parquet')
    entrypoint(['chat', src, out3, '--validate'])
    assert [r['conv_id'] for r in
            spark.read.parquet(out3).collect()] == [1]
    out4 = str(tmp_path / 'trunc.parquet')
    # final pair renders to 40 + 43 = 83 chars; 90 keeps exactly it
    entrypoint(['chat', src, out4, '--max-chars', '90', '--spans'])
    got = [(r['conv_id'], r['turn_idx'])
           for r in spark.read.parquet(out4).collect()]
    assert sorted(got) == [(1, 1), (2, 0)]


def test_spancorrupt_subcommand(spark, tmp_path):
    """spancorrupt from the shell appends inputs/targets columns."""
    from erde_spark.cli import entrypoint
    src = str(tmp_path / 'd.parquet')
    spark.createDataFrame(
        [(1, ' '.join(f'tok{k}' for k in range(40)))],
        'doc_id long, text string').write.mode('overwrite').parquet(src)
    out = str(tmp_path / 'sc.parquet')
    entrypoint(['spancorrupt', src, out, '--noise-density', '0.2'])
    r = spark.read.parquet(out).collect()[0]
    assert '<extra_id_0>' in r['inputs'] and '<extra_id_0>' in r['targets']


def test_ul2_subcommand(spark, tmp_path):
    """ul2 from the shell: denoiser assignment + tagged inputs."""
    from erde_spark.cli import entrypoint
    src = str(tmp_path / 'd.parquet')
    spark.createDataFrame(
        [(i, ' '.join(f'tok{i}x{k}' for k in range(25)))
         for i in range(30)],
        'doc_id long, text string').write.mode('overwrite').parquet(src)
    out = str(tmp_path / 'ul2.parquet')
    entrypoint(['ul2', src, out, '--s-weight', '1.0',
                '--r-weight', '0', '--x-weight', '0'])
    rows = spark.read.parquet(out).collect()
    assert all(r['denoiser'] == 'S' for r in rows)
    assert all(r['inputs'].startswith('[S2S]') for r in rows)


def test_semdedup_wsample_subcommands(spark, tmp_path):
    """Round-10 CLI additions end-to-end from the entrypoint."""
    import numpy as np

    from erde_spark.cli import entrypoint
    rng = np.random.RandomState(3)
    base = rng.normal(size=(40, 8))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in (base[i - 1] if i % 4 == 1 else base[i])])
            for i in range(40)]
    src = str(tmp_path / 'emb.parquet')
    spark.createDataFrame(rows, 'vec_id long, embedding array<double>') \
        .write.parquet(src)
    out = str(tmp_path / 'kept.parquet')
    entrypoint(['semdedup', src, out, '--threshold', '0.99',
                '--keep', 'min'])
    kept = sorted(r['vec_id'] for r in spark.read.parquet(out).collect())
    assert kept == [i for i in range(40) if i % 4 != 1]

    docs = str(tmp_path / 'd.parquet')
    spark.range(100).selectExpr('id AS doc_id',
                                'CAST(id % 3 + 1 AS DOUBLE) AS w') \
        .write.parquet(docs)
    out2 = str(tmp_path / 'sample.parquet')
    entrypoint(['wsample', docs, '20', 'w', out2])
    got = spark.read.parquet(out2)
    assert got.count() == 20 and 'doc_id' in got.columns


def test_zarrexport_subcommand(spark, tmp_path):
    """zarrexport (r12: the last training-export format without a CLI
    mirror) writes a Zarr v2 array directory readable by read_zarr;
    --compressor none round-trips uncompressed."""
    import glob

    from erde_spark.cli import entrypoint
    from erde_spark.io.zarr import read_zarr
    src = str(tmp_path / 'emb.parquet')
    spark.createDataFrame(
        [(i, [float(i), float(i * 2)]) for i in range(10)],
        'vec_id long, emb array<double>') \
        .coalesce(1).write.mode('overwrite').parquet(src)
    out = str(tmp_path / 'z')
    entrypoint(['zarrexport', src, out, '--value-column', 'emb',
                '--chunk-rows', '4', '--compressor', 'none'])
    assert glob.glob(out + '/.zarray')
    back = read_zarr(out, spark).orderBy('row_id').collect()
    assert len(back) == 10
    assert sorted(tuple(r['value']) for r in back) == \
        sorted((float(i), float(i * 2)) for i in range(10))


def test_snapshot_subcommand(spark, tmp_path, capsys):
    """snapshot (r12): the manifest dataset's control-plane verbs from
    the shell; the data plane goes through any subcommand's normal
    paths because the facade dispatches *.mparquet."""
    import json

    from erde_spark.cli import entrypoint
    from erde_spark.io import read_df, write_df
    ds = str(tmp_path / 'd.mparquet')
    df = spark.range(30).selectExpr('id AS doc_id',
                                    'CAST(id AS STRING) AS text')
    write_df(df, ds)
    # appended rows: fresh ids, duplicated texts (exact-dedup fodder)
    write_df(df.filter('doc_id < 5')
             .selectExpr('doc_id + 100 AS doc_id', 'text'), ds,
             mode='append')
    out = entrypoint(['snapshot', ds])
    assert out['version'] == 2 and out['total_rows'] == 35
    vs = entrypoint(['snapshot', ds, '--action', 'versions'])
    assert [v['version'] for v in vs] == [1, 2]
    printed = capsys.readouterr().out.strip().splitlines()
    assert json.loads(printed[0])['total_rows'] == 35
    removed = entrypoint(['snapshot', ds, '--action', 'vacuum',
                          '--keep-last', '1'])
    assert removed['removed'] == []  # append: v2 references v1's files
    assert read_df(ds, spark).count() == 35
    # the data plane through another subcommand: dedup reads/writes
    # the manifest format via the facade
    out2 = str(tmp_path / 'kept.mparquet')
    entrypoint(['dedup', ds, out2, '--strategy', 'exact',
                '--text-column', 'text'])
    assert read_df(out2, spark).count() == 30


def test_snapshot_compact_action(spark, tmp_path):
    """snapshot --action compact rewrites the small files as a new
    snapshot from the shell."""
    from erde_spark.cli import entrypoint
    from erde_spark.io import read_df, write_df
    from erde_spark.io.manifest import manifest_planned_files
    ds = str(tmp_path / 'd.mparquet')
    df = spark.range(40).selectExpr('id AS doc_id',
                                    'CAST(id AS STRING) AS text')
    write_df(df.filter('doc_id < 20').coalesce(1), ds)
    write_df(df.filter('doc_id >= 20').coalesce(1), ds, mode='append')
    out = entrypoint(['snapshot', ds, '--action', 'compact'])
    assert out['version'] == 3
    assert len(manifest_planned_files(ds)) == 1
    assert read_df(ds, spark).count() == 40
