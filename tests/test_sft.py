"""Conversation/SFT prep (erde_spark.scale.sft) + the round-9 text
additions (fim_transform, compression_ratio)."""

import pyspark.sql.functions as F
import pytest

from erde_spark.scale.sft import (CHAT_TEMPLATES, assistant_spans,
                                  render_chat, truncate_turns,
                                  turn_offsets, validate_turns)
from erde_spark.scale.text import (compression_filter, compression_ratio,
                                   fim_transform)


def _conv(spark, turns, conv_id=1):
    return spark.createDataFrame(
        [(conv_id, [{'role': r, 'content': c} for r, c in turns])],
        'conv_id long, turns array<struct<role:string,content:string>>')


TURNS = [('system', 'Be terse.'), ('user', 'Hi there'),
         ('assistant', 'Hello!'), ('user', 'Bye'),
         ('assistant', 'See you.')]


class TestRenderChat:
    def test_chatml_exact(self, spark):
        out = render_chat(_conv(spark, TURNS[:3])).collect()[0]
        assert out.rendered == (
            '<|im_start|>system\nBe terse.<|im_end|>\n'
            '<|im_start|>user\nHi there<|im_end|>\n'
            '<|im_start|>assistant\nHello!<|im_end|>\n')

    def test_plain_template(self, spark):
        out = render_chat(_conv(spark, TURNS[1:3]),
                          template='plain').collect()[0]
        assert out.rendered == ('### user: Hi there\n'
                                '### assistant: Hello!\n')

    def test_null_turns(self, spark):
        df = spark.createDataFrame(
            [(1, None)],
            'conv_id long, turns array<struct<role:string,content:string>>')
        assert render_chat(df).collect()[0].rendered is None

    def test_unknown_template(self, spark):
        with pytest.raises(ValueError, match='unknown chat template'):
            render_chat(_conv(spark, TURNS), template='nope')


class TestSpans:
    @pytest.mark.parametrize('template', ['chatml', 'plain'])
    def test_spans_extract_content(self, spark, template):
        df = _conv(spark, TURNS)
        rendered = render_chat(df, template=template) \
            .collect()[0].rendered
        rows = turn_offsets(df, template=template).orderBy(
            'turn_idx').collect()
        assert [r.turn_idx for r in rows] == list(range(5))
        for r, (role, content) in zip(rows, TURNS):
            assert r.role == role
            assert rendered[r.start:r.end] == content

    def test_assistant_only(self, spark):
        rows = assistant_spans(_conv(spark, TURNS)).orderBy(
            'turn_idx').collect()
        assert [r.turn_idx for r in rows] == [2, 4]
        assert all(r.role == 'assistant' for r in rows)

    def test_offsets_are_full_rendering_indices(self, spark):
        # filtering to assistant must NOT renumber/re-offset
        df = _conv(spark, TURNS)
        allr = {r.turn_idx: (r.start, r.end)
                for r in turn_offsets(df).collect()}
        subr = {r.turn_idx: (r.start, r.end)
                for r in assistant_spans(df).collect()}
        assert subr == {k: allr[k] for k in (2, 4)}


class TestValidate:
    @pytest.mark.parametrize('turns,ok', [
        ([('user', 'a'), ('assistant', 'b')], True),
        ([('system', 's'), ('user', 'a'), ('assistant', 'b')], True),
        ([('user', 'a'), ('assistant', 'b'), ('user', 'c')], True),
        ([('system', 's')], False),           # no non-system turn
        ([('assistant', 'b')], False),        # starts with assistant
        ([('user', 'a'), ('user', 'b')], False),    # no alternation
        ([('user', 'a'), ('system', 's')], False),  # system not first
        ([('system', 's'), ('system', 's2'),
          ('user', 'a')], False),             # two systems
        ([('tool', 'x'), ('assistant', 'b')], False),  # unknown role
        ([('user', ''), ('assistant', 'b')], False),   # empty content
        ([('user', None), ('assistant', 'b')], False),  # null content
        ([], False),
    ])
    def test_cases(self, spark, turns, ok):
        got = validate_turns(_conv(spark, turns)).collect()[0].turns_valid
        assert got is ok, (turns, got)

    def test_null_array(self, spark):
        df = spark.createDataFrame(
            [(1, None)],
            'conv_id long, turns array<struct<role:string,content:string>>')
        assert validate_turns(df).collect()[0].turns_valid is False


def _rlen(role, content, template='chatml'):
    t = CHAT_TEMPLATES[template]
    return len(t.head) + len(role) + len(t.sep) + len(content) + len(t.tail)


class TestTruncate:
    def test_fits_all(self, spark):
        out = truncate_turns(_conv(spark, TURNS), max_chars=10_000) \
            .collect()[0].turns_kept
        assert [(t.role, t.content) for t in out] == TURNS

    def test_tail_kept(self, spark):
        budget = (_rlen('system', 'Be terse.') + _rlen('user', 'Bye')
                  + _rlen('assistant', 'See you.'))
        out = truncate_turns(_conv(spark, TURNS), max_chars=budget) \
            .collect()[0].turns_kept
        assert [(t.role, t.content) for t in out] == [
            ('system', 'Be terse.'), ('user', 'Bye'),
            ('assistant', 'See you.')]

    def test_contiguity_latch(self, spark):
        # [user tiny, assistant BIG, user mid] with budget = mid + tiny:
        # mid fits, BIG fails and latches, the tiny first turn would
        # fit but must NOT be taken (kept turns must stay contiguous)
        turns = [('user', 'y'), ('assistant', 'x' * 100),
                 ('user', 'z' * 50)]
        budget = _rlen('user', 'z' * 50) + _rlen('user', 'y')
        out = truncate_turns(_conv(spark, turns), max_chars=budget,
                             keep_system=False).collect()[0].turns_kept
        assert [(t.role, t.content) for t in out] == [('user', 'z' * 50)]

    def test_no_system_to_keep(self, spark):
        out = truncate_turns(_conv(spark, TURNS[1:]),
                             max_chars=_rlen('assistant', 'See you.')) \
            .collect()[0].turns_kept
        assert [(t.role, t.content) for t in out] == [
            ('assistant', 'See you.')]

    def test_system_always_kept(self, spark):
        out = truncate_turns(_conv(spark, TURNS), max_chars=0) \
            .collect()[0].turns_kept
        assert [(t.role, t.content) for t in out] == [
            ('system', 'Be terse.')]

    def test_negative_budget_raises(self, spark):
        with pytest.raises(ValueError):
            truncate_turns(_conv(spark, TURNS), max_chars=-1)


class TestFim:
    def _docs(self, spark):
        rows = [(i, f'doc {i} body text with some length {i * 7}')
                for i in range(40)]
        return spark.createDataFrame(rows, 'doc_id long, text string')

    def test_reconstructible(self, spark):
        out = fim_transform(self._docs(spark), rate=1.0).collect()
        for r in out:
            assert r.fim_applied is True
            body = r.fim_text
            assert body.startswith('<PRE>')
            p, rest = body[5:].split('<SUF>', 1)
            s, m = rest.split('<MID>', 1)
            assert p + m + s == r.text

    def test_spm_mode(self, spark):
        out = fim_transform(self._docs(spark), rate=1.0,
                            mode='spm').collect()
        for r in out:
            assert r.fim_text.startswith('<SUF>')
            s, rest = r.fim_text[5:].split('<PRE>', 1)
            p, m = rest.split('<MID>', 1)
            assert p + m + s == r.text

    def test_rate_zero_untouched(self, spark):
        out = fim_transform(self._docs(spark), rate=0.0).collect()
        assert all(r.fim_text == r.text and r.fim_applied is False
                   for r in out)

    def test_rate_selects_subset(self, spark):
        out = fim_transform(self._docs(spark), rate=0.5).collect()
        applied = sum(r.fim_applied for r in out)
        assert 0 < applied < len(out)
        for r in out:
            assert (r.fim_text != r.text) == r.fim_applied or \
                r.text.startswith('<PRE>')

    def test_empty_and_null(self, spark):
        df = spark.createDataFrame([(1, ''), (2, None)],
                                   'doc_id long, text string')
        rows = {r.doc_id: r for r in
                fim_transform(df, rate=1.0).collect()}
        assert rows[1].fim_text == '<PRE><SUF><MID>'
        assert rows[2].fim_text is None
        assert rows[2].fim_applied is None

    def test_deterministic_across_partitioning(self, spark):
        d = self._docs(spark)
        a = sorted((r.doc_id, r.fim_text) for r in
                   fim_transform(d, rate=0.7).collect())
        b = sorted((r.doc_id, r.fim_text) for r in
                   fim_transform(d.repartition(7), rate=0.7).collect())
        assert a == b

    def test_bad_mode(self, spark):
        with pytest.raises(ValueError):
            fim_transform(self._docs(spark), mode='pms')


class TestCompression:
    def test_ratio_separates_classes(self, spark):
        import hashlib
        chain, h = [], b'seed'
        for _ in range(16):
            h = hashlib.md5(h).digest()
            chain.append(h.hex())
        df = spark.createDataFrame(
            [(1, 'spark rows and tables ' * 40),
             (2, ''.join(chain)),
             (3, ''), (4, None)],
            'doc_id long, text string')
        rows = {r.doc_id: r.compression_ratio
                for r in compression_ratio(df).collect()}
        assert rows[1] > 8.0         # repetition compresses hugely
        assert rows[2] < 3.0         # hex chain stays near-incompressible
        assert rows[3] == 0.0
        assert rows[4] is None

    def test_filter_band(self, spark):
        df = spark.createDataFrame(
            [(1, 'the quick brown fox jumps over the lazy dog and '
              'then writes a perfectly ordinary paragraph about it'),
             (2, 'boilerplate line\n' * 400), (3, None)],
            'doc_id long, text string')
        kept = [r.doc_id for r in
                compression_filter(df, min_ratio=1.1,
                                   max_ratio=12.0).collect()]
        assert kept == [1]

    def test_keep_ratio_column(self, spark):
        df = spark.createDataFrame(
            [(1, 'a perfectly ordinary sentence that deflate can '
              'squeeze only modestly, like real prose')],
            'doc_id long, text string')
        out = compression_filter(df, keep_ratio=True).collect()[0]
        assert 1.0 < out.compression_ratio < 3.0


class TestFimUnicode:
    def test_reconstruction_on_adversarial_unicode(self, spark):
        """p + m + s == text must hold at CODEPOINT granularity for any
        input: combining marks, non-BMP emoji (UTF-16 surrogate pairs —
        the classic off-by-one source), CJK, RTL, zero-width joiners,
        newlines and quotes. One Spark job over the whole corpus."""
        pieces = ['café', '\U0001f600\U0001f680', 'NUL\x00byte',
                  '你好世界', 'שלום',
                  'a‍​b', 'line\nbreak\ttab', '"quoted"',
                  'x' * 3, '', '\U0001f1fa\U0001f1f8']
        texts = []
        for i in range(200):
            t = ''.join(pieces[(i + k) % len(pieces)]
                        for k in range(i % 7 + 1))
            texts.append((i, t))
        df = spark.createDataFrame(texts, 'doc_id long, text string')
        out = fim_transform(df, rate=1.0).collect()
        assert len(out) == 200
        for r in out:
            p, rest = r.fim_text[5:].split('<SUF>', 1)
            s, m = rest.split('<MID>', 1)
            assert p + m + s == r.text, r.doc_id

    def test_truncate_invariants_bulk(self, spark):
        """For a spread of budgets: kept is a contiguous TAIL of the
        input (after the optional system head), its rendered length
        fits the budget, and adding one more turn would overflow."""
        turns = [('system', 'sys')] + [
            ('user' if j % 2 == 0 else 'assistant', 'c' * (j % 17 + 1))
            for j in range(12)]
        df = _conv(spark, turns)
        rendered = [_rlen(r, c) for r, c in turns]
        for budget in range(0, sum(rendered) + 30, 13):
            kept = truncate_turns(df, max_chars=budget) \
                .collect()[0].turns_kept
            got = [(t.role, t.content) for t in kept]
            assert got[0] == turns[0]          # system always kept
            body = got[1:]
            assert body == turns[len(turns) - len(body):]  # contiguous tail
            used = sum(_rlen(r, c) for r, c in got)
            if body != turns[1:]:              # something was dropped
                nxt = turns[len(turns) - len(body) - 1]
                assert used + _rlen(*nxt) > budget
            if len(got) > 1:
                assert used <= max(budget, _rlen(*turns[0]))


class TestBind:
    def test_bind_evaluates_once_per_row(self, spark):
        """bind() must return body(value) exactly and keep nulls sane."""
        from pyspark.sql import functions as F

        from erde_spark.functions.bind import bind
        df = spark.createDataFrame([(1, 'ab'), (2, None)],
                                   'i long, s string')
        out = df.select('i', bind(
            F.upper('s'),
            lambda v: F.concat(v, F.lit('/'), v)).alias('x')).collect()
        got = {r.i: r.x for r in out}
        assert got == {1: 'AB/AB', 2: None}


class TestSpanCorrupt:
    def _docs(self, spark):
        rows = [(i, ' '.join(f'tok{i}x{k}' for k in range(i % 50 + 1)))
                for i in range(60)] + [(100, ''), (101, None)]
        # multibyte text: the alnum tokenizer strips CJK/accents by
        # design; reconstruction must still hold on the TOKEN stream
        rows.append((102, '你好 café 世界 b2 ' * 10))
        return spark.createDataFrame(rows, 'doc_id long, text string')

    def test_reconstructible(self, spark):
        """Merging inputs and targets at the sentinels reproduces the
        exact token stream for every document."""
        from erde_spark.scale.text import span_corrupt, tokens
        import re
        import pyspark.sql.functions as F
        out = span_corrupt(self._docs(spark)).withColumn(
            '_toks', tokens(F.col('text'))).collect()
        for r in out:
            if not r.text:
                assert r.inputs == '' and r.targets == ''
                continue
            spans = {}
            for m in re.finditer(r'<extra_id_(\d+)> ([^<]*)', r.targets + ' '):
                spans[int(m.group(1))] = m.group(2).strip()
            rebuilt = re.sub(r'<extra_id_(\d+)>',
                             lambda m: spans[int(m.group(1))], r.inputs)
            assert rebuilt.split() == list(r._toks), r.doc_id

    def test_density_and_span_stats(self, spark):
        from erde_spark.scale.text import span_corrupt
        text = ' '.join(f'w{k}' for k in range(1000))
        df = spark.createDataFrame([(1, text)], 'doc_id long, text string')
        r = span_corrupt(df, noise_density=0.15, mean_span=3.0).collect()[0]
        corrupted = len(r.targets.split()) - r.targets.count('<extra_id_')
        assert 120 <= corrupted <= 180          # ~15% of 1000
        n_spans = r.targets.count('<extra_id_')
        assert 40 <= n_spans <= 60              # ~mean span 3

    def test_deterministic_and_salted(self, spark):
        from erde_spark.scale.text import span_corrupt
        d = self._docs(spark)
        a = sorted((r.doc_id, r.inputs) for r in span_corrupt(d).collect())
        b = sorted((r.doc_id, r.inputs)
                   for r in span_corrupt(d.repartition(5)).collect())
        assert a == b
        c = sorted((r.doc_id, r.inputs)
                   for r in span_corrupt(d, salt='ep2').collect())
        assert a != c  # a new salt re-draws the spans

    def test_bad_params(self, spark):
        from erde_spark.scale.text import span_corrupt
        import pytest as _pytest
        with _pytest.raises(ValueError):
            span_corrupt(self._docs(spark), noise_density=0.0)
        with _pytest.raises(ValueError):
            span_corrupt(self._docs(spark), mean_span=0.5)


class TestUl2Mix:
    def _docs(self, spark):
        rows = [(i, ' '.join(f'w{i}x{k}' for k in range(i % 40 + 1)))
                for i in range(80)]
        return spark.createDataFrame(rows, 'doc_id long, text string')

    def test_all_denoisers_present_and_tagged(self, spark):
        from erde_spark.scale.text import ul2_mix
        out = ul2_mix(self._docs(spark)).collect()
        seen = {r.denoiser for r in out}
        assert seen == {'R', 'S', 'X'}
        tags = {'R': '[NLU]', 'S': '[S2S]', 'X': '[NLG]'}
        for r in out:
            assert r.inputs.startswith(tags[r.denoiser]), r.doc_id

    def test_s_branch_reconstructs(self, spark):
        from erde_spark.scale.text import ul2_mix
        for r in ul2_mix(self._docs(spark)).collect():
            if r.denoiser == 'S':
                assert (r.inputs.split()[1:] + r.targets.split()
                        == r.text.split()), r.doc_id

    def test_x_denser_than_r(self, spark):
        from erde_spark.scale.text import ul2_mix
        # force all docs through each branch via weights
        d = self._docs(spark)
        r_only = ul2_mix(d, r_weight=1, s_weight=0, x_weight=0).collect()
        x_only = ul2_mix(d, r_weight=0, s_weight=0, x_weight=1).collect()
        def corrupt_frac(rows):
            tot = cor = 0
            for r in rows:
                n = len(r.text.split())
                c = len(r.targets.split()) - r.targets.count('<extra_id_')
                tot += n; cor += c
            return cor / tot
        fr, fx = corrupt_frac(r_only), corrupt_frac(x_only)
        assert fr < 0.3 < fx            # ~0.15 vs ~0.5

    def test_weights_partition(self, spark):
        from erde_spark.scale.text import ul2_mix
        out = ul2_mix(self._docs(spark), r_weight=0, s_weight=1,
                      x_weight=0).collect()
        assert all(r.denoiser == 'S' for r in out)

    def test_bad_weights(self, spark):
        import pytest as _pytest
        from erde_spark.scale.text import ul2_mix
        with _pytest.raises(ValueError):
            ul2_mix(self._docs(spark), r_weight=0, s_weight=0,
                    x_weight=0)
