"""URI (object-store) two-phase commit branch for every training sink
(r11 verdict ask #2 — finish the protocol io/zst.py pioneered).

Every test writes to a ``file://`` URI: ``pyarrow.fs.FileSystem.from_uri``
maps it to LocalFileSystem, so the IDENTICAL code path s3:// / gs:// /
hdfs:// destinations take — open the ``.inprogress``/``.staged`` temp
object, VERIFY it landed whole, then ``fs.move`` onto the final name
(one atomic PUT) — runs end-to-end in-container. Each test pins:

* round-trip fidelity through the URI branch,
* no leftover staging objects after commit,
* mode='error' raising through the pyarrow.fs prologue.

The zst sink's equivalent test lives in test_io.py (r10); the zarr
sink's in test_zarr.py (r11). This file covers the r12 ports:
wds / tfrecord / arrow shards / megatron / npy / safetensors / avro.
"""
import glob
import os

import pytest
from pyspark.sql import functions as F


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col('id').alias('doc_id'),
        F.md5(F.col('id').cast('string')).alias('text'))


def _no_staging(local_dir):
    left = [f for f in glob.glob(os.path.join(local_dir, '**'),
                                 recursive=True)
            if f.endswith('.inprogress') or f.endswith('.staged')]
    assert not left, left


class TestWdsUri:
    def test_roundtrip_and_two_phase(self, spark, tmp_path):
        from erde_spark.io.wds import read_webdataset, write_webdataset
        local = str(tmp_path / 'w')
        write_webdataset(_docs(spark), 'file://' + local, shard_size=25)
        assert glob.glob(local + '/shard-*.tar')
        _no_staging(local)
        back = read_webdataset(spark, local)
        assert back.count() == 60
        with pytest.raises(FileExistsError):
            write_webdataset(_docs(spark), 'file://' + local,
                             mode='error')

    def test_tar_bytes_match_local_branch(self, spark, tmp_path):
        """The streamed ('w|') tar written through the URI branch and
        the seekable ('w') tar written locally are byte-identical —
        deterministic member headers are the format contract."""
        from erde_spark.io.wds import write_webdataset
        d = _docs(spark, 10).coalesce(1)
        write_webdataset(d, 'file://' + str(tmp_path / 'u'))
        write_webdataset(d, str(tmp_path / 'l'))
        u = open(glob.glob(str(tmp_path / 'u') + '/*.tar')[0], 'rb').read()
        loc = open(glob.glob(str(tmp_path / 'l') + '/*.tar')[0], 'rb').read()
        assert u == loc


class TestTfrecordUri:
    def test_roundtrip_and_two_phase(self, spark, tmp_path):
        from erde_spark.io.tfrecord import read_tfrecord, write_tfrecord
        local = str(tmp_path / 't')
        write_tfrecord(_docs(spark), 'file://' + local, shard_size=25)
        assert glob.glob(local + '/part-*.tfrecord')
        _no_staging(local)
        back = read_tfrecord(spark, local,
                             columns={'doc_id': ('int64', 'scalar'),
                                      'text': ('bytes', 'scalar')})
        assert back.count() == 60
        with pytest.raises(FileExistsError):
            write_tfrecord(_docs(spark), 'file://' + local, mode='error')


class TestArrowUri:
    def test_roundtrip_and_two_phase(self, spark, tmp_path):
        from erde_spark.io.arrow_shards import (read_arrow_shards,
                                                write_arrow_shards)
        local = str(tmp_path / 'a')
        write_arrow_shards(_docs(spark), 'file://' + local,
                           shard_size=25)
        assert glob.glob(local + '/part-*.arrow')
        _no_staging(local)
        back = read_arrow_shards(spark, local)
        assert back.count() == 60
        assert {r['doc_id'] for r in back.collect()} == set(range(60))
        with pytest.raises(FileExistsError):
            write_arrow_shards(_docs(spark), 'file://' + local,
                               mode='error')


class TestMegatronUri:
    def test_roundtrip_and_two_phase(self, spark, tmp_path):
        from erde_spark.io.megatron import read_megatron, write_megatron
        local = str(tmp_path / 'm')
        df = spark.range(40).select(
            F.array(F.col('id'), F.col('id') * 2,
                    F.col('id') + 7).alias('tokens'))
        write_megatron(df, 'file://' + local, dtype='int32')
        assert glob.glob(local + '/part-*.bin')
        assert glob.glob(local + '/part-*.idx')
        _no_staging(local)
        back = read_megatron(spark, local)
        assert back.count() == 40
        got = {tuple(r['tokens']) for r in back.collect()}
        assert (0, 0, 7) in got and (39, 78, 46) in got
        with pytest.raises(FileExistsError):
            write_megatron(df, 'file://' + local, mode='error')


class TestNpyUri:
    def test_roundtrip_exact_size_verify(self, spark, tmp_path):
        from erde_spark.io.npy import read_npy, write_npy
        local = str(tmp_path / 'n')
        df = spark.range(30).select(
            F.array(F.col('id').cast('double'),
                    (F.col('id') * 2).cast('double')).alias('value'))
        write_npy(df.coalesce(2), 'file://' + local)
        assert glob.glob(local + '/part-*.npy')
        _no_staging(local)
        back = read_npy(local, spark)
        assert back.count() == 30
        import numpy as np
        a = np.load(glob.glob(local + '/part-*.npy')[0])
        assert a.ndim == 2 and a.shape[1] == 2
        with pytest.raises(FileExistsError):
            write_npy(df, 'file://' + local, mode='error')


class TestSafetensorsUri:
    def test_roundtrip_and_driver_publish(self, spark, tmp_path):
        from erde_spark.io.safetensors import (read_safetensors,
                                               write_safetensors)
        local = str(tmp_path / 's')
        df = spark.range(30).select(
            F.array(F.col('id').cast('float'),
                    (F.col('id') + 1).cast('float')).alias('value'))
        write_safetensors(df.coalesce(2), 'file://' + local)
        shards = glob.glob(local + '/model-*.safetensors')
        assert shards
        assert os.path.exists(
            os.path.join(local, 'model.safetensors.index.json'))
        _no_staging(local)
        back = read_safetensors(local, spark)
        assert back.count() == 30
        # index total_size equals the published shard bytes
        import json
        idx = json.load(open(
            os.path.join(local, 'model.safetensors.index.json')))
        assert idx['metadata']['total_size'] == \
            sum(os.path.getsize(s) for s in shards)
        with pytest.raises(FileExistsError):
            write_safetensors(df, 'file://' + local, mode='error')


class TestAvroUri:
    def test_roundtrip_and_two_phase(self, spark, tmp_path):
        from erde_spark.io.avro_ocf import read_avro, write_avro
        local = str(tmp_path / 'v.avro')
        write_avro(_docs(spark), 'file://' + local)
        assert glob.glob(local + '/part-*.avro')
        _no_staging(local)
        assert read_avro(spark, 'file://' + local).count() == 60
        with pytest.raises(FileExistsError):
            write_avro(_docs(spark), 'file://' + local, mode='error')

    def test_empty_frame_header_only_shard_via_uri(self, spark, tmp_path):
        from erde_spark.io.avro_ocf import read_avro, write_avro
        local = str(tmp_path / 'e.avro')
        write_avro(_docs(spark).filter(F.lit(False)),
                   'file://' + local)
        back = read_avro(spark, local)
        assert back.count() == 0
        assert set(back.columns) == {'doc_id', 'text'}


class TestAvroUnionSchema:
    def test_evolved_lake_keeps_new_columns(self, spark, tmp_path):
        """ADVICE r11 (medium): a schema-evolved directory where the
        OLDER, NARROWER file sorts first must not silently drop the
        newer file's added column — the reader schema is the union."""
        import shutil
        from erde_spark.io.avro_ocf import read_avro, write_avro
        d = str(tmp_path / 'lake.avro')
        old = spark.createDataFrame([(1, 'x')], 'id long, s string')
        new = spark.createDataFrame([(2, 'y', 9.5)],
                                    'id long, s string, score double')
        write_avro(old.coalesce(1), d)
        first = glob.glob(d + '/*.avro')[0]
        shutil.move(first, d + '/part-aaa.avro')
        write_avro(new.coalesce(1), str(tmp_path / 'n.avro'))
        shutil.copy(glob.glob(str(tmp_path / 'n.avro') + '/*.avro')[0],
                    d + '/part-zzz.avro')
        back = read_avro(spark, d)
        assert 'score' in back.columns
        rows = {r['id']: r['score'] for r in back.collect()}
        assert rows == {1: None, 2: 9.5}

    def test_union_widens_promotable_types(self, spark, tmp_path):
        """int-written and long-written shards of the same field read
        back as the WIDER type, whichever file sorts first."""
        import shutil
        from erde_spark.io.avro_ocf import read_avro, write_avro
        d = str(tmp_path / 'p.avro')
        narrow = spark.createDataFrame([(1,)], 'v int')
        wide = spark.createDataFrame([(2.5,)], 'v double')
        write_avro(narrow.coalesce(1), d)
        shutil.move(glob.glob(d + '/*.avro')[0], d + '/part-aaa.avro')
        write_avro(wide.coalesce(1), str(tmp_path / 'w.avro'))
        shutil.copy(glob.glob(str(tmp_path / 'w.avro') + '/*.avro')[0],
                    d + '/part-zzz.avro')
        back = read_avro(spark, d)
        assert dict(back.dtypes)['v'] == 'double'
        assert {r['v'] for r in back.collect()} == {1.0, 2.5}


class TestAvroAliases:
    @staticmethod
    def _patch_aliases(part_path, field, aliases):
        """Rewrite an OCF's header with ``aliases`` added to one
        field's schema JSON (body blocks + sync marker unchanged)."""
        import io as _io
        import json as _json

        from erde_spark.io.avro_ocf import _read_header, _write_header
        raw = open(part_path, 'rb').read()
        meta, sync, pos = _read_header(raw)
        sch = _json.loads(meta['avro.schema'].decode('utf-8'))
        for f in sch['fields']:
            if f['name'] == field:
                f['aliases'] = aliases
        codec = meta.get('avro.codec', b'null').decode('ascii')
        buf = _io.BytesIO()
        _write_header(buf, _json.dumps(sch), codec, sync)
        open(part_path, 'wb').write(buf.getvalue() + raw[pos:])

    def test_renamed_field_unifies_via_alias(self, spark, tmp_path):
        """Spec 'Schema Resolution' aliases (r11 optional ask #8a): an
        evolved file renames s -> txt and declares aliases:["s"] — the
        union reader must surface ONE column (the renamer's name) fed
        by both files, not two half-null columns."""
        import shutil

        from erde_spark.io.avro_ocf import read_avro, write_avro
        d = str(tmp_path / 'al.avro')
        old = spark.createDataFrame([(1, 'x')], 'id long, s string')
        new = spark.createDataFrame([(2, 'y')], 'id long, txt string')
        write_avro(old.coalesce(1), d)
        shutil.move(glob.glob(d + '/*.avro')[0], d + '/part-aaa.avro')
        write_avro(new.coalesce(1), str(tmp_path / 'n.avro'))
        shutil.copy(glob.glob(str(tmp_path / 'n.avro') + '/*.avro')[0],
                    d + '/part-zzz.avro')
        self._patch_aliases(d + '/part-zzz.avro', 'txt', ['s'])
        back = read_avro(spark, d)
        assert 'txt' in back.columns and 's' not in back.columns
        rows = {r['id']: r['txt'] for r in back.collect()}
        assert rows == {1: 'x', 2: 'y'}

    def test_single_file_with_aliases_reads_plain(self, spark, tmp_path):
        """A lone file whose schema carries aliases still reads (alias
        metadata must not confuse the fast path)."""
        from erde_spark.io.avro_ocf import read_avro, write_avro
        d = str(tmp_path / 'one.avro')
        df = spark.createDataFrame([(5, 'z')], 'id long, txt string')
        write_avro(df.coalesce(1), d)
        self._patch_aliases(glob.glob(d + '/*.avro')[0], 'txt', ['s'])
        back = read_avro(spark, d)
        assert {r['txt'] for r in back.collect()} == {'z'}


class TestOpenStaged:
    """Unit pins for the shared staged-commit primitive itself."""

    def test_local_commit_and_abort(self, tmp_path):
        from erde_spark.io.task_files import open_staged
        final = str(tmp_path / 'x.bin')
        fh, commit, abort = open_staged(final)
        fh.write(b'abc')
        commit()
        assert open(final, 'rb').read() == b'abc'
        fh, commit, abort = open_staged(final + '2')
        fh.write(b'zzz')
        abort()
        assert not os.path.exists(final + '2')
        assert not glob.glob(str(tmp_path) + '/*.inprogress')

    def test_uri_commit_verifies_size(self, tmp_path):
        """The two-phase verify refuses to publish a staged object
        smaller than min_size — and min_size=0 admits a legally empty
        file (the megatron all-empty-sequences .bin case)."""
        from erde_spark.io.task_files import open_staged
        final = 'file://' + str(tmp_path / 'y.bin')
        fh, commit, abort = open_staged(final, 'file')
        fh.close()  # zero bytes staged
        with pytest.raises(IOError):
            commit()
        assert not os.path.exists(str(tmp_path / 'y.bin'))
        fh, commit, abort = open_staged(final, 'file')
        fh.close()
        commit(min_size=0)
        assert os.path.exists(str(tmp_path / 'y.bin'))
        assert not glob.glob(str(tmp_path) + '/*.inprogress')

    def test_uri_abort_removes_staging(self, tmp_path):
        from erde_spark.io.task_files import open_staged
        final = 'file://' + str(tmp_path / 'z.bin')
        fh, commit, abort = open_staged(final, 'file')
        fh.write(b'partial')
        abort()
        assert not glob.glob(str(tmp_path) + '/*')


class TestDyingAttemptCleanup:
    """A task attempt that dies mid-shard must not leave its staging
    object behind (read globs exclude '.inprogress', but a clean
    directory beats relying on the filter — the zst sink's rule,
    now uniform across wds/arrow/avro)."""

    def test_wds_failure_cleans_staging(self, spark, tmp_path):
        from erde_spark.io.wds import write_webdataset
        bad = spark.createDataFrame(
            [('ok1', 'a'), ('dotted.key', 'b')], 'doc_id string, text string')
        local = str(tmp_path / 'w')
        with pytest.raises(Exception):
            write_webdataset(bad.coalesce(1), local)
        _no_staging(local)
        with pytest.raises(Exception):
            write_webdataset(bad.coalesce(1), 'file://' + local)
        _no_staging(local)

    def test_avro_failure_cleans_staging(self, spark, tmp_path):
        # failure injected mid-iteration: a UDF that raises on the
        # last row, after block_rows=2 already opened + flushed once
        from pyspark.sql import functions as F, types as T

        from erde_spark.io.avro_ocf import write_avro

        @F.udf(T.LongType())
        def boom(i):
            if i == 4:
                raise RuntimeError('boom')
            return int(i)
        bad = spark.range(5).select(boom('id').alias('id'))
        local = str(tmp_path / 'a.avro')
        with pytest.raises(Exception):
            write_avro(bad.coalesce(1), local, block_rows=2)
        _no_staging(local)

    def test_arrow_failure_cleans_staging(self, spark, tmp_path):
        from pyspark.sql import functions as F, types as T

        from erde_spark.io.arrow_shards import write_arrow_shards

        @F.udf(T.LongType())
        def boom(i):
            if i == 9:
                raise RuntimeError('boom')
            return int(i)
        bad = spark.range(10).select(boom('id').alias('id'))
        local = str(tmp_path / 'ar')
        with pytest.raises(Exception):
            write_arrow_shards(bad.coalesce(1), local, shard_size=4)
        _no_staging(local)


def test_avro_union_distributed_header_path(spark, tmp_path):
    """Above 255 files the union's distinct-writer-schema collection
    runs as a Spark job over the listing instead of a driver loop —
    same union result (both schemas' fields surface)."""
    import hashlib
    import json

    from erde_spark.io.avro_ocf import _write_header, read_avro
    out = str(tmp_path / 'many.avro')
    os.makedirs(out)
    s1 = json.dumps({'type': 'record', 'name': 'r', 'fields': [
        {'name': 'id', 'type': ['null', 'long']}]})
    s2 = json.dumps({'type': 'record', 'name': 'r', 'fields': [
        {'name': 'id', 'type': ['null', 'long']},
        {'name': 's', 'type': ['null', 'string']}]})
    for i in range(300):   # > the 255 driver-loop cap
        with open(os.path.join(out, f'part-{i:05d}.avro'), 'wb') as fh:
            _write_header(fh, s1 if i % 2 else s2, 'null',
                          hashlib.md5(str(i).encode()).digest())
    df = read_avro(spark, out)
    assert df.columns == ['id', 's']
    assert df.count() == 0   # header-only shards carry no blocks


def test_facade_uri_dispatch(spark, tmp_path):
    """write_df/read_df route file:// URIs to the suffix driver, which
    then takes the two-phase branch — the user-facing path a pipeline
    actually writes s3://bucket/out.tfrecord through."""
    import erde_spark as es
    df = _docs(spark, 10)
    for suffix in ['t.tfrecord', 't.wds', 't.avro', 't.arrow']:
        local = str(tmp_path / suffix)
        es.write_df(df, 'file://' + local)
        assert es.read_df(local, spark).count() == 10
        _no_staging(local)
