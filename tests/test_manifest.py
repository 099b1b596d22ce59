"""Manifested parquet datasets (io/manifest.py): dataset-level atomic
commit via versioned manifests + a last-swapped pointer, manifest-
planned reads, time travel, vacuum — on both the local path and the
pyarrow.fs URI branch (``file://`` exercising the identical code an
object store takes, the test_uri_sinks.py convention).
"""
import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from erde_spark.io.manifest import (
    ConcurrentWriteError, manifest_stats, manifest_versions,
    read_manifest_parquet, vacuum_manifest, write_manifest_parquet)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col('id').alias('doc_id'),
        F.md5(F.col('id').cast('string')).alias('text'))


def _ids(df):
    return sorted(r['doc_id'] for r in df.select('doc_id').collect())


class TestRoundTrip:
    def test_overwrite_roundtrip(self, spark, tmp_path):
        ds = str(tmp_path / 'd.mparquet')
        v = write_manifest_parquet(_docs(spark, 0, 50), ds)
        assert v == 1
        back = read_manifest_parquet(ds, spark)
        assert _ids(back) == list(range(50))
        # names + types pinned by the manifest (nullability is file-
        # source-normalized by Spark, not part of the contract)
        assert [(f.name, f.dataType) for f in back.schema.fields] == \
            [(f.name, f.dataType) for f in _docs(spark, 0, 0).schema.fields]

    def test_append_and_time_travel(self, spark, tmp_path):
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 30), ds)
        v2 = write_manifest_parquet(_docs(spark, 30, 50), ds, mode='append')
        assert v2 == 2
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(50))
        assert _ids(read_manifest_parquet(ds, spark, version=1)) == \
            list(range(30))

    def test_overwrite_resets_live_set_keeps_history(self, spark, tmp_path):
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 30), ds)
        write_manifest_parquet(_docs(spark, 100, 110), ds)
        assert _ids(read_manifest_parquet(ds, spark)) == \
            list(range(100, 110))
        assert _ids(read_manifest_parquet(ds, spark, version=1)) == \
            list(range(30))

    def test_mode_error(self, spark, tmp_path):
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 5), ds, mode='error')
        with pytest.raises(FileExistsError):
            write_manifest_parquet(_docs(spark, 0, 5), ds, mode='error')
        with pytest.raises(ValueError):
            write_manifest_parquet(_docs(spark, 0, 5), ds, mode='ignore')

    def test_append_schema_pinned(self, spark, tmp_path):
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 5), ds)
        evolved = _docs(spark, 5, 9).withColumn('extra', F.lit(1))
        with pytest.raises(ValueError, match='schema'):
            write_manifest_parquet(evolved, ds, mode='append')

    def test_empty_dataframe_snapshot(self, spark, tmp_path):
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 0), ds)
        back = read_manifest_parquet(ds, spark)
        assert back.count() == 0
        assert 'doc_id' in back.columns


class TestAtomicity:
    def test_reader_plans_from_manifest_not_listing(self, spark, tmp_path):
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 20), ds)
        # a rogue file dropped into data/ (half-published rival commit,
        # foreign artifact) must be INVISIBLE to snapshot reads
        _docs(spark, 900, 910).coalesce(1).write.mode('overwrite') \
            .parquet(str(tmp_path / 'rogue'))
        part = glob.glob(str(tmp_path / 'rogue' / 'part-*.parquet'))[0]
        os.replace(part, os.path.join(ds, 'data', 'zzz-rogue.parquet'))
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(20))

    def test_aborted_commit_leaves_old_snapshot(self, spark, tmp_path,
                                                monkeypatch):
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 10), ds)
        import erde_spark.io.manifest as m
        real = m._write_atomic

        def boom(path, payload, scheme):
            if path.endswith(m._POINTER):
                raise RuntimeError('crash before pointer swap')
            real(path, payload, scheme)

        monkeypatch.setattr(m, '_write_atomic', boom)
        with pytest.raises(RuntimeError, match='crash'):
            write_manifest_parquet(_docs(spark, 10, 20), ds, mode='append')
        monkeypatch.setattr(m, '_write_atomic', real)
        # pointer still at v1: readers see the old snapshot, data/
        # holds v2 orphans that vacuum sweeps
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(10))
        removed = vacuum_manifest(ds, keep_last=1)
        assert removed  # the orphaned v2 files
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(10))

    def test_no_staging_left_after_commit(self, spark, tmp_path):
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 10), ds)
        left = [p for p in glob.glob(os.path.join(ds, '**'), recursive=True)
                if '/_staging-' in p or p.endswith('.inprogress')]
        assert not left, left

    def test_concurrent_pointer_advance_detected(self, spark, tmp_path,
                                                 monkeypatch):
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 10), ds)
        import erde_spark.io.manifest as m
        real = m._write_atomic

        def rival_then_write(path, payload, scheme):
            # a rival commit lands (pointer -> v2) while this writer is
            # about to publish its own manifest for v2
            if '_manifest.v2' in path:
                ptr = os.path.join(ds, m._POINTER)
                with open(ptr + '.rival', 'w') as fh:
                    json.dump({'version': 2,
                               'manifest': m._manifest_name(2)}, fh)
                os.replace(ptr + '.rival', ptr)
            real(path, payload, scheme)

        monkeypatch.setattr(m, '_write_atomic', rival_then_write)
        with pytest.raises(ConcurrentWriteError):
            write_manifest_parquet(_docs(spark, 10, 20), ds, mode='append')


class TestStatsAndVacuum:
    def test_stats_without_scan(self, spark, tmp_path):
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 40), ds)
        write_manifest_parquet(_docs(spark, 40, 50), ds, mode='append')
        st = manifest_stats(ds)
        assert st['version'] == 2 and st['total_rows'] == 50
        assert manifest_stats(ds, version=1)['total_rows'] == 40
        vs = manifest_versions(ds)
        assert [v['version'] for v in vs] == [1, 2]
        assert vs[-1]['latest'] and not vs[0]['latest']

    def test_vacuum_removes_only_unreferenced(self, spark, tmp_path):
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 30), ds)
        write_manifest_parquet(_docs(spark, 100, 120), ds)  # v2 overwrite
        removed = vacuum_manifest(ds, keep_last=1)
        assert removed  # v1's data files
        assert _ids(read_manifest_parquet(ds, spark)) == \
            list(range(100, 120))
        with pytest.raises(FileNotFoundError):
            read_manifest_parquet(ds, spark, version=1)

    def test_vacuum_keep_last_two(self, spark, tmp_path):
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 10), ds)
        write_manifest_parquet(_docs(spark, 10, 20), ds, mode='append')
        write_manifest_parquet(_docs(spark, 50, 60), ds)
        assert vacuum_manifest(ds, keep_last=2) == []  # v2 appended v1's
        # files and v3 is live: every data file is referenced by v2 or v3
        assert _ids(read_manifest_parquet(ds, spark, version=2)) == \
            list(range(20))
        with pytest.raises(ValueError):
            vacuum_manifest(ds, keep_last=0)


class TestUriBranch:
    def test_uri_roundtrip_two_phase(self, spark, tmp_path):
        local = str(tmp_path / 'd.mparquet')
        ds = 'file://' + local
        write_manifest_parquet(_docs(spark, 0, 25), ds)
        write_manifest_parquet(_docs(spark, 25, 40), ds, mode='append')
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(40))
        assert _ids(read_manifest_parquet(ds, spark, version=1)) == \
            list(range(25))
        assert manifest_stats(ds)['total_rows'] == 40
        left = [p for p in glob.glob(os.path.join(local, '**'),
                                     recursive=True)
                if '/_staging-' in p or p.endswith('.inprogress')]
        assert not left, left
        removed = vacuum_manifest(ds, keep_last=1)
        assert removed == []  # append: v2 references v1's files too
        with pytest.raises(FileExistsError):
            write_manifest_parquet(_docs(spark, 0, 5), ds, mode='error')


class TestFacade:
    def test_dispatch_and_roundtrip(self, spark, tmp_path):
        from erde_spark.io import read_df, select_driver, write_df
        assert select_driver('x.mparquet').name == 'mparquet'
        assert select_driver('x.mparquet/').name == 'mparquet'
        assert select_driver('x.parquet').name == 'parquet'
        ds = str(tmp_path / 'd.mparquet')
        write_df(_docs(spark, 0, 15), ds)
        assert _ids(read_df(ds, spark)) == list(range(15))


class TestStreamingBridge:
    def _stage(self, spark, tmp_path, n=40):
        import shutil
        in_dir = str(tmp_path / 'in')
        os.makedirs(in_dir, exist_ok=True)
        for k in (0, 1):
            part_dir = str(tmp_path / f'tmp{k}')
            _docs(spark, k * n // 2, (k + 1) * n // 2).coalesce(1) \
                .write.mode('overwrite').parquet(part_dir)
            src = glob.glob(os.path.join(part_dir, 'part-*.parquet'))[0]
            dst = os.path.join(in_dir, f'batch-{k}.parquet')
            shutil.move(src, dst)
            os.utime(dst, (1_700_000_000 + k * 60,) * 2)
        return in_dir

    def test_exactly_once_across_replay(self, spark, tmp_path):
        from erde_spark.io.manifest import manifest_last_txn
        from erde_spark.streaming.shards import stream_to_manifest
        in_dir = self._stage(spark, tmp_path)
        ds = str(tmp_path / 'd.mparquet')
        schema = _docs(spark, 0, 0).schema

        def run(ckpt):
            src = (spark.readStream.schema(schema)
                   .option('maxFilesPerTrigger', '1').parquet(in_dir))
            q = stream_to_manifest(src, ds, ckpt)
            q.awaitTermination()

        run(str(tmp_path / 'ckpt1'))
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(40))
        assert manifest_last_txn(ds) == 1
        vs = manifest_versions(ds)
        assert [v['version'] for v in vs] == [1, 2]
        # checkpoint loss forces a FULL replay (fresh batch ids 0, 1):
        # the txn guard must skip both — no duplicate snapshots
        run(str(tmp_path / 'ckpt2'))
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(40))
        assert [v['version'] for v in manifest_versions(ds)] == [1, 2]

    def test_crash_before_pointer_then_replay(self, spark, tmp_path,
                                              monkeypatch):
        from erde_spark.io.manifest import manifest_last_txn
        from erde_spark.streaming.shards import stream_to_manifest
        import erde_spark.io.manifest as m
        in_dir = self._stage(spark, tmp_path)
        ds = str(tmp_path / 'd.mparquet')
        schema = _docs(spark, 0, 0).schema
        real = m._write_atomic
        state = {'crashed': False}

        def crash_second_pointer(path, payload, scheme):
            if path.endswith(m._POINTER) and \
                    json.loads(payload)['version'] == 2 and \
                    not state['crashed']:
                state['crashed'] = True
                raise RuntimeError('die before publishing batch 1')
            real(path, payload, scheme)

        monkeypatch.setattr(m, '_write_atomic', crash_second_pointer)
        src = (spark.readStream.schema(schema)
               .option('maxFilesPerTrigger', '1').parquet(in_dir))
        q = stream_to_manifest(src, ds, str(tmp_path / 'ckpt1'))
        with pytest.raises(Exception):
            q.awaitTermination()
        # batch 0 visible, batch 1's partial commit invisible
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(20))
        assert manifest_last_txn(ds) == 0
        # restart from the SAME checkpoint: Spark replays batch 1,
        # which now commits cleanly — exactly one copy of everything
        src2 = (spark.readStream.schema(schema)
                .option('maxFilesPerTrigger', '1').parquet(in_dir))
        q2 = stream_to_manifest(src2, ds, str(tmp_path / 'ckpt1'))
        q2.awaitTermination()
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(40))
        assert manifest_last_txn(ds) == 1


def test_vacuum_sweeps_dead_driver_staging(spark, tmp_path):
    """A commit-scoped _staging-<token> directory only survives a
    driver death mid-write; vacuum sweeps it with the other
    unreferenced objects."""
    from erde_spark.io.manifest import vacuum_manifest, \
        write_manifest_parquet, read_manifest_parquet
    ds = str(tmp_path / 'd.mparquet')
    write_manifest_parquet(_docs(spark, 0, 10), ds)
    dead = os.path.join(ds, '_staging-deadbeef0000')
    os.makedirs(dead)
    with open(os.path.join(dead, 'part-00000.parquet'), 'wb') as fh:
        fh.write(b'torn')
    vacuum_manifest(ds)
    assert not os.path.exists(dead)
    assert read_manifest_parquet(ds, spark).count() == 10


class TestFileSkipping:
    def _range_ds(self, spark, tmp_path):
        ds = str(tmp_path / 'd.mparquet')
        # range-clustered files: disjoint doc_id bands per file
        df = _docs(spark, 0, 400).repartitionByRange(8, 'doc_id')
        write_manifest_parquet(df, ds)
        return ds

    def test_where_prunes_files_and_filters_rows(self, spark, tmp_path):
        from erde_spark.io.manifest import manifest_planned_files
        ds = self._range_ds(spark, tmp_path)
        total = manifest_planned_files(ds)
        planned = manifest_planned_files(ds, where=('doc_id', 100, 149))
        assert len(planned) < len(total)
        got = _ids(read_manifest_parquet(ds, spark,
                                         where=('doc_id', 100, 149)))
        assert got == list(range(100, 150))

    def test_open_bounds(self, spark, tmp_path):
        ds = self._range_ds(spark, tmp_path)
        assert _ids(read_manifest_parquet(
            ds, spark, where=('doc_id', 390, None))) == \
            list(range(390, 400))
        assert _ids(read_manifest_parquet(
            ds, spark, where=('doc_id', None, 9))) == list(range(10))

    def test_disjoint_range_reads_nothing(self, spark, tmp_path):
        from erde_spark.io.manifest import manifest_planned_files
        ds = self._range_ds(spark, tmp_path)
        assert manifest_planned_files(ds, where=('doc_id', 1000, 2000)) \
            == []
        assert read_manifest_parquet(
            ds, spark, where=('doc_id', 1000, 2000)).count() == 0

    def test_column_without_stats_is_never_skipped(self, spark, tmp_path):
        from erde_spark.io.manifest import manifest_planned_files
        ds = self._range_ds(spark, tmp_path)
        # strings carry no manifest stats (writer truncation hazard):
        # the pruner must keep every file, the row filter still applies
        planned = manifest_planned_files(ds, where=('text', 'a', 'b'))
        assert planned == manifest_planned_files(ds)

    def test_empty_range_raises(self, spark, tmp_path):
        ds = self._range_ds(spark, tmp_path)
        with pytest.raises(ValueError, match='empty where range'):
            read_manifest_parquet(ds, spark, where=('doc_id', 5, 4))


class TestCompaction:
    def test_compact_streaming_debris(self, spark, tmp_path):
        from erde_spark.io.manifest import (compact_manifest,
                                            manifest_planned_files,
                                            manifest_last_txn)
        from erde_spark.streaming.shards import stream_to_manifest
        ds = str(tmp_path / 'd.mparquet')
        in_dir = TestStreamingBridge()._stage(spark, tmp_path, n=60)
        schema = _docs(spark, 0, 0).schema
        src = (spark.readStream.schema(schema)
               .option('maxFilesPerTrigger', '1').parquet(in_dir))
        stream_to_manifest(src, ds, str(tmp_path / 'ckpt1')) \
            .awaitTermination()
        before = manifest_planned_files(ds)
        assert len(before) >= 2
        v = compact_manifest(ds, spark, min_bytes=32 << 20)
        assert v == 3
        after = manifest_planned_files(ds)
        assert len(after) < len(before)
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(60))
        # time travel: the pre-compaction snapshot still reads
        assert _ids(read_manifest_parquet(ds, spark, version=2)) == \
            list(range(60))
        # the txn high-water mark survives compaction, so a full
        # replay against a fresh checkpoint still lands zero batches
        assert manifest_last_txn(ds) == 1
        src2 = (spark.readStream.schema(schema)
                .option('maxFilesPerTrigger', '1').parquet(in_dir))
        stream_to_manifest(src2, ds, str(tmp_path / 'ckpt2')) \
            .awaitTermination()
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(60))
        assert manifest_versions(ds)[-1]['version'] == 3
        # vacuum to the live snapshot: the replaced small files go
        removed = vacuum_manifest(ds, keep_last=1)
        assert removed
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(60))

    def test_compact_nothing_to_do(self, spark, tmp_path):
        from erde_spark.io.manifest import compact_manifest
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 20).coalesce(1), ds)
        assert compact_manifest(ds, spark) is None

    def test_compact_keeps_large_files_untouched(self, spark, tmp_path):
        import erde_spark.io.manifest as m
        ds = str(tmp_path / 'd.mparquet')
        write_manifest_parquet(_docs(spark, 0, 50).coalesce(1), ds)
        write_manifest_parquet(_docs(spark, 50, 60).coalesce(1), ds,
                               mode='append')
        write_manifest_parquet(_docs(spark, 60, 70).coalesce(1), ds,
                               mode='append')
        mf = m._load_manifest(ds, '', 3)
        sizes = {e['path']: e['bytes'] for e in mf['files']}
        big_name = m.manifest_planned_files(ds, version=1)[0]
        # threshold exactly at the v1 file's size: strict < keeps it,
        # the two appended files qualify and merge into one
        v = m.compact_manifest(ds, spark, min_bytes=sizes[big_name])
        assert v == 4
        after = m.manifest_planned_files(ds)
        assert big_name in after and len(after) == 2
        assert _ids(read_manifest_parquet(ds, spark)) == list(range(70))
