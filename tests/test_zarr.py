"""Zarr v2 source/sink (io/zarr.py): spec-by-hand cross-validation
(no zarr lib in this container), bit-exact roundtrip, chunk-grid
arithmetic, and the honest capability boundaries."""

import json
import os
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from erde_spark.io import read_df, write_df
from erde_spark.io.zarr import read_zarr, write_zarr


def _hand_store(tmp_path, arr, chunks, compressor='zlib',
                name='foreign.zarr', **meta_over):
    """Build a zarr v2 directory by hand, straight from the spec —
    stands in for a store written by stock zarr+numcodecs."""
    d = str(tmp_path / name)
    os.makedirs(d)
    n_rows, n_cols = arr.shape
    cr, cc = chunks
    meta = {'zarr_format': 2, 'shape': [n_rows, n_cols],
            'chunks': [cr, cc], 'dtype': arr.dtype.str,
            'compressor': ({'id': compressor, 'level': 1}
                           if compressor else None),
            'fill_value': 0, 'order': 'C', 'filters': None}
    meta.update(meta_over)
    with open(d + '/.zarray', 'w') as fh:
        json.dump(meta, fh)
    for bi in range(-(-n_rows // cr)):
        for bj in range(-(-n_cols // cc)):
            block = np.zeros((cr, cc), dtype=arr.dtype)
            sl = arr[bi * cr:(bi + 1) * cr, bj * cc:(bj + 1) * cc]
            block[:sl.shape[0], :sl.shape[1]] = sl
            buf = block.tobytes(order='C')
            if compressor == 'zlib':
                buf = zlib.compress(buf, 1)
            elif compressor == 'gzip':
                co = zlib.compressobj(1, zlib.DEFLATED, 31)
                buf = co.compress(buf) + co.flush()
            with open(d + f'/{bi}.{bj}', 'wb') as fh:
                fh.write(buf)
    return d


class TestZarrRead:
    def test_foreign_store_multi_chunk_grid(self, spark, tmp_path):
        # 7x5 float64 in 3x2 chunks: edge padding on BOTH axes must be
        # trimmed, bands hstacked, row ids global
        arr = np.arange(35, dtype='<f8').reshape(7, 5) * 1.5
        d = _hand_store(tmp_path, arr, (3, 2))
        got = read_zarr(d, spark).orderBy('row_id').collect()
        assert len(got) == 7
        for r in got:
            assert list(r['value']) == list(arr[r['row_id']])

    @pytest.mark.parametrize('comp', [None, 'zlib', 'gzip'])
    def test_compressors(self, spark, tmp_path, comp):
        arr = np.arange(12, dtype='<i8').reshape(4, 3)
        d = _hand_store(tmp_path, arr, (2, 3), compressor=comp,
                        name=f'c_{comp}.zarr')
        got = read_zarr(d, spark).orderBy('row_id').collect()
        assert [list(r['value']) for r in got] == arr.tolist()

    def test_absent_chunk_reads_as_fill_value(self, spark, tmp_path):
        # spec: chunks need not be present — zarr writers omit all-fill
        # chunks by default; an absent chunk must read as fill_value
        arr = np.arange(12, dtype='<f8').reshape(6, 2)
        d = _hand_store(tmp_path, arr, (2, 2), compressor=None,
                        fill_value=7.5)
        os.remove(d + '/1.0')  # rows 2-3 become all-fill
        got = {r['row_id']: list(r['value'])
               for r in read_zarr(d, spark).collect()}
        for i in (0, 1, 4, 5):
            assert got[i] == list(arr[i])
        for i in (2, 3):
            assert got[i] == [7.5, 7.5]
        # null fill_value + absent chunk = undefined cells: loud error
        d2 = _hand_store(tmp_path, arr, (2, 2), compressor=None,
                         name='nf.zarr', fill_value=None)
        os.remove(d2 + '/0.0')
        with pytest.raises(Exception, match='fill_value is null'):
            read_zarr(d2, spark).collect()

    def test_slash_dimension_separator(self, spark, tmp_path):
        # zarr v2 allows dimension_separator '/' (nested chunk dirs)
        arr = np.arange(8, dtype='<i4').reshape(4, 2)
        d = _hand_store(tmp_path, arr, (2, 2), compressor=None,
                        name='nested.zarr', dimension_separator='/')
        for f in list(os.listdir(d)):
            if f != '.zarray':
                i, j = f.split('.')
                os.makedirs(f'{d}/{i}', exist_ok=True)
                os.rename(f'{d}/{f}', f'{d}/{i}/{j}')
        got = read_zarr(d, spark).orderBy('row_id').collect()
        assert [list(r['value']) for r in got] == arr.tolist()

    def test_refusals_are_loud(self, spark, tmp_path):
        arr = np.ones((2, 2), dtype='<f4')
        d = _hand_store(tmp_path, arr, (2, 2), name='blosc.zarr',
                        compressor=None)
        meta = json.load(open(d + '/.zarray'))
        meta['compressor'] = {'id': 'blosc', 'cname': 'lz4'}
        json.dump(meta, open(d + '/.zarray', 'w'))
        with pytest.raises(ValueError, match='blosc'):
            read_zarr(d, spark)
        for patch, msg in ((dict(order='F'), 'C-order'),
                           (dict(dtype='>f4'), 'dtype'),
                           (dict(shape=[2, 2, 2]), '2-D'),
                           (dict(zarr_format=3), 'zarr v2')):
            d2 = _hand_store(tmp_path, arr, (2, 2),
                             name=f'bad_{msg.strip(" -")}.zarr',
                             compressor=None, **patch)
            with pytest.raises(ValueError, match=msg):
                read_zarr(d2, spark)


class TestZarrWrite:
    def test_roundtrip_bit_exact_and_facade(self, spark, tmp_path):
        e = spark.read.parquet(
            '/root/testdata/sf0.001/embeddings.parquet')
        out = str(tmp_path / 'emb.zarr')
        write_df(e.repartitionByRange(3, 'vec_id')
                  .sortWithinPartitions('vec_id'), out, chunk_rows=128)
        meta = json.load(open(out + '/.zarray'))
        assert meta['chunks'] == [128, meta['shape'][1]]
        assert not [f for f in os.listdir(out)
                    if f.endswith('.inprogress')]
        back = read_df(out, spark).orderBy('row_id').collect()
        src = e.orderBy('vec_id').collect()
        assert len(back) == len(src)
        for b, s in zip(back, src):
            assert np.array_equal(
                np.asarray(b['value'], dtype=np.float32),
                np.asarray(s['embedding'], dtype=np.float32))

    def test_write_refusals(self, spark, tmp_path):
        df = spark.createDataFrame([(0, [1.0, 2.0])],
                                   'id long, v array<double>')
        out = str(tmp_path / 'a.zarr')
        write_zarr(df, out, value_col='v')
        with pytest.raises(FileExistsError):
            write_zarr(df, out, value_col='v', mode='error')
        with pytest.raises(ValueError, match='renumber'):
            write_zarr(df, out, value_col='v', mode='append')
        with pytest.raises(ValueError, match='compressor'):
            write_zarr(df, str(tmp_path / 'b.zarr'), value_col='v',
                       compressor='blosc')
        ragged = spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, [1.0])], 'id long, v array<double>')
        with pytest.raises(Exception, match='ragged|constant width'):
            write_zarr(ragged, str(tmp_path / 'r.zarr'), value_col='v')
        empty = df.filter('id < 0')
        with pytest.raises(ValueError, match='empty'):
            write_zarr(empty, str(tmp_path / 'e.zarr'), value_col='v')

    def test_grid_arithmetic_hypothesis(self, spark, tmp_path):
        """Property: for every dtype, shape and chunk geometry (both
        axes chunked, edge padding anywhere), the reader recovers the
        hand-built store exactly — the chunk-grid/trim arithmetic has
        no off-by-one at any boundary."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        @settings(max_examples=12, deadline=None,
                  suppress_health_check=list(HealthCheck))
        @given(dtype=st.sampled_from(['<f4', '<f8', '<i4', '<i8']),
               n_rows=st.integers(1, 23),
               n_cols=st.integers(1, 9),
               cr=st.integers(1, 10),
               cc=st.integers(1, 5),
               comp=st.sampled_from([None, 'zlib', 'gzip']))
        def prop(dtype, n_rows, n_cols, cr, cc, comp):
            import uuid
            arr = (np.arange(n_rows * n_cols, dtype=dtype)
                   .reshape(n_rows, n_cols))
            d = _hand_store(tmp_path, arr, (min(cr, n_rows),
                                            min(cc, n_cols)),
                            compressor=comp,
                            name=f'h{uuid.uuid4().hex[:10]}.zarr')
            got = read_zarr(d, spark).orderBy('row_id').collect()
            assert len(got) == n_rows
            for r in got:
                assert list(r['value']) == list(arr[r['row_id']])

        prop()

    def test_uri_write_two_phase_commit(self, spark, tmp_path):
        """A file:// destination takes the pyarrow.fs two-phase branch
        (the io/zst.py protocol) — identical code path to s3://;
        roundtrip fidelity, no .inprogress leftovers, .zarray written
        last as the commit marker."""
        local = str(tmp_path / 'u.zarr')
        df = spark.createDataFrame(
            [(i, [float(i), i + 0.5]) for i in range(20)],
            'id long, v array<double>')
        write_zarr(df.coalesce(1), 'file://' + local, value_col='v',
                   chunk_rows=8)
        assert not [f for f in os.listdir(local)
                    if f.endswith('.inprogress')]
        got = read_zarr(local, spark).orderBy('row_id').collect()
        assert [list(r['value']) for r in got] == \
            [[float(i), i + 0.5] for i in range(20)]
        with pytest.raises(FileExistsError):
            write_zarr(df, 'file://' + local, value_col='v',
                       mode='error')

    def test_int_arrays(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, [i, i * 2, i * 3]) for i in range(10)],
            'id long, v array<bigint>')
        out = str(tmp_path / 'i.zarr')
        write_zarr(df.coalesce(1), out, value_col='v', chunk_rows=4,
                   compressor=None)
        got = read_zarr(out, spark).orderBy('row_id').collect()
        assert [list(r['value']) for r in got] == \
            [[i, i * 2, i * 3] for i in range(10)]


class TestZarr1D:
    """1-D arrays (r12): scalar column <-> 1-D store — the
    label/timestamp vectors that ship beside 2-D embedding matrices."""

    def test_scalar_roundtrip(self, spark, tmp_path):
        from erde_spark.io.zarr import read_zarr, write_zarr
        out = str(tmp_path / 'z1')
        df = spark.range(100).selectExpr('cast(id * 3 as bigint) as v')
        write_zarr(df.coalesce(2), out, value_col='v', chunk_rows=16)
        back = read_zarr(out, spark)
        assert dict(back.dtypes)['value'] == 'bigint'
        got = sorted(r['value'] for r in back.collect())
        assert got == [i * 3 for i in range(100)]
        import json
        import os
        meta = json.load(open(os.path.join(out, '.zarray')))
        assert meta['shape'] == [100] and meta['chunks'] == [16]
        # 1-D chunk files are named by the bare band index
        assert os.path.exists(os.path.join(out, '0'))
        assert not os.path.exists(os.path.join(out, '0.0'))

    def test_foreign_1d_store_reads(self, spark, tmp_path):
        """A hand-built spec-shaped 1-D store (uncompressed, with an
        absent all-fill chunk) reads back with fill_value padding."""
        import json
        import os

        import numpy as np

        from erde_spark.io.zarr import read_zarr
        out = str(tmp_path / 'f1')
        os.makedirs(out)
        meta = {'zarr_format': 2, 'shape': [10], 'chunks': [4],
                'dtype': '<f8', 'compressor': None, 'fill_value': 7.5,
                'order': 'C', 'filters': None}
        json.dump(meta, open(os.path.join(out, '.zarray'), 'w'))
        np.arange(4, dtype='<f8').tofile(os.path.join(out, '0'))
        # chunk 1 absent -> all fill_value; chunk 2 covers rows 8..9
        np.full(4, 9.0, dtype='<f8').tofile(os.path.join(out, '2'))
        rows = {r['row_id']: r['value']
                for r in read_zarr(out, spark).collect()}
        assert rows[0] == 0.0 and rows[3] == 3.0
        assert rows[4] == 7.5 and rows[7] == 7.5
        assert rows[8] == 9.0 and len(rows) == 10

    def test_float_scalar_uri_roundtrip(self, spark, tmp_path):
        from erde_spark.io.zarr import read_zarr, write_zarr
        local = str(tmp_path / 'zu')
        df = spark.range(20).selectExpr('cast(id as double) as v')
        write_zarr(df.coalesce(1), 'file://' + local, value_col='v',
                   chunk_rows=8, compressor='gzip')
        got = sorted(r['value'] for r in read_zarr(local, spark).collect())
        assert got == [float(i) for i in range(20)]
