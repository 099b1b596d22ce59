"""WARC (ISO 28500) reading: record framing, gzip-member segments,
record-type pruning, HTTP envelope stripping, truncation tolerance,
and the Spark mapInPandas source."""

import gzip
import io

from erde_spark.io.warc import (encode_warc, http_payload_body,
                                parse_warc_records, read_warc)


def _recs():
    html = (b'HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n'
            b'<html><body>hello crawl</body></html>')
    return [
        {'type': 'warcinfo', 'payload': b'software: test'},
        {'type': 'request', 'target-uri': 'https://a.example/x',
         'payload': b'GET /x HTTP/1.1\r\n\r\n'},
        {'type': 'response', 'target-uri': 'https://a.example/x',
         'content-type': 'application/http', 'payload': html},
        {'type': 'conversion', 'target-uri': 'https://a.example/x',
         'content-type': 'text/plain', 'payload': b'hello crawl'},
    ]


def test_parse_raw_records():
    blob = encode_warc(_recs(), compress=False)
    got = list(parse_warc_records(io.BytesIO(blob)))
    assert [r['type'] for r in got] == ['warcinfo', 'request', 'response',
                                       'conversion']
    assert got[2]['target-uri'] == 'https://a.example/x'
    assert got[3]['payload'] == b'hello crawl'


def test_gzip_members_and_truncation():
    blob = encode_warc(_recs())
    f = gzip.GzipFile(fileobj=io.BytesIO(blob))
    assert len(list(parse_warc_records(f))) == 4
    # truncated mid-record: earlier records still parse, no raise
    raw = encode_warc(_recs(), compress=False)
    cut = raw[:len(raw) - 30]
    got = list(parse_warc_records(io.BytesIO(cut)))
    assert 2 <= len(got) <= 3


def test_http_payload_body():
    r = _recs()[2]['payload']
    assert http_payload_body(r) == b'<html><body>hello crawl</body></html>'
    assert http_payload_body(b'plain text') == b'plain text'


def test_read_warc_spark(spark, tmp_path):
    seg1 = tmp_path / 'seg-00001.warc.gz'
    seg1.write_bytes(encode_warc(_recs(), segment='seg-00001'))
    seg2 = tmp_path / 'seg-00002.warc.gz'
    seg2.write_bytes(encode_warc([
        {'type': 'conversion', 'target-uri': f'https://b.example/{i}',
         'content-type': 'text/plain',
         'payload': b'doc %d body' % i} for i in range(10)],
        segment='seg-00002'))

    df = read_warc(str(tmp_path), spark)
    rows = df.collect()
    # request/warcinfo pruned at parse time
    assert {r['record_type'] for r in rows} == {'response', 'conversion'}
    assert len(rows) == 12
    byuri = {r['target_uri']: r for r in rows if r['record_type'] == 'conversion'}
    assert bytes(byuri['https://b.example/3']['payload']) == b'doc 3 body'
    assert byuri['https://b.example/3']['n_bytes'] == len(b'doc 3 body')

    # all record types when pruning is off
    all_df = read_warc(str(seg1), spark, record_types=())
    assert all_df.count() == 4

    # record IDs are globally unique across segments (doc_id derives
    # from them — cross-segment collisions would merge distinct docs)
    ids = [r['record_id'] for r in rows]
    assert len(set(ids)) == len(ids)


def test_read_warc_scan_prunes_content(spark, tmp_path):
    """The blob column never reaches the tasks: the binaryFile scan
    reads only ``path`` — segments are opened and streamed inside the
    task, so peak memory is one record, not one file."""
    seg = tmp_path / 'seg.warc.gz'
    seg.write_bytes(encode_warc(_recs()))
    df = read_warc(str(seg), spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert 'ReadSchema: struct<path:string>' in plan


def test_warc_stream_is_bounded_memory(tmp_path):
    """A segment far larger than any single record parses with peak
    Python allocation on the order of ONE record — the exact task-side
    code path (_open_warc_stream -> parse_warc_records)."""
    import tracemalloc

    from erde_spark.io.warc import _open_warc_stream
    one_mb = (b'x' * 1024) * 1024
    n = 48  # 48 MiB uncompressed
    seg = tmp_path / 'big.warc.gz'
    seg.write_bytes(encode_warc(
        [{'type': 'conversion', 'target-uri': f'https://big.example/{i}',
          'payload': one_mb} for i in range(n)], segment='big'))

    tracemalloc.start()
    tracemalloc.reset_peak()
    count = 0
    with _open_warc_stream(str(seg)) as stream:
        for rec in parse_warc_records(stream):
            assert len(rec['payload']) == len(one_mb)
            count += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert count == n
    # a handful of records' worth of buffers, nowhere near the file
    assert peak < 8 * len(one_mb), f'peak {peak} bytes'


def test_read_df_dispatch_and_documents_bridge(spark, tmp_path):
    import erde_spark as es
    from erde_spark.io.warc import warc_to_documents
    seg = tmp_path / 'crawl.warc.gz'
    seg.write_bytes(encode_warc([
        {'type': 'response', 'target-uri': 'https://a.example/1',
         'payload': (b'HTTP/1.1 200 OK\r\n\r\nthe quick brown fox and '
                     b'the lazy dog')},
        {'type': 'conversion', 'target-uri': 'https://a.example/2',
         'payload': 'der hund und die katze ist hier'.encode()},
    ]))
    recs = es.read_df(str(seg), spark)
    assert recs.count() == 2
    docs = warc_to_documents(recs)
    rows = {r['source']: r for r in docs.collect()}
    assert rows['https://a.example/1']['text'].startswith('the quick')
    assert rows['https://a.example/1']['lang'] == 'en'
    assert rows['https://a.example/2']['lang'] == 'de'
    assert all(r['doc_id'] is not None for r in rows.values())


def test_write_warc_roundtrip(spark, tmp_path):
    """Documents -> WARC sink -> read_warc -> documents: text and URIs
    survive byte-exact; record IDs unique; empty partitions leave no
    zero-record segments."""
    import erde_spark as es
    from erde_spark.io.warc import warc_to_documents
    docs = spark.createDataFrame(
        [(i, f'document body number {i} with ünïcode',
          f'https://ex.example/{i}') for i in range(25)],
        'doc_id long, text string, source string').repartition(6)
    out = str(tmp_path / 'corpus.warc')
    es.write_df(docs, out)
    import os
    segs = os.listdir(out)
    assert segs and all(s.endswith('.warc.gz') for s in segs)
    back = warc_to_documents(es.read_df(out, spark))
    got = {r['source']: r['text'] for r in back.collect()}
    want = {f'https://ex.example/{i}': f'document body number {i} '
            'with ünïcode' for i in range(25)}
    assert got == want
    ids = [r['record_id'] for r in es.read_df(out, spark).collect()]
    assert len(set(ids)) == len(ids) == 25
    # mode='error' refuses to clobber
    import pytest as _pt
    with _pt.raises(FileExistsError):
        es.write_df(docs, out, mode='error')


def test_write_warc_remote_mode_contract(tmp_path):
    """The pyarrow.fs branch honors the same mode contract as local
    paths: 'error' refuses an existing target, 'overwrite' clears
    stale segments (ghost records otherwise), other modes write into
    place. Exercised against LocalFileSystem — the same FileSystem API
    every remote scheme goes through."""
    import pytest as _pt
    from pyarrow import fs as pafs

    from erde_spark.io.warc import _prepare_remote_target
    filesystem = pafs.LocalFileSystem()
    rel = str(tmp_path / 'corpus.warc')
    # fresh target: created
    _prepare_remote_target(filesystem, rel, 'overwrite', rel)
    (tmp_path / 'corpus.warc' / 'stale.warc.gz').write_bytes(b'old')
    # error mode refuses the existing dir
    with _pt.raises(FileExistsError):
        _prepare_remote_target(filesystem, rel, 'error', rel)
    # overwrite clears stale segments
    _prepare_remote_target(filesystem, rel, 'overwrite', rel)
    assert list((tmp_path / 'corpus.warc').iterdir()) == []
    # append-style mode leaves contents alone
    (tmp_path / 'corpus.warc' / 'keep.warc.gz').write_bytes(b'k')
    _prepare_remote_target(filesystem, rel, 'append', rel)
    assert [p.name for p in (tmp_path / 'corpus.warc').iterdir()] \
        == ['keep.warc.gz']


def test_streaming_warc_ingest(spark, tmp_path):
    """New segments arriving in a watched directory stream into
    documents-shaped parquet exactly once."""
    from erde_spark.io.warc import streaming_warc_ingest
    in_dir = tmp_path / 'incoming'
    in_dir.mkdir()
    (in_dir / 'seg-1.warc.gz').write_bytes(encode_warc([
        {'type': 'conversion', 'target-uri': f'https://s1.example/{i}',
         'payload': b'the crawl body number %d' % i} for i in range(5)],
        segment='seg-1'))
    out = str(tmp_path / 'docs.parquet')
    ckpt = str(tmp_path / 'ckpt')

    q = streaming_warc_ingest(spark, str(in_dir), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 5
    assert set(got.columns) >= {'doc_id', 'text', 'lang', 'source', 'n_chars'}

    # second segment arrives; only the new rows append
    (in_dir / 'seg-2.warc.gz').write_bytes(encode_warc([
        {'type': 'conversion', 'target-uri': 'https://s2.example/0',
         'payload': b'another segment arrives later'}], segment='seg-2'))
    q2 = streaming_warc_ingest(spark, str(in_dir), out, ckpt)
    q2.awaitTermination(120)
    back = spark.read.parquet(out)
    assert back.count() == 6
    assert back.filter("source = 'https://s2.example/0'").count() == 1
