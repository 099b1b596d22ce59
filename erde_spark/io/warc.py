"""WARC (Web ARChive, ISO 28500) reading — the container Common Crawl
and every serious web crawl ships: raw ``.warc`` / ``.warc.gz`` (one
gzip member per record, concatenated), including WET plain-text
conversions.

Scale shape: WARC files are written in ~1 GB segments precisely so that
one segment is one unit of work. ``read_warc`` lists files as rows
(``binaryFile`` source, pruned to ``path`` only — the blob column is
never materialized, which also sidesteps binaryFile's ~2 GB per-file
content limit), then each task OPENS its segment from the filesystem
(local ``open`` or ``pyarrow.fs`` for s3://, hdfs://, ...) and parses
it RECORD BY RECORD through a streaming gzip reader, yielding Arrow
batches as it goes — peak memory is one decompressed record plus gzip
window buffers, not one file. The record parser is pure stdlib
(ISO 28500 §4: version line, named headers, Content-Length payload,
CRLF CRLF framing).
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_warc_records(stream) -> Iterator[dict]:
    """Iterate records from a binary file-like of RAW (uncompressed)
    WARC bytes: dicts with the WARC headers (lower-cased keys, without
    the ``WARC-`` prefix) plus ``payload``. Tolerates trailing garbage
    after the last complete record (truncated segment downloads)."""
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.strip():
            continue
        if not line.startswith(b'WARC/'):
            return  # desynced / trailing garbage: stop cleanly
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h:
                return  # EOF mid-headers: truncated record, drop it
            if h in (b'\r\n', b'\n'):
                break
            k, _, v = h.partition(b':')
            key = k.decode('latin1').strip().lower()
            if key.startswith('warc-'):
                key = key[5:]
            headers[key] = v.decode('latin1').strip()
        try:
            length = int(headers.get('content-length', '0'))
        except ValueError:
            return
        payload = stream.read(length)
        if len(payload) < length:
            return  # truncated final record
        headers['payload'] = payload
        # each record is followed by CRLF CRLF
        stream.readline()
        stream.readline()
        yield headers


class _ReadAdapter(io.RawIOBase):
    """RawIOBase facade over any ``.read(n)`` handle (pyarrow
    ``NativeFile`` included) so ``io.BufferedReader`` can supply the
    ``readline``/``peek`` interface the record parser needs."""

    def __init__(self, f):
        self._f = f

    def readable(self):
        return True

    def readinto(self, b):
        data = self._f.read(len(b))
        n = len(data)
        b[:n] = data
        return n

    def close(self):
        try:
            self._f.close()
        finally:
            super().close()


def _open_segment(path: str):
    """Open a segment URI inside the task as a buffered STREAM — the
    file is read incrementally, never materialized. Local paths (and
    ``file:`` URIs, the form Spark's file listing emits) go through
    plain ``open``; any other scheme through ``pyarrow.fs``."""
    from urllib.parse import unquote, urlparse
    p = urlparse(path)
    if p.scheme in ('', 'file'):
        return open(unquote(p.path) if p.scheme else path, 'rb')
    from pyarrow import fs as pafs
    filesystem, rel = pafs.FileSystem.from_uri(path)
    return io.BufferedReader(_ReadAdapter(filesystem.open_input_stream(rel)))


def _open_warc_stream(path: str):
    """Streaming handle of RAW WARC bytes for a segment path, gunzipping
    on the fly for ``.warc.gz`` (concatenated members: stdlib GzipFile
    reads them all) — decompressed bytes are consumed record by record,
    never held whole."""
    raw = _open_segment(path)
    magic = raw.peek(2)[:2]
    if path.endswith('.gz') or magic == b'\x1f\x8b':
        gz = gzip.GzipFile(fileobj=raw)
        gz.myfileobj = raw  # cascade close() to the file handle
        return gz
    return raw


WARC_SCHEMA = T.StructType([
    T.StructField('segment', T.StringType()),
    T.StructField('record_type', T.StringType()),
    T.StructField('target_uri', T.StringType()),
    T.StructField('record_id', T.StringType()),
    T.StructField('date', T.StringType()),
    T.StructField('content_type', T.StringType()),
    T.StructField('payload', T.BinaryType()),
    T.StructField('n_bytes', T.LongType()),
])


def _segment_parser(record_types, batch_rows: int):
    """mapInPandas function over a ``path``-only listing: open each
    segment from the filesystem inside the task and stream records out
    in bounded Arrow batches. Shared by the batch and streaming
    readers."""
    wanted = {t.lower() for t in record_types} if record_types else None

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA]
        for pdf in batches:
            for fpath in pdf['path']:
                rows = []
                with _open_warc_stream(fpath) as stream:
                    for rec in parse_warc_records(stream):
                        rtype = rec.get('type', '').lower()
                        if wanted and rtype not in wanted:
                            continue
                        payload = rec['payload']
                        rows.append((fpath, rtype, rec.get('target-uri'),
                                     rec.get('record-id'), rec.get('date'),
                                     rec.get('content-type'), payload,
                                     len(payload)))
                        if len(rows) >= batch_rows:
                            yield pd.DataFrame(rows, columns=cols)
                            rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return _parse


def read_warc(path: str, spark: SparkSession,
              record_types: tuple = ('response', 'conversion'),
              batch_rows: int = 256) -> DataFrame:
    """DataFrame of WARC records under ``path`` (a file, directory, or
    glob of ``.warc`` / ``.warc.gz`` segments). ``record_types`` prunes
    at parse time — ('response', 'conversion') keeps crawl payloads and
    WET text and drops request/metadata chatter before it ever crosses
    Arrow. Only the listing's ``path`` column reaches the tasks; each
    segment is opened and streamed inside its task (see module
    docstring)."""
    files = spark.read.format('binaryFile').load(path).select('path')
    return files.mapInPandas(_segment_parser(record_types, batch_rows),
                             schema=WARC_SCHEMA)


def http_payload_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a ``response`` record's
    payload (status line + headers + CRLF CRLF); returns the input
    unchanged when no envelope is present (WET conversion records)."""
    if not payload.startswith(b'HTTP/'):
        return payload
    sep = payload.find(b'\r\n\r\n')
    if sep == -1:
        return payload
    return payload[sep + 4:]


# --------------------------------------------------------------- fixture


def encode_warc(records: list[dict], compress: bool = True,
                segment: str = '') -> bytes:
    """Write spec-shaped WARC bytes for fixtures: each record dict needs
    ``type``/``payload`` and may carry ``target-uri``/``content-type``.
    ``compress=True`` emits one gzip member per record (the Common Crawl
    layout). Record IDs are deterministic but GLOBALLY unique —
    sha1(segment | index | payload) — so multi-segment fixtures never
    collide on ``doc_id = xxhash64(record_id)`` downstream; pass a
    distinct ``segment`` salt per encoded file when payloads may
    repeat across segments."""
    import hashlib
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec['payload']
        rid = hashlib.sha1(
            segment.encode() + b'|%d|' % i + payload).hexdigest()
        head = [b'WARC/1.0',
                b'WARC-Type: ' + rec['type'].encode(),
                b'WARC-Record-ID: <urn:sha1:' + rid.encode() + b'>',
                b'WARC-Date: 2024-01-01T00:00:00Z']
        if rec.get('target-uri'):
            head.append(b'WARC-Target-URI: ' + rec['target-uri'].encode())
        if rec.get('content-type'):
            head.append(b'Content-Type: ' + rec['content-type'].encode())
        head.append(b'Content-Length: %d' % len(payload))
        body = b'\r\n'.join(head) + b'\r\n\r\n' + payload + b'\r\n\r\n'
        out += gzip.compress(body) if compress else body
    return bytes(out)


def _prepare_remote_target(filesystem, rel: str, mode: str,
                           path: str) -> None:
    """Apply the write-mode contract on a ``pyarrow.fs`` target — the
    same semantics the local branch gets: ``error`` refuses an existing
    directory, ``overwrite`` clears it first (otherwise stale segments
    from a prior write survive and ``read_warc`` returns ghost
    records)."""
    from pyarrow import fs as pafs
    info = filesystem.get_file_info(rel)
    if info.type != pafs.FileType.NotFound:
        if mode == 'error':
            raise FileExistsError(path)
        if mode == 'overwrite':
            filesystem.delete_dir_contents(rel, missing_dir_ok=True)
    filesystem.create_dir(rel, recursive=True)


def write_warc(df: DataFrame, path: str, mode: str = 'overwrite',
               text_col: str = 'text', uri_col: str = 'source',
               compress: bool = True) -> None:
    """Distributed WARC sink: export a documents-shaped frame back to
    crawl interchange format — one ``conversion``-record segment file
    per partition under ``path`` (the directory layout ``read_warc``
    consumes), written executor-side with one gzip member per record
    and single-record peak memory. Record IDs are globally unique
    (sha1 over a per-segment uuid salt + index + payload). Local paths
    and any ``pyarrow.fs`` scheme (s3://, hdfs://) are supported; like
    Spark's own file sinks, a plain local path on a multi-host cluster
    must be a shared filesystem."""
    import shutil
    import uuid
    from urllib.parse import urlparse

    p = urlparse(path)
    if p.scheme in ('', 'file'):
        local = p.path if p.scheme else path
        if mode == 'error' and os.path.exists(local):
            raise FileExistsError(path)
        if mode == 'overwrite':
            shutil.rmtree(local, ignore_errors=True)
        os.makedirs(local, exist_ok=True)
    else:
        from pyarrow import fs as pafs
        filesystem, rel = pafs.FileSystem.from_uri(path)
        _prepare_remote_target(filesystem, rel, mode, path)
    rows = df.select(F.coalesce(F.col(uri_col).cast('string'), F.lit(''))
                     .alias('_uri'),
                     F.coalesce(F.col(text_col).cast('string'), F.lit(''))
                     .alias('_text'))

    def _write_partition(it):
        import hashlib
        seg = uuid.uuid4().hex
        name = f'segment-{seg}.warc' + ('.gz' if compress else '')
        if p.scheme in ('', 'file'):
            local = p.path if p.scheme else path
            out = open(os.path.join(local, name), 'wb')
        else:
            from pyarrow import fs as pafs
            filesystem, rel = pafs.FileSystem.from_uri(path)
            out = filesystem.open_output_stream(f'{rel}/{name}')
        n = 0
        try:
            for row in it:
                payload = row['_text'].encode('utf-8')
                rid = hashlib.sha1(
                    seg.encode() + b'|%d|' % n + payload).hexdigest()
                head = [b'WARC/1.0',
                        b'WARC-Type: conversion',
                        b'WARC-Record-ID: <urn:sha1:' + rid.encode() + b'>',
                        b'WARC-Date: 2024-01-01T00:00:00Z']
                if row['_uri']:
                    head.append(b'WARC-Target-URI: '
                                + row['_uri'].encode('utf-8'))
                head.append(b'Content-Type: text/plain')
                head.append(b'Content-Length: %d' % len(payload))
                body = (b'\r\n'.join(head) + b'\r\n\r\n' + payload
                        + b'\r\n\r\n')
                out.write(gzip.compress(body) if compress else body)
                n += 1
        finally:
            out.close()
        if n == 0:
            # an empty partition leaves a zero-record segment: remove
            # it on every scheme, not just local, so read_warc never
            # lists dead files
            if p.scheme in ('', 'file'):
                os.unlink(os.path.join(p.path if p.scheme else path,
                                       name))
            else:
                from pyarrow import fs as pafs
                filesystem, rel = pafs.FileSystem.from_uri(path)
                filesystem.delete_file(f'{rel}/{name}')

    rows.rdd.foreachPartition(_write_partition)


def warc_to_documents(records: DataFrame,
                      langid_model=None) -> DataFrame:
    """Shape WARC records into the ``documents``-table contract
    (doc_id, text, lang, source, n_chars): payload -> UTF-8 text with
    the HTTP envelope stripped (errors replaced, so one mojibake page
    can't fail a task), doc_id = xxhash64 of the record id. ``lang``
    defaults to the cheap marker-stopword tag (zero extra plan cost);
    pass a :class:`erde_spark.scale.langid.LangIdModel` (e.g.
    ``default_langid_model(spark)``) to tag with the real 30-language
    identifier instead — one extra broadcast join + aggregate. The
    bridge from ``read_warc`` to every curation operator in
    :mod:`erde_spark.scale`."""
    from pyspark.sql import functions as F

    from erde_spark.scale.text import lang_id

    @F.pandas_udf(T.StringType())
    def _to_text(payload: pd.Series) -> pd.Series:
        return payload.map(
            lambda b: http_payload_body(bytes(b)).decode('utf-8', 'replace')
            if b is not None else '')

    docs = (records
            .select(F.xxhash64('record_id').alias('doc_id'),
                    _to_text('payload').alias('text'),
                    F.col('target_uri').alias('source')))
    if langid_model is not None:
        from erde_spark.scale.langid import identify_language
        tags = identify_language(docs, langid_model)
        docs = (docs.join(tags.withColumnRenamed('id', 'doc_id')
                          .select('doc_id', 'lang'), 'doc_id'))
    else:
        docs = docs.withColumn('lang', lang_id(F.col('text')))
    return docs.withColumn('n_chars', F.length('text'))


def streaming_warc_ingest(spark: SparkSession, in_dir: str, out_dir: str,
                          checkpoint_dir: str,
                          record_types: tuple = ('response', 'conversion'),
                          trigger_once: bool = True,
                          max_files_per_trigger: int | None = None):
    """Continuous crawl ingest: watch ``in_dir`` for new WARC segments
    (the file-stream source tracks arrivals exactly-once via the
    checkpoint), parse each through the same record machinery as
    ``read_warc``, shape to the documents contract, and append parquet
    to ``out_dir`` per micro-batch.

    This is the front door of a standing curation pipeline: new Common
    Crawl segments land in a bucket, this query turns them into
    documents rows, and the downstream ``streaming_neardup_dedup``
    store-join keeps the corpus deduplicated incrementally. Returns the
    started ``StreamingQuery``."""
    # streaming file sources need an explicit schema; this is
    # binaryFile's fixed one
    bin_schema = ('path string, modificationTime timestamp, '
                  'length long, content binary')
    stream = (spark.readStream.format('binaryFile').schema(bin_schema)
              .option('pathGlobFilter', '*.warc*'))
    if max_files_per_trigger:
        stream = stream.option('maxFilesPerTrigger', int(max_files_per_trigger))
    files = stream.load(in_dir).select('path')
    recs = files.mapInPandas(_segment_parser(record_types, 256),
                             schema=WARC_SCHEMA)
    docs = warc_to_documents(recs)
    writer = (docs.writeStream
              .option('checkpointLocation', checkpoint_dir)
              .outputMode('append')
              .format('parquet')
              .option('path', out_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
