"""WARC (Web ARChive, ISO 28500) reading — the container Common Crawl
and every serious web crawl ships: raw ``.warc`` / ``.warc.gz`` (one
gzip member per record, concatenated), including WET plain-text
conversions.

Scale shape: WARC files are written in ~1 GB segments precisely so that
one segment is one unit of work. ``read_warc`` lists files as rows
(``binaryFile`` source — Spark never splits inside a member stream,
matching the format's own parallelism grain), then each task parses its
segment RECORD BY RECORD through a streaming gzip reader and yields
Arrow batches as it goes — peak memory is one record, not one file.
The record parser is pure stdlib (ISO 28500 §4: version line, named
headers, Content-Length payload, CRLF CRLF framing).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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


def _open_warc(blob: bytes, path: str):
    if path.endswith('.gz') or blob[:2] == b'\x1f\x8b':
        # concatenated gzip members: stdlib GzipFile reads them all
        return gzip.GzipFile(fileobj=io.BytesIO(blob))
    return io.BytesIO(blob)


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


def read_warc(path: str, spark: SparkSession,
              record_types: tuple = ('response', 'conversion'),
              batch_rows: int = 256) -> DataFrame:
    """DataFrame of WARC records under ``path`` (a file, directory, or
    glob of ``.warc`` / ``.warc.gz`` segments). ``record_types`` prunes
    at parse time — ('response', 'conversion') keeps crawl payloads and
    WET text and drops request/metadata chatter before it ever crosses
    Arrow."""
    wanted = {t.lower() for t in record_types} if record_types else None
    files = spark.read.format('binaryFile').load(path) \
        .select('path', 'content')

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA]
        for pdf in batches:
            for fpath, blob in zip(pdf['path'], pdf['content']):
                rows = []
                stream = _open_warc(bytes(blob), fpath)
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

    return files.mapInPandas(_parse, schema=WARC_SCHEMA)


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


def encode_warc(records: list[dict], compress: bool = True) -> bytes:
    """Write spec-shaped WARC bytes for fixtures: each record dict needs
    ``type``/``payload`` and may carry ``target-uri``/``content-type``.
    ``compress=True`` emits one gzip member per record (the Common Crawl
    layout)."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec['payload']
        head = [b'WARC/1.0',
                b'WARC-Type: ' + rec['type'].encode(),
                b'WARC-Record-ID: <urn:uuid:%08d>' % i,
                b'WARC-Date: 2024-01-01T00:00:00Z']
        if rec.get('target-uri'):
            head.append(b'WARC-Target-URI: ' + rec['target-uri'].encode())
        if rec.get('content-type'):
            head.append(b'Content-Type: ' + rec['content-type'].encode())
        head.append(b'Content-Length: %d' % len(payload))
        body = b'\r\n'.join(head) + b'\r\n\r\n' + payload + b'\r\n\r\n'
        out += gzip.compress(body) if compress else body
    return bytes(out)


def warc_to_documents(records: DataFrame) -> DataFrame:
    """Shape WARC records into the ``documents``-table contract
    (doc_id, text, lang, source, n_chars): payload -> UTF-8 text with
    the HTTP envelope stripped (errors replaced, so one mojibake page
    can't fail a task), doc_id = xxhash64 of the record id, lang from
    the marker-stopword ID. The bridge from ``read_warc`` to every
    curation operator in :mod:`erde_spark.scale`."""
    from pyspark.sql import functions as F

    from erde_spark.scale.text import lang_id

    @F.pandas_udf(T.StringType())
    def _to_text(payload: pd.Series) -> pd.Series:
        return payload.map(
            lambda b: http_payload_body(bytes(b)).decode('utf-8', 'replace')
            if b is not None else '')

    return (records
            .select(F.xxhash64('record_id').alias('doc_id'),
                    _to_text('payload').alias('text'),
                    F.col('target_uri').alias('source'))
            .withColumn('lang', lang_id(F.col('text')))
            .withColumn('n_chars', F.length('text')))


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
    files = stream.load(in_dir).select('path', 'content')
    wanted = {t.lower() for t in record_types} if record_types else None

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA]
        for pdf in batches:
            for fpath, blob in zip(pdf['path'], pdf['content']):
                rows = []
                for rec in parse_warc_records(_open_warc(bytes(blob), fpath)):
                    rtype = rec.get('type', '').lower()
                    if wanted and rtype not in wanted:
                        continue
                    payload = rec['payload']
                    rows.append((fpath, rtype, rec.get('target-uri'),
                                 rec.get('record-id'), rec.get('date'),
                                 rec.get('content-type'), payload,
                                 len(payload)))
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    docs = warc_to_documents(files.mapInPandas(_parse, schema=WARC_SCHEMA))
    writer = (docs.writeStream
              .option('checkpointLocation', checkpoint_dir)
              .outputMode('append')
              .format('parquet')
              .option('path', out_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
