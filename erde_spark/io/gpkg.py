"""GeoPackage source/sink on stdlib ``sqlite3`` — no fiona/GDAL needed.

A GPKG file is a SQLite database (OGC GeoPackage spec): features live in a
plain table whose geometry column holds a ``GP``-header blob wrapping
ordinary WKB. Since this engine's geometry convention is WKB binary, IO is
header strip/prepend — no geometry math.

Reference behavior mirrored (`/root/reference/erde/io/gpkg.py`):
``file.gpkg:layer`` sub-addressing with layer autodetect (:16-100), spatial
``mask`` filter pushdown (:73), per-numeric-column ``stats()`` pushed to
sqlite SQL (:102-117), delete-then-create layer write semantics (:120-190).

Scale design:

* **read** — the driver probes schema + rowid span with one cheap sqlite
  query, then builds ``spark.range``-style rowid slices and reads each slice
  in ``mapInPandas`` (`SELECT .. WHERE _rowid_ BETWEEN lo AND hi`): the scan
  parallelizes across executors (the .gpkg must be on shared/local storage,
  same contract as any file source), transfers Arrow batches, and never
  materializes the table on the driver.
* **bbox pushdown** — when the layer has a GPKG rtree index the slice query
  filters ``_rowid_ IN (SELECT id FROM rtree_<t>_<g> WHERE ...)`` inside
  sqlite; otherwise rows are dropped post-parse per batch.
* **write** — sqlite is a single-writer file, so the sink necessarily
  funnels through the driver (same as the reference's fiona writer);
  ``toLocalIterator`` streams one partition at a time for constant memory.
"""

from __future__ import annotations

import os
import re
import sqlite3
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GPKG_PATH_RE = re.compile(r'^(?P<file>.*\.gpkg)(?::(?P<layer>[A-Za-z0-9_]+))?$')

_SQLITE_TYPES = {
    'INTEGER': T.LongType(), 'INT': T.LongType(), 'MEDIUMINT': T.LongType(),
    'SMALLINT': T.LongType(), 'TINYINT': T.LongType(), 'BOOLEAN': T.BooleanType(),
    'REAL': T.DoubleType(), 'DOUBLE': T.DoubleType(), 'FLOAT': T.DoubleType(),
    'TEXT': T.StringType(), 'DATETIME': T.StringType(), 'DATE': T.StringType(),
    'BLOB': T.BinaryType(),
}


def split_path(path: str) -> tuple[str, str | None]:
    m = GPKG_PATH_RE.match(path)
    if not m:
        raise ValueError(f'not a gpkg path: {path!r}')
    return m.group('file'), m.group('layer')


def _connect(file: str) -> sqlite3.Connection:
    return sqlite3.connect(file)


def _layers(con) -> list[str]:
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type='features'"
        ).fetchall()
        return [r[0] for r in rows]
    except sqlite3.OperationalError:
        return []


def _geom_column(con, layer: str) -> tuple[str | None, int]:
    try:
        row = con.execute(
            'SELECT column_name, srs_id FROM gpkg_geometry_columns '
            'WHERE table_name=?', (layer,)).fetchone()
        return (row[0], row[1]) if row else (None, 4326)
    except sqlite3.OperationalError:
        return None, 4326


def _resolve(file: str, layer: str | None):
    con = _connect(file)
    try:
        layers = _layers(con)
        if layer is None:
            if not layers:
                raise ValueError(f'no feature layers in {file!r}')
            layer = layers[0]  # autodetect: first features layer
        elif layer not in layers:
            raise ValueError(f'layer {layer!r} not in {file!r} (has {layers})')
        geom_col, srs = _geom_column(con, layer)
        cols = con.execute(f'PRAGMA table_info("{layer}")').fetchall()
        span = con.execute(
            f'SELECT MIN(_rowid_), MAX(_rowid_), COUNT(*) FROM "{layer}"').fetchone()
        has_rtree = geom_col is not None and con.execute(
            "SELECT 1 FROM sqlite_master WHERE name=?",
            (f'rtree_{layer}_{geom_col}',)).fetchone() is not None
        return layer, geom_col, srs, cols, span, has_rtree
    finally:
        con.close()


def gpkg_unwrap(blob: bytes | None) -> bytes | None:
    """GPKG geometry blob -> plain WKB (strip the GP header + envelope)."""
    if blob is None or len(blob) < 8 or blob[0:2] != b'GP':
        return blob  # tolerate raw WKB
    flags = blob[3]
    env = (flags >> 1) & 0x07
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env, 0)
    return bytes(blob[8 + env_len:])


def gpkg_wrap(wkb: bytes | None, srs_id: int = 4326) -> bytes | None:
    """Plain WKB -> GPKG blob: GP magic, version 0, little-endian flags,
    no envelope (envelope indicator 0 is spec-valid)."""
    if wkb is None:
        return None
    return b'GP\x00\x01' + struct.pack('<i', srs_id) + bytes(wkb)


def read_gpkg(spark: SparkSession, path: str, bbox: tuple | None = None,
              num_partitions: int | None = None) -> DataFrame:
    """Distributed GPKG scan. ``bbox=(minx, miny, maxx, maxy)`` pushes the
    spatial filter into sqlite via the layer rtree when present."""
    file, layer = split_path(path)
    if not os.path.exists(file):
        raise FileNotFoundError(file)
    layer, geom_col, srs, cols, (lo, hi, n), has_rtree = _resolve(file, layer)

    fields, names = [], []
    for _, name, decl, *_ in cols:
        base = (decl or '').split('(')[0].upper()
        if name == geom_col:
            fields.append(T.StructField('geometry', T.BinaryType()))
        else:
            fields.append(T.StructField(name, _SQLITE_TYPES.get(base, T.StringType())))
        names.append(name)
    schema = T.StructType(fields)

    if n == 0 or lo is None:
        return spark.createDataFrame([], schema)

    if num_partitions is None:
        # ~64k rows per slice, capped by parallelism floor of 1
        num_partitions = max(1, min(int(spark.sparkContext.defaultParallelism) * 2,
                                    (n + 65535) // 65536))
    step = (hi - lo) // num_partitions + 1
    ranges = [(lo + i * step, min(hi, lo + (i + 1) * step - 1))
              for i in range(num_partitions) if lo + i * step <= hi]
    rdf = spark.createDataFrame(ranges, 'lo long, hi long').repartition(len(ranges))

    sel = ', '.join(f'"{c}"' for c in names)
    where = '_rowid_ BETWEEN ? AND ?'
    params_extra: tuple = ()
    if bbox is not None and has_rtree:
        where += (f' AND _rowid_ IN (SELECT id FROM "rtree_{layer}_{geom_col}" '
                  'WHERE minx <= ? AND maxx >= ? AND miny <= ? AND maxy >= ?)')
        params_extra = (bbox[2], bbox[0], bbox[3], bbox[1])
    query = f'SELECT {sel} FROM "{layer}" WHERE {where}'
    out_names = [f.name for f in schema.fields]
    geom_idx = names.index(geom_col) if geom_col else -1

    def _scan(batches):
        con = sqlite3.connect(file)
        try:
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    rows = con.execute(query, (r.lo, r.hi) + params_extra).fetchall()
                    if not rows:
                        continue
                    data = pd.DataFrame(rows, columns=out_names)
                    if geom_idx >= 0:
                        data['geometry'] = data['geometry'].map(gpkg_unwrap)
                    yield data
        finally:
            con.close()

    df = rdf.mapInPandas(_scan, schema=schema)
    if bbox is not None and geom_col and not has_rtree:
        from erde_spark.functions.geo import st_bounds
        b = st_bounds(F.col('geometry'))
        df = (df.withColumn('__b', b)
                .filter((F.col('__b.minx') <= bbox[2]) & (F.col('__b.maxx') >= bbox[0]) &
                        (F.col('__b.miny') <= bbox[3]) & (F.col('__b.maxy') >= bbox[1]))
                .drop('__b'))
    from erde_spark.geo.crs import set_crs
    return set_crs(df, srs if srs and srs > 0 else 4326)


_SPARK_TO_SQLITE = {
    'bigint': 'INTEGER', 'int': 'INTEGER', 'smallint': 'INTEGER',
    'tinyint': 'INTEGER', 'boolean': 'BOOLEAN', 'double': 'REAL',
    'float': 'REAL', 'string': 'TEXT', 'binary': 'BLOB',
    'date': 'DATE', 'timestamp': 'DATETIME',
}


def write_gpkg(df: DataFrame, path: str, mode: str = 'overwrite',
               batch_size: int = 1000) -> None:
    """Write a DataFrame as a GPKG features layer. Delete-then-create layer
    semantics like the reference; appends with ``mode='append'``."""
    from erde_spark.geo.crs import get_crs
    file, layer = split_path(path)
    layer = layer or 'layer'
    srs = get_crs(df) or 4326
    geom_col = 'geometry' if 'geometry' in df.columns else None

    con = sqlite3.connect(file)
    try:
        con.execute('PRAGMA application_id = 0x47504B47')  # "GPKG"
        con.execute('PRAGMA user_version = 10300')
        con.execute(
            'CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys ('
            'srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, '
            'organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, '
            'definition TEXT NOT NULL, description TEXT)')
        for sid, name in ((-1, 'Undefined cartesian'), (0, 'Undefined geographic'),
                          (4326, 'WGS 84'), (3857, 'Web Mercator')):
            con.execute('INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES '
                        "(?, ?, 'EPSG', ?, 'undefined', NULL)", (name, sid, sid))
        con.execute(
            'CREATE TABLE IF NOT EXISTS gpkg_contents ('
            'table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL, '
            'identifier TEXT UNIQUE, description TEXT DEFAULT "", '
            'last_change DATETIME, min_x DOUBLE, min_y DOUBLE, '
            'max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)')
        con.execute(
            'CREATE TABLE IF NOT EXISTS gpkg_geometry_columns ('
            'table_name TEXT NOT NULL, column_name TEXT NOT NULL, '
            'geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, '
            'z TINYINT NOT NULL, m TINYINT NOT NULL, '
            'CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))')

        exists = con.execute('SELECT 1 FROM sqlite_master WHERE name=?',
                             (layer,)).fetchone()
        if exists and mode == 'overwrite':
            con.execute(f'DROP TABLE "{layer}"')
            con.execute('DELETE FROM gpkg_contents WHERE table_name=?', (layer,))
            con.execute('DELETE FROM gpkg_geometry_columns WHERE table_name=?', (layer,))
            exists = None
        if not exists:
            defs = ['fid INTEGER PRIMARY KEY AUTOINCREMENT']
            for name, dt in df.dtypes:
                sq = 'BLOB' if name == geom_col else _SPARK_TO_SQLITE.get(dt, 'TEXT')
                defs.append(f'"{name}" {sq}')
            con.execute(f'CREATE TABLE "{layer}" ({", ".join(defs)})')
            con.execute("INSERT INTO gpkg_contents (table_name, data_type, "
                        "identifier, srs_id) VALUES (?, 'features', ?, ?)",
                        (layer, layer, srs))
            if geom_col:
                con.execute('INSERT INTO gpkg_geometry_columns VALUES '
                            "(?, ?, 'GEOMETRY', ?, 0, 0)", (layer, geom_col, srs))

        names = [c for c, _ in df.dtypes]
        ins = (f'INSERT INTO "{layer}" ({", ".join(chr(34)+c+chr(34) for c in names)}) '
               f'VALUES ({", ".join("?"*len(names))})')
        gi = names.index(geom_col) if geom_col else -1
        batch = []
        # toLocalIterator streams one partition at a time -> constant driver memory
        for row in df.toLocalIterator():
            vals = list(row)
            if gi >= 0:
                vals[gi] = gpkg_wrap(vals[gi], srs)
            batch.append(vals)
            if len(batch) >= batch_size:
                con.executemany(ins, batch)
                batch = []
        if batch:
            con.executemany(ins, batch)
        con.commit()
    finally:
        con.close()


def gpkg_stats(path: str) -> pd.DataFrame:
    """min/mean/max/variance/count per numeric column, pushed to sqlite SQL
    (reference `/root/reference/erde/io/gpkg.py:102-117`). Variance is the
    population variance E[x^2] - E[x]^2 computed in one scan."""
    file, layer = split_path(path)
    layer, geom_col, _, cols, _, _ = _resolve(file, layer)
    num = [name for _, name, decl, *_ in cols
           if name != geom_col and name != 'fid'
           and (decl or '').split('(')[0].upper() in
           ('INTEGER', 'INT', 'MEDIUMINT', 'SMALLINT', 'TINYINT', 'REAL',
            'DOUBLE', 'FLOAT')]
    con = _connect(file)
    try:
        out = []
        for c in num:
            q = (f'SELECT MIN("{c}"), AVG("{c}"), MAX("{c}"), '
                 f'AVG("{c}"*"{c}") - AVG("{c}")*AVG("{c}"), COUNT("{c}") '
                 f'FROM "{layer}"')
            mn, mean, mx, var, cnt = con.execute(q).fetchone()
            out.append({'column': c, 'min': mn, 'mean': mean, 'max': mx,
                        'variance': var, 'count': cnt})
        return pd.DataFrame(out)
    finally:
        con.close()
