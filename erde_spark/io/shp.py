"""ESRI Shapefile source/sink on the stdlib — no fiona/GDAL needed.

A shapefile is three fixed binary files (public ESRI whitepaper, 1998):
``.shp`` (geometry records), ``.shx`` (per-record byte offsets), ``.dbf``
(dBase III attribute table, fixed-width records). Optional ``.prj`` holds
the CRS as ESRI WKT and ``.cpg`` the text encoding.

Reference behavior mirrored (`/root/reference/erde/io/shp.py:11-43` — a
fiona driver with the same read_df/write_df surface).

Scale design:

* **read** — the ``.shx`` index gives every record's byte offset and the
  ``.dbf`` header gives a fixed record size, so the scan is SPLITTABLE
  without parsing: the driver reads only the two headers (O(1) memory),
  carves the record space into contiguous slices, and each ``mapInPandas``
  task seeks straight to its slice in ``.shx``/``.shp``/``.dbf``. No
  driver-side materialization, no shuffle; parallelism scales with record
  count like a parquet scan.
* **bbox pushdown** — each task compares its records' shape bboxes (stored
  per record in the .shp) before full geometry parse and drops
  non-intersecting rows early.
* **write** — the three files are sequential single-writer formats, so the
  sink funnels through the driver streaming one partition at a time
  (``toLocalIterator``), constant memory — same contract as the
  reference's fiona writer.
"""

from __future__ import annotations

import datetime as _dt
import os
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from erde_spark.geo import geom as G

# shape type code -> (base kind, has Z, has M); M/Z coords are skipped (2D model)
_SHAPE_KINDS = {
    0: None,
    1: 'Point', 11: 'Point', 21: 'Point',
    3: 'PolyLine', 13: 'PolyLine', 23: 'PolyLine',
    5: 'Polygon', 15: 'Polygon', 25: 'Polygon',
    8: 'MultiPoint', 18: 'MultiPoint', 28: 'MultiPoint',
}


# ---------------------------------------------------------------- helpers

def _ring_area2(ring) -> float:
    """Twice the signed shoelace area, translated to the first vertex
    (cancellation discipline, see geo/geom.py)."""
    x0, y0 = ring[0]
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    return s


def _point_in_ring(pt, ring) -> bool:
    x, y = pt
    inside = False
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        if (y1 > y) != (y2 > y) and x < x1 + (y - y1) / (y2 - y1) * (x2 - x1):
            inside = not inside
    return inside


def _assemble_polygon(rings):
    """Shapefile polygons are flat ring lists: outer rings wind clockwise
    (negative shoelace), holes counter-clockwise. Group holes under the
    shell that contains them; 1 shell -> Polygon, else MultiPolygon."""
    shells = [r for r in rings if _ring_area2(r) <= 0]
    holes = [r for r in rings if _ring_area2(r) > 0]
    if not shells:                      # degenerate: treat all as shells
        shells, holes = rings, []
    if len(shells) == 1:
        return ('Polygon', [shells[0]] + holes)
    polys = [[s] for s in shells]
    for h in holes:
        for i, s in enumerate(shells):
            if _point_in_ring(h[0], s):
                polys[i].append(h)
                break
        else:
            polys.append([h])           # orphan hole: keep as its own shell
    return ('MultiPolygon', polys)


def _parse_shape(buf: bytes):
    """One .shp record's content -> (geometry tuple | None, bbox | None)."""
    (code,) = struct.unpack_from('<i', buf, 0)
    kind = _SHAPE_KINDS.get(code)
    if kind is None:
        return None, None
    if kind == 'Point':
        x, y = struct.unpack_from('<2d', buf, 4)
        return ('Point', (x, y)), (x, y, x, y)
    bbox = struct.unpack_from('<4d', buf, 4)
    if kind == 'MultiPoint':
        (n,) = struct.unpack_from('<i', buf, 36)
        pts = list(zip(*[iter(struct.unpack_from(f'<{2 * n}d', buf, 40))] * 2))
        return ('MultiPoint', pts), bbox
    nparts, npts = struct.unpack_from('<2i', buf, 36)
    parts = struct.unpack_from(f'<{nparts}i', buf, 44)
    coords = struct.unpack_from(f'<{2 * npts}d', buf, 44 + 4 * nparts)
    pts = list(zip(*[iter(coords)] * 2))
    pieces = [pts[a:b] for a, b in zip(parts, list(parts[1:]) + [npts])]
    if kind == 'PolyLine':
        geom = (('LineString', pieces[0]) if len(pieces) == 1
                else ('MultiLineString', pieces))
    else:
        geom = _assemble_polygon(pieces)
    return geom, bbox


def _shape_bytes(geom) -> tuple[bytes, tuple | None]:
    """Geometry tuple -> .shp record content (+ bbox), little-endian."""
    if geom is None:
        return struct.pack('<i', 0), None
    gtype, data = geom

    def xy(pts):
        return b''.join(struct.pack('<2d', float(x), float(y)) for x, y in pts)

    def bbox_of(pts):
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        return (min(xs), min(ys), max(xs), max(ys))

    if gtype == 'Point':
        return struct.pack('<i2d', 1, float(data[0]), float(data[1])), \
            (data[0], data[1], data[0], data[1])
    if gtype == 'MultiPoint':
        bb = bbox_of(data)
        return (struct.pack('<i4di', 8, *bb, len(data)) + xy(data)), bb
    if gtype in ('LineString', 'MultiLineString'):
        parts = [data] if gtype == 'LineString' else list(data)
        code = 3
    elif gtype in ('Polygon', 'MultiPolygon'):
        polys = [data] if gtype == 'Polygon' else list(data)
        parts = []
        for rings in polys:
            # spec: shell clockwise (negative shoelace), holes CCW
            for i, r in enumerate(rings):
                a = _ring_area2(r)
                flip = (a > 0) if i == 0 else (a <= 0)
                parts.append(list(reversed(r)) if flip else list(r))
        code = 5
    else:
        raise ValueError(f'shapefile cannot store {gtype}')
    allpts = [p for part in parts for p in part]
    bb = bbox_of(allpts)
    offs, acc = [], 0
    for part in parts:
        offs.append(acc)
        acc += len(part)
    return (struct.pack('<i4d2i', code, *bb, len(parts), len(allpts))
            + struct.pack(f'<{len(offs)}i', *offs) + xy(allpts)), bb


# ---------------------------------------------------------------- dbf

def _dbf_header(fh):
    head = fh.read(32)
    nrec, hsize, rsize = struct.unpack_from('<iHH', head, 4)
    fields = []
    while True:
        fd = fh.read(32)
        if not fd or fd[0:1] == b'\r':
            break
        name = fd[:11].split(b'\x00')[0].decode('ascii', 'replace')
        ftype = chr(fd[11])
        flen, fdec = fd[16], fd[17]
        fields.append((name, ftype, flen, fdec))
    return nrec, hsize, rsize, fields


def _dbf_value(raw: bytes, ftype: str, fdec: int):
    s = raw.decode('utf-8', 'replace').strip()
    if not s:
        return None
    if ftype in 'NF':
        return float(s) if (fdec or '.' in s or 'e' in s.lower()) else int(s)
    if ftype == 'L':
        return s in 'YyTt'
    if ftype == 'D':
        return s  # keep ISO-ish yyyymmdd as string (reference: fiona str)
    return s


_FIELD_TYPES = {'N0': T.LongType(), 'N': T.DoubleType(), 'F': T.DoubleType(),
                'L': T.BooleanType(), 'D': T.StringType(), 'C': T.StringType()}


# ---------------------------------------------------------------- read

def read_shp(spark: SparkSession, path: str, bbox: tuple | None = None,
             num_partitions: int | None = None) -> DataFrame:
    """Distributed shapefile scan; see module docstring for the split
    strategy. ``bbox=(minx, miny, maxx, maxy)`` prunes per record on the
    stored shape bbox before geometry parse."""
    base = path[:-4]
    for ext in ('.shp', '.shx', '.dbf'):
        if not os.path.exists(base + ext):
            raise FileNotFoundError(base + ext)
    with open(base + '.shx', 'rb') as fh:
        shx_len = os.fstat(fh.fileno()).st_size
        nrec = (shx_len - 100) // 8
    with open(base + '.dbf', 'rb') as fh:
        dbf_n, dbf_hsize, dbf_rsize, fields = _dbf_header(fh)
    nrec = min(nrec, dbf_n) if dbf_n else nrec

    crs = _read_prj(base + '.prj')
    schema = T.StructType(
        [T.StructField(n, _FIELD_TYPES['N0' if t == 'N' and d == 0 else t],
                       True) for n, t, _l, d in fields]
        + [T.StructField('geometry', T.BinaryType())])
    if nrec == 0:
        df = spark.createDataFrame([], schema)
        from erde_spark.geo.crs import set_crs
        return set_crs(df, crs)

    if num_partitions is None:
        num_partitions = max(1, min(int(spark.sparkContext.defaultParallelism) * 2,
                                    (nrec + 65535) // 65536))
    step = nrec // num_partitions + 1
    slices = [(i, min(nrec, i + step)) for i in range(0, nrec, step)]
    rdf = (spark.createDataFrame(slices, 'lo long, hi long')
           .repartition(len(slices)))
    meta = (base, dbf_hsize, dbf_rsize, tuple(fields), bbox)

    def _scan(batches):
        base, hsize, rsize, fields, bbox = meta
        col_off, offs = [], 1  # 1 = deletion-flag byte
        for _n, _t, flen, _d in fields:
            col_off.append((offs, offs + flen))
            offs += flen
        with open(base + '.shx', 'rb') as shx, \
                open(base + '.shp', 'rb') as shp, \
                open(base + '.dbf', 'rb') as dbf:
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    lo, hi = int(r.lo), int(r.hi)
                    shx.seek(100 + 8 * lo)
                    idx = shx.read(8 * (hi - lo))
                    dbf.seek(hsize + rsize * lo)
                    attrs = dbf.read(rsize * (hi - lo))
                    rows = []
                    for i in range(hi - lo):
                        off, ln = struct.unpack_from('>2i', idx, 8 * i)
                        shp.seek(off * 2 + 8)
                        geom, gb = _parse_shape(shp.read(ln * 2))
                        if bbox is not None and gb is not None and (
                                gb[0] > bbox[2] or gb[2] < bbox[0]
                                or gb[1] > bbox[3] or gb[3] < bbox[1]):
                            continue
                        rec = attrs[rsize * i:rsize * (i + 1)]
                        if rec[0:1] == b'*':   # deleted row
                            continue
                        row = [_dbf_value(rec[a:b], f[1], f[3])
                               for (a, b), f in zip(col_off, fields)]
                        row.append(None if geom is None else G.wkb_dumps(geom))
                        rows.append(row)
                    if rows:
                        yield pd.DataFrame(rows, columns=[f.name
                                                          for f in schema.fields])

    df = rdf.mapInPandas(_scan, schema=schema)
    from erde_spark.geo.crs import set_crs
    return set_crs(df, crs)


_PRJ = {
    4326: ('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
           'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
           'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'),
    3857: ('PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",'
           'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
           'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
           'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
           'PROJECTION["Mercator_Auxiliary_Sphere"],'
           'PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],'
           'PARAMETER["Central_Meridian",0.0],'
           'PARAMETER["Standard_Parallel_1",0.0],'
           'PARAMETER["Auxiliary_Sphere_Type",0.0],UNIT["Meter",1.0]]'),
}


def _read_prj(path: str) -> int:
    try:
        with open(path) as fh:
            wkt = fh.read()
    except OSError:
        return 4326
    import re
    m = list(re.finditer(r'AUTHORITY\["EPSG",\s*"?(\d+)"?\]', wkt))
    if m:
        return int(m[-1].group(1))
    if 'Web_Mercator' in wkt or '"Mercator' in wkt:
        return 3857
    return 4326


# ---------------------------------------------------------------- write

def _dbf_fields(df: DataFrame):
    """Spark schema -> dBase field descriptors (fiona-compatible widths:
    int -> N 18.0, float -> N 24.15, bool -> L, else C 80)."""
    out = []
    for name, dt in df.dtypes:
        if name == 'geometry':
            continue
        nm = name[:10]
        if dt in ('bigint', 'int', 'smallint', 'tinyint'):
            out.append((name, nm, 'N', 18, 0))
        elif dt in ('double', 'float'):
            out.append((name, nm, 'N', 24, 15))
        elif dt == 'boolean':
            out.append((name, nm, 'L', 1, 0))
        else:
            out.append((name, nm, 'C', 80, 0))
    return out


def _dbf_cell(v, ftype: str, flen: int, fdec: int) -> bytes:
    if v is None:
        return b' ' * flen
    if ftype == 'N':
        s = f'{v:.{fdec}f}' if fdec else str(int(v))
        s = s[:flen].rjust(flen)
        return s.encode('ascii')
    if ftype == 'L':
        return b'T' if v else b'F'
    raw = str(v).encode('utf-8')[:flen]
    return raw.ljust(flen)


def write_shp(df: DataFrame, path: str, mode: str = 'overwrite', **kw) -> None:
    """Write `.shp` + `.shx` + `.dbf` (+ `.prj`/`.cpg`), streaming one
    partition at a time through the driver (single-writer format)."""
    from erde_spark.geo.crs import get_crs
    base = path[:-4]
    if mode == 'error' and os.path.exists(path):
        raise FileExistsError(path)
    crs = get_crs(df) or 4326
    fields = _dbf_fields(df)
    names = [c for c, _ in df.dtypes if c != 'geometry']
    has_geom = 'geometry' in df.columns

    shp = open(base + '.shp', 'wb')
    shx = open(base + '.shx', 'wb')
    dbf = open(base + '.dbf', 'wb')
    try:
        shp.write(b'\x00' * 100)     # headers patched at close
        shx.write(b'\x00' * 100)
        rsize = 1 + sum(f[3] for f in fields)
        hsize = 32 + 32 * len(fields) + 1
        dbf.write(b'\x00' * hsize)
        nrec, shtype = 0, 0
        bb = [float('inf'), float('inf'), float('-inf'), float('-inf')]
        offset = 50                  # in 16-bit words
        for row in df.toLocalIterator():
            d = row.asDict()
            geom = (G.wkb_loads(bytes(d['geometry']))
                    if has_geom and d.get('geometry') is not None else None)
            content, gb = _shape_bytes(geom)
            if gb is not None:
                bb = [min(bb[0], gb[0]), min(bb[1], gb[1]),
                      max(bb[2], gb[2]), max(bb[3], gb[3])]
                (shtype,) = struct.unpack_from('<i', content, 0) \
                    if shtype == 0 else (shtype,)
            nrec += 1
            ln = len(content) // 2
            shp.write(struct.pack('>2i', nrec, ln) + content)
            shx.write(struct.pack('>2i', offset, ln))
            offset += 4 + ln
            dbf.write(b' ' + b''.join(
                _dbf_cell(d.get(n), f[2], f[3], f[4])
                for n, f in zip(names, fields)))
        dbf.write(b'\x1a')

        if bb[0] == float('inf'):
            bb = [0.0, 0.0, 0.0, 0.0]
        today = _dt.date.today()
        for fh, total in ((shp, offset), (shx, 50 + 4 * nrec)):
            fh.seek(0)
            fh.write(struct.pack('>7i', 9994, 0, 0, 0, 0, 0, total))
            fh.write(struct.pack('<2i4d4d', 1000, shtype, *bb,
                                 0.0, 0.0, 0.0, 0.0))
        dbf.seek(0)
        dbf.write(struct.pack('<4B i HH 20x', 3, today.year % 100, today.month,
                              today.day, nrec, hsize, rsize))
        for _orig, nm, ftype, flen, fdec in fields:
            dbf.write(struct.pack('<11sc4xBB14x', nm.encode('ascii'),
                                  ftype.encode('ascii'), flen, fdec))
        dbf.write(b'\r')
    finally:
        shp.close()
        shx.close()
        dbf.close()
    with open(base + '.prj', 'w') as fh:
        fh.write(_PRJ.get(
            crs, f'PROJCS["EPSG_{crs}",AUTHORITY["EPSG","{crs}"]]'))
    with open(base + '.cpg', 'w') as fh:
        fh.write('UTF-8')
