"""FlatGeobuf source/sink — pure stdlib, no GDAL/fiona/flatbuffers lib.

Layout per the public spec (flatgeobuf.org, bjornharrtell/flatgeobuf):
8 magic bytes ``fgb\\x03fgb\\x01``, a size-prefixed FlatBuffers *Header*
(name, columns, geometry type, CRS, feature count, index node size), an
optional packed R-tree index (40-byte nodes: 4×f64 bbox + u64 offset,
stored root-first with leaves last), then one size-prefixed FlatBuffers
*Feature* per record (Geometry table + packed property bytes).

The FlatBuffers wire format itself (vtables, forward uoffsets, vectors) is
small enough that this module carries its own ~100-line builder/accessor
pair rather than depending on the ``flatbuffers`` package.

Reference behavior mirrored (`/root/reference/erde/io/fgb.py:11-59` — a
fiona driver with the same read_df/write_df surface).

Scale design:

* **read** — features are size-prefixed so the stream is self-describing,
  and when the packed R-tree is present its LEAF nodes give every
  feature's byte offset: the driver reads only the header plus one leaf
  node per partition boundary (O(P) seeks, no materialization) and each
  ``mapInPandas`` task seeks straight to its byte range — splittable like
  parquet. Tasks also read their slice of leaf *bboxes*, so a ``bbox``
  query skips non-intersecting features before any FlatBuffers parse.
  Unindexed files fall back to a driver-side streaming skip-scan of the
  u32 size prefixes (sequential read, O(1) memory per feature).
* **write** — single-writer format: features stream through the driver
  (``toLocalIterator``) into a spool file while bboxes accumulate, then
  magic + header + packed R-tree (file order — valid per spec; Hilbert
  sorting only improves locality) + spool are concatenated. Files with
  null geometries are written unindexed (the index must cover every
  feature).
"""

from __future__ import annotations

import os
import struct
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from erde_spark.geo import geom as G

MAGIC = b'fgb\x03fgb\x01'

_GEOM_CODE = {'Point': 1, 'LineString': 2, 'Polygon': 3, 'MultiPoint': 4,
              'MultiLineString': 5, 'MultiPolygon': 6, 'GeometryCollection': 7}
_GEOM_NAME = {v: k for k, v in _GEOM_CODE.items()}

# ColumnType enum -> (struct fmt | None for length-prefixed, spark type)
_COL_TYPES = {
    0: ('b', 'tinyint'), 1: ('B', 'smallint'), 2: ('?', 'boolean'),
    3: ('h', 'smallint'), 4: ('H', 'int'), 5: ('i', 'int'), 6: ('I', 'bigint'),
    7: ('q', 'bigint'), 8: ('Q', 'bigint'), 9: ('f', 'float'),
    10: ('d', 'double'), 11: (None, 'string'), 12: (None, 'string'),
    13: (None, 'string'), 14: (None, 'binary'),
}
_SPARK_TO_COL = {'tinyint': 0, 'boolean': 2, 'smallint': 3, 'int': 5,
                 'bigint': 7, 'float': 9, 'double': 10, 'string': 11,
                 'binary': 14, 'date': 13, 'timestamp': 13,
                 'timestamp_ntz': 13}

_NODE_FMT = '<4dQ'                     # packed R-tree node: bbox + offset
_NODE_SIZE = struct.calcsize(_NODE_FMT)


# ------------------------------------------------------- minimal FlatBuffers

_SZ = {'u8': 1, 'u16': 2, 'u32': 4, 'u64': 8, 'i32': 4, 'f64': 8, 'offset': 4}
_FMT = {'u8': 'B', 'u16': 'H', 'u32': 'I', 'u64': 'Q', 'i32': 'i', 'f64': 'd'}


class _FB:
    """Tiny FlatBuffers builder. Objects are PREPENDED (buffer grows toward
    the front, as in the reference implementation), so an object's handle is
    its *tail offset* — distance from the buffer end — and a stored uoffset
    is simply ``field_tail - target_tail`` (always forward/positive)."""

    def __init__(self):
        self.b = bytearray()

    def string(self, s: str) -> int:
        raw = s.encode('utf-8')
        pad = (-(len(self.b) + len(raw) + 1)) % 4
        self.b[:0] = struct.pack('<I', len(raw)) + raw + b'\x00' * (1 + pad)
        return len(self.b)

    def scalar_vector(self, fmt: str, vals, size: int) -> int:
        raw = struct.pack(f'<{len(vals)}{fmt}', *vals)
        return self.byte_vector(raw, len(vals), max(size, 4))

    def byte_vector(self, raw: bytes, count: int | None = None,
                    align: int = 4) -> int:
        pad = (-(len(self.b) + len(raw))) % align
        self.b[:0] = struct.pack(
            '<I', len(raw) if count is None else count) + raw + b'\x00' * pad
        return len(self.b)

    def offset_vector(self, targets: list[int]) -> int:
        n = len(targets)
        pad = (-(len(self.b) + 4 * n)) % 4
        elems_tail = len(self.b) + pad + 4 * n
        vals = [(elems_tail - 4 * i) - t for i, t in enumerate(targets)]
        self.b[:0] = (struct.pack(f'<I{n}I', n, *vals) + b'\x00' * pad)
        return len(self.b)

    def table(self, fields: list[tuple[int, str, int | float]]) -> int:
        """fields = [(field_id, kind, value)]; 'offset' values are tail
        offsets of already-built children. Returns the table's tail."""
        placed, off = [], 4                      # inline area after soffset
        for fid, kind, val in sorted(fields, key=lambda f: -_SZ[f[1]]):
            sz = _SZ[kind]
            off = (off + sz - 1) // sz * sz
            placed.append((fid, kind, val, off))
            off += sz
        tbl_len = off
        vt_len = 4 + 2 * (max((f[0] for f in fields), default=-1) + 1)
        pad = (-(len(self.b) + vt_len + tbl_len)) % 4
        blob_tail = len(self.b) + pad + vt_len + tbl_len
        tbl_tail = blob_tail - vt_len
        tbl = bytearray(tbl_len)
        struct.pack_into('<i', tbl, 0, vt_len)   # soffset: vtable sits before
        vt = bytearray(vt_len)
        struct.pack_into('<HH', vt, 0, vt_len, tbl_len)
        for fid, kind, val, o in placed:
            if kind == 'offset':
                struct.pack_into('<I', tbl, o, (tbl_tail - o) - val)
            else:
                struct.pack_into('<' + _FMT[kind], tbl, o, val)
            struct.pack_into('<H', vt, 4 + 2 * fid, o)
        self.b[:0] = bytes(vt) + bytes(tbl) + b'\x00' * pad
        return tbl_tail

    def finish(self, root_tail: int) -> bytes:
        self.b[:0] = struct.pack('<I', (len(self.b) + 4) - root_tail)
        return bytes(self.b)


def _indirect(buf, pos: int) -> int:
    return pos + struct.unpack_from('<I', buf, pos)[0]


def _tfield(buf, tpos: int, fid: int) -> int:
    """Absolute position of a table field's inline data, or 0 if absent."""
    vt = tpos - struct.unpack_from('<i', buf, tpos)[0]
    o = 4 + 2 * fid
    if o + 2 > struct.unpack_from('<H', buf, vt)[0]:
        return 0
    fo = struct.unpack_from('<H', buf, vt + o)[0]
    return tpos + fo if fo else 0


def _tscalar(buf, tpos, fid, fmt, default=0):
    p = _tfield(buf, tpos, fid)
    return struct.unpack_from('<' + fmt, buf, p)[0] if p else default


def _tstring(buf, tpos, fid) -> str | None:
    p = _tfield(buf, tpos, fid)
    if not p:
        return None
    sp = _indirect(buf, p)
    n = struct.unpack_from('<I', buf, sp)[0]
    return bytes(buf[sp + 4:sp + 4 + n]).decode('utf-8')


def _tvec(buf, tpos, fid, fmt):
    p = _tfield(buf, tpos, fid)
    if not p:
        return ()
    vp = _indirect(buf, p)
    n = struct.unpack_from('<I', buf, vp)[0]
    return struct.unpack_from(f'<{n}{fmt}', buf, vp + 4)


def _tbytes(buf, tpos, fid) -> bytes:
    p = _tfield(buf, tpos, fid)
    if not p:
        return b''
    vp = _indirect(buf, p)
    n = struct.unpack_from('<I', buf, vp)[0]
    return bytes(buf[vp + 4:vp + 4 + n])


def _toffvec(buf, tpos, fid) -> list[int]:
    p = _tfield(buf, tpos, fid)
    if not p:
        return []
    vp = _indirect(buf, p)
    n = struct.unpack_from('<I', buf, vp)[0]
    return [_indirect(buf, vp + 4 + 4 * i) for i in range(n)]


# ------------------------------------------------------------ geometry codec

def _encode_geom(fb: _FB, geom) -> int:
    gtype, data = geom
    fields = [(6, 'u8', _GEOM_CODE[gtype])]
    if gtype == 'MultiPolygon':
        parts = [_encode_geom(fb, ('Polygon', rings)) for rings in data]
        fields.append((7, 'offset', fb.offset_vector(parts)))
    elif gtype == 'GeometryCollection':
        parts = [_encode_geom(fb, g) for g in data]
        fields.append((7, 'offset', fb.offset_vector(parts)))
    else:
        if gtype == 'Point':
            pts = [data]
        elif gtype in ('LineString', 'MultiPoint'):
            pts = data
        else:                                    # Polygon / MultiLineString
            if len(data) > 1:
                ends, acc = [], 0
                for part in data:
                    acc += len(part)
                    ends.append(acc)
                fields.append((0, 'offset', fb.scalar_vector('I', ends, 4)))
            pts = [p for part in data for p in part]
        xy = [float(c) for p in pts for c in p[:2]]
        fields.append((1, 'offset', fb.scalar_vector('d', xy, 8)))
    return fb.table(fields)


def _decode_geom(buf, gpos: int, default_type: int):
    code = _tscalar(buf, gpos, 6, 'B', 0) or default_type
    parts = _toffvec(buf, gpos, 7)
    if code == 7:
        return ('GeometryCollection', [_decode_geom(buf, p, 0) for p in parts])
    if code == 6 and parts:
        return ('MultiPolygon',
                [_decode_geom(buf, p, 3)[1] for p in parts])
    xy = _tvec(buf, gpos, 1, 'd')
    pts = [(xy[i], xy[i + 1]) for i in range(0, len(xy), 2)]
    if code == 1:
        return ('Point', pts[0])
    if code == 4:
        return ('MultiPoint', pts)
    if code == 2:
        return ('LineString', pts)
    ends, rings, prev = _tvec(buf, gpos, 0, 'I'), [], 0
    for e in (ends or (len(pts),)):
        rings.append(pts[prev:e])
        prev = e
    if code == 5:
        return ('MultiLineString', rings)
    if code == 6:
        return ('MultiPolygon', [rings])
    return ('Polygon', rings)


def _all_pts(geom):
    gtype, d = geom
    if gtype == 'Point':
        return [d]
    if gtype in ('LineString', 'MultiPoint'):
        return d
    if gtype in ('Polygon', 'MultiLineString'):
        return [p for part in d for p in part]
    if gtype == 'MultiPolygon':
        return [p for poly in d for ring in poly for p in ring]
    return [p for g in d for p in _all_pts(g)]


def _bbox(geom):
    pts = _all_pts(geom)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return (min(xs), min(ys), max(xs), max(ys))


# ---------------------------------------------------------- properties codec

def _encode_props(vals, col_types) -> bytes:
    out = bytearray()
    for i, (v, ct) in enumerate(zip(vals, col_types)):
        if v is None:
            continue
        out += struct.pack('<H', i)
        fmt = _COL_TYPES[ct][0]
        if fmt:
            out += struct.pack('<' + fmt,
                               bool(v) if fmt == '?' else v)
        else:
            raw = bytes(v) if isinstance(v, (bytes, bytearray)) else \
                str(v).encode('utf-8')
            out += struct.pack('<I', len(raw)) + raw
    return bytes(out)


def _decode_props(raw: bytes, col_types) -> list:
    vals, o = [None] * len(col_types), 0
    while o + 2 <= len(raw):
        (i,) = struct.unpack_from('<H', raw, o)
        o += 2
        ct = col_types[i]
        fmt = _COL_TYPES[ct][0]
        if fmt:
            vals[i] = struct.unpack_from('<' + fmt, raw, o)[0]
            o += struct.calcsize(fmt)
        else:
            (n,) = struct.unpack_from('<I', raw, o)
            o += 4
            chunk = raw[o:o + n]
            o += n
            vals[i] = chunk if ct == 14 else chunk.decode('utf-8')
    return vals


# ------------------------------------------------------------- packed R-tree

def _tree_level_sizes(n: int, node_size: int) -> list[int]:
    """Node counts per level, leaves first."""
    node_size = min(max(node_size, 2), 65535)
    sizes = [n]
    while sizes[-1] > 1:
        sizes.append((sizes[-1] + node_size - 1) // node_size)
    return sizes


def _tree_size(n: int, node_size: int) -> int:
    return sum(_tree_level_sizes(n, node_size)) * _NODE_SIZE if n else 0


def _build_tree(leaves: list[tuple], node_size: int) -> bytes:
    """leaves = [(minx, miny, maxx, maxy, feature_byte_offset)] in file
    order. Internal node offsets point at the first child's byte offset
    within the tree, per spec."""
    node_size = min(max(node_size, 2), 65535)
    levels = [leaves]
    while len(levels[-1]) > 1:
        prev, cur = levels[-1], []
        for i in range(0, len(prev), node_size):
            grp = prev[i:i + node_size]
            cur.append((min(g[0] for g in grp), min(g[1] for g in grp),
                        max(g[2] for g in grp), max(g[3] for g in grp), i))
        levels.append(cur)
    order = list(reversed(levels))               # root level first
    starts, acc = [], 0
    for lvl in order:
        starts.append(acc)
        acc += len(lvl)
    out = bytearray()
    for li, lvl in enumerate(order):
        leaf_level = li == len(order) - 1
        for node in lvl:
            off = node[4] if leaf_level else \
                (starts[li + 1] + node[4]) * _NODE_SIZE
            out += struct.pack(_NODE_FMT, node[0], node[1], node[2], node[3], off)
    return bytes(out)


# ------------------------------------------------------------------- header

def _encode_header(columns, geom_code: int, crs: int, count: int,
                   node_size: int, envelope) -> bytes:
    fb = _FB()
    col_offs = []
    for cname, ctype in columns:
        nm = fb.string(cname)
        col_offs.append(fb.table([(0, 'offset', nm), (1, 'u8', ctype)]))
    fields = [(2, 'u8', geom_code), (8, 'u64', count),
              (9, 'u16', node_size)]
    if col_offs:
        fields.append((7, 'offset', fb.offset_vector(col_offs)))
    if crs:
        crs_t = fb.table([(0, 'offset', fb.string('EPSG')), (1, 'i32', crs)])
        fields.append((10, 'offset', crs_t))
    if envelope:
        fields.append((1, 'offset', fb.scalar_vector('d', envelope, 8)))
    fields.append((0, 'offset', fb.string('layer')))
    buf = fb.finish(fb.table(fields))
    return struct.pack('<I', len(buf)) + buf


def _decode_header(buf: bytes):
    root = _indirect(buf, 0)
    geom_code = _tscalar(buf, root, 2, 'B', 0)
    count = _tscalar(buf, root, 8, 'Q', 0)
    node_size = _tscalar(buf, root, 9, 'H', 16)
    cols = [(_tstring(buf, c, 0), _tscalar(buf, c, 1, 'B', 0))
            for c in _toffvec(buf, root, 7)]
    crs, crs_f = 0, _tfield(buf, root, 10)
    if crs_f:
        crs = _tscalar(buf, _indirect(buf, crs_f), 1, 'i', 0)
    return geom_code, count, node_size, cols, crs


# --------------------------------------------------------------------- read

def read_fgb(spark: SparkSession, path: str, bbox: tuple | None = None,
             num_partitions: int | None = None) -> DataFrame:
    """Distributed FlatGeobuf scan; see module docstring for the split
    strategy. ``bbox=(minx, miny, maxx, maxy)`` prunes on the R-tree leaf
    bboxes (or parsed bboxes when unindexed) before WKB assembly."""
    from erde_spark.geo.crs import set_crs
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    file_size = os.path.getsize(path)
    with open(path, 'rb') as fh:
        magic = fh.read(8)
        if magic[:4] != MAGIC[:4]:
            raise ValueError(f'{path!r} is not FlatGeobuf (bad magic)')
        (hsize,) = struct.unpack('<I', fh.read(4))
        geom_code, count, node_size, cols, crs = _decode_header(fh.read(hsize))
        index_off = 8 + 4 + hsize
        index_size = _tree_size(count, node_size) if node_size else 0
        data_start = index_off + index_size
        total_nodes = (sum(_tree_level_sizes(count, node_size))
                       if node_size and count else 0)

        if count and node_size:
            n = count

            def _feature_off(i: int) -> int:
                if i >= n:
                    return file_size - data_start
                fh.seek(index_off + (total_nodes - n + i) * _NODE_SIZE + 32)
                return struct.unpack('<Q', fh.read(8))[0]
        else:
            # unindexed: streaming skip-scan of size prefixes on the driver
            offs, pos = [], data_start
            while pos + 4 <= file_size:
                offs.append(pos - data_start)
                fh.seek(pos)
                (sz,) = struct.unpack('<I', fh.read(4))
                pos += 4 + sz
            n = len(offs)
            offs.append(file_size - data_start)

            def _feature_off(i: int) -> int:
                return offs[i]

        schema = T.StructType(
            [T.StructField(cn, _spark_type(ct)) for cn, ct in cols]
            + [T.StructField('geometry', T.BinaryType())])
        if n == 0:
            return set_crs(spark.createDataFrame([], schema), crs or 4326)

        if num_partitions is None:
            num_partitions = max(1, min(
                int(spark.sparkContext.defaultParallelism) * 2,
                (n + 32767) // 32768))
        step = n // num_partitions + 1
        slices = [(lo, min(n, lo + step),
                   _feature_off(lo), _feature_off(min(n, lo + step)))
                  for lo in range(0, n, step)]

    col_types = tuple(ct for _cn, ct in cols)
    names = [f.name for f in schema.fields]
    meta = (path, data_start, index_off, total_nodes, n, bbox, geom_code)

    def _scan(batches):
        path, data_start, index_off, total_nodes, n, bbox, gcode = meta
        with open(path, 'rb') as fh:
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    lo, hi = int(r.lo), int(r.hi)
                    start, end = int(r.start), int(r.end)
                    boxes = None
                    if bbox is not None and total_nodes:
                        fh.seek(index_off
                                + (total_nodes - n + lo) * _NODE_SIZE)
                        raw = fh.read((hi - lo) * _NODE_SIZE)
                        boxes = [struct.unpack_from(_NODE_FMT, raw, i * _NODE_SIZE)[:4]
                                 for i in range(hi - lo)]
                    fh.seek(data_start + start)
                    buf = fh.read(end - start)
                    rows, p = [], 0
                    for i in range(hi - lo):
                        (sz,) = struct.unpack_from('<I', buf, p)
                        fpos, p = p + 4, p + 4 + sz
                        if boxes is not None:
                            b = boxes[i]
                            if (b[0] > bbox[2] or b[2] < bbox[0]
                                    or b[1] > bbox[3] or b[3] < bbox[1]):
                                continue
                        root = _indirect(buf, fpos)
                        gfield = _tfield(buf, root, 0)
                        geom = wkb = None
                        if gfield:
                            geom = _decode_geom(buf, _indirect(buf, gfield),
                                                gcode)
                        if geom is not None and bbox is not None \
                                and boxes is None:
                            gb = _bbox(geom)
                            if (gb[0] > bbox[2] or gb[2] < bbox[0]
                                    or gb[1] > bbox[3] or gb[3] < bbox[1]):
                                continue
                        if geom is not None:
                            wkb = G.wkb_dumps(geom)
                        vals = _decode_props(_tbytes(buf, root, 1), col_types)
                        rows.append(vals + [wkb])
                    if rows:
                        yield pd.DataFrame(rows, columns=names)

    rdf = (spark.createDataFrame(slices, 'lo long, hi long, start long, end long')
           .repartition(len(slices)))
    return set_crs(rdf.mapInPandas(_scan, schema=schema), crs or 4326)


def _spark_type(col_type: int) -> T.DataType:
    return {
        'tinyint': T.ByteType(), 'smallint': T.ShortType(),
        'boolean': T.BooleanType(), 'int': T.IntegerType(),
        'bigint': T.LongType(), 'float': T.FloatType(),
        'double': T.DoubleType(), 'string': T.StringType(),
        'binary': T.BinaryType(),
    }[_COL_TYPES[col_type][1]]


# -------------------------------------------------------------------- write

def write_fgb(df: DataFrame, path: str, mode: str = 'overwrite',
              node_size: int = 16, **kw) -> None:
    """Write a FlatGeobuf file, streaming one partition at a time through
    the driver (single-writer format). Indexed unless any geometry is null."""
    from erde_spark.geo.crs import get_crs
    if mode == 'error' and os.path.exists(path):
        raise FileExistsError(path)
    crs = get_crs(df) or 4326
    has_geom = 'geometry' in df.columns
    columns = [(c, _SPARK_TO_COL.get(dt, 11))
               for c, dt in df.dtypes if c != 'geometry']
    col_types = [ct for _c, ct in columns]
    names = [c for c, _ct in columns]

    leaves, geom_codes, spool_pos, any_null = [], set(), 0, False
    env = [float('inf'), float('inf'), float('-inf'), float('-inf')]
    spool = tempfile.NamedTemporaryFile(
        dir=os.path.dirname(os.path.abspath(path)) or '.', delete=False)
    try:
        for row in df.toLocalIterator():
            d = row.asDict()
            fb = _FB()
            fields = []
            raw_props = _encode_props([d.get(c) for c in names], col_types)
            if raw_props:
                fields.append((1, 'offset', fb.byte_vector(raw_props)))
            geom = None
            if has_geom and d.get('geometry') is not None:
                geom = G.wkb_loads(bytes(d['geometry']))
                fields.append((0, 'offset', _encode_geom(fb, geom)))
            body = fb.finish(fb.table(fields))
            rec = struct.pack('<I', len(body)) + body
            if geom is None:
                any_null = True
                leaves.append((0.0, 0.0, 0.0, 0.0, spool_pos))
            else:
                gb = _bbox(geom)
                geom_codes.add(_GEOM_CODE[geom[0]])
                env = [min(env[0], gb[0]), min(env[1], gb[1]),
                       max(env[2], gb[2]), max(env[3], gb[3])]
                leaves.append((gb[0], gb[1], gb[2], gb[3], spool_pos))
            spool.write(rec)
            spool_pos += len(rec)
        spool.close()

        count = len(leaves)
        indexed = count > 0 and not any_null and node_size > 0
        geom_code = geom_codes.pop() if len(geom_codes) == 1 else 0
        envelope = env if env[0] != float('inf') else None
        with open(path, 'wb') as out:
            out.write(MAGIC)
            out.write(_encode_header(columns, geom_code, crs, count,
                                     node_size if indexed else 0, envelope))
            if indexed:
                out.write(_build_tree(leaves, node_size))
            with open(spool.name, 'rb') as src:
                while True:
                    chunk = src.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
    finally:
        os.unlink(spool.name)
