"""Geometry model + WKT/WKB codecs (pure Python, no GEOS).

Model: a geometry is ``(gtype, data)`` where ``gtype`` is one of
``Point LineString Polygon MultiPoint MultiLineString MultiPolygon
GeometryCollection`` and ``data`` is:

* Point               -> (x, y)
* LineString          -> [(x, y), ...]
* Polygon             -> [ring, ...]     (ring = closed [(x, y), ...], first ring is the shell)
* MultiPoint          -> [(x, y), ...]
* MultiLineString     -> [[(x, y), ...], ...]
* MultiPolygon        -> [[ring, ...], ...]
* GeometryCollection  -> [Geometry, ...]

WKB follows the OGC simple-features 2D encoding (type codes 1-7), which is
what the reference exchanges with PostGIS (`/root/reference/erde/io/postgres.py:34,48`)
and what our DataFrames carry in the ``geometry`` BinaryType column.
"""

from __future__ import annotations

import re
import struct
from typing import Any, Tuple

Geometry = Tuple[str, Any]

_TYPE_CODES = {
    'Point': 1, 'LineString': 2, 'Polygon': 3, 'MultiPoint': 4,
    'MultiLineString': 5, 'MultiPolygon': 6, 'GeometryCollection': 7,
}
_CODE_TYPES = {v: k for k, v in _TYPE_CODES.items()}


# ---------------------------------------------------------------- WKB

def wkb_dumps(geom: Geometry) -> bytes:
    """Serialize a geometry to little-endian 2D WKB."""
    gtype, data = geom
    out = [b'\x01', struct.pack('<I', _TYPE_CODES[gtype])]
    if gtype == 'Point':
        out.append(struct.pack('<2d', float(data[0]), float(data[1])))
    elif gtype == 'LineString':
        out.append(_pack_coords(data))
    elif gtype == 'Polygon':
        out.append(struct.pack('<I', len(data)))
        for ring in data:
            out.append(_pack_coords(ring))
    elif gtype == 'MultiPoint':
        out.append(struct.pack('<I', len(data)))
        for pt in data:
            out.append(wkb_dumps(('Point', pt)))
    elif gtype == 'MultiLineString':
        out.append(struct.pack('<I', len(data)))
        for line in data:
            out.append(wkb_dumps(('LineString', line)))
    elif gtype == 'MultiPolygon':
        out.append(struct.pack('<I', len(data)))
        for poly in data:
            out.append(wkb_dumps(('Polygon', poly)))
    elif gtype == 'GeometryCollection':
        out.append(struct.pack('<I', len(data)))
        for g in data:
            out.append(wkb_dumps(g))
    else:
        raise ValueError(f'unknown geometry type {gtype}')
    return b''.join(out)


def _pack_coords(coords) -> bytes:
    parts = [struct.pack('<I', len(coords))]
    for x, y in coords:
        parts.append(struct.pack('<2d', float(x), float(y)))
    return b''.join(parts)


def wkb_loads(buf: bytes) -> Geometry:
    """Parse 2D WKB (either endianness; Z/M not supported)."""
    geom, _ = _wkb_read(buf, 0)
    return geom


def _wkb_read(buf: bytes, off: int):
    endian = '<' if buf[off] == 1 else '>'
    (code,) = struct.unpack_from(endian + 'I', buf, off + 1)
    has_srid = bool(code & 0x20000000)  # PostGIS EWKB: SRID follows type
    code = code & 0xFF  # strip SRID/dimension flags
    gtype = _CODE_TYPES[code]
    off += 5
    if has_srid:
        off += 4  # skip the embedded 4-byte SRID (EWKB)
    if gtype == 'Point':
        x, y = struct.unpack_from(endian + '2d', buf, off)
        return ('Point', (x, y)), off + 16
    if gtype == 'LineString':
        coords, off = _wkb_read_coords(buf, off, endian)
        return ('LineString', coords), off
    if gtype == 'Polygon':
        (nrings,) = struct.unpack_from(endian + 'I', buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _wkb_read_coords(buf, off, endian)
            rings.append(ring)
        return ('Polygon', rings), off
    # multi-types & collections: nested full WKB geometries
    (n,) = struct.unpack_from(endian + 'I', buf, off)
    off += 4
    parts = []
    for _ in range(n):
        g, off = _wkb_read(buf, off)
        parts.append(g)
    if gtype == 'MultiPoint':
        return ('MultiPoint', [g[1] for g in parts]), off
    if gtype == 'MultiLineString':
        return ('MultiLineString', [g[1] for g in parts]), off
    if gtype == 'MultiPolygon':
        return ('MultiPolygon', [g[1] for g in parts]), off
    return ('GeometryCollection', parts), off


def _wkb_read_coords(buf: bytes, off: int, endian: str):
    (n,) = struct.unpack_from(endian + 'I', buf, off)
    off += 4
    vals = struct.unpack_from(endian + f'{2 * n}d', buf, off)
    coords = [(vals[2 * i], vals[2 * i + 1]) for i in range(n)]
    return coords, off + 16 * n


# ---------------------------------------------------------------- WKT

_WKT_TYPE_RE = re.compile(r'\s*([A-Za-z]+)\s*(EMPTY|\()', re.I)
_WKT_NAMES = {t.upper(): t for t in _TYPE_CODES}


def wkt_loads(text: str) -> Geometry:
    """Parse 2D WKT. Raises ValueError on malformed input."""
    geom, pos = _wkt_parse(text, 0)
    if text[pos:].strip():
        raise ValueError(f'trailing content in WKT: {text[pos:]!r}')
    return geom


def _wkt_parse(text: str, pos: int):
    m = _WKT_TYPE_RE.match(text, pos)
    if not m:
        raise ValueError(f'invalid WKT at {text[pos:pos + 30]!r}')
    name = m.group(1).upper()
    if name not in _WKT_NAMES:
        raise ValueError(f'unknown WKT geometry type {name}')
    gtype = _WKT_NAMES[name]
    if m.group(2).upper() == 'EMPTY':
        empty = (0.0, 0.0) if gtype == 'Point' else []
        if gtype == 'Point':
            raise ValueError('POINT EMPTY not supported')
        return (gtype, empty), m.end()
    pos = m.end() - 1  # at '('
    if gtype == 'Point':
        coords, pos = _wkt_coords(text, pos)
        return ('Point', coords[0]), pos
    if gtype in ('LineString', 'MultiPoint'):
        # MULTIPOINT accepts both (1 2, 3 4) and ((1 2), (3 4))
        data, pos = _wkt_coords_or_nested(text, pos)
        return (gtype, data), pos
    if gtype == 'Polygon':
        rings, pos = _wkt_nested(text, pos, _wkt_coords)
        return ('Polygon', rings), pos
    if gtype == 'MultiLineString':
        lines, pos = _wkt_nested(text, pos, _wkt_coords)
        return ('MultiLineString', lines), pos
    if gtype == 'MultiPolygon':
        polys, pos = _wkt_nested(text, pos, lambda t, p: _wkt_nested(t, p, _wkt_coords))
        return ('MultiPolygon', polys), pos
    # GeometryCollection
    parts = []
    pos += 1
    while True:
        g, pos = _wkt_parse(text, pos)
        parts.append(g)
        pos = _skip_ws(text, pos)
        if text[pos] == ',':
            pos += 1
            continue
        if text[pos] == ')':
            return ('GeometryCollection', parts), pos + 1
        raise ValueError(f'bad WKT collection at {text[pos:pos + 20]!r}')


def _skip_ws(text: str, pos: int) -> int:
    while pos < len(text) and text[pos].isspace():
        pos += 1
    return pos


def _wkt_coords(text: str, pos: int):
    """Parse '(x y, x y, ...)' starting at '('."""
    if text[pos] != '(':
        raise ValueError(f'expected ( at {text[pos:pos + 20]!r}')
    end = text.index(')', pos)
    body = text[pos + 1:end]
    coords = []
    for token in body.split(','):
        nums = token.split()
        if len(nums) < 2:
            raise ValueError(f'bad coordinate {token!r}')
        coords.append((float(nums[0]), float(nums[1])))
    return coords, end + 1


def _wkt_nested(text: str, pos: int, inner):
    if text[pos] != '(':
        raise ValueError(f'expected ( at {text[pos:pos + 20]!r}')
    pos += 1
    items = []
    while True:
        pos = _skip_ws(text, pos)
        item, pos = inner(text, pos)
        items.append(item)
        pos = _skip_ws(text, pos)
        if text[pos] == ',':
            pos += 1
            continue
        if text[pos] == ')':
            return items, pos + 1
        raise ValueError(f'bad WKT nesting at {text[pos:pos + 20]!r}')


def _wkt_coords_or_nested(text: str, pos: int):
    p = _skip_ws(text, pos + 1)
    if text[p] == '(':
        nested, pos = _wkt_nested(text, pos, _wkt_coords)
        return [c[0] for c in nested], pos
    return _wkt_coords(text, pos)


def _fmt_coord(x: float) -> str:
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x)


def _fmt_coords(coords) -> str:
    return '(' + ', '.join(f'{_fmt_coord(x)} {_fmt_coord(y)}' for x, y in coords) + ')'


def wkt_dumps(geom: Geometry) -> str:
    gtype, data = geom
    if gtype == 'Point':
        return f'POINT ({_fmt_coord(data[0])} {_fmt_coord(data[1])})'
    if gtype == 'LineString':
        return 'LINESTRING ' + _fmt_coords(data)
    if gtype == 'Polygon':
        return 'POLYGON (' + ', '.join(_fmt_coords(r) for r in data) + ')'
    if gtype == 'MultiPoint':
        return 'MULTIPOINT ' + _fmt_coords(data)
    if gtype == 'MultiLineString':
        return 'MULTILINESTRING (' + ', '.join(_fmt_coords(l) for l in data) + ')'
    if gtype == 'MultiPolygon':
        return 'MULTIPOLYGON (' + ', '.join(
            '(' + ', '.join(_fmt_coords(r) for r in rings) + ')' for rings in data) + ')'
    if gtype == 'GeometryCollection':
        return 'GEOMETRYCOLLECTION (' + ', '.join(wkt_dumps(g) for g in data) + ')'
    raise ValueError(f'unknown geometry type {gtype}')
