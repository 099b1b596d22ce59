"""Google encoded-polyline codec (public algorithm,
https://developers.google.com/maps/documentation/utilities/polylinealgorithm).

The reference delegates to the ``polyline`` PyPI package
(`/root/reference/erde/utils.py:14-23`) which is absent here; this is a
from-spec implementation. OSRM exchanges (lat, lon) order; the geometry
layer uses (lon, lat) — the route/table kernels flip at the boundary.
"""

from __future__ import annotations


def encode(coords: list[tuple[float, float]], precision: int = 5) -> str:
    """Encode (lat, lon) pairs."""
    factor = 10 ** precision
    out = []
    prev_lat = prev_lon = 0
    for lat, lon in coords:
        ilat = round(lat * factor)
        ilon = round(lon * factor)
        for delta in (ilat - prev_lat, ilon - prev_lon):
            v = ~(delta << 1) if delta < 0 else (delta << 1)
            while v >= 0x20:
                out.append(chr((0x20 | (v & 0x1F)) + 63))
                v >>= 5
            out.append(chr(v + 63))
        prev_lat, prev_lon = ilat, ilon
    return ''.join(out)


def decode(text: str, precision: int = 5) -> list[tuple[float, float]]:
    """Decode to (lat, lon) pairs."""
    factor = 10 ** precision
    coords = []
    lat = lon = 0
    i = 0
    n = len(text)
    while i < n:
        for which in (0, 1):
            shift = result = 0
            while True:
                b = ord(text[i]) - 63
                i += 1
                result |= (b & 0x1F) << shift
                shift += 5
                if b < 0x20:
                    break
            delta = ~(result >> 1) if result & 1 else (result >> 1)
            if which == 0:
                lat += delta
            else:
                lon += delta
        coords.append((lat / factor, lon / factor))
    return coords
