"""Distance-field buffering and union for the pure-Python geometry kernel.

The container has no GEOS, so polygon offsetting / boolean union cannot be
done exactly. Instead, buffer/erode/union are computed as the iso-contour
of a signed distance field on a regular grid, traced with interpolated
marching squares — the standard raster formulation of the Minkowski
sum/difference (buffer(G, r) = {p : dist(p, G) <= r}, with dist negative
inside polygon interiors so r < 0 erodes).

Accuracy is resolution-bounded: the grid step is ``|radius|/resolution``
(default 16 cells per radius, comparable to shapely's default of 16 arc
vertices per quarter circle; reference buffer semantics at
`/root/reference/erde/op/buffer.py:5-51`). Vertices are linearly
interpolated along grid edges, so the boundary error is O(h^2/r), not the
half-cell staircase of a binary trace.

Everything is vectorized numpy over per-primitive sub-windows; the grid is
capped at ``max_cells`` (the step grows if the extent is too large). This
runs inside Arrow-batched pandas UDFs on executors — one small field per
row — never on the driver.
"""

from __future__ import annotations

import math

import numpy as np

Geometry = tuple


# ------------------------------------------------------------ primitives

def _collect(geoms):
    """Split geometries into point sites, boundary segments, and polygon
    part ring-lists (for interior parity)."""
    points, segments, polygons = [], [], []
    for geom in geoms:
        gtype, data = geom
        if gtype == 'Point':
            points.append(tuple(data))
        elif gtype == 'MultiPoint':
            points.extend(tuple(p) for p in data)
        elif gtype == 'LineString':
            _line_segs(data, points, segments)
        elif gtype == 'MultiLineString':
            for part in data:
                _line_segs(part, points, segments)
        elif gtype == 'Polygon':
            polygons.append(data)
            for ring in data:
                _line_segs(ring, points, segments)
        elif gtype == 'MultiPolygon':
            for rings in data:
                polygons.append(rings)
                for ring in rings:
                    _line_segs(ring, points, segments)
        else:
            raise ValueError(f'cannot build a distance field for {gtype}')
    return points, segments, polygons


def _line_segs(coords, points, segments):
    if len(coords) == 1:
        points.append(tuple(coords[0]))
        return
    for a, b in zip(coords, coords[1:]):
        if a == b:
            points.append(tuple(a))
        else:
            segments.append((a[0], a[1], b[0], b[1]))


# --------------------------------------------------------- distance field

def _min_dist_updates(D, xs, ys, points, segments, reach):
    """In-place min-update of D with distances to each primitive, computed
    only inside the primitive's bbox dilated by ``reach`` (cells farther
    away cannot fall under the iso level)."""
    def window(x0, y0, x1, y1):
        ix0 = np.searchsorted(xs, x0 - reach)
        ix1 = np.searchsorted(xs, x1 + reach, side='right')
        iy0 = np.searchsorted(ys, y0 - reach)
        iy1 = np.searchsorted(ys, y1 + reach, side='right')
        return ix0, ix1, iy0, iy1

    for px, py in points:
        ix0, ix1, iy0, iy1 = window(px, py, px, py)
        if ix0 >= ix1 or iy0 >= iy1:
            continue
        d = np.hypot(xs[ix0:ix1][None, :] - px, ys[iy0:iy1][:, None] - py)
        np.minimum(D[iy0:iy1, ix0:ix1], d, out=D[iy0:iy1, ix0:ix1])

    for x1, y1, x2, y2 in segments:
        ix0, ix1, iy0, iy1 = window(min(x1, x2), min(y1, y2),
                                    max(x1, x2), max(y1, y2))
        if ix0 >= ix1 or iy0 >= iy1:
            continue
        X = xs[ix0:ix1][None, :]
        Y = ys[iy0:iy1][:, None]
        dx, dy = x2 - x1, y2 - y1
        t = ((X - x1) * dx + (Y - y1) * dy) / (dx * dx + dy * dy)
        np.clip(t, 0.0, 1.0, out=t)
        d = np.hypot(X - (x1 + t * dx), Y - (y1 + t * dy))
        np.minimum(D[iy0:iy1, ix0:ix1], d, out=D[iy0:iy1, ix0:ix1])


def _inside_mask(polygons, xs, ys):
    """(ny, nx) bool: node inside the UNION of the polygon parts (each
    part's own rings combine even-odd, so holes stay holes; overlapping
    parts OR together — union, not symmetric difference)."""
    inside = np.zeros((len(ys), len(xs)), dtype=bool)
    for rings in polygons:
        crossings = [[] for _ in ys]
        for ring in rings:
            for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
                if y1 == y2:
                    continue
                lo, hi = (y1, y2) if y1 < y2 else (y2, y1)
                i0 = np.searchsorted(ys, lo, side='left')
                i1 = np.searchsorted(ys, hi, side='left')  # half-open [lo, hi)
                for i in range(i0, i1):
                    crossings[i].append(x1 + (ys[i] - y1) * (x2 - x1) / (y2 - y1))
        part = np.zeros_like(inside)
        for i, xc in enumerate(crossings):
            if not xc:
                continue
            # parity of crossings strictly right of each node
            cnt = len(xc) - np.searchsorted(np.sort(xc), xs, side='right')
            part[i] = (cnt % 2) == 1
        inside |= part
    return inside


# ----------------------------------------------------- marching squares

_MS_TABLE = {
    1: [('l', 'b')], 2: [('b', 'r')], 3: [('l', 'r')],
    4: [('r', 't')], 6: [('b', 't')], 7: [('l', 't')],
    8: [('t', 'l')], 9: [('t', 'b')], 11: [('t', 'r')],
    12: [('r', 'l')], 13: [('r', 'b')], 14: [('b', 'l')],
}


def _trace_iso(F, xs, ys, level):
    """Interpolated marching squares: closed loops of the iso-contour
    ``F == level`` with the region F <= level on the left. Vertices are
    keyed by grid edge id (('h'|'v', row, col)) so chaining is exact, and
    interpolated along their grid edge at the end."""
    ny, nx = F.shape
    inside = F <= level
    segs: dict = {}

    def edge(kind, r, c):
        return (kind, r, c)

    for r in range(ny - 1):
        row0, row1 = inside[r], inside[r + 1]
        diff = (row0[:-1] != row0[1:]) | (row1[:-1] != row1[1:]) | (row0[:-1] != row1[:-1])
        for c in np.nonzero(diff)[0]:
            tl, tr = bool(row0[c]), bool(row0[c + 1])
            bl, br = bool(row1[c]), bool(row1[c + 1])
            code = (tl << 3) | (tr << 2) | (br << 1) | bl
            if code in (0, 15):
                continue
            ids = {'t': edge('h', r, c), 'b': edge('h', r + 1, c),
                   'l': edge('v', r, c), 'r': edge('v', r, c + 1)}
            if code in (5, 10):
                # saddle: split by the cell-center value
                center = (F[r, c] + F[r, c + 1] + F[r + 1, c] + F[r + 1, c + 1]) / 4.0
                if code == 5:
                    pairs = [('l', 't'), ('r', 'b')] if center <= level \
                        else [('l', 'b'), ('r', 't')]
                else:
                    pairs = [('t', 'r'), ('b', 'l')] if center <= level \
                        else [('t', 'l'), ('b', 'r')]
            else:
                pairs = _MS_TABLE[code]
            for a, b in pairs:
                segs.setdefault(ids[a], []).append(ids[b])

    loops = []
    while segs:
        start = next(iter(segs))
        loop = [start]
        cur = start
        while True:
            nxts = segs.get(cur)
            if not nxts:
                break
            nxt = nxts.pop()
            if not nxts:
                del segs[cur]
            loop.append(nxt)
            cur = nxt
            if cur == start:
                break
        if len(loop) >= 4 and loop[0] == loop[-1]:
            loops.append(loop)

    def interp(eid):
        kind, r, c = eid
        if kind == 'h':
            f0, f1 = F[r, c], F[r, c + 1]
            t = 0.5 if f1 == f0 else (level - f0) / (f1 - f0)
            return (xs[c] + min(max(t, 0.0), 1.0) * (xs[c + 1] - xs[c]), ys[r])
        f0, f1 = F[r, c], F[r + 1, c]
        t = 0.5 if f1 == f0 else (level - f0) / (f1 - f0)
        return (xs[c], ys[r] + min(max(t, 0.0), 1.0) * (ys[r + 1] - ys[r]))

    return [[interp(eid) for eid in loop] for loop in loops]


def _ring_area2(pts) -> float:
    return sum(pts[i][0] * pts[i + 1][1] - pts[i + 1][0] * pts[i][1]
               for i in range(len(pts) - 1))


def _assemble(loops) -> Geometry:
    """Shells/holes by even-odd nesting depth; each hole attaches to the
    smallest enclosing shell. Always returns a MultiPolygon (the reference
    normalizes Polygon -> MultiPolygon, `erde/op/isochrone.py:219`)."""
    from erde_spark.geo.ops import _point_in_ring
    if not loops:
        return ('MultiPolygon', [])
    meta = [(abs(_ring_area2(lp)) / 2.0, lp) for lp in loops]

    def depth(lp):
        x, y = lp[0]
        return sum(1 for other in loops if other is not lp and _point_in_ring(x, y, other))

    shells = [(a, lp) for a, lp in meta if depth(lp) % 2 == 0]
    holes = [(a, lp) for a, lp in meta if depth(lp) % 2 == 1]
    shells.sort(key=lambda t: -t[0])
    polys = [[list(map(tuple, lp))] for _, lp in shells]
    for _, hole in holes:
        x, y = hole[0]
        for i in range(len(shells) - 1, -1, -1):  # smallest enclosing shell
            if _point_in_ring(x, y, shells[i][1]):
                polys[i].append(list(map(tuple, hole)))
                break
    return ('MultiPolygon', polys)


# ---------------------------------------------------------------- public

def buffer_field(geoms, radius: float, resolution: int = 16,
                 max_cells: int = 4_000_000) -> Geometry:
    """Buffer (radius > 0) or erode (radius < 0, polygons only) the UNION
    of ``geoms`` via the signed distance field; returns a MultiPolygon.

    One call both buffers and dissolves: the field of many inputs is their
    union's field, so overlapping buffers merge exactly as in the
    reference's ``unary_union`` dissolve (`erde/op/buffer.py:47,51`).
    """
    points, segments, polygons = _collect(geoms)
    if radius < 0 and not polygons:
        return ('MultiPolygon', [])
    if not points and not segments:
        return ('MultiPolygon', [])

    xs0 = [p[0] for p in points] + [min(s[0], s[2]) for s in segments]
    xs1 = [p[0] for p in points] + [max(s[0], s[2]) for s in segments]
    ys0 = [p[1] for p in points] + [min(s[1], s[3]) for s in segments]
    ys1 = [p[1] for p in points] + [max(s[1], s[3]) for s in segments]
    pad = max(radius, 0.0)
    x0, x1 = min(xs0) - pad, max(xs1) + pad
    y0, y1 = min(ys0) - pad, max(ys1) + pad

    h = abs(radius) / resolution if radius else \
        max(x1 - x0, y1 - y0, 1e-9) / math.sqrt(max_cells)
    # honor the cell cap: grow the step if the extent is too large
    need = ((x1 - x0) / h + 3) * ((y1 - y0) / h + 3)
    if need > max_cells:
        h *= math.sqrt(need / max_cells)
    x0, y0 = x0 - 1.5 * h, y0 - 1.5 * h
    x1, y1 = x1 + 1.5 * h, y1 + 1.5 * h
    xs = np.arange(x0, x1 + h, h)
    ys = np.arange(y0, y1 + h, h)

    D = np.full((len(ys), len(xs)), np.inf)
    _min_dist_updates(D, xs, ys, points, segments, abs(radius) + 2 * h)
    if polygons:
        inside = _inside_mask(polygons, xs, ys)
        F = np.where(inside, -D, D)
    else:
        F = D
    # nodes beyond any primitive's reach keep their side, finitely (deep
    # interior is -inf, far exterior +inf; both must stay on their side of
    # every finite level for interpolation)
    big = abs(radius) + 4 * h
    F[F == np.inf] = big
    F[F == -np.inf] = -big

    return _assemble(_trace_iso(F, xs, ys, float(radius)))


def union_field(geoms, resolution_cells: int = 1024,
                max_cells: int = 4_000_000) -> Geometry:
    """True boolean union of polygonal geometries: the 0-level of the
    signed field. Grid step = bbox longest side / ``resolution_cells``."""
    points, segments, polygons = _collect(geoms)
    if not polygons:
        return ('MultiPolygon', [])
    xs0 = [min(s[0], s[2]) for s in segments]
    xs1 = [max(s[0], s[2]) for s in segments]
    ys0 = [min(s[1], s[3]) for s in segments]
    ys1 = [max(s[1], s[3]) for s in segments]
    x0, x1, y0, y1 = min(xs0), max(xs1), min(ys0), max(ys1)
    h = max(x1 - x0, y1 - y0, 1e-9) / resolution_cells
    need = ((x1 - x0) / h + 3) * ((y1 - y0) / h + 3)
    if need > max_cells:
        h *= math.sqrt(need / max_cells)
    x0, y0 = x0 - 1.5 * h, y0 - 1.5 * h
    x1, y1 = x1 + 1.5 * h, y1 + 1.5 * h
    xs = np.arange(x0, x1 + h, h)
    ys = np.arange(y0, y1 + h, h)
    D = np.full((len(ys), len(xs)), np.inf)
    _min_dist_updates(D, xs, ys, [], segments, 2 * h)
    inside = _inside_mask(polygons, xs, ys)
    F = np.where(inside, -D, D)
    F[F == np.inf] = 4 * h
    F[F == -np.inf] = -4 * h
    return _assemble(_trace_iso(F, xs, ys, 0.0))
