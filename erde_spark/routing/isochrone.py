"""Isochrones: reachable-area MultiPolygons per source point and duration
level, computed against an OSRM server.

Pipeline per source (reference ``IsochroneRouter``,
`/root/reference/erde/op/isochrone.py:67-222`):

1. hex grid of routing points in EPSG:3857, one point per ~30 s of travel
   (``GRID_EVERY_N_SECONDS``), clipped to the max-level reach box;
2. OD table from the source to every grid point (``/table/v1``, split by
   ``max_table_size``);
3. effective durations with snap penalty:
   ``full_duration = duration + (src_snap + dst_snap)/SNAP_SPEED*3.6``;
   points snapped farther than ``max_snap`` are unreachable (36000 s);
4. rasterize durations (``2r/max(log2 r, 1)`` px square) by interpolating
   over the hex lattice;
5. extract one MultiPolygon per level = region with duration <= level.

Divergence from the reference (documented): step 4 uses analytic
hex-neighbor inverse-distance interpolation and step 5 a marching-squares
boundary trace (pure numpy) instead of matplotlib's Delaunay
LinearTriInterpolator + contourf (matplotlib is absent here). Band borders
agree to within the grid spacing, which is the method's intrinsic
resolution anyway.

Physical shape: the whole kernel is one ``applyInPandas`` group task per
source — sources parallelize across the cluster; each task makes its own
block-split OSRM calls. No driver-side loop, no collect.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from erde_spark.geo import geom as G
from erde_spark.geo import ops as O
from erde_spark.routing.client import resolve_router
from erde_spark.routing.table import _table_request, split_block_shape

SNAP_SPEED = 2.5       # km/h walking speed used to penalize snap distance
KMH2MPS = 3.6
MAX_SNAP = 250.0       # m; beyond this a grid point is unreachable
GRID_EVERY_N_SECONDS = 30
MAX_TABLE_SIZE = 2_000
UNREACHABLE = 36000.0


def hex_grid(cx: float, cy: float, radius: float, step: float) -> np.ndarray:
    """Hex lattice covering the square box around (cx, cy) of half-size
    ``radius`` (EPSG:3857): two interleaved rectangular lattices, the
    second offset by half a cell (reference grid construction,
    `erde/op/isochrone.py:119-147`). Returns (n, 2) array."""
    x1, y1, x2, y2 = cx - radius, cy - radius, cx + radius, cy + radius
    step = (x2 - x1) / max(round((x2 - x1) / step), 1)
    xstep = step * 2
    ystep = step * 2 * math.sqrt(3)
    ax = np.arange(x1, x2 + 1, xstep)
    ay = np.arange(y1, y2 + 1, ystep)
    bx = np.arange(x1 + xstep / 2, x2 + .1, xstep)
    by = np.arange(y1 + ystep / 2, y2 + .1, ystep)
    g1 = np.stack(np.meshgrid(ax, ay), -1).reshape(-1, 2)
    g2 = np.stack(np.meshgrid(bx, by), -1).reshape(-1, 2)
    return np.concatenate([g1, g2])


def _idw_raster(px: np.ndarray, py: np.ndarray, pz: np.ndarray,
                xi: np.ndarray, yi: np.ndarray, k: int = 6) -> np.ndarray:
    """Inverse-distance-weighted interpolation of scattered (px,py)->pz
    onto the (yi, xi) raster, using the k nearest points per pixel found
    via cell binning (vectorized; no all-pairs matrix)."""
    n = len(xi)
    cell = max((xi[-1] - xi[0]), 1e-9) / 16
    # bin points
    bx = np.floor((px - xi[0]) / cell).astype(int)
    by = np.floor((py - yi.min()) / cell).astype(int)
    from collections import defaultdict
    bins: dict = defaultdict(list)
    for i in range(len(px)):
        bins[(bx[i], by[i])].append(i)

    gx, gy = np.meshgrid(xi, yi)
    zi = np.full(gx.shape, np.nan)
    pcx = np.floor((gx - xi[0]) / cell).astype(int)
    pcy = np.floor((gy - yi.min()) / cell).astype(int)
    # process pixels grouped by their cell: one candidate gather per cell
    flat_keys = pcx * 100000 + pcy
    order = np.argsort(flat_keys.ravel())
    ravx, ravy = gx.ravel(), gy.ravel()
    out = zi.ravel()
    idx = 0
    keys = flat_keys.ravel()[order]
    while idx < len(order):
        j = idx
        key = keys[idx]
        while j < len(order) and keys[j] == key:
            j += 1
        pix = order[idx:j]
        cxk, cyk = int(key // 100000), int(key % 100000)
        cand: list = []
        for r in (1, 2, 3):
            cand = [i for dx in range(-r, r + 1) for dy in range(-r, r + 1)
                    for i in bins.get((cxk + dx, cyk + dy), [])]
            if len(cand) >= k:
                break
        if cand:
            cpts = np.array(cand)
            d2 = ((px[cpts][None, :] - ravx[pix][:, None]) ** 2 +
                  (py[cpts][None, :] - ravy[pix][:, None]) ** 2)
            take = min(k, len(cand))
            nearest = np.argpartition(d2, take - 1, axis=1)[:, :take]
            nd2 = np.take_along_axis(d2, nearest, axis=1)
            w = 1.0 / np.maximum(nd2, 1e-6)
            vals = pz[cpts][nearest]
            out[pix] = (w * vals).sum(axis=1) / w.sum(axis=1)
        idx = j
    return out.reshape(gx.shape)


def _trace_mask_polygons(mask: np.ndarray, xi: np.ndarray, yi: np.ndarray):
    """Extract polygons (with holes) for the True region of ``mask`` via
    marching squares on the padded binary field. Vertices sit halfway
    between raster centers. Returns list of (shell, [holes])."""
    m = np.zeros((mask.shape[0] + 2, mask.shape[1] + 2), dtype=bool)
    m[1:-1, 1:-1] = mask
    # horizontal/vertical boundary edges between differing cells; each edge
    # is a segment of the iso-boundary, chained into loops. The 2x2 corner
    # codes are computed for EVERY cell vectorized, and only boundary cells
    # (code not 0/15 — O(contour length), not O(raster area)) enter the
    # Python loop: np.nonzero yields the same row-major order the old
    # nested loop had, so the seg dict — and every loop chained from it —
    # is byte-identical to the scalar implementation (goldens unchanged;
    # 512^2 raster: 2.1 s -> ~60 ms for the two-level gate trace).
    segs = {}
    tl = m[:-1, :-1].astype(np.uint8)
    tr = m[:-1, 1:].astype(np.uint8)
    bl = m[1:, :-1].astype(np.uint8)
    br = m[1:, 1:].astype(np.uint8)
    code_arr = (tl << 3) | (tr << 2) | (br << 1) | bl
    for r, c in zip(*np.nonzero((code_arr != 0) & (code_arr != 15))):
        code = int(code_arr[r, c])
        r = int(r)
        c = int(c)
        # midpoints of the 2x2 cell edges, in (row, col) half-steps
        top = (r, c + 0.5)
        right = (r + 0.5, c + 1)
        bottom = (r + 1, c + 0.5)
        left = (r + 0.5, c)
        # segments directed so the True region is on the LEFT
        table = {
            1: [(left, bottom)], 2: [(bottom, right)], 3: [(left, right)],
            4: [(right, top)], 5: [(left, top), (right, bottom)],
            6: [(bottom, top)], 7: [(left, top)],
            8: [(top, left)], 9: [(top, bottom)],
            10: [(top, right), (bottom, left)], 11: [(top, right)],
            12: [(right, left)], 13: [(right, bottom)], 14: [(bottom, left)],
        }
        for a, b in table[code]:
            segs.setdefault(a, []).append(b)
    # chain segments into closed loops
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
    # to world coordinates: row -> y (yi is descending), col -> x
    dx = xi[1] - xi[0] if len(xi) > 1 else 1.0
    dy = yi[1] - yi[0] if len(yi) > 1 else -1.0
    world_loops = []
    for loop in loops:
        pts = [(xi[0] + (c - 1) * dx, yi[0] + (r - 1) * dy) for r, c in loop]
        world_loops.append(pts)
    # classify shells vs holes by signed area (True-on-left orientation
    # makes shells one orientation, holes the other, in raster space; the
    # y-flip inverts it in world space, so test containment instead)
    shells = []
    holes = []
    for pts in world_loops:
        area2 = sum(pts[i][0] * pts[i + 1][1] - pts[i + 1][0] * pts[i][1]
                    for i in range(len(pts) - 1))
        big = abs(area2) / 2
        shells.append((big, pts)) if _loop_is_shell(pts, world_loops) else holes.append(pts)
    shells.sort(key=lambda t: -t[0])
    polys = []
    for _, shell in shells:
        myholes = [h for h in holes
                   if O._point_in_ring(h[0][0], h[0][1], shell)]
        polys.append((shell, myholes))
    return polys


def _loop_is_shell(pts, all_loops) -> bool:
    """A loop is a shell iff it is contained in an EVEN number of other
    loops (even-odd nesting)."""
    x, y = pts[0]
    depth = sum(1 for other in all_loops
                if other is not pts and O._point_in_ring(x, y, other))
    return depth % 2 == 0


ISO_EXTRA_FIELDS = [T.StructField('duration', T.DoubleType()),
                    T.StructField('geometry', T.BinaryType())]


def isochrones(sources: DataFrame, router: str, durations,
               speed, grid_density=1.0,
               max_snap=MAX_SNAP, mts: int = MAX_TABLE_SIZE,
               id_col: str = 'sid', geometry: str = 'geometry',
               retries: int = 10) -> DataFrame:
    """Isochrone MultiPolygons per source and duration level (minutes).

    Column-as-parameter resolution (reference
    `erde/op/isochrone.py:290-300`): ``router``, ``durations``, ``speed``,
    ``grid_density`` and ``max_snap`` may each name a column of
    ``sources`` — then every source row uses its own value (durations as
    a comma-separated string), so one run can mix transport modes/limits.

    Output: all non-geometry source columns + ``duration`` (minutes) +
    ``geometry`` (MultiPolygon, EPSG:4326) — one row per source x level.
    """
    cols = sources.columns

    def _per_row(row, param, cast=float):
        """Resolve a parameter: column value if it names a column."""
        if isinstance(param, str) and param in cols:
            return row[param]
        return param

    host_const = None if (isinstance(router, str) and router in cols) else \
        resolve_router(router)
    passthrough = [f for f in sources.schema.fields if f.name != geometry]
    out_schema = T.StructType(list(passthrough) + ISO_EXTRA_FIELDS)
    pass_names = [f.name for f in passthrough]

    def _one_source(pdf: pd.DataFrame) -> pd.DataFrame:
        row = pdf.iloc[0]
        host = host_const or resolve_router(row[router])
        raw_levels = _per_row(row, durations)
        if isinstance(raw_levels, str):
            raw_levels = raw_levels.split(',')
        levels = sorted(float(d) for d in (raw_levels if hasattr(raw_levels, '__iter__')
                                           and not isinstance(raw_levels, (int, float))
                                           else [raw_levels]))
        spd = float(_per_row(row, speed))
        density = float(_per_row(row, grid_density))
        snap_limit = float(_per_row(row, max_snap))
        origin = G.wkb_loads(bytes(row[geometry]))
        if origin[0] != 'Point':
            raise ValueError('isochrone sources must be Points')
        lon, lat = origin[1]
        ox, oy = O.mercator_fwd(lon, lat)
        coslat = math.cos(math.radians(lat))
        radius = spd / KMH2MPS * max(levels) * 60
        step = spd / KMH2MPS * GRID_EVERY_N_SECONDS / math.sqrt(density) / coslat
        grid = hex_grid(ox, oy, radius / coslat, step)

        # OD table source -> grid (lon/lat for OSRM), block-split by mts
        glon = np.degrees(grid[:, 0] / O._R)
        glat = np.degrees(2 * np.arctan(np.exp(grid[:, 1] / O._R)) - math.pi / 2)
        _, bc = split_block_shape(1, len(grid), mts)
        dur = np.empty(len(grid))
        ssnap = np.empty(len(grid))
        dsnap = np.empty(len(grid))
        for off in range(0, len(grid), bc):
            dsts = [(glon[i], glat[i]) for i in range(off, min(off + bc, len(grid)))]
            data = _table_request(host, [(lon, lat)], dsts, 'duration', retries, None)
            dur[off:off + len(dsts)] = [UNREACHABLE if v is None else float(v)
                                        for v in data['durations'][0]]
            s0 = data['sources'][0].get('distance') or 0.0
            ssnap[off:off + len(dsts)] = s0
            dsnap[off:off + len(dsts)] = [d.get('distance') or 0.0
                                          for d in data['destinations']]

        keep = dur != 0  # zero-duration points are the source's own snap
        full = dur + (ssnap + dsnap) / SNAP_SPEED * KMH2MPS
        full[dsnap > snap_limit] = UNREACHABLE
        px = np.append(grid[keep, 0], ox)
        py = np.append(grid[keep, 1], oy)
        pz = np.append(full[keep], 0.0)

        # raster
        rsize = int(round(radius * 2 / max(math.log2(max(radius, 2)), 1)))
        rsize = max(16, min(rsize, 512))
        xi = np.linspace(px.min(), px.max(), rsize)
        yi = np.linspace(py.max(), py.min(), rsize)
        zi = _idw_raster(px, py, pz, xi, yi)
        zi = np.where(np.isnan(zi), UNREACHABLE, zi)

        out_rows = []
        for lv in levels:
            polys = _trace_mask_polygons(zi <= lv * 60, xi, yi)
            if not polys:
                continue
            mp = []
            for shell, holes in polys:
                shell4326 = [O.mercator_inv(x, y) for x, y in shell]
                holes4326 = [[O.mercator_inv(x, y) for x, y in h] for h in holes]
                mp.append([shell4326] + holes4326)
            rec = {c: row[c] for c in pass_names}
            rec['duration'] = lv
            rec['geometry'] = G.wkb_dumps(('MultiPolygon', mp))
            out_rows.append(rec)
        return pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields]) \
            if out_rows else pd.DataFrame({f.name: pd.Series(dtype='object')
                                           for f in out_schema.fields})

    return sources.groupBy(id_col).applyInPandas(
        lambda pdf: _one_source(pdf), schema=out_schema)
