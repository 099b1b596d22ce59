"""Fake OSRM HTTP server for routing tests.

Serves /route/v1 and /table/v1 with deterministic straight-line metrics:
distance = euclidean degrees x 111319.49 m, duration = distance / SPEED
(10 m/s). Runs threaded on 127.0.0.1:<random port> so Spark executor
processes can reach it (the reference mocks at the same HTTP boundary,
`/root/reference/tests/table/test_table.py:58-116`).
"""

from __future__ import annotations

import json
import math
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from erde_spark.routing import polyline as PL

M_PER_DEG = 111319.49079327358
SPEED = 10.0  # m/s
SNAP = 5.0    # constant snap distance served for every point


def _dist(a, b) -> float:
    return math.hypot(b[0] - a[0], b[1] - a[1]) * M_PER_DEG


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        # NB: not urlparse — it would split the OSRM `lon,lat;lon,lat`
        # path on ';' as legacy path-params
        raw_path, _, raw_query = self.path.partition('?')
        parsed = urllib.parse.ParseResult('', '', raw_path, '', raw_query, '')
        try:
            if parsed.path.startswith('/route/v1/'):
                body = self._route(parsed)
            elif parsed.path.startswith('/table/v1/'):
                body = self._table(parsed)
            else:
                self.send_error(404)
                return
        except Exception as e:  # surface server bugs in the test output
            body = {'code': 'Error', 'message': repr(e)}
        data = json.dumps(body).encode()
        self.send_response(200)
        self.send_header('Content-Type', 'application/json')
        self.send_header('Content-Length', str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _route(self, parsed):
        coords_part = parsed.path.rsplit('/', 1)[-1]
        coords = [tuple(map(float, c.split(','))) for c in coords_part.split(';')]
        q = dict(urllib.parse.parse_qsl(parsed.query))
        n_alt = 2 if q.get('alternatives') in ('true', '2') else 1
        dist = sum(_dist(coords[i], coords[i + 1]) for i in range(len(coords) - 1))
        routes = []
        for alt in range(n_alt):
            factor = 1.0 + 0.5 * alt
            legs = []
            base = 100
            for i in range(len(coords) - 1):
                # repeat the shared edge at leg boundaries (OSRM behavior
                # the node-dedup logic must handle)
                if i == 0:
                    nodes = [base, base + 1, base + 2]
                else:
                    nodes = [base + i, base + i + 1, base + i + 2]
                legs.append({'annotation': {'nodes': nodes}})
            routes.append({
                'duration': round(dist * factor / SPEED, 3),
                'distance': round(dist * factor, 3),
                'geometry': PL.encode([(y, x) for x, y in coords]),
                'legs': legs,
            })
        return {'code': 'Ok', 'routes': routes}

    def _table(self, parsed):
        m = re.search(r'polyline\((.*)\)$', urllib.parse.unquote_plus(parsed.path))
        pts = [(lon, lat) for lat, lon in PL.decode(m.group(1))]
        q = dict(urllib.parse.parse_qsl(urllib.parse.unquote_plus(parsed.query)))
        src_idx = [int(i) for i in q['sources'].split(';')]
        dst_idx = [int(i) for i in q['destinations'].split(';')]
        ann = q.get('annotations', 'duration').split(',')
        out = {'code': 'Ok',
               'sources': [{'distance': SNAP} for _ in src_idx],
               'destinations': [{'distance': SNAP} for _ in dst_idx]}
        if 'duration' in ann:
            out['durations'] = [[round(_dist(pts[s], pts[d]) / SPEED, 3)
                                 for d in dst_idx] for s in src_idx]
        if 'distance' in ann:
            out['distances'] = [[round(_dist(pts[s], pts[d]), 3)
                                 for d in dst_idx] for s in src_idx]
        return out


class MockOsrm:
    def __enter__(self):
        self.server = ThreadingHTTPServer(('127.0.0.1', 0), _Handler)
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()
        self.url = f'http://127.0.0.1:{self.server.server_address[1]}'
        return self

    def __exit__(self, *a):
        self.server.shutdown()
        self.server.server_close()
