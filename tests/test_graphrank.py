"""PageRank domain centrality (erde_spark.scale.graphrank)."""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from erde_spark.scale.graphrank import domain_quality_weights, pagerank


def _reference(edges, n_iter, damping=0.85):
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, d in set(edges):
        out.setdefault(s, []).append(d)
    r = np.full(n, 1 / n)
    for _ in range(n_iter):
        nxt = np.zeros(n)
        dangling = 0.0
        for v in nodes:
            if v in out:
                for d in out[v]:
                    nxt[idx[d]] += r[idx[v]] / len(out[v])
            else:
                dangling += r[idx[v]]
        r = (1 - damping) / n + damping * dangling / n + damping * nxt
    return {v: r[idx[v]] for v in nodes}


class TestPagerank:
    def test_matches_reference_with_dangling(self, spark):
        # node 4 is a pure sink: its rank must redistribute uniformly
        edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4)]
        df = spark.createDataFrame(edges, 'src long, dst long')
        got = {r.node: r.rank for r in pagerank(df, iterations=15).collect()}
        ref = _reference(edges, 15)
        assert abs(sum(got.values()) - 1.0) < 1e-12
        for v, rv in ref.items():
            assert abs(got[v] - rv) < 1e-12, v

    def test_duplicate_edges_count_once(self, spark):
        base = [(0, 1), (1, 0), (0, 2), (2, 0)]
        dup = base + [(0, 1)] * 5
        d1 = spark.createDataFrame(base, 'src long, dst long')
        d2 = spark.createDataFrame(dup, 'src long, dst long')
        r1 = sorted((r.node, round(r.rank, 12))
                    for r in pagerank(d1, iterations=8).collect())
        r2 = sorted((r.node, round(r.rank, 12))
                    for r in pagerank(d2, iterations=8).collect())
        assert r1 == r2

    def test_string_nodes_and_weights_join(self, spark):
        edges = spark.createDataFrame(
            [('a.com', 'b.com'), ('b.com', 'a.com'), ('c.com', 'a.com')],
            'src string, dst string')
        ranks = pagerank(edges, iterations=10)
        docs = spark.createDataFrame(
            [(1, 'https://a.com/x'), (2, 'http://c.com/y'),
             (3, 'https://unknown.org/z'), (4, 'not a url')],
            'doc_id long, url string')
        out = {r.doc_id: r.domain_rank
               for r in domain_quality_weights(docs, ranks).collect()}
        assert out[1] > out[2] > 0      # a.com is the hub
        assert out[3] is None and out[4] is None

    def test_validation(self, spark):
        df = spark.createDataFrame([(0, 1)], 'src long, dst long')
        with pytest.raises(ValueError):
            pagerank(df, damping=1.5)
        with pytest.raises(ValueError):
            pagerank(df, iterations=0)

    def test_empty_edges(self, spark):
        df = spark.createDataFrame([], 'src long, dst long')
        assert pagerank(df, iterations=3).count() == 0
