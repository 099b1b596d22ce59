"""Link-graph centrality for crawl curation: PageRank over the domain
graph (Page et al. 1999), the quality prior web-curation pipelines
weight domains by (a spam farm links differently than a reference
site, however good its token statistics look — the signal is
orthogonal to every text-level gate in this package).

Spark-first iterative shape: ranks live in a small (node, rank) table
— DOMAINS, not documents, so thousands-to-millions of rows however
big the corpus — and each power iteration is one equi-join of ranks
onto the edge list plus one map-side-combined aggregation by
destination. The edge list stays partitioned by source across
iterations; AQE handles skewed hub domains. Dangling mass (nodes with
no out-edges) is redistributed uniformly each iteration, per the
standard formulation, so ranks stay a probability distribution and
the gate can assert sum==1.

Deterministic: given the same edges and iteration count the result is
fixed-point float arithmetic with per-node fan-in sums; cross-engine
parity holds to ~1e-12 relative (a handful of doubles per node), so
gates compare at rounded precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, damping: float = 0.85,
             iterations: int = 10, src_col: str = 'src',
             dst_col: str = 'dst') -> DataFrame:
    """(node, rank) after ``iterations`` power iterations from the
    uniform start. Nodes = every distinct src or dst; duplicate edges
    count once (the domain-graph convention: linkage, not link
    volume). Returns ranks summing to 1.

    Each iteration: contribution = rank/out_degree joined onto the
    deduped edge list, summed by destination; dangling rank mass
    (sink nodes) and the teleport term are added uniformly. The loop
    is a driver-side ``for`` over lazy plans with an eager
    ``localCheckpoint`` per iteration — without it the lineage doubles
    every round and iteration k replays all k-1 predecessors."""
    if not 0 < damping < 1:
        raise ValueError(f'damping must be in (0, 1), got {damping}')
    if iterations < 1:
        raise ValueError('iterations must be >= 1')
    e = (edges.select(F.col(src_col).alias('src'),
                      F.col(dst_col).alias('dst'))
         .where(F.col('src').isNotNull() & F.col('dst').isNotNull())
         .distinct().localCheckpoint(eager=True))
    nodes = (e.select(F.col('src').alias('node'))
             .unionByName(e.select(F.col('dst').alias('node')))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn('rank', F.lit(0.0))
    out_deg = e.groupBy('src').agg(F.count(F.lit(1)).alias('out'))
    ranks = nodes.withColumn('rank', F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (e.join(ranks.withColumnRenamed('node', 'src'), 'src')
                   .join(out_deg, 'src')
                   .select('dst', (F.col('rank') / F.col('out'))
                           .alias('c')))
        inflow = contrib.groupBy('dst').agg(F.sum('c').alias('in_rank'))
        # dangling mass (rank held by nodes with no out-edges) as a
        # broadcast 1-row aggregate INSIDE the iteration's plan — the
        # old `.first()` per iteration was a second driver action per
        # round (2 jobs/iteration -> 1; r12 optimization). The float
        # expression keeps the exact operation order of the old
        # driver-side arithmetic ((1-d)/n + (d*dangling)/n + d*inflow),
        # so ranks are bit-identical (pinned by the existing pytest
        # values and the rounded oracle gate).
        dang = (ranks.join(out_deg,
                           ranks['node'] == out_deg['src'],
                           'left_anti')
                .agg(F.coalesce(F.sum('rank'), F.lit(0.0))
                     .alias('__dang')))
        ranks = (nodes.join(inflow, nodes['node'] == inflow['dst'],
                            'left')
                 .crossJoin(F.broadcast(dang))
                 .select('node',
                         (F.lit((1.0 - damping) / n)
                          + (F.lit(damping) * F.col('__dang'))
                          / F.lit(float(n))
                          + F.lit(damping)
                          * F.coalesce(F.col('in_rank'), F.lit(0.0)))
                         .alias('rank'))
                 .localCheckpoint(eager=True))
    return ranks


def domain_quality_weights(docs: DataFrame, ranks: DataFrame,
                           url_col: str = 'url',
                           id_col: str = 'doc_id') -> DataFrame:
    """Attach each document's domain rank as ``domain_rank`` (null for
    unranked/unparseable domains) — the join that turns graph
    centrality into a per-document curation weight. Ranks broadcast
    (the domain table is small by construction)."""
    from .text import url_domain
    d = docs.withColumn('_dom', url_domain(F.col(url_col)))
    r = ranks.select(F.col('node').alias('_dom'),
                     F.col('rank').alias('domain_rank'))
    return d.join(F.broadcast(r), '_dom', 'left').drop('_dom')
