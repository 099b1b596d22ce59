"""Tests: connected-components cluster dedup, stateful streaming,
per-row isochrone parameterization."""

import duckdb
import pytest
from pyspark.sql import functions as F

SF = '/root/testdata/sf0.001'


def test_connected_components_chain(spark):
    from erde_spark.scale.dedup import connected_components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 8)], 'id_a long, id_b long')
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 6, 7, 8)], 'id long')
    comp = {r['id']: r['component'] for r in connected_components(pairs, ids).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[5] == comp[6] == 5
    assert comp[7] == 7  # isolated node keeps its own label


def test_dedup_clusters_documents(spark):
    """Representatives must be exactly the min doc_id per near-dup
    component; every kept doc is its cluster's minimum."""
    from erde_spark.scale.dedup import dedup_clusters, minhash_lsh_pairs
    docs = spark.read.parquet(f'{SF}/documents.parquet').filter(F.col('doc_id') < 150)
    n_docs = 150
    pairs_df = minhash_lsh_pairs(docs, threshold=0.9).cache()
    pairs = {(r['id_a'], r['id_b']) for r in pairs_df.collect()}
    assert pairs  # near-dups exist in this slice
    kept = dedup_clusters(docs, threshold=0.9)
    kept_ids = {r['doc_id'] for r in kept.select('doc_id').collect()}
    assert 0 < len(kept_ids) < n_docs
    # no two representatives may be near-dups of each other at >= .9:
    # their components would have merged
    both_kept = [(a, b) for a, b in pairs if a in kept_ids and b in kept_ids]
    assert both_kept == []
    # sizes add up to the corpus
    total = kept.agg(F.sum('cluster_size')).first()[0]
    assert total == n_docs
    pairs_df.unpersist()


def test_running_user_stats_stateful(spark, tmp_path):
    from erde_spark.session import load_tables
    from erde_spark.streaming.stateful import run_stateful_batch, running_user_stats
    ev = load_tables(spark, SF, 'events')['events'].limit(200)
    out = run_stateful_batch(spark, ev, running_user_stats, str(tmp_path))
    # final state per user = plain batch aggregation
    got = {r['user_id']: (r['n_events'], round(r['sum_value'], 6))
           for r in out.groupBy('user_id')
                       .agg(F.max('n_events').alias('n_events'),
                            F.max('sum_value').alias('sum_value')).collect()}
    exp = {r['user_id']: (r['n'], round(r['s'], 6))
           for r in ev.groupBy('user_id')
                      .agg(F.count(F.lit(1)).alias('n'),
                           F.sum('value').alias('s')).collect()}
    assert got == exp


def test_isochrone_per_row_params(spark):
    """speed/durations as COLUMNS: each source uses its own values
    (reference column-as-parameter contract)."""
    from erde_spark.functions.geo import st_point
    from erde_spark.geo import geom as G
    from erde_spark.routing.isochrone import isochrones
    from tests.osrm_mock import SPEED, MockOsrm
    src = spark.createDataFrame(
        [(0, 10.0, 0.0, '3', SPEED * 3.6), (1, 12.0, 0.0, '3,6', SPEED * 3.6)],
        'sid long, x double, y double, durs string, spd double') \
        .select('sid', 'durs', 'spd',
                st_point(F.col('x'), F.col('y')).alias('geometry'))
    with MockOsrm() as m:
        out = isochrones(src, m.url, durations='durs', speed='spd',
                         max_snap=100.0).collect()
    got = sorted((r['sid'], r['duration']) for r in out)
    assert got == [(0, 3.0), (1, 3.0), (1, 6.0)]
    assert all(G.wkb_loads(bytes(r['geometry']))[0] == 'MultiPolygon' for r in out)
