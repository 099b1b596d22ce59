"""The example scripts run end-to-end (reference keeps its examples
executable; ours compose the real operator surface)."""

import importlib.util
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), '..', 'examples')


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(EXAMPLES, f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_training_pipeline_curates(spark, tmp_path):
    mod = _load('training_pipeline')
    out = mod.curate(spark, '/root/testdata/sf0.001')
    n = out.count()
    # quality gate + exact + near dedup must drop a meaningful share of
    # the 500 synthetic docs (which are ~25% near-dup pairs) but keep most
    assert 100 < n < 500
    # survivors are unique texts
    assert out.select('text').distinct().count() == n


def test_web_ingest_pipeline(spark):
    mod = _load('web_ingest')
    out = mod.ingest(spark, '/root/testdata/sf0.001', select_k=120)
    rows = out.collect()
    assert len(rows) == 120
    # splits assigned, PII-free HTML stripped text survived
    assert {r['split'] for r in rows} <= {'train', 'val', 'test'}
    assert all('<p>' not in r['text'] and 'nav();' not in r['text']
               for r in rows)
    # snapshot dedup removed the 'previous snapshot' slice
    assert all(r['doc_id'] % 7 != 0 for r in rows)
    # selection weights present and finite
    assert all(r['log_weight'] is not None for r in rows)
