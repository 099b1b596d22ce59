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
