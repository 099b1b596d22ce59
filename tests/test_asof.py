"""As-of join tests (extension operator — SURVEY.md §2.3 notes the
reference has no as-of join; semantics follow SQL ASOF JOIN / pandas
merge_asof: nearest right row at-or-before / at-or-after each left ts)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from erde_spark.operators.asof import asof_join

T = dt.datetime


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 0, 10), 'a'), (1, T(2024, 1, 1, 0, 0, 20), 'b'),
         (2, T(2024, 1, 1, 0, 0, 5), 'c'), (2, T(2024, 1, 1, 0, 0, 1), 'd')],
        'uid long, ts timestamp, tag string')
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 0, 8), 100.0), (1, T(2024, 1, 1, 0, 0, 15), 200.0),
         (2, T(2024, 1, 1, 0, 0, 5), 300.0)],
        'uid long, ts timestamp, price double')
    return left, right


def _by_tag(df):
    return {r['tag']: r['price'] for r in df.collect()}


def test_backward_inclusive(sides):
    left, right = sides
    got = _by_tag(asof_join(left, right, 'ts', by='uid'))
    # 'c' matches the equal-timestamp right row (inclusive bound);
    # 'd' predates every right row -> NULL
    assert got == {'a': 100.0, 'b': 200.0, 'c': 300.0, 'd': None}


def test_forward(sides):
    left, right = sides
    got = _by_tag(asof_join(left, right, 'ts', by='uid', direction='forward'))
    assert got == {'a': 200.0, 'b': None, 'c': 300.0, 'd': 300.0}


def test_tolerance_seconds(sides):
    left, right = sides
    got = _by_tag(asof_join(left, right, 'ts', by='uid', tolerance=3))
    # 'a' is 2s after its match (keeps), 'b' is 5s after (dropped)
    assert got == {'a': 100.0, 'b': None, 'c': 300.0, 'd': None}


def test_right_ts_exposed_and_suffix(sides):
    left, right = sides
    out = asof_join(left, right, 'ts', by='uid')
    assert 'ts_right' in out.columns and 'price' in out.columns
    row = [r for r in out.collect() if r['tag'] == 'a'][0]
    assert row['ts_right'] == T(2024, 1, 1, 0, 0, 8)


def test_numeric_on_column(spark):
    left = spark.createDataFrame([(1, 10), (1, 3)], 'k long, x long')
    right = spark.createDataFrame([(1, 5, 'five'), (1, 9, 'nine')], 'k long, x long, v string')
    got = {r['x']: r['v'] for r in asof_join(left, right, 'x', by='k').collect()}
    assert got == {10: 'nine', 3: None}


def test_no_by_keys(spark):
    left = spark.createDataFrame([(7,)], 'x long')
    right = spark.createDataFrame([(5, 'v')], 'x long, v string')
    assert asof_join(left, right, 'x').first()['v'] == 'v'


def test_single_shuffle_plan(sides):
    """The physical plan must contain exactly one exchange (the union is
    windowed once) — no pair-join blowup, no second shuffle."""
    left, right = sides
    plan = asof_join(left, right, 'ts', by='uid')._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count('Exchange hashpartitioning') == 1
    assert 'NestedLoop' not in plan and 'CartesianProduct' not in plan


def test_asof_matches_python_model(spark):
    """Randomized differential test: asof_join output equals a brute-force
    per-row scan model, across seeds, directions and key distributions."""
    import random

    for seed, direction in [(1, 'backward'), (2, 'forward'), (3, 'backward')]:
        rng = random.Random(seed)
        lrows = [(rng.randrange(5), rng.randrange(1000), i)
                 for i in range(120)]
        rrows = [(rng.randrange(5), rng.randrange(1000), i * 10)
                 for i in range(80)]
        left = spark.createDataFrame(lrows, 'k long, x long, tag long')
        right = spark.createDataFrame(rrows, 'k long, x long, val long')

        def model(k, x):
            if direction == 'backward':
                cand = [(rx, v) for rk, rx, v in rrows if rk == k and rx <= x]
                best = max(cand, default=None)
            else:
                cand = [(-rx, v) for rk, rx, v in rrows if rk == k and rx >= x]
                best = max(cand, default=None)
            return best[1] if best else None

        got = {r['tag']: r['val']
               for r in asof_join(left, right, 'x', by='k',
                                  direction=direction).collect()}
        want = {tag: model(k, x) for k, x, tag in lrows}
        assert got == want, f'seed={seed} direction={direction}'


def test_resample_locf(spark):
    """Gap-fill semantics: grid points before the first observation are
    NULL; later points carry the latest value forward."""
    from erde_spark.operators.timeseries import resample_locf
    df = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 10), 5.0), (1, T(2024, 1, 1, 2, 30), 7.0),
         (2, T(2024, 1, 1, 1, 45), 9.0)],
        'k long, ts timestamp, v double')
    out = resample_locf(df, 'ts', '1 hour', by='k',
                        start='2024-01-01 00:00:00', end='2024-01-01 03:00:00')
    got = {(r['k'], r['grid_ts'].hour): r['v'] for r in out.collect()}
    assert got == {(1, 0): None, (1, 1): 5.0, (1, 2): 5.0, (1, 3): 7.0,
                   (2, 0): None, (2, 1): None, (2, 2): 9.0, (2, 3): 9.0}
    assert out.count() == 8  # 2 keys x 4 grid points


def test_resample_locf_auto_bounds_and_no_keys(spark):
    from erde_spark.operators.timeseries import resample_locf
    df = spark.createDataFrame(
        [(T(2024, 1, 1, 0, 0), 1.0), (T(2024, 1, 1, 4, 0), 2.0)],
        'ts timestamp, v double')
    out = resample_locf(df, 'ts', '2 hours')
    rows = sorted((r['grid_ts'].hour, r['v']) for r in out.collect())
    assert rows == [(0, 1.0), (2, 1.0), (4, 2.0)]
