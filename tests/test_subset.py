"""Subset DSL tests — matrix from the reference's doctests
(`/root/reference/erde/op/subset.py:65-76`) and tests/test_subset.py."""

import pytest

from erde_spark.operators.subset import parse_spec, subset


@pytest.fixture()
def df(spark):
    return spark.createDataFrame([(10, 100, 1000)], 'col1 int, col2 int, col3 int')


def test_rename_dict(df):
    assert subset(df, {'col1': 'col4'}).columns == ['col4']


def test_rename_keep_rest(df):
    assert subset(df, 'col1: col5,*').columns == ['col5', 'col2', 'col3']


def test_pairs(df):
    assert subset(df, (('col1', 'col4'), ('col2', 'new2'))).columns == ['col4', 'new2']


def test_drop_only_keeps_rest(df):
    assert subset(df, '-col1').columns == ['col2', 'col3']


def test_rename_plus_drop(df):
    assert subset(df, 'col2:new2, -col1').columns == ['new2']


def test_assert_presence(df):
    assert subset(df, 'col1,col2').columns == ['col1', 'col2']
    with pytest.raises(KeyError):
        subset(df, 'nope')


def test_drop_missing_is_noop(df):
    assert subset(df, '-nope').columns == ['col1', 'col2', 'col3']


def test_values_preserved(df):
    row = subset(df, 'col1:a,*').first()
    assert row['a'] == 10 and row['col2'] == 100


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_spec('a:b:c')
    with pytest.raises(ValueError):
        parse_spec('-a:b')
    with pytest.raises(ValueError):
        parse_spec('a,,b')
    with pytest.raises(ValueError):
        parse_spec('-')


def test_bad_type(df):
    with pytest.raises(TypeError):
        subset(df, 42)
