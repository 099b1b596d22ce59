"""Trainable quality classifier: planted-signal separation, determinism,
filter semantics, and the map-only scoring plan."""

import random

import pytest
from pyspark.sql import functions as F

from erde_spark.scale.classifier import (classifier_auc,
                                         train_quality_classifier)

GOOD_WORDS = ['theorem', 'analysis', 'evidence', 'method', 'result',
              'structure', 'careful', 'precise', 'context', 'citation']
BAD_WORDS = ['click', 'free', 'winner', 'casino', 'pills', 'cheap',
             'offer', 'buy', 'now', 'prize']
NEUTRAL = ['the', 'of', 'and', 'with', 'for', 'data', 'table', 'note',
           'section', 'line']


def _corpus(n, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        label = i % 2
        lex = GOOD_WORDS if label else BAD_WORDS
        words = [rng.choice(lex if rng.random() < 0.6 else NEUTRAL)
                 for _ in range(40)]
        rows.append((i, ' '.join(words), label))
    return rows


@pytest.fixture(scope='module')
def labeled(spark):
    return spark.createDataFrame(_corpus(400, seed=7),
                                 'doc_id long, text string, label int')


@pytest.fixture(scope='module')
def clf(labeled):
    return train_quality_classifier(labeled, max_iter=30)


def test_planted_signal_separates(spark, clf):
    held = spark.createDataFrame(_corpus(200, seed=99),
                                 'doc_id long, text string, label int')
    auc = classifier_auc(clf, held)
    assert auc > 0.95, auc


def test_scores_are_probabilities(clf, labeled):
    row = (clf.score(labeled)
           .agg(F.min('quality_prob'), F.max('quality_prob')).first())
    assert 0.0 <= row[0] <= row[1] <= 1.0


def test_training_deterministic(labeled):
    a = train_quality_classifier(labeled, max_iter=15)
    b = train_quality_classifier(labeled, max_iter=15)
    pa = {r['id']: r['quality_prob'] for r in a.score(labeled).collect()}
    pb = {r['id']: r['quality_prob'] for r in b.score(labeled).collect()}
    assert pa == pb


def test_filter_keeps_good(spark, clf):
    held = spark.createDataFrame(_corpus(200, seed=3),
                                 'doc_id long, text string, label int')
    kept = clf.filter(held, threshold=0.5)
    stats = kept.agg(F.avg('label'), F.count(F.lit(1))).first()
    assert stats[1] > 0
    assert stats[0] > 0.9  # kept set is overwhelmingly the good class


def test_scoring_plan_is_map_only(clf, labeled):
    from erde_spark.plans.inspect import count_shuffles
    assert count_shuffles(clf.score(labeled)) == 0


def test_nb_classifier_separates_and_is_deterministic(spark):
    from erde_spark.scale.classifier import nb_score, nb_token_logratios
    pos = [(i, 'the quick brown fox jumps over the lazy dog %d' % i, 1)
           for i in range(15)]
    neg = [(100 + i, 'qz%d xv%d jk%d ww%d' % (i, i * 3, i * 7, i * 11), 0)
           for i in range(15)]
    df = spark.createDataFrame(pos + neg, 'doc_id long, text string, label int')
    model = nb_token_logratios(df)
    scored = {r['id']: r for r in
              nb_score(df.select('doc_id', 'text'), model).collect()}
    assert all(scored[i]['nb_label'] == 1 for i, _, _ in pos)
    assert all(scored[i]['nb_label'] == 0 for i, _, _ in neg)
    # closed-form: a second training run is bit-identical
    again = {r['id']: r['nb_score'] for r in
             nb_score(df.select('doc_id', 'text'),
                      nb_token_logratios(df)).collect()}
    assert all(again[i] == scored[i]['nb_score'] for i in again)
    # OOV-only documents score exactly 0 (no class evidence)
    oov = spark.createDataFrame([(999, 'unseen tokens entirely')],
                                'doc_id long, text string')
    r = nb_score(oov, model).first()
    assert r['nb_score'] == 0.0 and r['nb_label'] == 0
