"""Trainable quality classifier — fastText/CCNet-style document scoring.

The reference engine ships only static quality heuristics; real curation
pipelines (CCNet, Gopher, Llama/GPT data work) train a LINEAR classifier
on hashed bag-of-n-gram features against a small labeled set ("looks
like Wikipedia" vs "random crawl") and score the whole corpus with it.
This module is that operator, built on Spark ML's distributed trainer:

- featurize: word unigram+bigram hashing trick into a fixed-dim sparse
  vector (``HashingTF`` — JVM murmur3, no Python workers), IDF optional;
- train: ``pyspark.ml`` ``LogisticRegression`` (L-BFGS) — each iteration
  is one treeAggregate of map-side gradient partials over the corpus, the
  canonical distributed shape for 100 TB linear-model training;
- score: coefficients broadcast in the model; scoring the corpus is a
  single map-only pass (no shuffle), emitting ``P(label=1)`` per doc.

Tokenization reuses :mod:`erde_spark.scale.text` so the classifier sees
the same token stream as every other text operator; n-grams are built
with the linear ``zip_with``-over-slices kernel from
:mod:`erde_spark.scale.dsir` (the element_at version measured quadratic).

Scale notes: the model is ``n_features`` floats (2^18 doubles = 2 MB),
always broadcastable. Training cost is #iterations × one corpus pass;
CCNet-style practice trains on a ≤1M-doc labeled sample, then scores the
full corpus with the map-only pass — both shapes are what this module
emits. Not SQL-expressible (iterative optimizer), so the gate entry is
rows-only; determinism and separation quality are pinned in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erde_spark.scale.dsir import _ngrams_of
from erde_spark.scale.text import tokens

#: 2^18 hashed feature buckets (fastText default is 2M for bigrams; 262k
#: keeps the broadcast model ~2 MB while collisions stay <1% on the
#: ≤100k-type vocabularies a labeled training sample has)
N_FEATURES = 1 << 18


def _featurize(df: DataFrame, text_col: str, ns: tuple[int, ...],
               n_features: int) -> DataFrame:
    """Append a ``features`` sparse-vector column (hashed n-gram counts).

    The token array is materialized behind its own projection before the
    n-gram ``zip_with`` kernel runs (see ``dsir._ngrams_of``), then
    ``HashingTF`` maps the array to a fixed-dim sparse count vector
    JVM-side."""
    from pyspark.ml.feature import HashingTF
    toked = df.withColumn('_toks', tokens(text_col))
    grams = toked.withColumn('_grams', _ngrams_of(F.col('_toks'), ns))
    tf = HashingTF(inputCol='_grams', outputCol='features',
                   numFeatures=n_features)
    return tf.transform(grams).drop('_toks', '_grams')


class QualityClassifier:
    """A trained linear quality model: hashing-trick featurizer params +
    the fitted ``LogisticRegressionModel``. Picklable enough for driver
    reuse; scoring broadcasts only the coefficient vector."""

    def __init__(self, lr_model, text_col: str, ns: tuple[int, ...],
                 n_features: int):
        self.lr_model = lr_model
        self.text_col = text_col
        self.ns = ns
        self.n_features = n_features

    def score(self, df: DataFrame, id_col: str = 'doc_id',
              text_col: str | None = None) -> DataFrame:
        """(id, quality_prob) for every document — P(label=1) under the
        trained model. One map-only pass: featurize + broadcast-coef
        dot product + sigmoid, no shuffle anywhere."""
        from pyspark.ml.functions import vector_to_array
        feat = _featurize(df, text_col or self.text_col, self.ns,
                          self.n_features)
        scored = self.lr_model.transform(feat)
        return scored.select(
            F.col(id_col).alias('id'),
            vector_to_array('probability').getItem(1).alias('quality_prob'))

    def filter(self, df: DataFrame, id_col: str = 'doc_id',
               threshold: float = 0.5) -> DataFrame:
        """Documents whose quality probability clears ``threshold`` —
        the CCNet keep-set. Original columns preserved."""
        keep = (self.score(df, id_col)
                .where(F.col('quality_prob') >= threshold)
                .select('id'))
        return df.join(keep, df[id_col] == keep['id'], 'left_semi')


def train_quality_classifier(labeled: DataFrame, text_col: str = 'text',
                             label_col: str = 'label',
                             ns: tuple[int, ...] = (1, 2),
                             n_features: int = N_FEATURES,
                             max_iter: int = 50,
                             reg_param: float = 1e-4) -> QualityClassifier:
    """Fit the classifier on a labeled frame (``label_col`` ∈ {0, 1};
    1 = high quality / target-like). L2-regularized logistic regression
    via L-BFGS; deterministic for a fixed input (no random init)."""
    from pyspark.ml.classification import LogisticRegression
    feat = _featurize(labeled, text_col, ns, n_features)
    train_df = feat.select('features',
                           F.col(label_col).cast('double').alias('label'))
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                            standardization=False)
    model = lr.fit(train_df)
    return QualityClassifier(model, text_col, ns, n_features)


def classifier_auc(clf: QualityClassifier, labeled: DataFrame,
                   id_col: str = 'doc_id', text_col: str | None = None,
                   label_col: str = 'label') -> float:
    """Area under the ROC curve of ``clf`` on a labeled eval frame —
    the metric CCNet-style pipelines gate a trained filter on."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.functions import array_to_vector
    scores = clf.score(labeled, id_col, text_col)
    joined = (labeled.select(F.col(id_col).alias('id'),
                             F.col(label_col).cast('double').alias('label'))
              .join(scores, 'id'))
    pred = joined.select(
        array_to_vector(F.array(1.0 - F.col('quality_prob'),
                                F.col('quality_prob')))
        .alias('probability'), 'label')
    ev = BinaryClassificationEvaluator(rawPredictionCol='probability',
                                       metricName='areaUnderROC')
    return float(ev.evaluate(pred))


# ------------------------------------------------- Naive Bayes variant


def nb_token_logratios(labeled: DataFrame, text_col: str = 'text',
                       label_col: str = 'label',
                       alpha: float = 1.0) -> DataFrame:
    """Multinomial Naive Bayes training as ONE aggregation: per token,
    ``llr = ln((c_pos + alpha)/(N_pos + alpha*V)) - ln((c_neg + alpha)/
    (N_neg + alpha*V))`` with Laplace smoothing over the joint
    vocabulary V. Returns (token, llr).

    Unlike the L-BFGS classifier this is CLOSED-FORM — count, divide,
    log — so training is exactly reproducible by any SQL engine (the
    gate oracle replays it in DuckDB) and costs one shuffle of the
    token stream with map-side combine. The standard fastText-era
    baseline for quality/langid-style filters."""
    toks = labeled.select(F.col(label_col).cast('int').alias('_y'),
                          F.explode(tokens(text_col)).alias('token'))
    # vocabulary-sized count table read twice (class totals + the
    # returned log-ratio projection): the lazy checkpoint is
    # materialized by the totals aggregation below, so the token-stream
    # shuffle runs ONCE with no extra action (r13, guide §5)
    counts = (toks.groupBy('token')
              .agg(F.sum(F.when(F.col('_y') == 1, 1).otherwise(0))
                   .alias('_cp'),
                   F.sum(F.when(F.col('_y') == 0, 1).otherwise(0))
                   .alias('_cn'))
              .localCheckpoint(eager=False))
    tot = counts.agg(F.sum('_cp').alias('np'), F.sum('_cn').alias('nn'),
                     F.count(F.lit(1)).alias('v')).first()
    np_, nn, v = float(tot['np']), float(tot['nn']), float(tot['v'])
    lp = F.log((F.col('_cp') + alpha) / (np_ + alpha * v))
    ln = F.log((F.col('_cn') + alpha) / (nn + alpha * v))
    return counts.select('token', (lp - ln).alias('llr'))


def nb_score(docs: DataFrame, logratios: DataFrame,
             id_col: str = 'doc_id', text_col: str = 'text',
             quantize_scale: int | None = None) -> DataFrame:
    """(id, nb_score, nb_label) per document: the summed log-likelihood
    ratio of its tokens (out-of-vocabulary tokens contribute 0 — they
    carry no class evidence under shared smoothing) and the sign
    verdict. The model is a (token, llr) table that BROADCASTS (real
    vocabularies are millions of rows at most), so scoring a 100 TB
    corpus is one map-side join + map-side-combined sum — no corpus
    shuffle by token.

    ``quantize_scale`` (e.g. ``1_000_000``) switches to fixed-point
    scoring: each token's llr is rounded to an integer multiple of
    ``1/scale`` and the per-document sum runs in exact integer
    arithmetic. Float summation is order-sensitive — two engines (or
    two partitionings of the SAME engine) can disagree in the last
    bits, and the error grows with document length — so exact
    cross-engine reproducibility (the driver's value-hash gate, or
    any audit that replays scoring elsewhere) needs the fixed-point
    path; plain float scoring stays the default for filtering use."""
    toks = docs.select(F.col(id_col).alias('id'),
                       F.explode(tokens(text_col)).alias('token'))
    if quantize_scale:
        q = logratios.select(
            'token',
            F.round(F.col('llr') * quantize_scale).cast('long')
            .alias('_q'))
        joined = toks.join(F.broadcast(q), 'token', 'left')
        return (joined.groupBy('id')
                .agg(F.sum(F.coalesce(F.col('_q'), F.lit(0)))
                     .alias('_sq'))
                .select('id',
                        (F.col('_sq') / F.lit(quantize_scale))
                        .alias('nb_score'),
                        (F.col('_sq') > 0).cast('int').alias('nb_label')))
    joined = toks.join(F.broadcast(logratios), 'token', 'left')
    return (joined.groupBy('id')
            .agg(F.sum(F.coalesce(F.col('llr'), F.lit(0.0)))
                 .alias('nb_score'))
            .select('id', 'nb_score',
                    (F.col('nb_score') > 0).cast('int').alias('nb_label')))
