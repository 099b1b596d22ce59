"""Counterbalanced pinned-commit A/B bench runner (round-7 verdict ask).

Runs a target-query subset of the bench in a FRESH process per (tree,
repetition), interleaved in a counterbalanced order (ABC CBA ...), with
the code-independent CPU sentinel timed in every process — the only
protocol that separates code effects from this box's ~1 h-scale drift
(see bench.py docstring and ROUND6_NOTES §2).

Usage:
    python tools/ab_bench.py run <tree_dir> <sf_dir> <query> [query ...]
        -> one JSON line {"tree", "sentinel", "queries": {q: [runs...]}}
    python tools/ab_bench.py drive <sf_dir> <query...> --trees a=/p1 b=/p2
        -> orchestrates the counterbalanced sequence, prints a summary
"""

import json
import os
import subprocess
import sys
import time


def _sentinel_cpu():
    import hashlib
    t0 = time.perf_counter()
    h = b'calibration'
    for _ in range(400_000):
        h = hashlib.md5(h).digest()
    return time.perf_counter() - t0


def run_one(tree, sf_dir, queries, n_runs=3):
    sys.path.insert(0, tree)
    os.chdir(tree)
    import __spark_entry__ as entry
    from erde_spark.session import get_spark
    spark = get_spark(app_name='ab_bench')
    qs = entry.queries()
    # same warm-up discipline as bench.py
    qs['tpch_q1_pricing'](spark, sf_dir).count()
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.LongType())
    def _warm(x):
        return x + 1
    spark.range(0, 1024, 1, 32).select(_warm('id')).count()
    s0 = _sentinel_cpu()
    out = {}
    for name in queries:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            spark.catalog.clearCache()
        out[name] = runs
    s1 = _sentinel_cpu()
    print(json.dumps({'tree': tree, 'sentinel': [round(s0, 3), round(s1, 3)],
                      'queries': out}))


def drive(sf_dir, queries, trees, reps=2):
    """Counterbalanced: forward order then reverse, `reps` times."""
    labels = list(trees)
    order = []
    for _ in range(reps):
        order += labels + labels[::-1]
    results = {k: [] for k in labels}
    for i, lab in enumerate(order):
        cmd = [sys.executable, os.path.abspath(__file__), 'run',
               trees[lab], sf_dir] + queries
        env = dict(os.environ)
        p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           timeout=1200)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ''
        try:
            rec = json.loads(line)
        except Exception:
            print(f'[{i}] {lab}: FAILED rc={p.returncode}\n{p.stderr[-2000:]}',
                  file=sys.stderr)
            continue
        results[lab].append(rec)
        mins = {q: min(v) for q, v in rec['queries'].items()}
        print(f'[{i}] {lab}: sentinel={rec["sentinel"]} mins={mins}',
              flush=True)
    print(json.dumps({'summary': {
        lab: {
            'sentinel_min': min((min(r['sentinel']) for r in rs),
                                default=None),
            'per_query_min': {q: min(min(r['queries'][q]) for r in rs)
                              for q in queries} if rs else {},
            'per_query_all': {q: [r['queries'][q] for r in rs]
                              for q in queries} if rs else {},
        } for lab, rs in results.items()}}))


if __name__ == '__main__':
    if sys.argv[1] == 'run':
        run_one(sys.argv[2], sys.argv[3], sys.argv[4:])
    elif sys.argv[1] == 'drive':
        args = sys.argv[2:]
        ti = args.index('--trees')
        sf, queries = args[0], args[1:ti]
        trees = dict(kv.split('=', 1) for kv in args[ti + 1:])
        drive(sf, queries, trees)
