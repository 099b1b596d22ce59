"""Per-query optimization profiler (round 12).

For each named query: capture .explain('formatted') to a file, run it
N times warm (same df.count() action as bench.py so numbers are
comparable), and dump the per-job wall-time breakdown from the app
status store so "where does the time go" is answerable per query
(job-chain overhead vs one dominant stage).

Usage:
  python tools/profile_query.py q1 [q2 ...] [--runs N] [--plandir DIR]
  python tools/profile_query.py q1 --noop      # time with noop sink
  python tools/profile_query.py q1 --alljobs   # every job, not top-8
"""

import os
import sys
import time

sys.path.insert(0, '.')
import __spark_entry__ as entry  # noqa: E402

SF_DIR = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')


def main():
    args = [a for a in sys.argv[1:]]
    runs = 3
    plandir = None
    use_noop = '--noop' in args
    alljobs = '--alljobs' in args
    if '--runs' in args:
        i = args.index('--runs')
        runs = int(args[i + 1])
        del args[i:i + 2]
    if '--plandir' in args:
        i = args.index('--plandir')
        plandir = args[i + 1]
        del args[i:i + 2]
    names = [a for a in args if not a.startswith('--')]

    from erde_spark.session import get_spark
    spark = get_spark(app_name='erde_profile')
    qs = entry.queries()

    # warm like bench.py does
    qs['tpch_q1_pricing'](spark, SF_DIR).count()
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.LongType())
    def _warm(x):
        return x + 1
    spark.range(0, 1024, 1, 32).select(_warm('id')).count()

    sc = spark.sparkContext

    def _jobs_snapshot():
        st = sc._jsc.sc().statusStore()
        jl = st.jobsList(None)
        out = []
        for i in range(jl.size()):
            j = jl.apply(i)
            sub = j.submissionTime()
            comp = j.completionTime()
            dur = None
            if sub.isDefined() and comp.isDefined():
                dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
            desc = j.description()
            label = (desc.get() if desc.isDefined()
                     else j.name()).replace('\n', ' ')[:100]
            out.append((j.jobId(), dur, label))
        return out

    for name in names:
        fn = qs[name]
        if plandir:
            os.makedirs(plandir, exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(os.path.join(plandir, f'{name}.txt'), 'w') as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), 'formatted'))
            print(f'{name}: plan -> {plandir}/{name}.txt')
        times = []
        for r in range(runs):
            before_ids = {j[0] for j in _jobs_snapshot()}
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if use_noop:
                df.write.format('noop').mode('overwrite').save()
            else:
                df.count()
            dt = time.perf_counter() - t0
            times.append(dt)
            new = [j for j in _jobs_snapshot() if j[0] not in before_ids]
            for rdd in sc._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            spark.catalog.clearCache()
            if r == runs - 1:  # report breakdown of the last (warm) run
                durs = sorted((j[1] or 0.0) for j in new)
                tot = sum(durs)
                print(f'{name}: wall={min(times):.3f}s (runs={[round(t,3) for t in times]}) '
                      f'jobs={len(new)} jobsum={tot:.2f}s '
                      f'max_job={max(durs) if durs else 0:.2f}s')
                if alljobs:
                    for jid, dur, desc in sorted(new):
                        print(f'   job {jid}: {dur if dur is not None else -1:.2f}s  {desc}')
                else:
                    big = sorted(new, key=lambda j: -(j[1] or 0))[:8]
                    for jid, dur, desc in big:
                        print(f'   job {jid}: {dur if dur is not None else -1:.2f}s  {desc[:110]}')


if __name__ == '__main__':
    main()
