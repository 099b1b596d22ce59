"""Per-stage skew profiler: run registry queries and report, for every
completed stage, the task-duration and shuffle-size distributions from
Spark's /api/v1 status store — the diagnosis a 1000-executor job needs
BEFORE a straggler becomes an OOM.

The signal is max/median task duration (and max/median shuffle-read)
per stage: a well-partitioned stage sits near 1; a hot key or an
unsplittable input shows up as one task carrying the stage. AQE's
skew-join splitting handles the join case at runtime, but scan-side
skew (one giant file) and explode-amplification skew do NOT get
re-planned — this report is how they're found. Local runs are the
rehearsal: the same API shape (and therefore this same tool) works
against any Spark cluster's history server.

Usage: python tools/skew_report.py [sf_dir] query [query ...]
       python tools/skew_report.py [sf_dir] --top8   # 8 priciest bench rows
Flags a stage SKEW when max/median task time > 4x with >= 8 tasks and
max > 1 s (below that, scheduler noise dominates). Exit 0 always —
a report, not a gate; paste tables into SCALE.md / round notes.
"""

import json
import sys
import urllib.request

sys.path.insert(0, '.')

SKEW_RATIO = 4.0
MIN_TASKS = 8
MIN_MAX_MS = 1000

#: the historically most expensive bench rows — the ones worth
#: profiling every round (--top8)
TOP8 = ['streaming_neardup_backfill', 'dedup_minhash_lsh',
        'dedup_clusters', 'quality_classifier', 'video_frame_dedup',
        'bitext_mine_check', 'exactsubstr_cut', 'contamination_check']


def _api(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    return json.load(urllib.request.urlopen(
        f'{ui}/api/v1/applications/{app}/{path}'))


def stage_rows(spark, since_stage: int):
    """(stage_id, name, tasks, med_ms, max_ms, shuf_read, shuf_write,
    spill) for completed stages with id >= since_stage, via the
    withSummaries task-metric quantiles (no per-task scrape)."""
    rows = []
    for s in _api(spark, 'stages?status=complete&withSummaries=true'
                         '&quantiles=0.5,1.0'):
        if s['stageId'] < since_stage:
            continue
        dist = s.get('taskMetricsDistributions') or {}
        dur = dist.get('executorRunTime') or [0, 0]
        rows.append({
            'stage': s['stageId'],
            'name': s['name'].split('\n')[0][:48],
            'tasks': s['numCompleteTasks'],
            'med_ms': dur[0],
            'max_ms': dur[-1],
            'shuf_read_mb': s.get('shuffleReadBytes', 0) / 1e6,
            'shuf_write_mb': s.get('shuffleWriteBytes', 0) / 1e6,
            'spill_mb': s.get('diskBytesSpilled', 0) / 1e6,
        })
    return sorted(rows, key=lambda r: -r['max_ms'])


def main():
    import __spark_entry__ as entry
    import os
    os.environ['SPARK_GRAFT_UI'] = '1'
    from erde_spark.session import get_spark
    spark = get_spark(app_name='erde_spark_skew_report')
    sf = sys.argv[1] if len(sys.argv) > 1 and not \
        sys.argv[1].startswith('-') else '/root/testdata/sf0.1'
    names = [a for a in sys.argv[2:] if not a.startswith('-')]
    if '--top8' in sys.argv:
        names += TOP8
    qs = entry.queries()
    any_skew = False
    for name in names:
        before = max((s['stageId'] for s in
                      _api(spark, 'stages')), default=-1) + 1
        qs[name](spark, sf).count()
        rows = stage_rows(spark, before)
        print(f'\n== {name} ({len(rows)} stages) ==')
        print('stage tasks   med_ms   max_ms ratio  shufR_MB shufW_MB '
              'spill_MB  flag  name')
        for r in rows[:12]:
            ratio = r['max_ms'] / max(r['med_ms'], 1)
            skew = (ratio > SKEW_RATIO and r['tasks'] >= MIN_TASKS
                    and r['max_ms'] >= MIN_MAX_MS)
            any_skew |= skew
            print(f"{r['stage']:5d} {r['tasks']:5d} {r['med_ms']:8.0f} "
                  f"{r['max_ms']:8.0f} {ratio:5.1f} "
                  f"{r['shuf_read_mb']:9.2f} {r['shuf_write_mb']:8.2f} "
                  f"{r['spill_mb']:8.2f}  {'SKEW' if skew else 'ok  '}"
                  f"  {r['name']}")
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        spark.catalog.clearCache()
    print('\nskew flags:', 'PRESENT (see rows above)' if any_skew
          else 'none')


if __name__ == '__main__':
    main()
