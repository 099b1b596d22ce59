"""OSM file filter/crop/merge/convert pipeline.

Reproduces the reference's `erde osm` staging semantics
(`/root/reference/erde/op/osm.py:114-226`): driver-side shell
orchestration of ``osmium`` (tags-filter / extract / cat) and ``ogr2ogr``
(GIS conversion), with tmp-file bookkeeping and a dry-run that returns the
full command plan (how the reference's golden tests validate it).

This stays driver-side on purpose (SURVEY.md §2.1): a pure-Spark OSM PBF
reader is out of scope; the pipeline produces GPKG/parquet which the Spark
engine then scans. Stage order per input file: tags-filter -> crop, then
across files: cat (merge/convert) -> ogr2ogr.
"""

from __future__ import annotations

import os
import re
import sys

OSM_FILE_RE = re.compile(r'.*\.osm(\.(pbf|gz|bz2))?$')
_STEM_RE = re.compile(r'(?:.*/)?(?P<stem>[^/.]+)\..*$')

#: default tag->column mapping ogr2ogr applies per OSM layer
DEFAULT_OGR_COLUMNS = {
    'points': 'name,highway,ref,address,is_in,place,man_made',
    'lines': 'name,highway,waterway,aerialway,barrier,man_made',
    'multipolygons': 'name,type,amenity,admin_level,barrier,boundary,building,landuse,natural',
    'multilinestrings': 'name,type',
    'other_relations': 'name,type',
}

OGR_BATCH = 65535  # ogr2ogr -gt transaction size


class Remove:
    """Deletable step: printable in dry runs, callable to execute."""

    def __init__(self, path: str):
        self.path = path

    def __call__(self) -> int:
        try:
            if os.path.exists(self.path):
                os.remove(self.path)
        except OSError:
            return 1
        return 0

    def __repr__(self):
        return f"Remove('{self.path}')"

    def __eq__(self, other):
        return isinstance(other, Remove) and other.path == self.path


def _ogr_config_file(columns: list[str]) -> tuple[str, str]:
    """Build the OSM_CONFIG_FILE contents for custom column selection.
    ``columns`` entries are either ``col1,col2`` (all layers) or
    ``layer=col1,col2``."""
    per_layer = {k: '' for k in DEFAULT_OGR_COLUMNS}
    for spec in columns:
        if '=' in spec:
            layer, cols = spec.split('=', 1)
            if layer not in per_layer:
                raise ValueError(
                    f'unknown layer {layer!r}; use one of {", ".join(per_layer)}')
            per_layer[layer] = cols
        else:
            if 'geometry' in spec.split(','):
                raise ValueError('"geometry" is a reserved column name')
            per_layer = {k: spec for k in per_layer}
    lines = ['closed_ways_are_polygons=aeroway,amenity,boundary,building,'
             'building:part,craft,geological,historic,landuse,leisure,military,'
             'natural,office,place,shop,sport,tourism,highway=platform,'
             'public_transport=platform',
             'attribute_name_laundering=yes']
    for layer, cols in per_layer.items():
        lines += ['', f'[{layer}]', 'osm_id=yes', f'attributes={cols}']
    path = '/tmp/_erde_spark_osmcfg.ini'
    return path, '\n'.join(lines) + '\n'


def plan_osm_pipeline(*filenames: str, layers: str = 'points,lines,multipolygons',
                      tags: list[str] | None = None, crop: str | None = None,
                      columns: list[str] | None = None,
                      check_exists: bool = True) -> list:
    """Build the command plan (list of shell strings and Remove steps)."""
    if len(filenames) < 2:
        raise ValueError('provide at least <input...> <output> filenames')
    *inputs, output = filenames
    for p in inputs:
        if not OSM_FILE_RE.match(p):
            raise ValueError(f"can't recognize OSM format of {p!r}")
        if check_exists and not os.path.exists(p):
            raise ValueError(f'file {p!r} does not exist')
    out_is_osm = bool(OSM_FILE_RE.match(output))

    plan: list = []
    tmp: list[str] = []

    def _stage(path: str, suffix: str, stem: str) -> str:
        out = f'/tmp/_erde_spark_{len(plan)}_{stem}.{suffix}'
        tmp.append(out)
        return out

    # per-input stages
    current: list[str] = []
    for p in inputs:
        stem = _STEM_RE.match(p)['stem']
        cur = p
        if tags:
            nxt = _stage(cur, 'filtered.osm.pbf', stem)
            plan.append(Remove(nxt))
            plan.append(f'osmium tags-filter {cur} ' + ' '.join(tags) + f' -o {nxt}')
            cur = nxt
        if crop:
            nxt = _stage(cur, 'cropped.osm.pbf', stem)
            plan.append(Remove(nxt))
            plan.append(f'osmium extract {cur} -o {nxt} -p "{crop}"')
            cur = nxt
        current.append(cur)

    if out_is_osm:
        plan.append(Remove(output))
        plan.append(f'osmium cat {" ".join(current)} -o {output}')
    else:
        cat_in = current
        if len(current) > 1:
            merged = f'/tmp/_erde_spark_cat.osm.pbf'
            tmp.append(merged)
            plan.append(Remove(merged))
            plan.append(f'osmium cat {" ".join(current)} -o {merged}')
            cat_in = [merged]
        ogr_layers = ' '.join(layers.split(','))
        extra = ''
        if columns:
            cfg_path, cfg_body = _ogr_config_file(columns)
            plan.append(('write_file', cfg_path, cfg_body))
            tmp.append(cfg_path)
            extra = f' --config OSM_CONFIG_FILE {cfg_path}'
        plan.append(Remove(output))
        plan.append(f'ogr2ogr --config OSM_USE_CUSTOM_INDEXING NO -gt {OGR_BATCH} '
                    f'-f GPKG {output} {cat_in[0]} {ogr_layers}{extra}')

    plan += [Remove(t) for t in tmp]
    return plan


def run_osm_pipeline(*filenames: str, dry: bool = False,
                     keep_tmp_files: bool = False, **kw) -> list:
    """Execute (or with ``dry`` just return) the OSM pipeline plan."""
    plan = plan_osm_pipeline(*filenames, **kw)
    if keep_tmp_files:
        while plan and isinstance(plan[-1], Remove) and \
                plan[-1].path.startswith('/tmp/_erde_spark'):
            plan.pop()
    if dry:
        print('Dry run of erde_spark osm. Generated commands:')
        for i, step in enumerate(plan):
            print(f'{i}: {step}')
        return plan
    for step in plan:
        if isinstance(step, Remove):
            rc = step()
        elif isinstance(step, tuple) and step[0] == 'write_file':
            with open(step[1], 'w') as f:
                f.write(step[2])
            rc = 0
        else:
            rc = os.system(step)
        if rc != 0:
            print(f'error in command {step}', file=sys.stderr)
            raise RuntimeError(f'OSM pipeline step failed: {step}')
    return plan
