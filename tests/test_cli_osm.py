"""CLI decorator contract + OSM pipeline planning tests
(reference `tests/test_command.py`, `tests/osm/test_osm.py` strategy:
dry-run command plans asserted as strings, CLI driven end-to-end)."""

import pytest

from erde_spark.io.osm import Remove, plan_osm_pipeline


def _strs(plan):
    return [s if isinstance(s, str) else repr(s) for s in plan
            if not isinstance(s, tuple)]


def test_osm_plan_convert_to_gpkg(tmp_path):
    src = tmp_path / 'city.osm.pbf'
    src.write_text('')
    plan = plan_osm_pipeline(str(src), str(tmp_path / 'out.gpkg'))
    cmds = [s for s in plan if isinstance(s, str)]
    assert len(cmds) == 1
    assert cmds[0].startswith('ogr2ogr --config OSM_USE_CUSTOM_INDEXING NO -gt 65535')
    assert 'points lines multipolygons' in cmds[0]
    assert str(src) in cmds[0]


def test_osm_plan_tags_crop_merge(tmp_path):
    a = tmp_path / 'a.osm.pbf'
    b = tmp_path / 'b.osm'
    a.write_text('')
    b.write_text('')
    out = str(tmp_path / 'out.gpkg')
    plan = plan_osm_pipeline(str(a), str(b), out,
                             tags=['highway', 'landuse=residential'],
                             crop='area.geojson')
    cmds = [s for s in plan if isinstance(s, str)]
    # per input: tags-filter then extract; then cat; then ogr2ogr
    assert sum('osmium tags-filter' in c for c in cmds) == 2
    assert sum('osmium extract' in c for c in cmds) == 2
    assert any('-p "area.geojson"' in c for c in cmds)
    assert sum(c.startswith('osmium cat') for c in cmds) == 1
    assert cmds[-1].startswith('ogr2ogr')
    # tmp files are removed at the end
    trailing = [s for s in plan[len(plan) - 6:] if isinstance(s, Remove)]
    assert all(s.path.startswith('/tmp/_erde_spark') for s in trailing)


def test_osm_plan_osm_output_cats(tmp_path):
    a = tmp_path / 'a.osm.pbf'
    a.write_text('')
    out = str(tmp_path / 'merged.osm.bz2')
    plan = plan_osm_pipeline(str(a), out)
    cmds = [s for s in plan if isinstance(s, str)]
    assert cmds == [f'osmium cat {a} -o {out}']


def test_osm_plan_columns_config(tmp_path):
    a = tmp_path / 'a.osm.pbf'
    a.write_text('')
    plan = plan_osm_pipeline(str(a), str(tmp_path / 'o.gpkg'),
                             columns=['points=highway,railway'])
    cfg = [s for s in plan if isinstance(s, tuple)]
    assert len(cfg) == 1 and cfg[0][0] == 'write_file'
    assert '[points]\nosm_id=yes\nattributes=highway,railway' in cfg[0][2]
    assert '--config OSM_CONFIG_FILE' in [s for s in plan if isinstance(s, str)][-1]


def test_osm_plan_errors(tmp_path):
    with pytest.raises(ValueError, match='at least'):
        plan_osm_pipeline('only_one.osm')
    with pytest.raises(ValueError, match='recognize'):
        plan_osm_pipeline('bad.txt', 'out.gpkg', check_exists=False)
    a = tmp_path / 'a.osm'
    a.write_text('')
    with pytest.raises(ValueError, match='reserved'):
        plan_osm_pipeline(str(a), 'o.gpkg', columns=['geometry,name'],
                          check_exists=False)


# ---------------------------------------------------------------- CLI

def test_cli_subset_end_to_end(spark, tmp_path):
    from erde_spark.cli import entrypoint
    src = tmp_path / 'in.csv'
    src.write_text('a,b,c\n1,2,3\n4,5,6\n')
    out = str(tmp_path / 'out.csv')
    entrypoint(['subset', str(src), 'a:x, c', out])
    from erde_spark.io import read_df
    back = read_df(out, spark)
    assert sorted(back.columns) == ['c', 'x']
    assert back.count() == 2


def test_cli_buffer_then_area(spark, tmp_path):
    from erde_spark.cli import entrypoint
    src = tmp_path / 'pts.csv'
    src.write_text('WKT,pid\n"POINT (37.6 55.75)",1\n')
    buffered = str(tmp_path / 'buf.csv')
    entrypoint(['buffer', str(src), '1000', buffered])
    out = str(tmp_path / 'area.csv')
    entrypoint(['area', buffered, '--column-name', 'a_m2', '--default-crs', '4326', out])
    from erde_spark.io import read_df
    row = read_df(out, spark).collect()[0]
    import math
    expected = 32 * math.sin(math.pi / 32) * 1000 ** 2  # 64-gon metric area
    assert row['a_m2'] == pytest.approx(expected, rel=1e-3)


def test_cli_osm_dry(tmp_path, capsys):
    from erde_spark.cli import entrypoint
    a = tmp_path / 'a.osm.pbf'
    a.write_text('')
    plan = entrypoint(['osm', str(a), str(tmp_path / 'o.gpkg'), '--dry',
                       '--tags', 'highway'])
    out = capsys.readouterr().out
    assert 'Dry run' in out and 'osmium tags-filter' in out
    assert any(isinstance(s, str) and 'ogr2ogr' in s for s in plan)


def test_cli_unknown_command_fails():
    from erde_spark.cli import entrypoint
    with pytest.raises(SystemExit):
        entrypoint(['nonexistent'])
