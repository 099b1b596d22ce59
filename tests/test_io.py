"""IO facade tests: path dispatch, WKT autodetect, round-trips
(reference `/root/reference/tests/io/test_read_write.py:23-32`)."""

import pytest
from pyspark.sql import functions as F

from erde_spark.geo import geom as G
from erde_spark.geo.crs import get_crs
from erde_spark.io import read_df, select_driver, write_df


def test_select_driver():
    assert select_driver('x.csv').name == 'csv'
    assert select_driver('x.csv.gz').name == 'csv'
    assert select_driver('x.parquet').name == 'parquet'
    assert select_driver('x.gpkg').name == 'gpkg'
    assert select_driver('x.gpkg:layer1').name == 'gpkg'
    assert select_driver('x.shp').name == 'shp'
    assert select_driver('x.fgb').name == 'fgb'
    assert select_driver('x.geojson').name == 'geojson'
    assert select_driver('x.geojsonl.json').name == 'geojsonl'
    assert select_driver('x.xlsx:sheet1').name == 'xls'
    assert select_driver('postgresql://u:p@h:5432/db/tbl@geom').name == 'postgres'
    with pytest.raises(ValueError):
        select_driver('x.unknown')


def test_csv_roundtrip_with_wkt(spark, tmp_path):
    src = tmp_path / 'pts.csv'
    src.write_text('WKT,fid,number\n"POINT (1 2)",1,10\n"POINT (3 4)",2,20\n,3,30\n')
    df = read_df(str(src), spark)
    assert 'geometry' in df.columns
    assert get_crs(df) == 4326
    rows = df.orderBy('fid').collect()
    assert G.wkb_loads(bytes(rows[0]['geometry'])) == ('Point', (1.0, 2.0))
    assert rows[2]['geometry'] is None

    out = tmp_path / 'out.csv'
    write_df(df, str(out))
    back = read_df(str(out), spark)
    assert back.count() == 3
    assert G.wkb_loads(bytes(back.orderBy('fid').collect()[1]['geometry'])) == ('Point', (3.0, 4.0))


def test_csv_broken_wkt_tolerated(spark, tmp_path):
    src = tmp_path / 'b.csv'
    src.write_text('geometry,id\n"POINT (1 2)",1\n"NOT A WKT",2\n')
    rows = read_df(str(src), spark).orderBy('id').collect()
    assert rows[0]['geometry'] is not None and rows[1]['geometry'] is None


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, 'a')], 'id int, s string')
    p = str(tmp_path / 'x.parquet')
    write_df(df, p)
    assert read_df(p, spark).count() == 1


def test_geojsonl_read(spark, tmp_path):
    src = tmp_path / 'f.geojsonl.json'
    src.write_text(
        '{"type":"Feature","properties":{"name":"A","num":1},"geometry":{"type":"Point","coordinates":[1.0,2.0]}}\n'
        '{"type":"Feature","properties":{"name":"B","num":2},"geometry":{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]}}\n')
    df = read_df(str(src), spark)
    assert get_crs(df) == 4326
    rows = df.orderBy('num').collect()
    assert G.wkb_loads(bytes(rows[0]['geometry']))[0] == 'Point'
    assert G.wkb_loads(bytes(rows[1]['geometry']))[0] == 'Polygon'


def test_geojsonl_roundtrip(spark, tmp_path):
    src = tmp_path / 'f.geojsonl.json'
    src.write_text(
        '{"type":"Feature","properties":{"name":"A","num":1},"geometry":{"type":"Point","coordinates":[1.5,2.5]}}\n'
        '{"type":"Feature","properties":{"name":"B","num":2},"geometry":{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]}}\n')
    df = read_df(str(src), spark)
    outdir = tmp_path / 'out.geojsonl'
    write_df(df, str(outdir) + '.json')  # .geojsonl.json dispatch
    back = read_df(str(outdir) + '.json', spark).orderBy('num').collect()
    assert [r['name'] for r in back] == ['A', 'B']
    assert G.wkb_loads(bytes(back[0]['geometry'])) == ('Point', (1.5, 2.5))
    assert G.wkb_loads(bytes(back[1]['geometry']))[0] == 'Polygon'


def test_gated_formats_raise_clearly(spark):
    for path in ['x.gpkg', 'x.shp', 'x.fgb', 'x.geojson', 'x.xlsx']:
        with pytest.raises(NotImplementedError, match='requires'):
            read_df(path, spark)


def test_read_write_geom(spark, tmp_path):
    from erde_spark.io import read_geom, write_geom
    p = str(tmp_path / 'g.csv')
    write_geom(('Point', (5.0, 6.0)), p, spark)
    assert read_geom(p, spark) == ('Point', (5.0, 6.0))
