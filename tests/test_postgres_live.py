"""LIVE PostgreSQL round-trip tests.

The container ships a postgres server binary (no JDBC jar, no Python
driver): a throwaway cluster is initdb'ed as ``nobody`` with trust auth
and the driver's wire-protocol fallback is exercised end-to-end —
distributed COPY writes, driver-side COPY reads, the hex-EWKB geometry
read contract, and the PostGIS DDL error surface. Mirrors the
reference's live test (/root/reference/tests/io/test_read_write.py:44-62)
which this repo previously could not run at all.

Skips cleanly when the postgres binaries are unavailable.
"""

import shutil
import subprocess
import tempfile

import pytest
from pyspark.sql import functions as F

from erde_spark.geo import geom as G
from erde_spark.io import read_df, write_df

PORT = 54931


def _su(cmd: str):
    return subprocess.run(['su', 'nobody', '-s', '/bin/sh', '-c', cmd],
                          cwd='/tmp', capture_output=True, text=True)


@pytest.fixture(scope='module')
def pg_url():
    if not (shutil.which('initdb') and shutil.which('pg_ctl')):
        pytest.skip('postgres binaries not in container')
    d = tempfile.mkdtemp(prefix='erde_pg_')
    subprocess.run(['chown', 'nobody', d], check=True)
    r = _su(f'initdb -D {d}/data -A trust -U erde')
    if r.returncode != 0:
        shutil.rmtree(d, ignore_errors=True)
        pytest.skip(f'initdb failed: {r.stderr[-200:]}')
    # scramuser must authenticate with SCRAM-SHA-256 (first match wins);
    # everyone else stays on trust
    hba = f'{d}/data/pg_hba.conf'
    with open(hba) as f:
        rules = f.read()
    with open(hba, 'w') as f:
        f.write('host all scramuser 127.0.0.1/32 scram-sha-256\n' + rules)
    r = _su(f'pg_ctl -D {d}/data -o "-p {PORT} -k {d} -h 127.0.0.1" '
            f'-l {d}/log -w start')
    if r.returncode != 0:
        shutil.rmtree(d, ignore_errors=True)
        pytest.skip(f'pg_ctl start failed: {r.stderr[-200:]}')
    try:
        yield f'postgresql://erde@127.0.0.1:{PORT}/postgres'
    finally:
        _su(f'pg_ctl -D {d}/data -m immediate stop')
        shutil.rmtree(d, ignore_errors=True)


def test_wire_roundtrip_types(spark, pg_url):
    """write_df -> read_df through the wire transport: ints, doubles,
    strings (incl. tab/newline/backslash escapes), bools, bytes, NULLs."""
    rows = [(1, 1.5, 'plain', True, bytearray(b'\x00\xff'), 'x'),
            (2, None, 'tab\there\nand\\slash', False, None, None),
            (3, -2.25, None, None, bytearray(b''), 'z')]
    df = spark.createDataFrame(
        rows, 'id long, val double, txt string, flag boolean, '
              'blob binary, extra string')
    write_df(df, f"{pg_url}/t_types")
    back = read_df(f'{pg_url}/t_types', spark)
    assert dict(back.dtypes) == {'id': 'bigint', 'val': 'double',
                                 'txt': 'string', 'flag': 'boolean',
                                 'blob': 'binary', 'extra': 'string'}
    got = sorted(((r['id'], r['val'], r['txt'], r['flag'],
                   bytes(r['blob']) if r['blob'] is not None else None,
                   r['extra']) for r in back.collect()))
    exp = sorted((i, v, t, f, bytes(b) if b is not None else None, e)
                 for i, v, t, f, b, e in rows)
    assert got == exp


def test_wire_write_modes(spark, pg_url):
    df = spark.createDataFrame([(1, 'a')], 'id long, v string')
    write_df(df, f"{pg_url}/t_modes")
    write_df(df, f'{pg_url}/t_modes', mode='append')
    assert read_df(f'{pg_url}/t_modes', spark).count() == 2
    write_df(df, f'{pg_url}/t_modes', mode='overwrite')
    assert read_df(f'{pg_url}/t_modes', spark).count() == 1


def test_wire_read_geomcols_hex_ewkb(spark, pg_url):
    """The @geomcols read contract against a REAL server: a table with
    PostGIS-style hex-EWKB text (SRID flag set) reads as WKB bytes the
    geometry kernel parses, SRID word skipped."""
    import struct as st

    from erde_spark.io import PostgresDriver
    d = PostgresDriver.path_re.match(f'{pg_url}/t_geom@geometry').groupdict()
    conn = PostgresDriver._wire_conn(d)
    try:
        conn.query('DROP TABLE IF EXISTS t_geom')
        conn.query('CREATE TABLE t_geom (gid int, geometry text)')
        ewkb = (b'\x01' + st.pack('<I', 0x20000001) + st.pack('<I', 4326)
                + st.pack('<dd', 3.5, -4.25))
        conn.query(
            f"INSERT INTO t_geom VALUES (7, '{ewkb.hex().upper()}')")
    finally:
        conn.close()
    back = read_df(f'{pg_url}/t_geom@geometry', spark)
    row = back.first()
    assert row['gid'] == 7
    assert G.wkb_loads(bytes(row['geometry'])) == ('Point', (3.5, -4.25))


def test_wire_geometry_write_needs_postgis(spark, pg_url):
    """Geometry writes push hex WKB then run the PostGIS DDL; without
    the postgis extension the server error must surface clearly (and
    the data itself must already be in the table)."""
    from erde_spark.functions.geo import st_point
    from erde_spark.io import PostgresDriver
    from erde_spark.io.pg_wire import PgError
    df = (spark.createDataFrame([(1, 37.6, 55.75)], 'id long, x double, y double')
          .select('id', st_point(F.col('x'), F.col('y')).alias('geometry')))
    d = PostgresDriver.path_re.match(f'{pg_url}/t_gw').groupdict()
    conn = PostgresDriver._wire_conn(d)
    try:
        has_postgis = bool(conn.query(
            "SELECT 1 FROM pg_available_extensions WHERE name='postgis'")[1])
    finally:
        conn.close()
    if has_postgis:
        write_df(df, f"{pg_url}/t_gw")
        back = read_df(f'{pg_url}/t_gw@geometry', spark)
        assert G.wkb_loads(bytes(back.first()['geometry']))[0] == 'Point'
    else:
        with pytest.raises(PgError, match='[Gg]eometry'):
            write_df(df, f"{pg_url}/t_gw")
        # hex payload landed before the DDL failed
        back = read_df(f'{pg_url}/t_gw', spark)
        g = G.wkb_loads(bytes.fromhex(back.first()['geometry']))
        assert g == ('Point', (37.6, 55.75))


def test_wire_distributed_copy_write(spark, pg_url):
    """A multi-partition frame writes through one COPY connection per
    partition; every row arrives exactly once."""
    df = spark.range(0, 1000, 1, 8).select(
        F.col('id'), (F.col('id') % 7).cast('double').alias('m'))
    write_df(df, f"{pg_url}/t_dist")
    back = read_df(f'{pg_url}/t_dist', spark)
    assert back.count() == 1000
    assert back.agg(F.sum('id')).first()[0] == 499500


def test_scram_sha256_auth(spark, pg_url):
    """SCRAM-SHA-256 (the PostgreSQL default auth): a role restricted to
    scram in pg_hba authenticates with the right password, fails with
    the wrong one, and the full read_df path works over the scram
    connection."""
    from erde_spark.io.pg_wire import PgConnection, PgError
    host_port = pg_url.split('@')[1].split('/')[0]
    host, port = host_port.split(':')
    admin = PgConnection(host, int(port), 'erde', 'postgres')
    try:
        admin.query("DROP ROLE IF EXISTS scramuser")
        admin.query("CREATE ROLE scramuser LOGIN PASSWORD 'tops3cret'")
        admin.query('DROP TABLE IF EXISTS t_scram')
        admin.query('CREATE TABLE t_scram (id int)')
        admin.query('INSERT INTO t_scram VALUES (41), (42)')
        admin.query('GRANT SELECT ON t_scram TO scramuser')
    finally:
        admin.close()
    ok = PgConnection(host, int(port), 'scramuser', 'postgres',
                      password='tops3cret')
    try:
        _, rows = ok.query('SELECT SUM(id) FROM t_scram')
        assert rows == [['83']]
    finally:
        ok.close()
    with pytest.raises(PgError):
        PgConnection(host, int(port), 'scramuser', 'postgres',
                     password='wrong')
    from erde_spark.io import read_df
    df = read_df(f'postgresql://scramuser:tops3cret@{host}:{port}'
                 '/postgres/t_scram', spark)
    assert sorted(r['id'] for r in df.collect()) == [41, 42]


def test_wire_copy_error_drains_connection(pg_url):
    """A failing COPY (wrong column count) raises PgError and leaves the
    connection usable for further queries (protocol fully drained)."""
    from erde_spark.io import PostgresDriver
    from erde_spark.io.pg_wire import PgError
    d = PostgresDriver.path_re.match(f'{pg_url}/t_err').groupdict()
    conn = PostgresDriver._wire_conn(d)
    try:
        conn.query('DROP TABLE IF EXISTS t_err')
        conn.query('CREATE TABLE t_err (a int, b int)')
        with pytest.raises(PgError):
            conn.copy_in('COPY t_err (a, b) FROM STDIN',
                         [b'1\t2\t3\n'])  # 3 cells into 2 columns
        # connection still alive and transactional state clean
        _, rows = conn.query('SELECT 1 + 1')
        assert rows == [['2']]
        with pytest.raises(PgError):
            conn.query('SELECT * FROM does_not_exist')
        _, rows = conn.query("SELECT 'ok'")
        assert rows == [['ok']]
    finally:
        conn.close()


def test_wire_save_mode_semantics(spark, pg_url):
    """Full Spark save-mode contract on the wire transport: 'error'
    raises on an existing table, 'ignore' is a silent no-op, unknown
    modes raise."""
    df = spark.createDataFrame([(1,)], 'id long')
    write_df(df, f'{pg_url}/t_sm')
    with pytest.raises(ValueError, match='already exists'):
        write_df(df, f'{pg_url}/t_sm', mode='error')
    write_df(df, f'{pg_url}/t_sm', mode='ignore')  # no-op
    assert read_df(f'{pg_url}/t_sm', spark).count() == 1
    with pytest.raises(ValueError, match='unknown save mode'):
        write_df(df, f'{pg_url}/t_sm', mode='bogus')
