"""Legacy .xls (OLE2/BIFF8) reader: handcrafted workbook bytes exercise
the CFB container walk, SST CONTINUE splits, and every cell record kind.
Reference parity note: the reference cannot read OLE2 .xls at all
(erde/io/xls.py:13 forces engine='openpyxl'); this driver exceeds it."""

import struct

import pytest


def _rec(op, payload):
    return struct.pack('<HH', op, len(payload)) + payload


def _biff_workbook(split_sst=False):
    """Globals (BOF, BOUNDSHEET x2, SST, EOF) + two sheet substreams."""
    # SST: ['alpha', 'beta'] — optionally split across a CONTINUE so the
    # cursor's re-read-grbit-at-part-boundary rule is exercised
    if split_sst:
        part1 = struct.pack('<II', 3, 2) + struct.pack('<HB', 5, 0) + b'alp'
        part2 = b'\x00ha' + struct.pack('<HB', 4, 0) + b'beta'
        sst = _rec(0xFC, part1) + _rec(0x3C, part2)
    else:
        body = (struct.pack('<II', 3, 2)
                + struct.pack('<HB', 5, 0) + b'alpha'
                + struct.pack('<HB', 4, 0) + b'beta')
        sst = _rec(0xFC, body)

    def bof(dt):
        return _rec(0x809, struct.pack('<HHHHII', 0x600, dt, 0, 0, 0, 0))

    def boundsheet(pos, name):
        return _rec(0x85, struct.pack('<IHBB', pos, 0, len(name), 0)
                    + name.encode())

    # sheet 1: header row + one data row with every record kind
    s1 = bof(0x10)
    s1 += _rec(0xFD, struct.pack('<HHHI', 0, 0, 0, 0))      # A1 = 'alpha'
    s1 += _rec(0xFD, struct.pack('<HHHI', 0, 1, 0, 1))      # B1 = 'beta'
    s1 += _rec(0x204, struct.pack('<HHHHB', 0, 2, 0, 3, 0) + b'lbl')  # C1
    s1 += _rec(0x203, struct.pack('<HHH', 1, 0, 0) + struct.pack('<d', 2.5))
    s1 += _rec(0x27E, struct.pack('<HHHI', 1, 1, 0, (7 << 2) | 2))    # RK int 7
    s1 += _rec(0x205, struct.pack('<HHHBB', 1, 2, 0, 1, 0))  # True
    # MULRK row 2: ints 10, 11 in cols 0-1 (rk = val<<2 | int flag)
    s1 += _rec(0xBD, struct.pack('<HH', 2, 0)
               + struct.pack('<HI', 0, (10 << 2) | 2)
               + struct.pack('<HI', 0, (11 << 2) | 2)
               + struct.pack('<H', 1))
    s1 += _rec(0x204, struct.pack('<HHHHB', 2, 2, 0, 1, 0) + b'x')
    s1 += _rec(0x0A, b'')
    # sheet 2: single labeled cell, to verify :sheet addressing
    s2 = bof(0x10)
    s2 += _rec(0xFD, struct.pack('<HHHI', 0, 0, 0, 1))       # A1 = 'beta'
    s2 += _rec(0x204, struct.pack('<HHHHB', 1, 0, 0, 2, 0) + b's2')
    s2 += _rec(0x0A, b'')

    head = bof(0x5)
    # BOUNDSHEET positions depend on globals length: two fixed-size
    # boundsheets (name lengths 6/6) land after head+sst+2 sheets records
    bs_len = 2 * (4 + 8 + 6)  # record hdr + <IHBB> + 6-char name
    globals_len = len(head) + bs_len + len(sst) + 4  # + EOF
    wb = (head
          + boundsheet(globals_len, 'sheet1')
          + boundsheet(globals_len + len(s1), 'sheet2')
          + sst + _rec(0x0A, b''))
    assert len(wb) == globals_len
    return wb + s1 + s2


def _cfb(stream: bytes, stream_name: str = 'Workbook') -> bytes:
    """Minimal CFB v3 container: 1 FAT sector, 1 dir sector, the stream
    padded into full 512-byte sectors (>= 4096 so no mini stream)."""
    stream_padded = stream + b'\x00' * (max(4096, len(stream)) - len(stream))
    if len(stream_padded) % 512:
        stream_padded += b'\x00' * (512 - len(stream_padded) % 512)
    n_stream_sectors = len(stream_padded) // 512

    fat = [0xFFFFFFFD, 0xFFFFFFFE]  # sector 0 = FAT itself, 1 = dir chain
    for i in range(n_stream_sectors):
        fat.append(2 + i + 1 if i < n_stream_sectors - 1 else 0xFFFFFFFE)
    fat += [0xFFFFFFFF] * (128 - len(fat))
    fat_sector = struct.pack('<128I', *fat)

    def dirent(name, etype, child, start, size):
        raw = name.encode('utf-16-le')
        e = raw + b'\x00' * (64 - len(raw))
        e += struct.pack('<HBB', len(raw) + 2, etype, 1)
        e += struct.pack('<III', 0xFFFFFFFF, 0xFFFFFFFF, child)
        e += b'\x00' * 36  # CLSID + state + times
        e += struct.pack('<IQ', start, size)
        assert len(e) == 128
        return e

    # declare the padded size: a stream under the 4096 mini-cutoff would
    # belong in the mini stream, which this minimal writer doesn't emit;
    # the BIFF record iterator stops at the zero padding
    directory = (dirent('Root Entry', 5, 1, 0xFFFFFFFE, 0)
                 + dirent(stream_name, 2, 0xFFFFFFFF, 2, len(stream_padded))
                 + b'\x00' * 256)

    hdr = bytearray(512)
    hdr[0:8] = b'\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1'
    struct.pack_into('<H', hdr, 26, 0x3E)       # minor
    struct.pack_into('<H', hdr, 28, 3)          # major (v3)
    struct.pack_into('<H', hdr, 30, 9)          # 512-byte sectors
    struct.pack_into('<H', hdr, 32, 6)          # 64-byte mini sectors
    struct.pack_into('<I', hdr, 44, 1)          # one FAT sector
    struct.pack_into('<I', hdr, 48, 1)          # dir start
    struct.pack_into('<I', hdr, 56, 4096)       # mini cutoff
    struct.pack_into('<I', hdr, 60, 0xFFFFFFFE)  # no miniFAT
    struct.pack_into('<I', hdr, 68, 0xFFFFFFFE)  # no DIFAT chain
    difat = [0] + [0xFFFFFFFF] * 108
    struct.pack_into('<109I', hdr, 76, *difat)
    return bytes(hdr) + fat_sector + directory + stream_padded


@pytest.fixture(params=[False, True], ids=['sst-whole', 'sst-continue'])
def xls_file(tmp_path, request):
    p = tmp_path / 'legacy.xls'
    p.write_bytes(_cfb(_biff_workbook(split_sst=request.param)))
    return str(p)


def test_parse_xls_cells(xls_file):
    from erde_spark.io.xls_biff import parse_xls
    rows = parse_xls(open(xls_file, 'rb').read())
    assert rows[0] == {0: 'alpha', 1: 'beta', 2: 'lbl'}
    assert rows[1] == {0: 2.5, 1: 7, 2: True}
    assert rows[2] == {0: 10, 1: 11, 2: 'x'}


def test_read_df_legacy_xls(spark, xls_file):
    from erde_spark.io import read_df
    df = read_df(xls_file, spark)
    assert df.columns == ['alpha', 'beta', 'lbl']
    got = df.orderBy('alpha').collect()
    assert [r['alpha'] for r in got] == [2.5, 10.0]
    assert dict(zip(df.columns, [f.dataType.simpleString()
                                 for f in df.schema.fields])) == {
        'alpha': 'double', 'beta': 'bigint', 'lbl': 'string'}


def test_read_df_xls_sheet_addressing(spark, xls_file):
    from erde_spark.io import read_df
    df = read_df(f'{xls_file}:sheet2', spark)
    assert df.columns == ['beta']
    assert [r['beta'] for r in df.collect()] == ['s2']


def test_rk_decoding():
    from erde_spark.io.xls_biff import _rk_value
    assert _rk_value((7 << 2) | 2) == 7
    assert _rk_value(((-3 & 0x3FFFFFFF) << 2) | 2) == -3
    assert _rk_value((250 << 2) | 3) == 2.5  # int with /100 flag
    ieee = struct.unpack('<Q', struct.pack('<d', 1.5))[0]
    assert _rk_value(ieee >> 32 & 0xFFFFFFFC) == 1.5


def _biff5_workbook():
    """Excel 5.0/95 'Book' stream: BOF vers=0x0500, CODEPAGE 1252,
    grbit-less BOUNDSHEET names, inline byte-string LABELs (no SST)."""
    def bof(dt):
        return _rec(0x809, struct.pack('<HHHH', 0x500, dt, 0, 0))

    def boundsheet(pos, name):
        return _rec(0x85, struct.pack('<IHB', pos, 0, len(name))
                    + name.encode('cp1252'))

    def label(r, c, text):
        raw = text.encode('cp1252')
        return _rec(0x204, struct.pack('<HHHH', r, c, 0, len(raw)) + raw)

    s1 = bof(0x10)
    s1 += label(0, 0, 'name')
    s1 += label(0, 1, 'value')
    s1 += label(1, 0, 'caf\xe9')            # cp1252 high byte
    s1 += _rec(0x203, struct.pack('<HHH', 1, 1, 0) + struct.pack('<d', 2.5))
    s1 += label(2, 0, 'tab')
    s1 += _rec(0x27E, struct.pack('<HHHI', 2, 1, 0, (9 << 2) | 2))
    s1 += _rec(0x0A, b'')
    s2 = bof(0x10)
    s2 += label(0, 0, 'only')
    s2 += label(1, 0, 'two')
    s2 += _rec(0x0A, b'')

    head = bof(0x5) + _rec(0x42, struct.pack('<H', 1252))
    bs_len = 2 * (4 + 7 + 5)  # record hdr + <IHB> + 5-char name
    globals_len = len(head) + bs_len + 4  # + EOF
    wb = (head
          + boundsheet(globals_len, 'blatt')
          + boundsheet(globals_len + len(s1), 'sheeb')
          + _rec(0x0A, b''))
    assert len(wb) == globals_len
    return wb + s1 + s2


@pytest.fixture
def xls5_file(tmp_path):
    p = tmp_path / 'excel95.xls'
    p.write_bytes(_cfb(_biff5_workbook(), stream_name='Book'))
    return str(p)


def test_parse_biff5_cells(xls5_file):
    from erde_spark.io.xls_biff import parse_xls
    rows = parse_xls(open(xls5_file, 'rb').read())
    assert rows[0] == {0: 'name', 1: 'value'}
    assert rows[1] == {0: 'caf\xe9', 1: 2.5}
    assert rows[2] == {0: 'tab', 1: 9}


def test_read_df_biff5(spark, xls5_file):
    from erde_spark.io import read_df
    df = read_df(xls5_file, spark)
    assert df.columns == ['name', 'value']
    got = {r['name']: r['value'] for r in df.collect()}
    assert got == {'caf\xe9': 2.5, 'tab': 9.0}


def test_read_df_biff5_sheet_addressing(spark, xls5_file):
    from erde_spark.io import read_df
    df = read_df(f'{xls5_file}:sheeb', spark)
    assert df.columns == ['only']
    assert [r['only'] for r in df.collect()] == ['two']


def test_pre_biff5_raises(tmp_path):
    from erde_spark.io.xls_biff import parse_xls
    stream = _rec(0x809, struct.pack('<HHHH', 0x400, 0x10, 0, 0))
    with pytest.raises(NotImplementedError, match='pre-Excel-5.0'):
        parse_xls(_cfb(stream, stream_name='Book'))
