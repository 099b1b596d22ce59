"""XLSX source/sink on stdlib ``zipfile`` + ``xml.etree`` — no openpyxl.

An .xlsx file is a zip of XML parts (ECMA-376 / ISO 29500 SpreadsheetML).
Excel files are small-data by nature (the format caps at ~1M rows), so IO
is driver-side — read parses on the driver and hands Spark an Arrow-backed
DataFrame; write streams ``toLocalIterator`` into one worksheet.

Reference behavior mirrored (`/root/reference/erde/io/xls.py:7-14`):
``file.xlsx:sheet`` sub-addressing, first row = header, WKT geometry
column autodetect on read.
"""

from __future__ import annotations

import os
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

XLSX_PATH_RE = re.compile(r'^(?P<file>.*\.xlsx?)(?::(?P<sheet>[^:]+))?$')
_NS = '{http://schemas.openxmlformats.org/spreadsheetml/2006/main}'
_NS_R = '{http://schemas.openxmlformats.org/officeDocument/2006/relationships}'
_CELL_RE = re.compile(r'^([A-Z]+)(\d+)$')


def split_path(path: str) -> tuple[str, str | None]:
    m = XLSX_PATH_RE.match(path)
    if not m:
        raise ValueError(f'not an xlsx path: {path!r}')
    return m.group('file'), m.group('sheet')


def _col_index(ref: str) -> int:
    """'A'->0, 'AB'->27."""
    n = 0
    for ch in ref:
        n = n * 26 + ord(ch) - 64
    return n - 1


def _sheet_xml(zf: zipfile.ZipFile, sheet: str | None) -> bytes:
    wb = ET.fromstring(zf.read('xl/workbook.xml'))
    rels = ET.fromstring(zf.read('xl/_rels/workbook.xml.rels'))
    rel_ns = '{http://schemas.openxmlformats.org/package/2006/relationships}'
    targets = {r.get('Id'): r.get('Target') for r in rels.iter(rel_ns + 'Relationship')}
    sheets = [(s.get('name'), targets[s.get(_NS_R + 'id')])
              for s in wb.iter(_NS + 'sheet')]
    if sheet is None:
        name, target = sheets[0]
    else:
        match = [t for n, t in sheets if n == sheet]
        if not match:
            raise ValueError(f'sheet {sheet!r} not found (has {[n for n, _ in sheets]})')
        target = match[0]
    return zf.read(target if target.startswith('xl/') else 'xl/' + target)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read('xl/sharedStrings.xml'))
    except KeyError:
        return []
    out = []
    for si in root.iter(_NS + 'si'):
        out.append(''.join(t.text or '' for t in si.iter(_NS + 't')))
    return out


def _cell_value(c, shared: list[str]):
    t = c.get('t', 'n')
    if t == 'inlineStr':
        return ''.join(el.text or '' for el in c.iter(_NS + 't'))
    v = c.find(_NS + 'v')
    if v is None or v.text is None:
        return None
    if t == 's':
        return shared[int(v.text)]
    if t == 'str':
        return v.text
    if t == 'b':
        return v.text == '1'
    if t == 'e':
        return None
    num = float(v.text)
    return int(num) if num.is_integer() and 'e' not in v.text.lower() else num


def read_xlsx(spark: SparkSession, path: str, **kw) -> DataFrame:
    """First row = header; column types unified per column (all-int stays
    long, mixed int/float widens to double, else string). OLE2 ``.xls``
    files route to the stdlib BIFF8 parser (``io/xls_biff.py``) — the
    reference cannot read those at all (`erde/io/xls.py:13` forces
    ``engine='openpyxl'``, which is zip-only)."""
    file, sheet = split_path(path)
    if not os.path.exists(file):
        raise FileNotFoundError(file)
    with open(file, 'rb') as fh:
        magic = fh.read(8)
    if magic == b'\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1':  # OLE2 compound file
        from erde_spark.io.xls_biff import parse_xls
        with open(file, 'rb') as fh:
            rows = parse_xls(fh.read(), sheet)
        return _rows_to_df(spark, rows, file)
    with zipfile.ZipFile(file) as zf:
        shared = _shared_strings(zf)
        root = ET.fromstring(_sheet_xml(zf, sheet))
    # cell/row refs (r="A1") are optional in SpreadsheetML: fall back to
    # sequential positions when a writer omits them
    rows: dict[int, dict[int, object]] = {}
    row_no = 0
    for row in root.iter(_NS + 'row'):
        row_no = int(row.get('r', row_no + 1))
        col_no = -1
        for c in row.iter(_NS + 'c'):
            m = _CELL_RE.match(c.get('r', ''))
            col_no = _col_index(m.group(1)) if m else col_no + 1
            val = _cell_value(c, shared)
            if val is not None:
                rows.setdefault(row_no, {})[col_no] = val
    return _rows_to_df(spark, rows, file)


def _rows_to_df(spark: SparkSession, rows: dict[int, dict[int, object]],
                file: str) -> DataFrame:
    """Sparse {row: {col: value}} -> DataFrame: first row is the header,
    per-column types unified the way pandas inference would."""
    from erde_spark.io import _try_geo
    if not rows:
        raise ValueError(f'empty sheet in {file!r}')
    hdr_no = min(rows)
    header = rows.pop(hdr_no)
    ncol = max(header) + 1
    names = [str(header.get(i, f'col{i}')) for i in range(ncol)]

    data = [[rows[rn].get(i) for i in range(ncol)] for rn in sorted(rows)]
    # unify column types the way pandas inference would
    for i in range(ncol):
        vals = [r[i] for r in data if r[i] is not None]
        if vals and all(isinstance(v, (int, float)) and not isinstance(v, bool)
                        for v in vals):
            cast = float if any(isinstance(v, float) for v in vals) else int
        elif vals and all(isinstance(v, bool) for v in vals):
            cast = bool
        else:
            cast = str
        for r in data:
            if r[i] is not None:
                r[i] = cast(r[i])
    fields = []
    for i, n in enumerate(names):
        kinds = {type(r[i]) for r in data if r[i] is not None}
        t = ('bigint' if kinds == {int} else 'double' if kinds == {float}
             else 'boolean' if kinds == {bool} else 'string')
        fields.append(f'`{n}` {t}')
    df = spark.createDataFrame(data, ', '.join(fields))
    return _try_geo(df)


_CT = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
       '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
       '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
       '<Default Extension="xml" ContentType="application/xml"/>'
       '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
       '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
       '</Types>')
_RELS = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
         '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
         '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
         '</Relationships>')
_WB_RELS = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            '</Relationships>')


def write_xlsx(df: DataFrame, path: str, mode: str = 'overwrite', **kw) -> None:
    """One-worksheet xlsx with inline strings; geometry -> WKT text column
    (same convention as the CSV sink)."""
    from pyspark.sql import functions as F

    from erde_spark.functions.geo import st_astext
    file, sheet = split_path(path)
    sheet = sheet or 'Sheet1'
    if mode == 'error' and os.path.exists(file):
        raise FileExistsError(file)
    if 'geometry' in df.columns and dict(df.dtypes)['geometry'] == 'binary':
        df = df.withColumn('geometry', st_astext(F.col('geometry')))

    def cell(v):
        if v is None:
            return '<c/>'
        if isinstance(v, bool):
            return f'<c t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c><v>{v!r}</v></c>'
        return f'<c t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
          'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
          f'<sheets><sheet name="{escape(sheet)}" sheetId="1" r:id="rId1"/></sheets>'
          '</workbook>')
    with zipfile.ZipFile(file, 'w', zipfile.ZIP_DEFLATED) as zf:
        zf.writestr('[Content_Types].xml', _CT)
        zf.writestr('_rels/.rels', _RELS)
        zf.writestr('xl/workbook.xml', wb)
        zf.writestr('xl/_rels/workbook.xml.rels', _WB_RELS)
        with zf.open('xl/worksheets/sheet1.xml', 'w') as fh:
            fh.write(b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                     b'<worksheet xmlns="http://schemas.openxmlformats.org/'
                     b'spreadsheetml/2006/main"><sheetData>')
            fh.write(('<row>' + ''.join(cell(c) for c in df.columns)
                      + '</row>').encode())
            # one partition at a time through the driver (single-doc format)
            for row in df.toLocalIterator():
                fh.write(('<row>' + ''.join(cell(v) for v in row)
                          + '</row>').encode())
            fh.write(b'</sheetData></worksheet>')
