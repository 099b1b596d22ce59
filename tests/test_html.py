"""HTML-to-text extraction: tag/script/style stripping, entity decoding,
whitespace normalization, title/link extraction — and cross-engine
parity of the restricted regex dialect against DuckDB."""

import duckdb
import pytest

from erde_spark.scale.html import (duckdb_text_sql, html_extract, html_links,
                                   html_title, html_to_text)

DOC = """<html>
<head><title> My  Page </title>
<style type="text/css">body { margin: 0; } /* <p> inside css */</style>
<script>if (a < b && c > d) { alert("x&amp;y"); }</script>
</head>
<body>
<!-- nav boilerplate -->
<h1>Heading</h1>
<p>First &amp; second &lt;tag&gt; &quot;quoted&quot; &#39;s &nbsp;end.</p>
<div>Block <b>bold</b> text<br/>line two</div>
<ul><li>item one</li><li><a href="https://a.example/x">link A</a></li></ul>
<A HREF="https://b.example/y?q=1&amp;r=2">link B</A>
</body></html>"""


def _extract(spark, html):
    df = spark.createDataFrame([(1, html)], 'id long, html string')
    return df.select(html_to_text('html').alias('t'),
                     html_title('html').alias('title'),
                     html_links('html').alias('links')).first()


def test_html_to_text_strips_and_decodes(spark):
    r = _extract(spark, DOC)
    t = r['t']
    assert 'alert' not in t and 'margin' not in t          # script/style gone
    assert 'boilerplate' not in t                          # comments gone
    assert '<b>' not in t and '</p>' not in t              # tags gone
    assert 'First & second <tag> "quoted" \'s' in t        # entities decoded
    assert 'Heading\n' in t                                # block closer -> \n
    assert 'bold' in t and 'line two' in t
    assert '  ' not in t.replace('\n', ' ').replace(' \n', '')
    assert not t.startswith(('\n', ' ')) and not t.endswith(('\n', ' '))


def test_title_and_links(spark):
    r = _extract(spark, DOC)
    assert r['title'] == 'My  Page'
    assert r['links'] == ['https://a.example/x', 'https://b.example/y?q=1&amp;r=2']


def test_entity_double_escape_order(spark):
    # "&amp;lt;" must decode to the LITERAL string "&lt;", not "<"
    r = _extract(spark, '<p>x &amp;lt; y</p>')
    assert r['t'] == 'x &lt; y'


def test_html_extract_report(spark):
    df = spark.createDataFrame([(7, DOC)], 'doc_id long, html string')
    row = html_extract(df, 'html').first()
    assert row['doc_id'] == 7
    assert row['title'] == 'My  Page'
    assert row['n_links'] == 2
    assert 0.0 < row['text_ratio'] < 1.0
    # the text chain collapses runs of spaces; the raw title keeps them
    assert row['text'].startswith('My Page')


def test_plain_text_passthrough(spark):
    r = _extract(spark, 'no markup here, just text')
    assert r['t'] == 'no markup here, just text'
    assert r['title'] == '' and r['links'] == []


@pytest.mark.parametrize('html', [
    DOC,
    '<p>a</p><p>b</p>',
    'text with < stray bracket and & ampersand',
    '<script>while(1){if(x<y)z="</xyz>";}</script>done',
    '<div><div><div>deep</div></div></div>',
    '&amp;&amp;lt;&nbsp;&gt;',
    '',
])
def test_duckdb_parity(spark, html):
    """The Spark chain and the DuckDB replay produce identical text —
    the property the correctness-gate oracle depends on."""
    got_spark = _extract(spark, html)['t']
    con = duckdb.connect()
    got_duck = con.execute(
        f"SELECT {duckdb_text_sql('?::VARCHAR')} ", [html]).fetchone()[0]
    assert got_spark == got_duck, html
