"""robots.txt compliance: RFC 9309 group selection, longest-match
allow/disallow resolution, pattern-rule exclusion, meta-noindex."""


def _robots(spark):
    return spark.createDataFrame([
        ('a.example', 'User-agent: *\nDisallow: /private/\n'
                      'Allow: /private/ok\n\n'
                      'User-agent: trainbot\nDisallow: /\n'
                      'Allow: /public/'),
        ('b.example', '# comments only\nUser-agent: *\nDisallow:\n'),
        ('c.example', 'User-agent: *\nDisallow: /x*$\nDisallow: /plain/'),
    ], 'domain string, robots_txt string')


def test_parse_groups_and_patterns(spark):
    from erde_spark.scale.robots import parse_robots
    rows = parse_robots(_robots(spark)).collect()
    rules = {(r['domain'], r['rule'], r['prefix']) for r in rows}
    assert rules == {('a.example', 'disallow', '/private/'),
                     ('a.example', 'allow', '/private/ok'),
                     ('c.example', 'disallow', '/x*$'),
                     ('c.example', 'disallow', '/plain/')}
    rx = {r['prefix']: r['regex'] for r in rows}
    assert rx['/x*$'] == '^/x.*$'
    assert rx['/plain/'] == '^/plain/'
    tb = {(r['domain'], r['rule'], r['prefix'])
          for r in parse_robots(_robots(spark), agent='trainbot').collect()}
    # the specific group REPLACES * for a.example; others fall back
    assert ('a.example', 'disallow', '/') in tb
    assert ('a.example', 'allow', '/public/') in tb
    assert ('a.example', 'disallow', '/private/') not in tb
    assert ('c.example', 'disallow', '/plain/') in tb


def test_filter_longest_match_and_defaults(spark):
    from erde_spark.scale.robots import parse_robots, robots_filter
    docs = spark.createDataFrame([
        (1, 'http://a.example/private/secret'),
        (2, 'http://a.example/private/ok/page'),  # longer allow wins
        (3, 'http://a.example/open'),
        (4, 'http://b.example/anything'),         # empty disallow = allow
        (5, 'http://c.example/plain/doc'),
        (6, 'http://unknown.example/x'),          # no robots row = allow
    ], 'doc_id long, url string')
    rules = parse_robots(_robots(spark))
    kept = sorted(r['doc_id'] for r in robots_filter(docs, rules).collect())
    assert kept == [2, 3, 4, 6]
    tb = parse_robots(_robots(spark), agent='trainbot')
    kept2 = sorted(r['doc_id'] for r in robots_filter(docs, tb).collect())
    assert kept2 == [4, 6]


def test_allow_wins_equal_length_tie(spark):
    from erde_spark.scale.robots import parse_robots, robots_filter
    robots = spark.createDataFrame(
        [('t.example', 'User-agent: *\nDisallow: /p/\nAllow: /p/')],
        'domain string, robots_txt string')
    docs = spark.createDataFrame([(1, 'http://t.example/p/x')],
                                 'doc_id long, url string')
    assert robots_filter(docs, parse_robots(robots)).count() == 1


def test_whitelist_group_blocks_star_fallback(spark):
    """RFC 9309 §2.2.1: a group naming the specific agent replaces '*'
    even when its only rule is the empty-Disallow allow-all idiom
    ('User-agent: X\\nDisallow:'), which yields ZERO stored rules.
    Fallback to '*' happens only when no group names the agent."""
    from erde_spark.scale.robots import parse_robots, robots_filter
    robots = spark.createDataFrame(
        [('w.example', 'User-agent: *\nDisallow: /\n\n'
                       'User-agent: trainbot\nDisallow:')],
        'domain string, robots_txt string')
    docs = spark.createDataFrame(
        [(1, 'http://w.example/anything')], 'doc_id long, url string')
    # trainbot is explicitly whitelisted: keep everything
    tb = parse_robots(robots, agent='trainbot')
    assert robots_filter(docs, tb).count() == 1
    # any other agent hits the '*' disallow-all
    other = parse_robots(robots, agent='otherbot')
    assert robots_filter(docs, other).count() == 0


def test_meta_noindex(spark):
    from erde_spark.scale.robots import meta_noindex
    rows = [(1, '<META NAME="ROBOTS" Content="NOINDEX, nofollow">', True),
            (2, '<meta content="noindex" name=googlebot>', True),
            (3, '<meta name="robots" content="index,follow">', False),
            (4, '<meta name="viewport" content="noindex-like">', False),
            (5, 'no meta at all', False)]
    df = spark.createDataFrame([(i, h) for i, h, _ in rows],
                               'i long, html string')
    got = {r['i']: r['n'] for r in
           df.select('i', meta_noindex('html').alias('n')).collect()}
    assert got == {i: want for i, _, want in rows}


def test_no_python_in_robots_plan(spark):
    """The robots gate must stay JVM-side: no Python evaluation nodes
    in parse or filter plans."""
    from erde_spark.scale.robots import parse_robots, robots_filter
    docs = spark.createDataFrame([(1, 'http://a.example/x')],
                                 'doc_id long, url string')
    out = robots_filter(docs, parse_robots(_robots(spark)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'Python' not in plan and 'Arrow' not in plan


def test_pattern_rules_match_per_rfc(spark):
    """RFC 9309 §2.2.3: '*' spans any octets, trailing '$' anchors;
    specificity is pattern length (a long Allow pattern overrides a
    shorter Disallow)."""
    from erde_spark.scale.robots import parse_robots, robots_filter
    robots = spark.createDataFrame(
        [('p.example', 'User-agent: *\n'
                       'Disallow: /*.pdf$\n'
                       'Disallow: /files/\n'
                       'Allow: /files/public*\n'
                       'Disallow: /a$')],
        'domain string, robots_txt string')
    docs = spark.createDataFrame([
        (1, 'http://p.example/docs/report.pdf'),    # *.pdf$ -> drop
        (2, 'http://p.example/docs/report.pdfx'),   # anchor miss -> keep
        (3, 'http://p.example/files/secret'),       # /files/ -> drop
        (4, 'http://p.example/files/public/x'),     # longer allow -> keep
        (5, 'http://p.example/a'),                  # /a$ exact -> drop
        (6, 'http://p.example/ab'),                 # anchored: keep
    ], 'doc_id long, url string')
    kept = sorted(r['doc_id'] for r in
                  robots_filter(docs, parse_robots(robots)).collect())
    assert kept == [2, 4, 6]
