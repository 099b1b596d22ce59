"""robots.txt compliance for crawl curation.

Training-data pipelines are increasingly required to respect crawl
opt-outs retroactively: given the robots.txt each host served, drop
documents whose URL the site disallowed (RFC 9309). This module is that
gate as a Spark join, plus the in-page `<meta name="robots">` noindex
signal.

Semantics (RFC 9309 §2.2.2): within the matched user-agent group, the
most specific (LONGEST path prefix) matching rule wins; on a tie
between an allow and a disallow of equal length, allow wins. No rule
matching means allowed. Pattern rules are fully honored: ``*``
matches any octet sequence and a trailing ``$`` anchors the end
(RFC 9309 §2.2.3) — each rule carries a compiled-equivalent regex and
specificity is the PATTERN length, per the spec.

Scale shape: robots tables are per-HOST (millions of rows at crawl
scale, tiny next to the corpus). Rules are exploded once into
(domain, rule_type, prefix) and joined to the corpus on domain — one
shuffle of the small side against the corpus's domain hash; per-URL
rule resolution is a JVM-side array fold over that host's rules (hosts
have few rules, so the fold is O(rules) per doc with no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from erde_spark.scale.text import url_domain

ROBOTS_RULE_SCHEMA = ('domain string, rule string, prefix string, '
                      'regex string')


def parse_robots(robots: DataFrame, domain_col: str = 'domain',
                 text_col: str = 'robots_txt',
                 agent: str = '*') -> DataFrame:
    """(domain, rule, prefix) rows from raw robots.txt bodies — the
    allow/disallow rules of the group matching ``agent`` (exact
    user-agent token or the ``*`` group; the specific group REPLACES
    the ``*`` group when present, per RFC 9309 §2.2.1).

    Pure JVM: the body is split into lines and folded with higher-order
    array functions; no Python workers touch the (potentially
    million-host) robots table."""
    d = F.lower(F.col(domain_col))
    # RFC 9309 §2.4 allows parsers to enforce a size limit (crawlers
    # commonly cap at 500 KiB); the cap also bounds the line fold below
    # — array_append copies the accumulator, so an unbounded hostile
    # robots.txt would cost O(lines^2) per host
    lines = F.slice(F.split(F.col(text_col), '\r?\n'), 1, 5000)
    # normalize: strip comments and whitespace, lowercase the directive
    norm = F.transform(
        lines,
        lambda ln: F.regexp_replace(F.trim(ln), '#.*$', ''))

    def _group_rules(agent_token: Column) -> Column:
        """struct(matched, rules): 'A:prefix'/'D:prefix' strings for one
        agent group, plus whether ANY group named this agent at all.
        A group = the allow/disallow lines following a user-agent line
        whose token matches, up to the next user-agent line that starts
        a different group (adjacent user-agent lines share one group).
        ``matched`` is tracked separately from rule count so a matching
        group whose rules are all empty-path (the 'Disallow:' = allow-all
        whitelist idiom) still counts as present per RFC 9309 §2.2.1 —
        fallback to '*' happens only when NO group names the agent."""
        # fold state: struct(active, sawua, matched booleans, rules array)
        # active: the current group applies to agent_token
        # sawua: last line was a user-agent line (groups can list
        #        several user-agents before their rules)
        # matched: some user-agent line matched agent_token anywhere
        init = F.struct(F.lit(False).alias('active'),
                        F.lit(False).alias('sawua'),
                        F.lit(False).alias('matched'),
                        F.array().cast('array<string>').alias('rules'))

        def step(acc, ln):
            low = F.lower(ln)
            is_ua = low.rlike('^user-agent\\s*:')
            ua_val = F.trim(F.regexp_extract(low, '^user-agent\\s*:(.*)$', 1))
            ua_hit = ua_val == F.lower(agent_token)
            is_allow = low.rlike('^allow\\s*:')
            is_dis = low.rlike('^disallow\\s*:')
            path = F.trim(F.regexp_extract(ln, '^[^:]+:(.*)$', 1))
            new_active = F.when(
                is_ua,
                # a UA line after rules STARTS a new group (active
                # resets unless this line matches); adjacent UA lines
                # accumulate (stay active if already active in this
                # header run)
                F.when(acc['sawua'], acc['active'] | ua_hit)
                .otherwise(ua_hit)).otherwise(acc['active'])
            add_rule = (acc['active'] & (is_allow | is_dis)
                        & (path != ''))
            rule = F.concat(F.when(is_allow, F.lit('A:'))
                            .otherwise(F.lit('D:')), path)
            return F.struct(
                new_active.alias('active'),
                is_ua.alias('sawua'),
                (acc['matched'] | (is_ua & ua_hit)).alias('matched'),
                F.when(add_rule,
                       F.array_append(acc['rules'], rule))
                .otherwise(acc['rules']).alias('rules'))

        res = F.aggregate(norm, init, step)
        return F.struct(res['matched'].alias('matched'),
                        res['rules'].alias('rules'))

    specific = _group_rules(F.lit(agent))
    star = _group_rules(F.lit('*'))
    rules = F.when(specific['matched'], specific['rules']) \
        .otherwise(star['rules'])
    out = (robots
           .select(d.alias('domain'), F.explode(rules).alias('r'))
           .select('domain',
                   F.when(F.col('r').startswith('A:'), F.lit('allow'))
                   .otherwise(F.lit('disallow')).alias('rule'),
                   F.expr("substring(r, 3)").alias('prefix')))
    # RFC 9309 §2.2.3 patterns -> an equivalent anchored regex: '*' is
    # any octet sequence, trailing '$' anchors; everything else is
    # escaped literally. Plain prefixes compile to '^<literal>'.
    anchored = F.col('prefix').endswith('$')
    body = F.when(anchored,
                  F.expr('substring(prefix, 1, length(prefix)-1)')) \
        .otherwise(F.col('prefix'))
    esc = F.regexp_replace(body,
                           r'([\\.\[\]\{\}\(\)\+\-\^\$\|\?])',
                           r'\\$1')
    regex = F.concat(F.lit('^'), F.regexp_replace(esc, r'\*', '.*'),
                     F.when(anchored, F.lit('$')).otherwise(F.lit('')))
    return out.withColumn('regex', regex)


def url_path(col: Column | str) -> Column:
    """Path+query part of a URL ('/' when bare)."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.regexp_replace(c, r'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
    p = F.regexp_replace(p, r'#.*$', '')
    return F.when(p == '', F.lit('/')).otherwise(p)


def robots_filter(docs: DataFrame, rules: DataFrame,
                  url_col: str = 'url') -> DataFrame:
    """Documents of ``docs`` whose URL the host's robots rules ALLOW
    (RFC 9309 longest-match, allow wins ties; no matching rule or no
    robots row for the host means allowed).

    One left join on domain with the host's rules pre-collected to an
    array (the rules table aggregates to one row per domain first, so
    the join never multiplies the corpus), then a JVM array fold picks
    the winning rule per URL — pattern rules match through their
    compiled-equivalent regex, specificity is pattern length."""
    per_host = (rules
                .groupBy(F.lower(F.col('domain')).alias('_dom'))
                .agg(F.collect_list(F.struct('rule', 'prefix', 'regex'))
                     .alias('_rules')))
    dom = url_domain(url_col)
    path = url_path(url_col)
    joined = docs.withColumn('_dom', dom).join(per_host, '_dom', 'left')
    # fold: best = struct(len, allowed); longer prefix wins, allow wins
    # ties (strictly-greater update for disallow, >= for allow)
    init = F.struct(F.lit(-1).alias('len'), F.lit(True).alias('allowed'))

    def step(acc, r):
        hit = F.regexp_like(path, r['regex'])
        plen = F.length(r['prefix'])
        is_allow = r['rule'] == 'allow'
        better = hit & (
            (plen > acc['len']) | ((plen == acc['len']) & is_allow))
        return F.when(
            better,
            F.struct(plen.alias('len'), is_allow.alias('allowed'))
        ).otherwise(acc)

    verdict = F.when(
        F.col('_rules').isNull(), F.lit(True)
    ).otherwise(F.aggregate(F.col('_rules'), init, step)['allowed'])
    return (joined.where(verdict)
            .drop('_dom', '_rules'))


def meta_noindex(html_col: Column | str) -> Column:
    """True when the page carries ``<meta name="robots">`` (or
    googlebot) with a ``noindex`` directive — the in-page opt-out a
    curation pass must honor alongside robots.txt. Single codegen
    regex, case-insensitive, attribute order independent."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    pat = ('(?is)<meta\\s+[^>]*name\\s*=\\s*["\']?(robots|googlebot)'
           '["\']?[^>]*content\\s*=\\s*["\']?[^"\'>]*noindex')
    pat2 = ('(?is)<meta\\s+[^>]*content\\s*=\\s*["\']?[^"\'>]*noindex'
            '[^>]*name\\s*=\\s*["\']?(robots|googlebot)')
    return c.rlike(pat) | c.rlike(pat2)
