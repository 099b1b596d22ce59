"""Conversation (SFT / chat) data preparation: template rendering,
loss-mask span computation, structural validation, whole-turn
truncation.

Instruction-tuning pipelines store conversations as
``array<struct<role:string, content:string>>`` and need three things a
plain-text corpus never does: a deterministic TEMPLATE rendering (the
exact byte stream the tokenizer will see), the CHARACTER SPANS of the
assistant turns inside that rendering (the loss mask — user/system
tokens are input-only), and structural hygiene (known roles, strict
alternation, no empty turns) before any of it is trusted.

Everything here is JVM-side (``transform`` / ``aggregate`` / window
prefix-sums over exploded turns) — no Python workers, so rendering and
span computation stay inside whole-stage codegen and scale as a narrow
map (+ one window keyed by conversation id for spans, which at 100 TB
is an even hash-partitioned shuffle: conversations are small and ids
are unique, so there is no skew key).

Offsets are 0-based CHARACTER offsets, end-exclusive:
``rendered[start:end] == content``. Token-level masks are a downstream
multiplication by the tokenizer's char->token alignment; character
spans are the engine-portable contract (they survive any tokenizer
choice and any engine's substr).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class ChatTemplate(NamedTuple):
    """One rendered turn = ``head + role + sep + content + tail``."""
    head: str
    sep: str
    tail: str


#: ChatML is the de-facto open format; plain is the minimal debuggable
#: one. Register more with CHAT_TEMPLATES['name'] = ChatTemplate(...).
CHAT_TEMPLATES = {
    'chatml': ChatTemplate('<|im_start|>', '\n', '<|im_end|>\n'),
    'plain': ChatTemplate('### ', ': ', '\n'),
}


def _template(template: str | ChatTemplate) -> ChatTemplate:
    if isinstance(template, ChatTemplate):
        return template
    try:
        return CHAT_TEMPLATES[template]
    except KeyError:
        raise ValueError(
            f'unknown chat template {template!r}; '
            f'known: {sorted(CHAT_TEMPLATES)}') from None


def _turn_text(t: Column, tpl: ChatTemplate) -> Column:
    return F.concat(F.lit(tpl.head), t['role'], F.lit(tpl.sep),
                    t['content'], F.lit(tpl.tail))


def render_chat(df: DataFrame, turns_col: str = 'turns',
                template: str | ChatTemplate = 'chatml',
                out_col: str = 'rendered') -> DataFrame:
    """Render each conversation to the exact training byte stream:
    ``concat over turns of head+role+sep+content+tail``. Map-only, one
    JVM ``transform`` + ``array_join`` (no per-turn Python, no
    shuffle). Null turns array -> null rendering; a null role/content
    inside a turn nulls the whole rendering (concat semantics), which
    :func:`validate_turns` exists to catch first."""
    tpl = _template(template)
    rendered = F.array_join(
        F.transform(F.col(turns_col), lambda t: _turn_text(t, tpl)), '')
    return df.withColumn(out_col, rendered)


def turn_offsets(df: DataFrame, id_col: str = 'conv_id',
                 turns_col: str = 'turns',
                 template: str | ChatTemplate = 'chatml',
                 roles: tuple | None = None) -> DataFrame:
    """One row per turn: (id, turn_idx, role, start, end) where
    [start, end) is the CONTENT's 0-based character span inside
    :func:`render_chat`'s output — ``rendered[start:end] == content``.
    ``roles`` filters to specific roles after offsets are computed (so
    indices and offsets stay those of the FULL rendering).

    Shape: posexplode + one prefix-sum window keyed by conversation id
    — a single even shuffle at 100 TB (unique small keys, no skew)."""
    tpl = _template(template)
    ex = df.select(F.col(id_col),
                   F.posexplode(turns_col).alias('turn_idx', '_t'))
    head_len = len(tpl.head) + len(tpl.sep)  # + role, added below
    full_len = (F.length(F.col('_t.role'))
                + F.length(F.col('_t.content'))
                + F.lit(head_len + len(tpl.tail)))
    w = (Window.partitionBy(id_col).orderBy('turn_idx')
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum(full_len).over(w), F.lit(0))
    start = (before + F.lit(head_len)
             + F.length(F.col('_t.role'))).cast('long')
    out = ex.select(
        F.col(id_col), F.col('turn_idx').cast('long'),
        F.col('_t.role').alias('role'), start.alias('start'),
        (start + F.length(F.col('_t.content'))).cast('long').alias('end'))
    if roles is not None:
        out = out.filter(F.col('role').isin(*roles))
    return out


def assistant_spans(df: DataFrame, id_col: str = 'conv_id',
                    turns_col: str = 'turns',
                    template: str | ChatTemplate = 'chatml') -> DataFrame:
    """The loss mask: character spans of assistant CONTENT in the
    rendered conversation (everything outside them is input-only)."""
    return turn_offsets(df, id_col, turns_col, template,
                        roles=('assistant',))


def validate_turns(df: DataFrame, turns_col: str = 'turns',
                   allowed: tuple = ('system', 'user', 'assistant'),
                   out_col: str = 'turns_valid') -> DataFrame:
    """Adds a boolean: non-empty turns array, every role in
    ``allowed``, every content non-null and non-empty, at most one
    system turn and only at position 0, and strict user/assistant
    alternation starting with user after the optional system prefix.
    Pure JVM array expressions — the hygiene filter runs map-side
    before any rendering is trusted."""
    turns = F.col(turns_col)
    roles = F.transform(turns, lambda t: t['role'])
    n = F.size(roles)
    off = F.when(F.element_at(roles, 1) == 'system', F.lit(1)) \
        .otherwise(F.lit(0))
    # post-prefix roles zipped with their 0-based position: user on
    # even, assistant on odd (slice, never element_at — strict/ANSI
    # element_at throws on any out-of-bounds index)
    body = F.slice(roles, off + 1, F.greatest(n - off, F.lit(0)))
    idx = F.sequence(F.lit(0), F.greatest(F.size(body) - 1, F.lit(0)))
    alternates = F.forall(
        F.zip_with(body, idx, lambda r, i: r == F.when(
            i % 2 == 0, 'user').otherwise('assistant')),
        lambda good: good)
    ok = ((n > off)  # at least one non-system turn
          & F.forall(roles, lambda r: r.isin(*allowed))
          & F.forall(turns, lambda t: t['content'].isNotNull()
                     & (F.length(t['content']) > 0))
          # system allowed only as the (already-skipped) first turn
          & ~F.exists(F.slice(roles, 2, F.greatest(n - 1, F.lit(0))),
                      lambda r: r == 'system')
          & alternates)
    return df.withColumn(out_col,
                         F.when(turns.isNull() | (n == 0), F.lit(False))
                         .otherwise(ok))


def truncate_turns(df: DataFrame, turns_col: str = 'turns',
                   max_chars: int = 8192,
                   template: str | ChatTemplate = 'chatml',
                   keep_system: bool = True,
                   out_col: str = 'turns_kept') -> DataFrame:
    """Budgeted WHOLE-TURN truncation: keep the longest contiguous
    TAIL of the conversation whose rendered length fits ``max_chars``
    (chat models are trained on recent context; cutting mid-turn
    corrupts the template). With ``keep_system=True`` a leading system
    turn is always retained (its rendered length is charged against
    the budget first), matching serving-time truncation behavior.

    One JVM ``aggregate`` over the reversed turns array with a
    (used, stopped, kept) struct accumulator — contiguity is the
    ``stopped`` latch: the first turn that does not fit stops
    acceptance even if a shorter earlier turn would. Map-only."""
    if max_chars < 0:
        raise ValueError('max_chars must be >= 0')
    tpl = _template(template)
    turns = F.col(turns_col)
    tlen = lambda t: (F.length(t['role']) + F.length(t['content'])
                      + F.lit(len(tpl.head) + len(tpl.sep)
                              + len(tpl.tail))).cast('long')
    # try_element_at, not element_at: ANSI mode (Spark 4 default)
    # throws on an EMPTY turns array otherwise — same pitfall the
    # validate_turns slice rewrite avoids
    has_sys = F.try_element_at(
        F.transform(turns, lambda t: t['role']), F.lit(1)) == 'system'
    sys_on = F.lit(keep_system) & F.coalesce(has_sys, F.lit(False))
    body = F.when(sys_on, F.slice(turns, 2, F.greatest(
        F.size(turns) - 1, F.lit(0)))).otherwise(turns)
    budget = F.when(sys_on,
                    F.lit(max_chars) - tlen(F.element_at(turns, 1))) \
        .otherwise(F.lit(max_chars)).cast('long')
    empty = F.slice(turns, 1, 0)  # empty array of the right struct type
    acc0 = F.struct(F.lit(0).cast('long').alias('used'),
                    F.lit(False).alias('stopped'), empty.alias('kept'))
    kept_rev = F.aggregate(
        F.reverse(body), acc0,
        lambda a, t: F.when(
            ~a['stopped'] & (a['used'] + tlen(t) <= budget),
            F.struct((a['used'] + tlen(t)).alias('used'),
                     F.lit(False).alias('stopped'),
                     F.array_append(a['kept'], t).alias('kept')))
        .otherwise(F.struct(a['used'].alias('used'),
                            F.lit(True).alias('stopped'),
                            a['kept'].alias('kept'))),
        lambda a: F.reverse(a['kept']))
    result = F.when(sys_on, F.concat(F.slice(turns, 1, 1), kept_rev)) \
        .otherwise(kept_rev)
    return df.withColumn(out_col,
                         F.when(turns.isNull(), F.lit(None)).otherwise(result))
