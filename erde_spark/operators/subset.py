"""Column subset/rename/drop/assert mini-DSL.

Semantics mirror the reference ``subset`` operator
(``/root/reference/erde/op/subset.py:24-100``; DSL grammar in its
docstring + ``parse_str`` at ``:3-21``):

* ``"old:new"``       — rename ``old`` → ``new``; all unlisted columns dropped
* ``"old:new,*"``     — same, but keep the rest
* ``"must_exist"``    — assert presence (KeyError if absent), keep column
* ``"-dropme"``       — drop column (missing ones ignored); if the spec is
  drops-only, an implicit ``*`` keeps the rest
* dict / list of pairs accepted from code, same as the reference

On Spark this lowers to a single ``select`` with aliases, which Catalyst
folds into the scan (column pruning) — at 100 TB the unreferenced columns
are never read off parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parse_spec(columns: str) -> list[list[str | None]]:
    """Parse the comma-separated DSL string into [name, new_name|None] pairs.

    >>> parse_spec('a:b, -c, *, d')
    [['a', 'b'], ['-c', None], ['*', None], ['d', None]]
    """
    result = []
    for item in columns.split(','):
        parts = [p.strip() for p in item.strip().split(':')]
        for p in parts:
            if len(p) == 0 or (len(p) == 1 and p.startswith('-')):
                raise ValueError(f'Bad column name: "{item}": zero name length.')
        if len(parts) > 2:
            raise ValueError(f'column spec must have 0 or 1 colons, got {len(parts) - 1} in "{item}"')
        if len(parts) == 2 and parts[0].startswith('-'):
            raise ValueError(f'column "{item}" is removed, but is also renamed')
        if len(parts) == 1:
            parts.append(None)
        result.append(parts)
    return result


def subset(df: DataFrame, columns: str | dict | list | tuple) -> DataFrame:
    """Rename/remove/assert columns of a DataFrame via the subset DSL."""
    if not isinstance(columns, (str, list, tuple, dict)):
        raise TypeError(f'columns must be str, dict or iterable of pairs, got {type(columns)}')

    if isinstance(columns, str):
        pairs = parse_spec(columns)
    elif isinstance(columns, dict):
        pairs = [[k, v] for k, v in columns.items()]
    else:
        pairs = [list(p) if isinstance(p, (list, tuple)) else [p, None] for p in columns]

    kept = [k for k, v in pairs if not k.startswith('-') and k != '*']
    renamed = {k: v for k, v in pairs if v is not None and not k.startswith('-') and k != '*'}
    removed = [k[1:] for k, v in pairs if k.startswith('-')]
    keep_others = any(k == '*' for k, _ in pairs) or (len(kept) == 0 and len(removed) > 0)

    existing = df.columns
    for name in kept:
        if name not in existing:
            raise KeyError(f'column {name} not in df (columns present: {", ".join(existing)})')

    if keep_others:
        ordered = kept + [c for c in existing if c not in kept]
    else:
        ordered = kept
    ordered = [c for c in ordered if c not in removed]
    return df.select(*[df[c].alias(renamed.get(c, c)) for c in ordered])
