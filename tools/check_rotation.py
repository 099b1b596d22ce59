"""Enforce the gate-rotation invariant mechanically.

The driver's correctness gate checks only the FIRST 50 ``queries()``
entries each round, so the registry docstring maintains a rotation:
every oracled query must either already have a driver-green row in
some round's CORRECTNESS_r*.json or sit inside the current first-50
window (so it gets one this round). This tool verifies that claim
against the actual files instead of trusting the ledger prose.

Usage: python tools/check_rotation.py   (exit 1 on violation)
"""

import glob
import json
import sys

sys.path.insert(0, '.')
import __spark_entry__ as entry  # noqa: E402


def green_history() -> dict[str, list[str]]:
    hist: dict[str, list[str]] = {}
    for path in sorted(glob.glob('CORRECTNESS_r*.json')):
        rnd = path.split('_r')[1].split('.')[0]
        for name, row in json.load(open(path)).items():
            ok = row.get('hash_match') or (row.get('rows_match')
                                           and row.get('err') is None)
            if ok:
                hist.setdefault(name, []).append(rnd)
    return hist


def main() -> int:
    names = list(entry.queries().keys())
    window = set(names[:50])
    oracled = set(entry.oracle_sql())
    hist = green_history()

    missing_oracle_rows = sorted(
        n for n in oracled
        if n not in hist and n not in window)
    stale_sql = sorted(set(entry.oracle_sql()) - set(names))
    dupes = sorted({n for n in names if names.count(n) > 1})

    never_green_in_window = sorted(
        n for n in window if n in oracled and n not in hist)
    print(f'registry: {len(names)} queries, {len(oracled)} oracled, '
          f'window=50')
    print(f'driver-green somewhere: {len(hist & oracled) if isinstance(hist, set) else len(set(hist) & oracled)}'
          f' of {len(oracled)} oracled')
    print(f'in-window awaiting first green (OK, checked this round): '
          f'{never_green_in_window}')
    bad = False
    if missing_oracle_rows:
        print('VIOLATION: oracled queries with NO driver-green row and '
              f'NOT in the current window: {missing_oracle_rows}')
        bad = True
    if stale_sql:
        print(f'VIOLATION: oracle_sql entries not in queries(): {stale_sql}')
        bad = True
    if dupes:
        print(f'VIOLATION: duplicate registry names: {dupes}')
        bad = True
    if not bad:
        print('rotation invariant holds')
    return 1 if bad else 0


if __name__ == '__main__':
    sys.exit(main())
