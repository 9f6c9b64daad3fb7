"""Diff two per-op profiles produced by ``trace_ops.py --json --group``.

Usage:
    python tools/trace_ops.py /tmp/prof_a --group --json > /tmp/a.json
    python tools/trace_ops.py /tmp/prof_b --group --json > /tmp/b.json
    python tools/diff_prof.py /tmp/a.json /tmp/b.json

Prints per-op-family device-time deltas (B - A), largest |delta| first.
Use this to verify an optimization actually landed on the op it targeted
(CLAUDE.md: config-plumbing bugs masquerade as perf non-results).
"""

from __future__ import annotations

import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d['total_us'], {o['name']: o['us'] for o in d['ops']}


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    ta, a = load(a_path)
    tb, b = load(b_path)
    names = set(a) | set(b)
    rows = sorted(((b.get(n, 0.0) - a.get(n, 0.0), n) for n in names),
                  key=lambda r: -abs(r[0]))
    print(f'# A={a_path} total {ta/1e3:.3f} ms; B={b_path} total {tb/1e3:.3f} ms;'
          f' delta {(tb-ta)/1e3:+.3f} ms')
    print(f'{"delta_us":>12} {"A_us":>12} {"B_us":>12}  name')
    for d, n in rows[:40]:
        if abs(d) < 1.0:
            break
        print(f'{d:12.1f} {a.get(n, 0.0):12.1f} {b.get(n, 0.0):12.1f}  {n}')


if __name__ == '__main__':
    main()
