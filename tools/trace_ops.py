"""Parse a jax.profiler trace directory into a per-op device-time table.

Usage:
    python tools/trace_ops.py /tmp/prof_dir [--top 40] [--group]

Reads the newest ``*.trace.json.gz`` under ``<dir>/plugins/profile/*/``,
keeps TensorCore-lane events (the device timeline), and aggregates wall
duration by HLO op name.  ``--group`` folds XLA's numbered op names
(``fusion.123`` -> ``fusion``) and prints one row per family.

This is the profiling playbook from CLAUDE.md: capture with
tools/profile_step.py, diff two captures with tools/diff_prof.py.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(root: str) -> str:
    pats = [os.path.join(root, 'plugins', 'profile', '*', '*.trace.json.gz'),
            os.path.join(root, '**', '*.trace.json.gz')]
    hits: list[str] = []
    for p in pats:
        hits += glob.glob(p, recursive=True)
        if hits:
            break
    if not hits:
        raise SystemExit(f'no *.trace.json.gz under {root}')
    return max(hits, key=os.path.getmtime)


def load_events(path: str) -> list[dict]:
    with gzip.open(path, 'rt') as f:
        data = json.load(f)
    return data.get('traceEvents', [])


def device_events(events: list[dict]) -> list[dict]:
    """Events on TensorCore op lanes (XLA Ops / XLA TPU ops threads)."""
    # pid/tid -> names from metadata events
    proc = {e['pid']: e['args'].get('name', '') for e in events
            if e.get('ph') == 'M' and e.get('name') == 'process_name'
            and 'args' in e}
    thread = {(e['pid'], e['tid']): e['args'].get('name', '') for e in events
              if e.get('ph') == 'M' and e.get('name') == 'thread_name'
              and 'args' in e}
    out = []
    for e in events:
        if e.get('ph') != 'X':
            continue
        pname = proc.get(e.get('pid'), '')
        tname = thread.get((e.get('pid'), e.get('tid')), '')
        tag = (pname + ' ' + tname).lower()
        if ('tensorcore' in tag or 'xla op' in tag or 'xla tpu' in tag
                or 'device:' in tag.replace(' ', '')):
            if 'step' in tname.lower():     # Steps lane, not ops
                continue
            out.append(e)
    return out


GROUP_RE = re.compile(r'\.\d+$|__\d+$|_\d+$')


def _key(e: dict, by: str, group: bool) -> str:
    name = e.get('name', '?')
    if group:
        name = GROUP_RE.sub('', name)
    if by == 'name':
        return name
    args = e.get('args', {})
    if by == 'source':
        src = args.get('source', '') or '<no source>'
        if isinstance(src, str):
            src = src.split(';')[0]
        return f'{name} @ {src}'
    if by == 'shape':
        return f'{name} {args.get("shape_with_layout", "?")}'
    raise ValueError(by)


def table(events: list[dict], group: bool, by: str = 'name'
          ) -> list[tuple[str, float, int]]:
    agg: dict[str, list[float]] = collections.defaultdict(lambda: [0.0, 0])
    for e in events:
        a = agg[_key(e, by, group)]
        a[0] += e.get('dur', 0.0)
        a[1] += 1
    return sorted(((k, v[0], v[1]) for k, v in agg.items()),
                  key=lambda r: -r[1])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('root')
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--group', action='store_true')
    ap.add_argument('--by', choices=('name', 'source', 'shape'),
                    default='name',
                    help='aggregate by op name, HLO source file:line, or '
                         'op name + output shape')
    ap.add_argument('--json', action='store_true',
                    help='dump full table as JSON (for diff_prof.py)')
    args = ap.parse_args(argv)

    path = find_trace(args.root)
    evs = device_events(load_events(path))
    rows = table(evs, args.group, args.by)
    total = sum(r[1] for r in rows)
    if args.json:
        json.dump({'trace': path, 'total_us': total,
                   'ops': [{'name': n, 'us': d, 'n': c} for n, d, c in rows]},
                  sys.stdout)
        return
    print(f'# {path}')
    print(f'# device total: {total/1e3:.3f} ms over {len(evs)} events')
    print(f'{"us":>12} {"count":>7}  name')
    for name, dur, cnt in rows[:args.top]:
        print(f'{dur:12.1f} {cnt:7d}  {name}')


if __name__ == '__main__':
    main()
