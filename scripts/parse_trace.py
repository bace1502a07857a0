#!/usr/bin/env python
"""Aggregate TPU op durations from a jax.profiler trace.json.gz.

Usage: python scripts/parse_trace.py <trace.json.gz> [top_n]

Groups events on the TPU device tracks by op name (collapsing fusion
suffixes) and prints total-us, count, and share of device time.
"""
import gzip
import json
import re
import sys
from collections import defaultdict


def main(path, top_n=40):
    with gzip.open(path, 'rt') as f:
        data = json.load(f)
    events = data['traceEvents']

    # map pid/tid -> track name
    procs, threads = {}, {}
    for e in events:
        if e.get('ph') == 'M':
            if e.get('name') == 'process_name':
                procs[e['pid']] = e['args'].get('name', '')
            elif e.get('name') == 'thread_name':
                threads[(e['pid'], e.get('tid'))] = e['args'].get('name', '')

    device_pids = {p for p, n in procs.items()
                   if 'TPU' in n or 'tpu' in n.lower()}

    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    steps = defaultdict(float)
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in device_pids:
            continue
        tname = threads.get((e['pid'], e.get('tid')), '')
        if 'step' in tname.lower():   # XLA Op track only, skip step track
            steps[e.get('name', '')] += e.get('dur', 0)
            continue
        name = e.get('name', '')
        args = e.get('args', {})
        # prefer the HLO op long name when present
        key = args.get('long_name') or name
        key = re.sub(r'\.\d+$', '', key)          # strip uniquing suffix
        dur = e.get('dur', 0.0)
        agg[key][0] += dur
        agg[key][1] += 1
        total += dur

    print(f"tracks: {sorted(set(procs.values()))}")
    print(f"total device op time: {total/1e3:.2f} ms across "
          f"{sum(c for _, c in agg.values())} events")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"{'us_total':>10} {'count':>6} {'share':>6}  name")
    for name, (dur, cnt) in rows[:int(top_n)]:
        print(f"{dur:10.0f} {cnt:6d} {100*dur/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
