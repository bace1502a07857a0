#!/usr/bin/env python
"""Byte/time attribution from a TPU trace (VERDICT r3 next #3/#4).

The jax.profiler TPU op events carry `bytes_accessed` (HBM traffic the
compiler accounts to the op), `device_duration_ps`, `model_flops`, the jax
scope path (`tf_op`) and the source line (`source`). This aggregates them
three ways:

  * by bucket  — forward / backward (jax `transpose(` scopes) / optimizer /
    metrics / losses, from the tf_op path: where the train step's 43 GB
    actually lives (activations vs grads vs Adam state vs metric sweeps)
  * by source  — repo file:line, the actionable view
  * by op      — top individual fusions with achieved GB/s, the
    tail-dissection table (which sub-ms ops carry bytes vs pure latency)

Usage: python scripts/trace_bytes.py <trace.json.gz> [top_n]
"""
import gzip
import json
import re
import sys
from collections import defaultdict


def classify(tf_op: str, source: str) -> str:
    s = tf_op or ""
    src = source or ""
    if "adam" in s.lower() or "/optimizer" in s or "scale_by_adam" in s:
        return "optimizer(adam)"
    if "dcp_metrics" in s or "metrics" in src:
        return "metrics"
    if re.search(r"transpose\(", s):
        # jax autodiff cotangent ops are wrapped in transpose(...) scopes
        if "losses" in src:
            return "backward:losses"
        return "backward"
    if "losses" in src or re.search(r"/(welsch|clu_loss|overlap_loss)", s):
        return "loss(fwd)"
    return "forward"


def main(path, top_n=40):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    procs = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in procs.items() if "TPU" in n}
    threads = {(e["pid"], e.get("tid")): e["args"].get("name", "")
               for e in ev if e.get("ph") == "M"
               and e.get("name") == "thread_name"}

    by_bucket = defaultdict(lambda: [0.0, 0, 0.0])   # ms, bytes, flops
    by_source = defaultdict(lambda: [0.0, 0, 0.0])
    ops = []
    n_ev = 0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if "step" in threads.get((e["pid"], e.get("tid")), "").lower():
            continue   # whole-step region track — parents every op
        a = e.get("args") or {}
        if "device_duration_ps" not in a:
            continue
        if re.match(r"^jit_", e.get("name", "")) and not a.get("tf_op"):
            # whole-program region event — parents every op below, would
            # double-count the totals
            continue
        ms = int(a["device_duration_ps"]) / 1e9
        by = int(a.get("bytes_accessed", 0) or 0)
        fl = int(a.get("model_flops", 0) or 0)
        tf_op = a.get("tf_op", "")
        source = a.get("source", "")
        n_ev += 1
        b = classify(tf_op, source)
        for d, k in ((by_bucket, b), (by_source, source or "(none)")):
            d[k][0] += ms
            d[k][1] += by
            d[k][2] += fl
        ops.append((ms, by, fl, e.get("name", ""), tf_op[:90], source))

    def table(d, title, n=None):
        tot_ms = sum(v[0] for v in d.values())
        tot_by = sum(v[1] for v in d.values())
        print(f"\n== {title} (total {tot_ms:.1f} ms, "
              f"{tot_by/2**30:.2f} GiB accessed) ==")
        print(f"{'ms':>9} {'ms%':>5} {'GiB':>7} {'GiB%':>5} {'GB/s':>6}  key")
        rows = sorted(d.items(), key=lambda kv: -kv[1][1])
        for k, (ms, by, fl) in rows[: n or len(rows)]:
            bw = by / 1e9 / (ms / 1e3) if ms > 0 else 0.0
            print(f"{ms:9.2f} {100*ms/tot_ms:5.1f} {by/2**30:7.2f} "
                  f"{100*by/max(tot_by,1):5.1f} {bw:6.0f}  {k[:100]}")

    print(f"device events with duration: {n_ev}")
    table(by_bucket, "bucket (fwd / bwd / adam / metrics)")
    table(by_source, "source line", 30)

    # top ops by bytes and by time — merge duplicate executions of one op
    merged = defaultdict(lambda: [0.0, 0, 0.0, 0])
    for ms, by, fl, name, tf_op, source in ops:
        key = (re.sub(r"\.\d+$", "", name), tf_op, source)
        m = merged[key]
        m[0] += ms
        m[1] += by
        m[2] += fl
        m[3] += 1
    print(f"\n== top ops by time ==")
    print(f"{'ms':>8} {'cnt':>4} {'MiB':>8} {'GB/s':>6} {'GFLOP/s':>8}  name | scope | src")
    rows = sorted(merged.items(), key=lambda kv: -kv[1][0])
    for (name, tf_op, source), (ms, by, fl, c) in rows[: int(top_n)]:
        bw = by / 1e9 / (ms / 1e3) if ms > 0 else 0.0
        fs = fl / 1e9 / (ms / 1e3) if ms > 0 else 0.0
        sl = source.replace("/root/repo/", "")
        print(f"{ms:8.2f} {c:4d} {by/2**20:8.1f} {bw:6.0f} {fs:8.0f}  "
              f"{name[:40]} | {tf_op[:60]} | {sl[:40]}")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
