"""Aggregate a jax.profiler trace into per-op-category device time.

jax.profiler.trace writes TensorBoard-format artifacts under
<dir>/plugins/profile/<run>/; the *.trace.json.gz contains one event per HLO
op execution on the device. Without a TensorBoard UI on this host, this
script does the aggregation: total device time by op category (fusion kinds,
convolution, custom-call, etc.) and the top individual ops.

Usage: python scripts/parse_trace.py /tmp/trace_n256 [--top 25]
"""

import argparse
import gzip
import json
import re
from collections import defaultdict
from pathlib import Path


def find_trace_files(root: Path):
    return sorted(root.rglob("*.trace.json.gz"))


def categorize(name: str) -> str:
    n = name.lower()
    if "convolution" in n or n.startswith("%conv") or "conv" in n.split(".")[0]:
        return "convolution"
    if "dot" in n or "matmul" in n or "einsum" in n:
        return "dot"
    if "custom-call" in n or "custom_call" in n or "pallas" in n or "tpu_custom" in n:
        return "custom-call (pallas)"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "fusion" in n:
        return "fusion (elementwise/reduce)"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "copy/layout"
    if "reduce" in n:
        return "reduce"
    if "infeed" in n or "outfeed" in n or "transfer" in n:
        return "transfer"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir", type=str)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--pid_filter", type=str, default=None,
                   help="only events whose process name matches this regex "
                        "(default: TPU/device processes)")
    args = p.parse_args()

    files = find_trace_files(Path(args.trace_dir))
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {args.trace_dir}")
    f = files[-1]
    print(f"parsing {f}")
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])

    # map pid -> process name
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    want = re.compile(args.pid_filter) if args.pid_filter else re.compile(
        r"(?i)tpu|device|/device|xla"
    )
    device_pids = {pid for pid, n in pid_names.items() if want.search(n or "")}
    if not device_pids:
        # fall back: everything with complete ('X') events
        device_pids = {e.get("pid") for e in events if e.get("ph") == "X"}
    print("device processes:",
          {pid: pid_names.get(pid, "?") for pid in device_pids})

    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    count = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "")
        count += 1
        by_cat[categorize(name)] += dur
        key = re.sub(r"\d+", "#", name)[:90]
        by_op[key] += dur

    total = sum(by_cat.values())
    print(f"\n{count} device events, total {total / 1e3:.1f} ms")
    print("\nby category:")
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:28s} {dur / 1e3:9.1f} ms  {100 * dur / total:5.1f}%")
    print(f"\ntop {args.top} ops (digits collapsed to #):")
    for op, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {dur / 1e3:9.1f} ms  {100 * dur / total:5.1f}%  {op}")


if __name__ == "__main__":
    main()
