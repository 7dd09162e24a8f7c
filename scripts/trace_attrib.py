"""Aggregate a profiled bench trace by framework source line.

Combines the perfetto trace from `tpu_checks benchprof` (op name -> device
microseconds) with the optimized HLO saved by `hlo_attrib.py`
(op name -> source_file:line metadata) into one table that accounts for the
WHOLE step, not just the top-k ops. This is the round-4 planning view: the
per-op table hides ~8 ms in sub-200 us fusions; grouping by source line
surfaces which subsystem owns them.

Usage:
    python scripts/tpu_checks.py benchprof      # writes /tmp/jaxprof_bench
    python scripts/hlo_attrib.py                # writes /tmp/bench_opt.hlo
    python scripts/trace_attrib.py [iters]
"""

from __future__ import annotations

import glob
import gzip
import json
import re
import sys
from collections import defaultdict

HLO_PATH = "/tmp/bench_opt.hlo"
TRACE_DIR = "/tmp/jaxprof_bench"


def load_trace(iters: int) -> dict[str, float]:
    files = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    if not files:
        raise SystemExit(f"no trace under {TRACE_DIR}; run tpu_checks benchprof")
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in trace["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    dev_pids = {
        p
        for p, nm in pid_names.items()
        if "TPU" in nm or "tpu" in nm or "Device" in nm or "/device" in nm
    }
    agg: dict[str, float] = defaultdict(float)
    for e in trace["traceEvents"]:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        agg[e.get("name", "?")] += e.get("dur", 0) / iters
    return agg


_OP_RE = re.compile(r"^\s*%?([\w.\-]+) = .*?metadata=\{(.*?)\}", re.S)
_SRC_RE = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
_NAME_RE = re.compile(r'op_name="([^"]+)"')


def load_hlo_sources() -> dict[str, tuple[str, str]]:
    """op name -> (source_file:line, short op_name). Top-level entries only —
    fusion ROOT metadata is what the profiler's fusion.N names refer to."""
    out: dict[str, tuple[str, str]] = {}
    with open(HLO_PATH) as f:
        for line in f:
            if "= " not in line or "metadata=" not in line:
                continue
            m = re.match(r"^\s*(?:ROOT )?%?([\w.\-]+) = ", line)
            if not m:
                continue
            name = m.group(1)
            sm = _SRC_RE.search(line)
            nm = _NAME_RE.search(line)
            src = ""
            if sm:
                src = f"{sm.group(1).split('/')[-1]}:{sm.group(2)}"
            out.setdefault(name, (src, nm.group(1) if nm else ""))
    return out


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    trace = load_trace(iters)
    sources = load_hlo_sources()

    skip = {"0"}  # top-level aggregate rows in the trace
    by_src: dict[str, float] = defaultdict(float)
    rows = []
    unattr = 0.0
    total = 0.0
    for name, us in trace.items():
        if name in skip or name.startswith("jit_") or name.startswith("while"):
            continue
        total += us
        src, opname = sources.get(name, ("", ""))
        if not src:
            # strip a trailing .N and retry (profiler sometimes renames)
            base = re.sub(r"\.\d+$", "", name)
            cands = [k for k in sources if k.startswith(base)]
            src, opname = sources[cands[0]] if len(cands) == 1 else ("?", "")
        if src in ("", "?"):
            unattr += us
            src = "(unattributed)"
        by_src[src] += us
        rows.append((us, name, src, opname))

    print(f"total device op time: {total:.0f} us/iter (trace over {iters} iters)")
    print("\n== by source line ==")
    for src, us in sorted(by_src.items(), key=lambda kv: -kv[1]):
        if us < 20:
            continue
        print(f"  {us:8.1f} us  {src}")
    print("\n== top 60 ops ==")
    for us, name, src, opname in sorted(rows, reverse=True)[:60]:
        print(f"  {us:8.1f} us  {name:<38} {src:<32} {opname[:60]}")


if __name__ == "__main__":
    main()
