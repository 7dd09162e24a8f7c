"""Attribute profiled XLA fusion names to framework source lines.

The tunneled TPU backend compiles REMOTELY, so `--xla_dump_to` on the client
dumps nothing. Instead: re-run bench.py with a jax.jit spy that captures the
compiled scan via `.lower().compile()` (warm from the persistent compile
cache), write `compiled.as_text()` — the optimized HLO carries per-op
`metadata={op_name=... source_file=... source_line=...}` — then map the
`fusion.N` names from a `tpu_checks benchprof` op table to their defining
computations and print the dominant source lines.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/hlo_attrib.py \
        fusion.974 multiply_add_fusion.173 ...

Session-5 result at the honest bench point (26.5 ms device step): the
backward's top XLA items are the `_gather_rows` reduction glue
(rasterize_pallas.py:879 gathers 2.45+0.66 ms + :886-896 cotangent add
1.18 ms — at the measured ~12 ns/row random-access floor) and the binning
unpack (tiles.py:194-221, ~2.2 ms with the scatter-max and row gather);
the 3.97 ms transpose_jvp chain is the deform MLP backward (remat).
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

HLO_PATH = "/tmp/bench_opt.hlo"


def capture_bench_hlo() -> str:
    """Run bench.main under a jax.jit spy; write optimized HLO of the scan."""
    import jax

    import bench

    orig_jit = jax.jit
    holder = {}

    def spy_jit(f, *a, **k):
        j = orig_jit(f, *a, **k)
        if getattr(f, "__name__", "") != "run":
            # only the target function gets wrapped — everything else keeps
            # the REAL jitted object (with .lower/.clear_cache/... intact)
            return j

        import functools

        @functools.wraps(f)
        def call(*args, **kw):
            if "run" not in holder:
                holder["run"] = j.lower(*args, **kw).compile()
            return j(*args, **kw)

        # pass through the jitted object's attributes so callers that touch
        # .lower etc. still work
        for attr in ("lower", "trace", "clear_cache", "eval_shape"):
            if hasattr(j, attr):
                setattr(call, attr, getattr(j, attr))
        return call

    jax.jit = spy_jit
    try:
        bench.main(label="hlo_attrib")
    finally:
        jax.jit = orig_jit
    txt = holder["run"].as_text()
    Path(HLO_PATH).write_text(txt)
    return txt


def attribute(txt: str, names: list[str]) -> None:
    for name in names:
        m = re.search(rf"%?{re.escape(name)} = [^\n]*", txt)
        if not m:
            print(f"--- {name}: NOT FOUND")
            continue
        line = m.group(0)
        meta = re.search(r"metadata={[^}]*}", line)
        print(f"--- {name}")
        print("   ", (meta.group(0)[:200] if meta else "no-meta"))
        calls = re.search(r"calls=%?([\w.\-]+)", line)
        if not calls:
            continue
        cm = re.search(
            rf"%{re.escape(calls.group(1))} [^\n]*\{{(.*?)\n\}}", txt, re.S
        )
        if not cm:
            continue
        body = cm.group(1)
        files = re.findall(r'source_file="([^"]+)" source_line=(\d+)', body)
        print(
            "    top sources:",
            Counter(f"{f.split('/')[-1]}:{l}" for f, l in files).most_common(8),
        )


def main():
    args = sys.argv[1:]
    recapture = "--recapture" in args
    names = [a for a in args if a != "--recapture"]
    p = Path(HLO_PATH)
    # reuse the cached HLO whenever it exists (the common, documented path —
    # passing fusion names must NOT trigger a full bench re-run); force a
    # fresh capture with --recapture
    if p.exists() and not recapture:
        txt = p.read_text()
    else:
        txt = capture_bench_hlo()
    attribute(txt, names or ["fusion.974"])


if __name__ == "__main__":
    main()
