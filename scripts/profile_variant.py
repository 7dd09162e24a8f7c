"""Profile a bench variant end-to-end: per-op trace + optimized HLO +
source-line aggregation in one run.

Usage:
    python scripts/profile_variant.py                       # default bench
    python scripts/profile_variant.py deform_impl=pallas    # cfg overrides
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

_SCRIPTS = Path(__file__).resolve().parent
sys.path.insert(0, str(_SCRIPTS.parent))
sys.path.insert(0, str(_SCRIPTS))


def main():
    overrides = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                pass
        overrides[k] = v
    tag = "_".join(f"{k}{v}" for k, v in overrides.items()) or "default"

    import jax

    import bench
    import trace_attrib
    from hlo_attrib import HLO_PATH

    # jit spy: capture the compiled scan's optimized HLO
    orig_jit = jax.jit
    holder = {}

    def spy_jit(f, *a, **k):
        j = orig_jit(f, *a, **k)
        if getattr(f, "__name__", "") != "run":
            return j
        import functools

        @functools.wraps(f)
        def call(*args, **kw):
            if "run" not in holder:
                holder["run"] = j.lower(*args, **kw).compile()
            return j(*args, **kw)

        call.lower = j.lower
        return call

    jax.jit = spy_jit
    try:
        shutil.rmtree(trace_attrib.TRACE_DIR, ignore_errors=True)
        bench.main(overrides or None, label=tag, profile_dir=trace_attrib.TRACE_DIR)
    finally:
        jax.jit = orig_jit
    Path(HLO_PATH).write_text(holder["run"].as_text())
    sys.argv = [sys.argv[0]]  # trace_attrib.main reads argv[1] as iters
    trace_attrib.main()


if __name__ == "__main__":
    main()
