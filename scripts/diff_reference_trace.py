"""Replay a recorded reference-engine trace through our Simulator and diff
every field bitwise.

    python scripts/diff_reference_trace.py trace.npz [--env overcooked ...]

Produce ``trace.npz`` on any CUDA host with the reference checkout using
``scripts/record_reference_trace.py`` (see its docstring for the recipe);
the format is documented in ``utils/golden_trace.py``.  Exit code 0 iff the
replay matches exactly.
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from madrona_rl_envs_playground_tpu.utils.golden_trace import (  # noqa: E402
    diff_trace,
    load_trace,
    make_env_from_meta,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace")
    p.add_argument("--max-report", type=int, default=10)
    args = p.parse_args()

    trace = load_trace(args.trace)
    print(f"trace: {json.dumps(trace.meta)}")
    env = make_env_from_meta(trace.meta)
    summary = diff_trace(trace, env, max_report=args.max_report)
    print(json.dumps(summary, indent=2))
    if summary["ok"]:
        print("MATCH: replay is bitwise identical to the recorded trace")
        return 0
    print("MISMATCH: see field report above")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
