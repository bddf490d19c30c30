"""Summarize a jax.profiler xplane trace: top HLO ops by self-time.

Usage: python tools/read_trace.py /tmp/pgym_trace [n_top]
"""
import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    trace_dir = sys.argv[1]
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rtd

    names, _ = rtd.xspace_to_tool_names(paths[-1:])
    print("tools:", names, file=sys.stderr)
    for tool in ("hlo_stats", "framework_op_stats", "op_profile"):
        if tool not in str(names):
            continue
        data, _ = rtd.xspace_to_tool_data(paths[-1:], tool, {})
        out = os.path.join(trace_dir, f"{tool}.json")
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else data.decode())
        print(f"wrote {out}", file=sys.stderr)
    # summarize hlo_stats
    path = os.path.join(trace_dir, "hlo_stats.json")
    if os.path.exists(path):
        tab = json.load(open(path))
        rows = tab.get("data", tab)
        print(json.dumps(rows, indent=0)[:2000])


if __name__ == "__main__":
    main()
