"""Summarize a jax.profiler trace: top HLO ops by self time.

Companion to examples/train_roofline.py --profile-dir: the roofline gives
the aggregate FLOPs/bytes picture; this tool attributes the measured step
time to individual fused HLO ops so byte-reduction work targets the real
hot spots. Parses the xplane protobuf via the tensorboard profile plugin
(no TensorBoard UI needed).

Usage: python examples/profile_hlo_stats.py /tmp/xprof_dir [--top 30]
"""
from __future__ import annotations

import argparse
import csv
import glob
import io
import json
import os


def find_xplane(trace_dir: str) -> str:
    pats = [os.path.join(trace_dir, "**", "*.xplane.pb")]
    for pat in pats:
        hits = sorted(glob.glob(pat, recursive=True))
        if hits:
            return hits[-1]
    raise SystemExit(f"no .xplane.pb under {trace_dir}")


def raw_xplane_rows(xplane: str):
    """Fallback hlo_stats: parse the xplane protobuf directly.

    The tensorboard profile plugin's converter can be broken by
    protobuf/tensorflow version skew (both failure modes seen in this
    image: generated-proto descriptor errors and a missing
    _pywrap_profiler.xspace_to_tools_data symbol). The XLA-Ops line of
    the device plane carries one event per fused-HLO execution, so
    aggregating event durations per op name gives the same self-time
    table without the plugin. Durations are summed across all profiled
    steps (relative ranking is unaffected).
    """
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as fp:
        xs.ParseFromString(fp.read())
    rows = []
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        emeta = {m.id: m for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg, cnt = {}, {}
            for ev in line.events:
                nm = emeta[ev.metadata_id].name
                agg[nm] = agg.get(nm, 0) + ev.duration_ps
                cnt[nm] = cnt.get(nm, 0) + 1
            rows += [{"HLO name": nm, "category": f"n={cnt[nm]}",
                      "Total self time (us)": d / 1e6}
                     for nm, d in agg.items()]
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--json-out", default="",
                    help="also dump the full table as JSON")
    args = ap.parse_args()

    xplane = find_xplane(args.trace_dir)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [xplane], "hlo_stats", {})
        if isinstance(data, bytes):
            data = data.decode()
        rows = list(csv.DictReader(io.StringIO(data)))
    except Exception as e:  # plugin/proto version skew — parse raw
        print(f"# tensorboard profile plugin unusable "
              f"({type(e).__name__}: {e}); raw xplane fallback")
        rows = raw_xplane_rows(xplane)
    if not rows:
        raise SystemExit("hlo_stats produced no rows")

    def f(row, *names, default=0.0):
        for n in names:
            if n in row and row[n] not in ("", None):
                try:
                    return float(row[n])
                except ValueError:
                    pass
        return default

    time_keys = [k for k in rows[0]
                 if "self" in k.lower() and "time" in k.lower()
                 and "%" not in k]
    tkey = time_keys[0] if time_keys else None
    if tkey is None:
        raise SystemExit(f"no self-time column in {list(rows[0])}")

    total = sum(f(r, tkey) for r in rows)
    rows.sort(key=lambda r: -f(r, tkey))
    print(f"# {xplane}")
    print(f"# total self time: {total:.1f} (column '{tkey}'); "
          f"top {args.top} ops:")
    name_key = next((k for k in rows[0] if "expression" in k.lower()
                     or "name" in k.lower()), None)
    cat_key = next((k for k in rows[0] if "category" in k.lower()), None)
    for r in rows[:args.top]:
        t = f(r, tkey)
        nm = (r.get(name_key, "?") or "?")[:110]
        cat = r.get(cat_key, "") if cat_key else ""
        print(f"{t:>12.1f}  {100*t/total:5.1f}%  {cat:<24} {nm}")

    if args.json_out:
        with open(args.json_out, "w") as fp:
            json.dump(rows, fp, indent=1)
        print(f"# wrote {args.json_out}")


if __name__ == "__main__":
    main()
