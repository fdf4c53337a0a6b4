"""Capture a jax.profiler trace of a jitted function and print per-op device
times, aggregated by HLO op name. Used for the critic roofline
(tools/critic_experiments.py) and any future hot-path digs.

The xplane.pb is decoded with a minimal hand-rolled protobuf wire-format
walker (the installed tensorboard_plugin_profile's generated protos are
incompatible with the installed protobuf runtime). Field numbers follow
tsl/profiler/protobuf/xplane.proto:

  XSpace.planes = 1
  XPlane.name = 2, .lines = 3, .event_metadata(map<int64, XEventMetadata>) = 4
  XLine.events = 4
  XEvent.metadata_id = 1, .duration_ps = 3
  XEventMetadata.id = 1, .name = 2

Usage (as a library):
    from tools.profile_ops import profile_top_ops
    profile_top_ops(lambda: fn(x), iters=10, top=30)
"""

from __future__ import annotations

import glob
import os
import tempfile
from collections import defaultdict


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) from a protobuf message body.
    value is int for varint, memoryview for length-delimited, raw int for
    fixed32/64."""
    i, n = 0, len(buf)
    while i < n:
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                val |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wt, val
        elif wt == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:  # fixed32
            yield field, wt, int.from_bytes(buf[i : i + 4], "little")
            i += 4
        elif wt == 1:  # fixed64
            yield field, wt, int.from_bytes(buf[i : i + 8], "little")
            i += 8
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wt}")


def _parse_plane(body: memoryview):
    """-> (name, {metadata_id: op_name}, [(metadata_id, duration_ps), ...])"""
    name = ""
    meta = {}
    events = []
    for f, wt, v in _fields(body):
        if f == 2 and wt == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif f == 4 and wt == 2:  # event_metadata map entry {key=1, value=2}
            mid, mname = None, ""
            for f2, wt2, v2 in _fields(v):
                if f2 == 1 and wt2 == 0:
                    mid = v2
                elif f2 == 2 and wt2 == 2:  # XEventMetadata
                    for f3, wt3, v3 in _fields(v2):
                        if f3 == 1 and wt3 == 0:
                            mid = mid if mid is not None else v3
                        elif f3 == 2 and wt3 == 2:
                            mname = bytes(v3).decode("utf-8", "replace")
            if mid is not None:
                meta[mid] = mname
        elif f == 3 and wt == 2:  # XLine
            for f2, wt2, v2 in _fields(v):
                if f2 == 4 and wt2 == 2:  # XEvent
                    mid, dur = 0, 0
                    for f3, wt3, v3 in _fields(v2):
                        if f3 == 1 and wt3 == 0:
                            mid = v3
                        elif f3 == 3 and wt3 == 0:
                            dur = v3
                    events.append((mid, dur))
    return name, meta, events


def device_op_times(logdir: str) -> dict:
    """Aggregate device-plane event durations by op name -> (total_us, count)."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    with open(sorted(paths)[-1], "rb") as f:
        space = memoryview(f.read())

    totals: dict = defaultdict(float)
    counts: dict = defaultdict(int)
    for f_no, wt, plane_body in _fields(space):
        if f_no != 1 or wt != 2:
            continue
        name, meta, events = _parse_plane(plane_body)
        lname = name.lower()
        if ("tpu" not in lname and "device" not in lname) or "host" in lname:
            continue
        for mid, dur in events:
            op = meta.get(mid, f"<meta {mid}>")
            totals[op] += dur / 1e6  # ps -> us
            counts[op] += 1
    return {k: (totals[k], counts[k]) for k in totals}


def profile_top_ops(run, iters: int = 10, top: int = 40, logdir: str | None = None):
    """run() dispatches + synchronizes one iteration. Prints the top device ops."""
    import jax

    logdir = logdir or tempfile.mkdtemp(prefix="tristrace_")
    run()  # warm outside the trace
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            run()
    ops = device_op_times(logdir)
    items = sorted(ops.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for v in ops.values())
    print(f"total device-event time: {total / 1e3:.2f} ms over {iters} iters "
          f"({total / 1e3 / iters:.3f} ms/iter)")
    for name, (us, n) in items[:top]:
        print(f"{us / iters:10.1f} us/iter  x{n:5d}  {name[:110]}")
    return logdir, items


if __name__ == "__main__":
    print(__doc__)
