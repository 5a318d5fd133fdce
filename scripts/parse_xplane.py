"""Rank device ops by time from a jax.profiler trace (xplane.pb).

A dependency-free protobuf wire-format decoder for the TensorFlow profiler
XSpace container — no tensorboard/tensorflow install needed.  This is the
device-trace methodology that drives the framework's optimization work
(docs/DESIGN.md §10): capture with jax.profiler.start_trace/stop_trace,
then

    python scripts/parse_xplane.py /tmp/jaxtrace [topN]

prints per-op total duration, call count, and share of device time for
every line of the device plane(s).
"""

import glob
import os
import struct
import sys
from collections import defaultdict


def _varint(buf, i):
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) for one message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 1:
            val = struct.unpack("<q", buf[i:i + 8])[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:
            val = struct.unpack("<i", buf[i:i + 4])[0]
            i += 4
        else:  # pragma: no cover - groups unused
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_plane(buf):
    """XPlane -> (name, {metadata_id: name}, [(line_name, [(meta_id, dur_ps)])])."""
    name = ""
    metadata = {}
    lines = []
    for fnum, wt, val in fields(buf):
        if fnum == 2 and wt == 2:
            name = val.decode(errors="replace")
        elif fnum == 4 and wt == 2:  # event_metadata map entry
            mid, meta = None, b""
            for f2, w2, v2 in fields(val):
                if f2 == 1:
                    mid = v2
                elif f2 == 2:
                    meta = v2
            mname = ""
            for f3, w3, v3 in fields(meta):
                if f3 == 2 and w3 == 2:
                    mname = v3.decode(errors="replace")
            if mid is not None:
                metadata[mid] = mname
        elif fnum == 3 and wt == 2:  # XLine
            lname = ""
            events = []
            for f2, w2, v2 in fields(val):
                if f2 == 2 and w2 == 2:
                    lname = v2.decode(errors="replace")
                elif f2 == 4 and w2 == 2:  # XEvent
                    mid = dur = occ = 0
                    for f3, w3, v3 in fields(v2):
                        if f3 == 1:
                            mid = v3
                        elif f3 == 3:
                            dur = v3
                        elif f3 == 5:
                            occ = v3
                    events.append((mid, dur, max(occ, 1)))
            lines.append((lname, events))
    return name, metadata, lines


def summarize(space_path, top=25, line_filter=None):
    buf = open(space_path, "rb").read()
    out = []
    for fnum, wt, val in fields(buf):
        if fnum != 1 or wt != 2:
            continue
        pname, metadata, lines = parse_plane(val)
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        for lname, events in lines:
            if line_filter and line_filter not in lname:
                continue
            agg = defaultdict(lambda: [0, 0])
            for mid, dur, occ in events:
                a = agg[metadata.get(mid, f"#{mid}")]
                a[0] += dur
                a[1] += occ
            total = sum(a[0] for a in agg.values())
            if not total:
                continue
            out.append((pname, lname, total, agg))
    for pname, lname, total, agg in out:
        print(f"\n== {pname} :: {lname}  (total {total / 1e9:.3f} ms)")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
        for opname, (dur, cnt) in rows:
            print(f"  {dur / 1e9:9.3f} ms  {100 * dur / total:5.1f}%  "
                  f"x{cnt:<6d} {opname[:110]}")
    return out


if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        sys.exit(f"no xplane.pb under {logdir}")
    summarize(paths[-1], top)
