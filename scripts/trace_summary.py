#!/usr/bin/env python
"""Summarize a jax.profiler trace (.xplane.pb) without tensorflow.

Minimal wire-format reader for the XSpace proto (XPlane/XLine/XEvent):
aggregates event durations per event-metadata name and prints the top ops
per plane.  Usage:

    python scripts/trace_summary.py /path/to/trace_dir_or_xplane.pb [topk]
"""
from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def _varint(buf: bytes, i: int):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value_bytes_or_int) records."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:                       # varint
            val, i = _varint(buf, i)
        elif wt == 1:                     # fixed64
            val = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 2:                     # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:                     # fixed32
            val = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def parse_xspace(path: str):
    """Return ({plane: [(op, total_ps, count), ...]},
               {plane: [(line_name, busy_ps, span_ps, n_events), ...]}).

    busy_ps is the union of event intervals on the line (occupancy); span_ps
    is last-end minus first-start — busy/span is the line's duty cycle.
    """
    with open(path, "rb") as f:
        space = f.read()
    planes = {}
    occupancy = {}
    for field, _, val in _fields(space):
        if field != 1:                    # XSpace.planes
            continue
        name = ""
        meta = {}
        lines = []
        for pf, _, pv in _fields(val):
            if pf == 2:
                name = pv.decode("utf-8", "ignore")
            elif pf == 4:                 # event_metadata map entry
                key = None
                mname = ""
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        key = mv
                    elif mf == 2:         # XEventMetadata
                        for ef, _, ev in _fields(mv):
                            if ef == 2:
                                mname = ev.decode("utf-8", "ignore")
                if key is not None:
                    meta[key] = mname
            elif pf == 3:                 # XLine
                lines.append(pv)
        agg = defaultdict(lambda: [0, 0])
        occ = []
        for line in lines:
            lname = ""
            intervals = []
            for lf, _, lv in _fields(line):
                if lf == 2:
                    lname = lv.decode("utf-8", "ignore")
                elif lf == 11:
                    lname = lv.decode("utf-8", "ignore") or lname
                elif lf == 4:             # XLine.events
                    mid, dur, off = None, 0, 0
                    for ef, _, ev in _fields(lv):
                        if ef == 1:
                            mid = ev
                        elif ef == 2:
                            off = ev
                        elif ef == 3:
                            dur = ev
                    if mid is not None:
                        a = agg[meta.get(mid, f"meta:{mid}")]
                        a[0] += dur
                        a[1] += 1
                        intervals.append((off, off + dur))
            if intervals:
                intervals.sort()
                busy = 0
                cur_s, cur_e = intervals[0]
                for s, e in intervals[1:]:
                    if s > cur_e:
                        busy += cur_e - cur_s
                        cur_s, cur_e = s, e
                    else:
                        cur_e = max(cur_e, e)
                busy += cur_e - cur_s
                span = intervals[-1][1] - intervals[0][0]
                occ.append((lname, busy, span, len(intervals)))
        planes[name] = sorted(((k, v[0], v[1]) for k, v in agg.items()),
                              key=lambda x: -x[1])
        occupancy[name] = occ
    return planes, occupancy


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pcfm_prof"
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    if os.path.isdir(target):
        files = sorted(glob.glob(os.path.join(target, "**", "*.xplane.pb"),
                                 recursive=True))
        if not files:
            raise SystemExit(f"no .xplane.pb under {target}")
        target = files[-1]
    print(f"[trace] {target}")
    planes, occupancy = parse_xspace(target)
    for plane, ops in planes.items():
        total = sum(t for _, t, _ in ops)
        if not total or "Steps" in plane:
            continue
        print(f"\n== {plane}  (total {total/1e9:.3f} ms of events)")
        for lname, busy, span, n in occupancy.get(plane, []):
            if span:
                print(f"  line '{lname}': busy {busy/1e9:.3f} ms / span "
                      f"{span/1e9:.3f} ms = {100*busy/span:.0f}% duty, "
                      f"{n} events")
        for opname, t, c in ops[:topk]:
            print(f"  {t/1e9:9.3f} ms  x{c:<6d} {opname[:90]}")


if __name__ == "__main__":
    main()
