#!/usr/bin/env python
"""Bucket a TPU trace's XLA ops into step-cost categories.

Groups the device plane's op events (excluding module/step/async-copy
entries) by a coarse pattern on the HLO name+shape, divides by the step
count, and prints ms/step per bucket plus the top individual ops.

    python scripts/trace_buckets.py /tmp/trace_hyb [steps] [topk]
"""
import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(__file__))
from trace_summary import parse_xspace  # noqa: E402


def bucket(name: str) -> str:
    if name.startswith("%pvconv"):
        m = re.search(r"f32\[([\d,]+)\]", name)
        return f"pallas sorted-window {m.group(1) if m else ''}"
    if "custom-call" in name and "tpu_custom_call" in name:
        return "pallas other"
    if name.startswith("%convolution") or "convolution" in name.split("=")[0]:
        return "conv3d"
    if ".sort" in name or name.startswith("%sort"):
        return "sort"
    if "all-reduce" in name:
        return "all-reduce"
    m = re.match(r"%(?:loop_)?([a-z-]+)[_.]", name)
    kind = m.group(1) if m else name.split(".")[0].lstrip("%")
    m2 = re.search(r"(f32|bf16|s32|u32|pred)\[([\d,]+)\]", name)
    shape = f"{m2.group(1)}[{m2.group(2)}]" if m2 else ""
    return f"{kind} {shape}"


def main():
    target = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    topk = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    if os.path.isdir(target):
        cands = sorted(glob.glob(os.path.join(
            target, "**", "*.xplane.pb"), recursive=True))
        target = cands[-1]
    planes, _ = parse_xspace(target)
    dev = next((v for k, v in planes.items() if "TPU" in k), None)
    buckets = defaultdict(lambda: [0.0, 0])
    total = 0.0
    async_only = "--async" in sys.argv
    for name, ps, cnt in dev:
        if (name.startswith("jit_") or re.fullmatch(r"\d+", name)
                or "meta:" in name):
            continue
        is_async = re.search(r"(copy|slice|fusion|collective.*)-(start|done)",
                             name) or "-start" in name or "-done" in name
        if bool(is_async) != async_only:
            continue
        b = bucket(name)
        ms = ps / 1e9 / steps
        buckets[b][0] += ms
        buckets[b][1] += cnt
        total += ms
    print(f"total (excl. async copies): {total:.2f} ms/step")
    rows = sorted(buckets.items(), key=lambda kv: -kv[1][0])
    for b, (ms, cnt) in rows[:topk]:
        print(f"{ms:9.3f} ms/step  x{cnt:<5d} {b}")


if __name__ == "__main__":
    main()
