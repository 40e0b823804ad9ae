"""Tests for the scripts/ measurement tooling the perf claims rest on.

The TF-free xplane parser (scripts/trace_summary.py) and its bucketizer
(scripts/trace_buckets.py) produced the trace attributions in ROADMAP and
the step-cost breakdowns behind the kernel work; the capacity report
(scripts/genq_capacity_report.py) assembles the gen-quality evidence for
docs/convergence.md.  None of these touch jax — pin their parsing and
aggregation behavior here with hand-built fixtures.
"""
import importlib.util
import io
import json
import os
import sys
from contextlib import redirect_stdout

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_SCRIPTS, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    # trace_buckets does `from trace_summary import parse_xspace`
    sys.path.insert(0, _SCRIPTS)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(_SCRIPTS)
    return mod


# ---------------------------------------------------------------- protobuf
# Minimal wire-format ENCODER mirroring the decoder under test.  Field
# numbers follow tensorflow/profiler XSpace: XSpace.planes=1; XPlane
# name=2, lines=3, event_metadata=4 (map entry key=1 value=2;
# XEventMetadata.name=2); XLine name=2, display_name=11, events=4;
# XEvent metadata_id=1, offset_ps=2, duration_ps=3.

def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _ld(field, payload):                  # length-delimited
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def _vi(field, val):                      # varint field
    return _varint(field << 3 | 0) + _varint(val)


def _event(mid, off_ps, dur_ps):
    return _ld(4, _vi(1, mid) + _vi(2, off_ps) + _vi(3, dur_ps))


def _meta_entry(mid, name):
    return _ld(4, _vi(1, mid) + _ld(2, _ld(2, name.encode())))


def _line(name, events):
    return _ld(3, _ld(2, name.encode()) + b"".join(events))


def _plane(name, metas, lines):
    return _ld(1, _ld(2, name.encode()) + b"".join(metas)
               + b"".join(lines))


def test_parse_xspace_aggregation_and_occupancy(tmp_path):
    ts = _load("trace_summary")
    # op_a: two events 10ps each, overlapping [0,10) and [5,15) -> the
    # per-op total is additive (20) but line busy is the interval UNION
    # (15); op_b adds a disjoint [100,104).
    space = _plane(
        "/device:TPU:0",
        [_meta_entry(1, "op_a"), _meta_entry(2, "op_b")],
        [_line("xla-ops", [_event(1, 0, 10), _event(1, 5, 10),
                           _event(2, 100, 4)])],
    )
    p = tmp_path / "t.xplane.pb"
    p.write_bytes(space)
    planes, occupancy = ts.parse_xspace(str(p))
    assert list(planes) == ["/device:TPU:0"]
    ops = planes["/device:TPU:0"]
    assert ops[0] == ("op_a", 20, 2)      # sorted by total desc
    assert ops[1] == ("op_b", 4, 1)
    (lname, busy, span, n), = occupancy["/device:TPU:0"]
    assert lname == "xla-ops"
    assert busy == 15 + 4                 # union, not sum
    assert span == 104 - 0
    assert n == 3


def test_parse_xspace_unknown_metadata_and_multi_plane(tmp_path):
    ts = _load("trace_summary")
    space = (_plane("devA", [], [_line("l", [_event(7, 0, 3)])])
             + _plane("devB", [_meta_entry(1, "x")],
                      [_line("l", [_event(1, 0, 5)])]))
    p = tmp_path / "t.xplane.pb"
    p.write_bytes(space)
    planes, _ = ts.parse_xspace(str(p))
    assert planes["devA"] == [("meta:7", 3, 1)]   # unresolved id is loud
    assert planes["devB"] == [("x", 5, 1)]


def test_trace_buckets_classification():
    tb = _load("trace_buckets")
    assert tb.bucket("%pvconv_gather.1 = f32[8,4096,128] custom-call"
                     ) == "pallas sorted-window 8,4096,128"
    assert (tb.bucket("%foo = f32[2] custom-call ... tpu_custom_call")
            == "pallas other")
    assert tb.bucket("%convolution.5 = f32[8,3,3] conv") == "conv3d"
    assert tb.bucket("%sort.2 = s32[8]") == "sort"
    assert tb.bucket("%all-reduce.1 = f32[4]") == "all-reduce"
    # generic: kind prefix + first dtype[shape]
    assert tb.bucket("%fusion.123 = bf16[8,512] fused"
                     ) == "fusion bf16[8,512]"


def test_capacity_report_both_schemas(tmp_path, monkeypatch):
    rep = _load("genq_capacity_report")
    d = tmp_path / "genq"
    (d / "run7").mkdir(parents=True)
    # legacy single-seed run5 (in-loop history + flat final + sweep)
    (d / "history_run5.json").write_text(json.dumps(
        [{"epoch": 100, "nna_cd": 0.90}, {"epoch": 150, "loss": 1.0},
         {"epoch": 200, "nna_cd": 0.70}]))
    (d / "final_run5.json").write_text(json.dumps(
        {"nna_cd": 0.58, "cov_cd": 0.48, "mmd_cd": 0.001}))
    (d / "guidance_sweep_run5.json").write_text(json.dumps(
        [{"guidance": 0.5, "nna_cd": 0.58}]))
    # r4 band-schema run7
    (d / "run7" / "history.json").write_text(json.dumps(
        [{"epoch": 200, "nna_cd": 0.80}]))
    band = {"mean": 0.55, "min": 0.52, "max": 0.58}
    blk = {"nna_cd": band, "cov_cd": {"mean": 0.5},
           "mmd_cd": {"mean": 0.001}, "nna_emd": {"mean": 0.56}}
    (d / "run7" / "final_suite.json").write_text(json.dumps(
        {"protocol": {"seeds": [101, 202, 303]}, "default": blk,
         "best": blk, "best_guidance": 0.5}))
    (d / "run7" / "guidance_sweep.json").write_text(json.dumps(
        [{"guidance": 0.5, "agg": {"nna_cd": {"mean": 0.55}}}]))
    monkeypatch.setattr(rep, "D", str(d))
    buf = io.StringIO()
    with redirect_stdout(buf):
        rep.main()
    out = buf.getvalue()
    # matched-epoch table: only %100 epochs become columns
    assert "| ep100 | ep200 |" in out
    assert "| 0.900 | 0.700 |" in out      # run5 row
    assert "| — | 0.800 |" in out          # run7 row (no ep100 yet)
    # finals: legacy flat vs r4 band formatting, run6 absent -> pending
    assert "0.580 (cov 0.480, mmd 0.0010) — single seed" in out
    assert "**0.550** [0.520, 0.580]" in out
    assert "nna-emd 0.560" in out
    assert "3-seed band" in out
    assert "(pending)" in out
    # both sweep schemas render
    assert "run5 guidance sweep (1-NNA-CD): g=0.5: 0.580" in out
    assert "run7 guidance sweep (1-NNA-CD): g=0.5: 0.550" in out
