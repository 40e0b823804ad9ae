#!/usr/bin/env python
"""Capacity-scaling report (VERDICT r3 #1): assemble the run5/run6/run7
gen-quality evidence into one markdown table set — matched-epoch 1-NNA
trajectories, per-run configuration (model capacity / data size /
protocol), and final suites (single-seed for the legacy runs, the r4
repeated-seed CD+EMD band for run7+).

Reads docs/genq/{history_run5,history_run6}.json, docs/genq/run7/
{history,final_suite}.json (+ optional guidance_sweep jsons); prints
markdown to stdout.  Pure host-side file munging — never touches jax.

Run anchors (docs/convergence.md):
  run5: 1x capacity (pf_width 512, ctx 128/256/256), 400 clouds, 96-cloud
        protocol;
  run6: 1x capacity, 800 clouds, 192-cloud protocol (data-scaling probe);
  run7: 2.7x capacity (pf_width 1024, ctx 256/512/512), 400 clouds,
        192-cloud protocol (capacity-scaling probe).
"""
import json
import os
import sys

D = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 "docs", "genq")

RUNS = [
    ("run5", "1x cap, 400 clouds, 96-ref", "history_run5.json",
     "final_run5.json", "guidance_sweep_run5.json"),
    ("run6", "1x cap, 800 clouds, 192-ref", "history_run6.json",
     "final_run6.json", "guidance_sweep_run6.json"),
    ("run7", "2.7x cap, 400 clouds, 192-ref", "run7/history.json",
     "run7/final_suite.json", "run7/guidance_sweep.json"),
    ("run8", "1x cap, 400 clouds, 192-ref (r5 recipe sweep)",
     "run8/history.json", "run8/final_suite.json",
     "run8/guidance_sweep.json"),
]


def _load(rel):
    p = os.path.join(D, rel)
    return json.load(open(p)) if os.path.exists(p) else None


def fmt_final(fin):
    """Legacy finals are flat single-seed dicts; r4 finals carry
    protocol/default/best band blocks."""
    if fin is None:
        return "(pending)"
    if "default" in fin:  # r4 band schema
        def band(blk):
            b = blk["nna_cd"]
            return (f"**{b['mean']:.3f}** [{b['min']:.3f}, {b['max']:.3f}]"
                    f" (cov {blk['cov_cd']['mean']:.3f}, "
                    f"mmd {blk['mmd_cd']['mean']:.4f}"
                    + (f", nna-emd {blk['nna_emd']['mean']:.3f}"
                       if "nna_emd" in blk else "") + ")")
        s = f"default g: {band(fin['default'])}"
        if fin.get("best") is not None:
            s += (f"; best g={fin['best_guidance']}: "
                  f"{band(fin['best'])}")
        seeds = fin.get("protocol", {}).get("seeds")
        return s + (f" — {len(seeds)}-seed band" if seeds else "")
    return (f"{fin['nna_cd']:.3f} (cov {fin['cov_cd']:.3f}, "
            f"mmd {fin['mmd_cd']:.4f}) — single seed")


def main():
    epochs = sorted({e["epoch"] for _, _, h, _, _ in RUNS
                     for e in (_load(h) or []) if "nna_cd" in e})
    cols = [ep for ep in epochs if ep % 100 == 0]
    print("## Capacity scaling (run5 vs run7) and data scaling (run5 vs "
          "run6)\n")
    print("In-loop 1-NNA-CD at matched epochs (single-seed instrument, "
          "binomial SE ~0.024 at 192 clouds / ~0.034 at 96):\n")
    print("| run (config) | " + " | ".join(f"ep{c}" for c in cols)
          + " |")
    print("|---|" + "---|" * len(cols))
    for name, desc, h, _, _ in RUNS:
        hist = _load(h) or []
        by_ep = {e["epoch"]: e["nna_cd"] for e in hist if "nna_cd" in e}
        row = [f"{by_ep[c]:.3f}" if c in by_ep else "—" for c in cols]
        print(f"| {name} ({desc}) | " + " | ".join(row) + " |")
    print("\nFinal suites:\n")
    for name, desc, _, f, _ in RUNS:
        print(f"- **{name}** ({desc}): {fmt_final(_load(f))}")
    print()
    for name, _, _, _, sw in RUNS:
        s = _load(sw)
        if not s:
            continue
        if isinstance(s, list) and s and "agg" in s[0]:  # r4 schemas
            # guidance-only entries carry "guidance"; the late-r4 recipe
            # sweep carries a "recipe" dict (guidance/steps/oversample)
            abbr = {"guidance": "g", "steps": "s", "oversample": "o",
                    "latent_std": "lstd", "latent_steps": "lnfe"}

            def _tag(r):
                if "recipe" in r:
                    return ",".join(f"{abbr.get(k, k)}={v}"
                                    for k, v in r["recipe"].items())
                return f"g={r['guidance']}"
            rows = ", ".join(f"{_tag(r)}: "
                             f"{r['agg']['nna_cd']['mean']:.3f}"
                             for r in s)
        else:
            rows = ", ".join(f"g={r['guidance']}: {r['nna_cd']:.3f}"
                             for r in (s or []))
        print(f"- {name} guidance sweep (1-NNA-CD): {rows}")


if __name__ == "__main__":
    main()
