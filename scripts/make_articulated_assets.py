#!/usr/bin/env python
"""Author a PartNet-Mobility-style asset tree (URDF + OBJ/MTL + index
CSV) entirely in-repo, so the full reference data path — datagen CLI ->
posed colored point clouds -> PLY->H5 packer -> training — can run in an
environment with no external dataset mounted.

Mirrors the input contract of the reference's dataset generation
(make_dataset.py:423-532 URDF/joint conventions; partnet_index.csv
columns model_id/urdf_relpath/anno_id/model_cat). Four articulated
categories with parametric per-instance variation:

  Scissors          1 revolute joint, two mixed-material links
  Laptop            1 revolute joint (screen hinge)
  Box               1 revolute joint (lid), open 5-wall body
  StorageFurniture  2 joints: prismatic drawer + revolute door

Usage: python scripts/make_articulated_assets.py --out DIR \
          [--per-cat 3] [--seed 0]
"""
import argparse
import csv
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def box_obj_lines(size, center, first_vertex=1):
    """Axis-aligned box -> (v-lines, f-lines) with outward-wound faces."""
    sx, sy, sz = size
    cx, cy, cz = center
    v = []
    for dx in (-0.5, 0.5):
        for dy in (-0.5, 0.5):
            for dz in (-0.5, 0.5):
                v.append((cx + dx * sx, cy + dy * sy, cz + dz * sz))
    # indices into the 2x2x2 corner lattice (x-major as built above)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5),   # -x, +x
             (0, 4, 5, 1), (2, 3, 7, 6),   # -y, +y
             (0, 2, 6, 4), (1, 5, 7, 3)]   # -z, +z
    vl = [f"v {x:.6f} {y:.6f} {z:.6f}" for x, y, z in v]
    fl = []
    for a, b, c, d in quads:
        a, b, c, d = (i + first_vertex for i in (a, b, c, d))
        fl.append(f"f {a} {b} {c}")
        fl.append(f"f {a} {c} {d}")
    return vl, fl


def write_obj(path: Path, parts, mtllib: str):
    """parts: list of (material_name, [(size, center), ...])."""
    lines = [f"mtllib {mtllib}"]
    nv = 1
    for mat, boxes in parts:
        lines.append(f"usemtl {mat}")
        for size, center in boxes:
            vl, fl = box_obj_lines(size, center, nv)
            nv += 8
            lines += vl + fl
    path.write_text("\n".join(lines) + "\n")


def write_mtl(path: Path, colors):
    lines = []
    for name, (r, g, b) in colors.items():
        lines += [f"newmtl {name}", f"Kd {r:.3f} {g:.3f} {b:.3f}", ""]
    path.write_text("\n".join(lines))


URDF_HEAD = '<?xml version="1.0"?>\n<robot name="{name}">\n'


def link_xml(name, obj=None):
    if obj is None:
        return f'  <link name="{name}"/>\n'
    return (f'  <link name="{name}">\n    <visual>\n'
            f'      <origin xyz="0 0 0" rpy="0 0 0"/>\n'
            f'      <geometry><mesh filename="{obj}"/></geometry>\n'
            f'    </visual>\n  </link>\n')


def joint_xml(name, jtype, parent, child, origin, axis, lo, hi):
    ox, oy, oz = origin
    ax, ay, az = axis
    return (f'  <joint name="{name}" type="{jtype}">\n'
            f'    <parent link="{parent}"/>\n'
            f'    <child link="{child}"/>\n'
            f'    <origin xyz="{ox:.4f} {oy:.4f} {oz:.4f}" rpy="0 0 0"/>\n'
            f'    <axis xyz="{ax} {ay} {az}"/>\n'
            f'    <limit lower="{lo:.4f}" upper="{hi:.4f}" '
            f'effort="10" velocity="1"/>\n  </joint>\n')


def make_scissors(d: Path, rng):
    L = 0.22 * rng.uniform(0.8, 1.2)        # blade length
    w = 0.016 * rng.uniform(0.8, 1.3)       # blade width
    t = 0.004                                # thickness
    hL = 0.08 * rng.uniform(0.8, 1.2)       # handle length
    write_mtl(d / "mats.mtl", {
        "steel": (0.75, 0.77, 0.80),
        "grip_a": (0.85, 0.15, 0.10),
        "grip_b": (0.10, 0.25, 0.80)})
    # one OBJ per link, each mixed-material (blade steel + colored grip)
    write_obj(d / "blade_a.obj",
              [("steel", [((L, w, t), (L / 2, 0, t / 2))]),
               ("grip_a", [((hL, 2.2 * w, 1.8 * t),
                            (-hL / 2, 0, t / 2))])], "mats.mtl")
    write_obj(d / "blade_b.obj",
              [("steel", [((L, w, t), (L / 2, 0, -t / 2))]),
               ("grip_b", [((hL, 2.2 * w, 1.8 * t),
                            (-hL / 2, 0, -t / 2))])], "mats.mtl")
    urdf = URDF_HEAD.format(name="scissors")
    urdf += link_xml("blade_a", "blade_a.obj")
    urdf += link_xml("blade_b", "blade_b.obj")
    urdf += joint_xml("joint_0", "revolute", "blade_a", "blade_b",
                      (0, 0, 0), (0, 0, 1), 0.08, 1.1)
    (d / "mobility.urdf").write_text(urdf + "</robot>\n")


def make_laptop(d: Path, rng):
    W = 0.32 * rng.uniform(0.85, 1.15)
    D = 0.22 * rng.uniform(0.85, 1.15)
    t = 0.012
    write_mtl(d / "mats.mtl", {
        "body": (0.35, 0.35, 0.38),
        "key": (0.15, 0.15, 0.16),
        "screen": (0.05, 0.05, 0.08)})
    write_obj(d / "base.obj",
              [("body", [((W, D, t), (0, -D / 2, t / 2))]),
               ("key", [((0.8 * W, 0.5 * D, 0.004),
                         (0, -D * 0.45, t + 0.002))])], "mats.mtl")
    write_obj(d / "lid.obj",
              [("body", [((W, D, t), (0, D / 2, t / 2))]),
               ("screen", [((0.9 * W, 0.85 * D, 0.004),
                            (0, D / 2, t + 0.002))])], "mats.mtl")
    urdf = URDF_HEAD.format(name="laptop")
    urdf += link_xml("base", "base.obj")
    urdf += link_xml("lid", "lid.obj")
    # hinge along the shared back edge; lid rotates open about x
    urdf += joint_xml("joint_0", "revolute", "base", "lid",
                      (0, 0, 0.012), (1, 0, 0), 0.15, 2.2)
    (d / "mobility.urdf").write_text(urdf + "</robot>\n")


def make_box(d: Path, rng):
    W = 0.25 * rng.uniform(0.8, 1.2)
    D = 0.18 * rng.uniform(0.8, 1.2)
    H = 0.12 * rng.uniform(0.8, 1.3)
    t = 0.008
    write_mtl(d / "mats.mtl", {
        "card": (0.72, 0.52, 0.28),
        "lid": (0.55, 0.35, 0.18)})
    walls = [((W, D, t), (0, 0, t / 2)),                       # bottom
             ((t, D, H), (-W / 2 + t / 2, 0, H / 2)),
             ((t, D, H), (W / 2 - t / 2, 0, H / 2)),
             ((W, t, H), (0, -D / 2 + t / 2, H / 2)),
             ((W, t, H), (0, D / 2 - t / 2, H / 2))]
    write_obj(d / "body.obj", [("card", walls)], "mats.mtl")
    write_obj(d / "lid.obj", [("lid", [((W, D, t), (0, D / 2, t / 2))])],
              "mats.mtl")
    urdf = URDF_HEAD.format(name="box")
    urdf += link_xml("body", "body.obj")
    urdf += link_xml("lid", "lid.obj")
    urdf += joint_xml("joint_0", "revolute", "body", "lid",
                      (0, -D / 2, H), (1, 0, 0), 0.0, 1.9)
    (d / "mobility.urdf").write_text(urdf + "</robot>\n")


def make_cabinet(d: Path, rng):
    W = 0.35 * rng.uniform(0.85, 1.15)
    D = 0.30 * rng.uniform(0.85, 1.15)
    H = 0.45 * rng.uniform(0.85, 1.15)
    t = 0.012
    write_mtl(d / "mats.mtl", {
        "wood": (0.55, 0.38, 0.22),
        "drawer": (0.65, 0.48, 0.30),
        "door": (0.45, 0.30, 0.18),
        "knob": (0.85, 0.80, 0.30)})
    shell = [((W, D, t), (0, 0, t / 2)),                       # bottom
             ((W, D, t), (0, 0, H - t / 2)),                   # top
             ((t, D, H), (-W / 2 + t / 2, 0, H / 2)),          # left
             ((t, D, H), (W / 2 - t / 2, 0, H / 2)),           # right
             ((W, t, H), (0, D / 2 - t / 2, H / 2)),           # back
             ((W, D, t), (0, 0, H / 2))]                       # mid shelf
    write_obj(d / "body.obj", [("wood", shell)], "mats.mtl")
    # drawer occupies the upper half, slides out along -y
    dw, dd, dh = W - 3 * t, D - 2 * t, H / 2 - 2 * t
    drawer = [((dw, dd, t), (0, 0, H / 2 + t + t / 2)),
              ((dw, t, dh), (0, -dd / 2 + t / 2, H / 2 + t + dh / 2)),
              ((dw, t, dh), (0, dd / 2 - t / 2, H / 2 + t + dh / 2)),
              ((t, dd, dh), (-dw / 2 + t / 2, 0, H / 2 + t + dh / 2)),
              ((t, dd, dh), (dw / 2 - t / 2, 0, H / 2 + t + dh / 2))]
    write_obj(d / "drawer.obj",
              [("drawer", drawer),
               ("knob", [((0.02, 0.02, 0.02),
                          (0, -dd / 2 - 0.01, H / 2 + t + dh / 2))])],
              "mats.mtl")
    # door covers the lower half front, hinged on its left edge
    write_obj(d / "door.obj",
              [("door", [((W - 2 * t, t, H / 2 - 2 * t),
                          ((W - 2 * t) / 2, 0, 0))]),
               ("knob", [((0.02, 0.02, 0.02),
                          (W - 2 * t - 0.03, -0.015, 0))])], "mats.mtl")
    urdf = URDF_HEAD.format(name="cabinet")
    urdf += link_xml("body", "body.obj")
    urdf += link_xml("drawer", "drawer.obj")
    urdf += link_xml("door", "door.obj")
    urdf += joint_xml("joint_0", "prismatic", "body", "drawer",
                      (0, 0, 0), (0, -1, 0), 0.0, 0.6 * D)
    urdf += joint_xml("joint_1", "revolute", "body", "door",
                      (-W / 2 + t, -D / 2 + t / 2, H / 4), (0, 0, -1),
                      0.0, 1.8)
    (d / "mobility.urdf").write_text(urdf + "</robot>\n")


MAKERS = {"Scissors": make_scissors, "Laptop": make_laptop,
          "Box": make_box, "StorageFurniture": make_cabinet}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--per-cat", type=int, default=3)
    ap.add_argument("--cats", type=str, default=",".join(MAKERS))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    args.out.mkdir(parents=True, exist_ok=True)
    rows = []
    mid = 10000
    for cat in [c for c in args.cats.split(",") if c in MAKERS]:
        for k in range(args.per_cat):
            model_id = str(mid)
            mid += 1
            d = args.out / model_id
            d.mkdir(exist_ok=True)
            MAKERS[cat](d, np.random.RandomState(args.seed * 1000 + mid))
            rows.append({"model_id": model_id,
                         "urdf_relpath": f"{model_id}/mobility.urdf",
                         "anno_id": model_id, "model_cat": cat})
    with (args.out / "index.csv").open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["model_id", "urdf_relpath",
                                          "anno_id", "model_cat"])
        w.writeheader()
        w.writerows(rows)
    print(f"[assets] {len(rows)} models -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
