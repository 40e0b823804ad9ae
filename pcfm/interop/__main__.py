"""CLI: ``python -m pcfm.interop <reference.pt> --out_dir runs/imported``.

Converts a reference torch checkpoint (train.py:682-708 format) into a
pcfm orbax checkpoint + meta.json that the pcfm train (--auto-resume),
sample and eval CLIs pick up directly.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Import a reference PyTorch checkpoint into pcfm")
    ap.add_argument("ckpt", help="path to hybrid_epNNNN.pt")
    ap.add_argument("--out_dir", required=True,
                    help="pcfm run dir to write ckpts/ under")
    ap.add_argument("--ctx_dtype", default="fp32", choices=["fp32", "bf16"],
                    help="ContextNet island precision for the continued "
                    "run (fp32 = exact reference semantics)")
    args = ap.parse_args(argv)

    from pcfm.interop.torch_ckpt import import_reference_checkpoint
    path, cfg = import_reference_checkpoint(
        args.ckpt, args.out_dir, ctx_dtype=args.ctx_dtype)
    print(f"[interop] wrote {path}")
    print(f"[interop] backbone={cfg.pf_backbone} cond_dim={cfg.cond_dim} "
          f"point_dim={cfg.pf_point_dim} latent_dim={cfg.latent_dim}")


if __name__ == "__main__":
    main()
