"""Grain loader backend (pcfm/data/grain_loader.py)."""
import numpy as np
import pytest

pytest.importorskip("grain")

from pcfm.config import Config
from pcfm.data.grain_loader import GrainLoader, make_loader
from pcfm.data.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(split="train", size=12, n_points=64,
                            tr_sample_size=32, te_sample_size=32,
                            with_rgb=True, with_cond=True, seed=0)


def test_grain_loader_batches(ds):
    ld = GrainLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                     seed=3, num_workers=0)
    assert len(ld) == 3
    batches = list(ld.epoch_batches(0))
    assert len(batches) == 3
    b = batches[0]
    assert b["train_points"].shape == (4, 32, 3)
    assert b["train_rgb"].shape == (4, 32, 3)
    assert b["cond"].shape[0] == 4
    # a second epoch draws different records order (persistent stream)
    batches2 = list(ld.epoch_batches(1))
    assert len(batches2) == 3
    all_idx = np.concatenate([bb["idx"] for bb in batches])
    assert len(np.unique(all_idx)) == 12  # full epoch coverage

def test_grain_loader_sharding(ds):
    ld0 = GrainLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                      seed=0, num_workers=0, rank=0, world_size=2)
    ld1 = GrainLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                      seed=0, num_workers=0, rank=1, world_size=2)
    i0 = np.concatenate([b["idx"] for b in ld0.epoch_batches(0)])
    i1 = np.concatenate([b["idx"] for b in ld1.epoch_batches(0)])
    assert len(set(i0) & set(i1)) == 0
    assert len(i0) == len(i1) == 6


def test_make_loader_thread_fallback(ds):
    ld = make_loader("thread", ds, 4, shuffle=False, drop_last=True,
                     seed=0, num_workers=0)
    from pcfm.data.loader import DataLoader
    assert isinstance(ld, DataLoader)


def test_train_loop_grain_backend(tmp_path):
    from pcfm.train.loop import train
    cfg = Config(dataset_type="synthetic", pf_backbone="mlp", latent_dim=16,
                 enc_width=16, enc_depth=4, pf_width=32, pf_depth=3,
                 pf_emb_dim=16, lf_width=32, lf_depth=3, lf_emb_dim=16,
                 warmup_steps=0, amp=False, epochs=1, save_every=1,
                 batch_size=4, tr_max_sample_points=32,
                 te_max_sample_points=32, num_workers=0,
                 out_dir=str(tmp_path), vis_count=1, geom_warmup_epochs=0,
                 sample_steps=2, loader_backend="grain")
    out = train(cfg, verbose=False)
    assert out["epochs_run"] == 1 and np.isfinite(out["loss"])
