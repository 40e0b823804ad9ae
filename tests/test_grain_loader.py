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


def test_grain_loader_partial_tail(ds):
    """Regression (ADVICE r2): drop_last=False must emit a true partial
    tail batch from a finite one-epoch sampler — not silently fill it
    with next-epoch records from an infinite stream."""
    # 12 records, batch 5 -> 2 full batches + tail of 2
    ld = GrainLoader(ds, batch_size=5, shuffle=True, drop_last=False,
                     seed=2, num_workers=0)
    assert len(ld) == 3
    batches = list(ld.epoch_batches(0))
    assert [b["idx"].shape[0] for b in batches] == [5, 5, 2]
    e0 = np.concatenate([b["idx"] for b in batches])
    assert len(np.unique(e0)) == 12          # exactly one epoch, no dups
    # second epoch: full coverage again, reshuffled independently
    e1 = np.concatenate([b["idx"] for b in ld.epoch_batches(1)])
    assert len(np.unique(e1)) == 12 and len(e1) == 12


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


def test_h5_dataset_pickles_for_workers(tmp_path):
    """Regression (r2 review): grain worker processes pickle the dataset
    inside the _LoadItem transform; the H5 base class must drop its lock
    and live handles."""
    import pickle
    import json as _json
    from pcfm.data.h5_dataset import PartNetH5Dataset
    from pcfm.data.pack_h5 import pack_ply_to_h5
    from pcfm.data.synthetic import hinge_shape
    from pcfm.utils import save_point_cloud_ply_rgb

    rng = np.random.RandomState(0)
    for pi in range(3):
        d = tmp_path / "raw" / "model_0" / f"pose_{pi:03d}"
        d.mkdir(parents=True)
        xyz, rgb = hinge_shape(rng, 128, 0.4 + 0.2 * pi)
        save_point_cloud_ply_rgb(xyz, rgb, str(d / "pointcloud.ply"))
        _json.dump({"angles": [0.4 + 0.2 * pi]},
                   open(d / "angles.json", "w"))
    out = tmp_path / "h5"
    pack_ply_to_h5(str(tmp_path / "raw"), str(out), split="train",
                   n_points=64, shard_size=4, verbose=False)
    ds = PartNetH5Dataset(str(out), split="train", tr_sample_size=32,
                          te_sample_size=32)
    ds.get(0, np.random.RandomState(0))        # open a live handle + lock
    ds2 = pickle.loads(pickle.dumps(ds))
    item = ds2.get(1, np.random.RandomState(1))
    assert item["train_points"].shape == (32, 3)
    # grain multiprocess end-to-end over the pickled dataset
    ld = GrainLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                     seed=0, num_workers=1)
    b = next(iter(ld.epoch_batches(0)))
    assert b["train_points"].shape == (2, 32, 3)


def test_grain_epoch_alignment_ragged(ds):
    """Regression (r2 review): when shard_n % batch_size != 0 the loader
    must drain the remainder so each nominal epoch covers one full grain
    reshuffle (no duplicated/missed records across epochs)."""
    # 12 records, batch 5 -> 2 batches/epoch (10 records) + 2 drained
    ld = GrainLoader(ds, batch_size=5, shuffle=True, drop_last=True,
                     seed=1, num_workers=0)
    e0 = np.concatenate([b["idx"] for b in ld.epoch_batches(0)])
    e1 = np.concatenate([b["idx"] for b in ld.epoch_batches(1)])
    assert len(e0) == len(e1) == 10
    # each epoch's 10 records are drawn from ONE reshuffle: all distinct
    assert len(np.unique(e0)) == 10 and len(np.unique(e1)) == 10
