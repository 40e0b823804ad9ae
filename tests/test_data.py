"""Data-layer tests: H5 shard schema, cond-dim policy, loaders, PLY IO,
condition encoders, packer."""
import json

import numpy as np
import pytest

from pcfm.config import Config
from pcfm.data import (DataLoader, PartNetH5Dataset, TDCRH5Dataset, collate,
                       encode_motors, get_cond_dim, get_datasets, load_ply,
                       pack_ply_to_h5, save_point_cloud_ply,
                       save_point_cloud_ply_rgb, save_point_cloud_xyz,
                       to_model_batch, write_synthetic_shards)
from pcfm.data.synthetic import hinge_shape


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    write_synthetic_shards(str(d), per_split=8, n_points=256, n_shards=2,
                           motors_dim=2, nan_rows=1)
    return str(d)


def test_partnet_dataset_scan(shard_dir):
    ds = PartNetH5Dataset(shard_dir, split="train", tr_sample_size=64,
                          te_sample_size=32)
    assert len(ds) == 8
    assert ds.has_rgb
    # mode policy: most rows have 2 effective joints (1 NaN row per shard)
    assert ds.cond_dim == 2
    assert len(ds.outliers) == 2
    rng = np.random.RandomState(0)
    item = ds.get(0, rng)
    assert item["train_points"].shape == (64, 3)
    assert item["test_points"].shape == (32, 3)
    assert item["train_rgb"].shape == (64, 3)
    assert item["train_rgb"].dtype == np.float32
    assert item["train_rgb"].max() <= 1.0
    assert item["cond"].shape == (2,)
    assert np.isfinite(item["cond"]).all()  # NaN -> 0
    assert isinstance(item["anno_id"], str)


def test_partnet_max_policy_and_report(shard_dir, tmp_path):
    rep = str(tmp_path / "report.json")
    ds = PartNetH5Dataset(shard_dir, split="train", cond_dim_policy="max",
                          report_file=rep)
    assert ds.cond_dim == 2
    data = json.load(open(rep))
    assert data["policy"] == "max"
    assert data["outliers_count"] == len(ds.outliers)


def test_partnet_exclude_outliers(shard_dir):
    ds = PartNetH5Dataset(shard_dir, split="train", exclude_outliers=True)
    assert len(ds) == 6  # 8 - 2 NaN rows


def test_partnet_oversample_replacement(shard_dir):
    ds = PartNetH5Dataset(shard_dir, split="train", tr_sample_size=1000,
                          te_sample_size=10)
    item = ds.get(0, np.random.RandomState(0))
    assert item["train_points"].shape == (1000, 3)  # 256 base + resampled


def test_dataloader_sharding_and_determinism(shard_dir):
    ds = PartNetH5Dataset(shard_dir, split="train", tr_sample_size=32,
                          te_sample_size=32)
    loaders = [DataLoader(ds, batch_size=2, seed=7, rank=r, world_size=2,
                          num_workers=2) for r in range(2)]
    seen = []
    for ld in loaders:
        for batch in ld.epoch_batches(3):
            assert batch["train_points"].shape == (2, 32, 3)
            seen.extend(batch["idx"].tolist())
    assert sorted(seen) == list(range(8))  # disjoint cover of the dataset
    # determinism: same epoch -> same batches
    b1 = next(iter(loaders[0].epoch_batches(3)))
    b2 = next(iter(loaders[0].epoch_batches(3)))
    np.testing.assert_array_equal(b1["train_points"], b2["train_points"])
    # different epoch -> different order or sample
    b3 = next(iter(loaders[0].epoch_batches(4)))
    assert not np.array_equal(b1["train_points"], b3["train_points"])


def test_get_datasets_factory(shard_dir):
    cfg = Config(dataset_type="partnet_h5", data_dir=shard_dir,
                 tr_max_sample_points=32, te_max_sample_points=16)
    tr, te = get_datasets(cfg)
    assert cfg.has_rgb and cfg.cond_dim == 2
    assert len(tr) == 8 and len(te) == 8
    batch = collate([tr.get(i, np.random.RandomState(i)) for i in range(4)])
    mb = to_model_batch(batch, train=True, has_rgb=cfg.has_rgb,
                        cond_dim=cfg.cond_dim)
    assert mb["pts"].shape == (4, 32, 3)
    assert mb["rgb"].shape == (4, 32, 3)
    assert mb["cond"].shape == (4, 2)


def test_train_fraction_subset(shard_dir):
    cfg = Config(dataset_type="partnet_h5", data_dir=shard_dir,
                 train_fraction=0.5, train_subset_seed=1)
    tr, _ = get_datasets(cfg)
    assert len(tr) == 4
    assert tr.has_rgb  # attr forwarding through the subset


def test_tdcr_dataset(tmp_path):
    import h5py
    d = tmp_path / "tdcr" / "train"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    with h5py.File(d / "shard-000.h5", "w") as f:
        f.create_dataset("data", data=rng.randn(4, 128, 3).astype(np.float32))
        f.create_dataset("data_norm",
                         data=rng.randn(4, 128, 3).astype(np.float32))
        f.create_dataset("motors",
                         data=rng.rand(4, 6).astype(np.float32) * 0.4)
    ds = TDCRH5Dataset(str(tmp_path / "tdcr"), split="train",
                       tr_sample_size=32, te_sample_size=32,
                       motor_enc="raw6+geom")
    assert ds.cond_dim == 16
    item = ds.get(1, np.random.RandomState(0))
    assert item["cond"].shape == (16,)


@pytest.mark.parametrize("mode,dim", [("raw6", 6), ("geom", 10),
                                      ("raw6+geom", 16), ("raw9", 9),
                                      ("geom3", 16), ("raw9+geom3", 25)])
def test_encode_motors_dims(mode, dim):
    n = 9 if "9" in mode or "3" in mode else 6
    out = encode_motors(np.random.rand(n).astype(np.float32) * 0.4,
                        mode, max_pos=0.4)
    assert out.shape == (dim,)
    assert get_cond_dim(mode) == dim


def test_encode_motors_normalization():
    m = np.array([0.2, 0.4, 0.8, 0.0, 0.0, 0.0], np.float32)
    out = encode_motors(m, "raw6", max_pos=0.4)
    np.testing.assert_allclose(out, [0.5, 1.0, 1.0, 0, 0, 0], atol=1e-6)


def test_ply_roundtrip(tmp_path):
    xyz = np.random.rand(50, 3).astype(np.float32)
    rgb = np.random.rand(50, 3).astype(np.float32)
    p1 = str(tmp_path / "a.ply")
    save_point_cloud_ply(xyz, p1)
    got, gotrgb = load_ply(p1)
    np.testing.assert_allclose(got, xyz, atol=1e-5)
    assert gotrgb is None
    p2 = str(tmp_path / "b.ply")
    save_point_cloud_ply_rgb(xyz, rgb, p2)
    got2, rgb2 = load_ply(p2)
    np.testing.assert_allclose(got2, xyz, atol=1e-5)
    want = (np.clip(rgb, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(rgb2, want)
    p3 = str(tmp_path / "c.xyz")
    save_point_cloud_xyz(xyz, p3)
    got3 = np.loadtxt(p3)
    np.testing.assert_allclose(got3, xyz, atol=1e-5)


def test_pack_h5_roundtrip(tmp_path):
    # build a make_dataset.py-style tree, pack it, and read it back
    rng = np.random.RandomState(0)
    for mi in range(2):
        for pi in range(3):
            d = tmp_path / "raw" / f"model_{mi}" / f"pose_{pi:03d}"
            d.mkdir(parents=True)
            xyz, rgb = hinge_shape(rng, 200, 0.5 + pi * 0.3)
            save_point_cloud_ply_rgb(xyz, rgb, str(d / "pointcloud.ply"))
            json.dump({"angles": [0.5 + pi * 0.3]},
                      open(d / "angles.json", "w"))
    out = tmp_path / "h5"
    paths = pack_ply_to_h5(str(tmp_path / "raw"), str(out), split="train",
                           n_points=128, shard_size=4, verbose=False)
    assert paths
    ds = PartNetH5Dataset(str(out), split="train", tr_sample_size=64,
                          te_sample_size=64)
    assert len(ds) == 6
    assert ds.has_rgb
    assert ds.cond_dim == 1
    item = ds.get(0, np.random.RandomState(0))
    assert item["train_points"].shape == (64, 3)
    # data_norm is within [-1, 1]
    assert np.abs(item["train_points"]).max() <= 1.0 + 1e-5


def test_keep_anno_filter(shard_dir):
    # keep only two specific anno ids in the train split
    keep = {"train-0-0", "train-1-1"}
    ds = PartNetH5Dataset(shard_dir, split="train", keep_annos=keep)
    assert len(ds) == 2
    ids = {ds.get(i, np.random.RandomState(0))["anno_id"]
           for i in range(len(ds))}
    assert ids == keep


def test_keep_anno_file_via_factory(shard_dir, tmp_path):
    f = tmp_path / "keep.txt"
    f.write_text("train-0-0\ntrain-0-1\n")
    cfg = Config(dataset_type="partnet_h5", data_dir=shard_dir,
                 keep_anno_file=str(f), keep_anno_splits=["train"])
    tr, te = get_datasets(cfg)
    assert len(tr) == 2
    assert len(te) == 8  # test split unfiltered


def test_tdcr_raw9_three_segment(tmp_path):
    import h5py
    d = tmp_path / "tdcr9" / "train"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    with h5py.File(d / "shard-000.h5", "w") as f:
        f.create_dataset("data_norm",
                         data=rng.randn(3, 64, 3).astype(np.float32))
        f.create_dataset("motors",
                         data=rng.rand(3, 9).astype(np.float32) * 0.4)
    ds = TDCRH5Dataset(str(tmp_path / "tdcr9"), split="train",
                       tr_sample_size=16, te_sample_size=16,
                       motor_enc="raw9+geom3")
    assert ds.cond_dim == 25
    item = ds.get(0, np.random.RandomState(0))
    assert item["cond"].shape == (25,)


# ---------------- review-fix regressions (late r3) ----------------

class _FailingDS:
    def __init__(self, n=8, fail_at=5):
        self.n, self.fail_at = n, fail_at

    def __len__(self):
        return self.n

    def get(self, idx, rng):
        if idx == self.fail_at:
            raise RuntimeError("corrupt row")
        return {"idx": idx, "train_points": np.zeros((4, 3), np.float32),
                "test_points": np.zeros((4, 3), np.float32)}


def test_loader_forwards_worker_exception():
    """A data error inside the producer thread must surface as an
    exception in the consumer, not a permanent q.get() hang (review)."""
    loader = DataLoader(_FailingDS(), batch_size=2, shuffle=False,
                        num_workers=2, prefetch=1)
    with pytest.raises(RuntimeError, match="corrupt row"):
        for _ in loader.epoch_batches(0):
            pass


def test_loader_abandoned_generator_unblocks_producer():
    """Dropping the generator early must not leave the producer thread
    parked on a full queue (thread/executor leak — review)."""
    import threading

    before = threading.active_count()
    loader = DataLoader(_FailingDS(n=64, fail_at=10 ** 9), batch_size=2,
                        shuffle=False, num_workers=2, prefetch=1)
    gen = loader.epoch_batches(0)
    next(gen)
    gen.close()                      # triggers the finally -> stop + drain
    import time
    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before + 1


def test_collate_mixed_optional_keys_raises():
    items = [{"idx": 0, "train_points": np.zeros((4, 3), np.float32),
              "cond": np.zeros(2, np.float32)},
             {"idx": 1, "train_points": np.zeros((4, 3), np.float32)}]
    with pytest.raises(ValueError, match="shards disagree"):
        collate(items)


def test_loader_len_matches_yield_count_ragged_world():
    """len(loader) must equal the number of batches epoch_batches yields
    under ceil-padded rank sharding (review: floor-sharding understated
    total_steps and let the cosine LR rebound past t=1)."""
    ds = _FailingDS(n=31, fail_at=10 ** 9)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=0,
                        rank=0, world_size=8, drop_last=True)
    n_yielded = sum(1 for _ in loader.epoch_batches(0))
    assert len(loader) == n_yielded == 2


def test_discover_first_pattern_wins(tmp_path):
    """Split globs must not union with the flat fallback — train and test
    would silently share files (review)."""
    (tmp_path / "train_a.h5").write_bytes(b"")
    (tmp_path / "test_a.h5").write_bytes(b"")
    from pcfm.data.h5_dataset import _discover
    pats = lambda split: [str(tmp_path / split / "*.h5"),
                          str(tmp_path / f"{split}*.h5"),
                          str(tmp_path / "*.h5")]
    tr = _discover(str(tmp_path), "train", pats("train"))
    te = _discover(str(tmp_path), "test", pats("test"))
    assert tr == [str(tmp_path / "train_a.h5")]
    assert te == [str(tmp_path / "test_a.h5")]


def test_test_split_pads_cond_to_train_canon(tmp_path):
    """A val/test split whose own motor-dim mode differs must pad the
    condition to the TRAIN split's canonical dim (review: the model's
    cond width is fixed by the train scan)."""
    import h5py

    for split, dims in (("train", [2, 2, 2, 3]), ("test", [3, 3, 3, 2])):
        d = tmp_path / split
        d.mkdir()
        with h5py.File(d / "shard-000.h5", "w") as f:
            n, dmax = len(dims), 3
            f["data"] = np.random.rand(n, 32, 3).astype(np.float32)
            m = np.full((n, dmax), np.nan, np.float32)
            for i, k in enumerate(dims):
                m[i, :k] = 0.5
            f["motors"] = m
    cfg = Config(dataset_type="partnet_h5", data_dir=str(tmp_path),
                 tr_max_sample_points=16, te_max_sample_points=16)
    tr, te = get_datasets(cfg)
    assert tr.cond_dim == 2 and te.cond_dim == 2     # not test's mode (3)
    rng = np.random.RandomState(0)
    assert te.get(0, rng)["cond"].shape == (2,)

    # eval_only: the run's recorded cond_dim is authoritative, train
    # split untouched
    cfg2 = Config(dataset_type="partnet_h5", data_dir=str(tmp_path),
                  tr_max_sample_points=16, te_max_sample_points=16,
                  cond_dim=2, has_rgb=False)
    none_tr, te2 = get_datasets(cfg2, eval_only=True)
    assert none_tr is None and te2.cond_dim == 2


def test_eval_only_skips_train_split_all_dataset_types(tmp_path):
    """eval_only must skip the train-split construction for EVERY dataset
    type, not just partnet_h5 (advisor r3) — exercised by giving tdcr_h5
    an empty/absent train directory that would raise if scanned."""
    import h5py

    d = tmp_path / "test"
    d.mkdir()
    with h5py.File(d / "shard-000.h5", "w") as f:
        f["data"] = np.random.rand(3, 32, 3).astype(np.float32)
        f["motors"] = np.full((3, 6), 0.25, np.float32)
    # no train/ directory at all: a train scan would fail loudly
    cfg = Config(dataset_type="tdcr_h5", data_dir=str(tmp_path),
                 tr_max_sample_points=16, te_max_sample_points=16,
                 motor_enc="raw6", cond_dim=6)
    tr, te = get_datasets(cfg, eval_only=True)
    assert tr is None and len(te) == 3

    cfg_syn = Config(dataset_type="synthetic", tr_max_sample_points=16,
                     te_max_sample_points=16)
    tr_s, te_s = get_datasets(cfg_syn, eval_only=True)
    assert tr_s is None and len(te_s) > 0


def test_eval_only_cond_dim_mismatch_raises(tmp_path):
    """eval_only verifies the eval data's cond_dim against the restored
    run's recorded cond_dim for dataset types that cannot pad (tdcr)."""
    import h5py

    d = tmp_path / "test"
    d.mkdir()
    with h5py.File(d / "shard-000.h5", "w") as f:
        f["data"] = np.random.rand(3, 32, 3).astype(np.float32)
        f["motors"] = np.full((3, 6), 0.25, np.float32)
    cfg = Config(dataset_type="tdcr_h5", data_dir=str(tmp_path),
                 tr_max_sample_points=16, te_max_sample_points=16,
                 motor_enc="raw6", cond_dim=16)   # run trained with geom16
    with pytest.raises(ValueError, match="cond_dim"):
        get_datasets(cfg, eval_only=True)


def test_cosine_lr_clamps_past_total():
    import jax.numpy as jnp

    from pcfm.train.state import cosine_lr
    past = float(cosine_lr(jnp.int32(200), total=100, base_lr=1e-3,
                           min_lr=1e-6, warmup=10))
    assert past == pytest.approx(1e-6, rel=1e-3)
