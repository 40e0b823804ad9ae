"""TensorBoard event-writer round-trip (pcfm/utils/tb.py)."""
import glob
import os

from pcfm.utils.tb import SummaryWriter, crc32c, read_events


def test_crc32c_known_answer():
    # RFC 3720 test vector for CRC32C (Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_event_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, step=1)
    w.add_scalars({"train/loss": 0.75, "val/cd": 2.25}, step=2)
    w.close()
    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    ev = read_events(files[0])
    assert ev == [(1, {"train/loss": 1.5}),
                  (2, {"train/loss": 0.75, "val/cd": 2.25})]


def test_loop_writes_tb(tmp_path):
    """End-to-end: tiny training run with --tensorboard writes parsable
    scalars for every epoch."""
    from pcfm.config import Config
    from pcfm.train.loop import train

    cfg = Config(dataset_type="synthetic", pf_backbone="mlp", latent_dim=16,
                 enc_width=16, enc_depth=4, pf_width=32, pf_depth=3,
                 pf_emb_dim=16, lf_width=32, lf_depth=3, lf_emb_dim=16,
                 warmup_steps=0, amp=False, epochs=2, save_every=2,
                 batch_size=4, tr_max_sample_points=32,
                 te_max_sample_points=32, num_workers=0,
                 out_dir=str(tmp_path), vis_count=1, geom_warmup_epochs=0,
                 sample_steps=2, tensorboard=True)
    train(cfg, verbose=False)
    files = glob.glob(os.path.join(str(tmp_path), "tb",
                                   "events.out.tfevents.*"))
    assert len(files) == 1
    ev = read_events(files[0])
    steps = [s for s, _ in ev]
    assert 1 in steps and 2 in steps
    tags = set().union(*(d.keys() for _, d in ev))
    assert "train/loss_point" in tags and "val/recon_cd" in tags
    assert "perf/points_per_sec" in tags
