"""End-to-end CLI tests: train (synthetic) -> sample CLI -> eval CLI, plus
eval metric sanity."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcfm.config import Config
from pcfm.eval.metrics import aggregate, cloud_metrics
from pcfm.train.loop import train


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    cfg = Config(dataset_type="synthetic", pf_backbone="mlp", latent_dim=16,
                 enc_width=16, enc_depth=4, pf_width=32, pf_depth=3,
                 pf_emb_dim=16, lf_width=32, lf_depth=3, lf_emb_dim=16,
                 warmup_steps=0, amp=False, epochs=1, save_every=1,
                 batch_size=4, tr_max_sample_points=32,
                 te_max_sample_points=32, num_workers=0, out_dir=out,
                 vis_count=1, geom_warmup_epochs=0, sample_steps=2)
    train(cfg, verbose=False)
    return out


def test_sample_cli(trained_run, tmp_path):
    from pcfm.sample.cli import main
    save = str(tmp_path / "gen")
    main(["--out_dir", trained_run, "--save_dir", save,
          "--num_samples", "2", "--n_points", "64", "--sample_steps", "2"])
    assert os.path.isfile(os.path.join(save, "sample_0.ply"))
    from pcfm.data import load_ply
    xyz, rgb = load_ply(os.path.join(save, "sample_0.ply"))
    assert xyz.shape == (64, 3)
    assert rgb is not None  # synthetic run has RGB


def test_sample_cli_with_cond(trained_run, tmp_path):
    from pcfm.sample.cli import main
    save = str(tmp_path / "gen_cond")
    main(["--out_dir", trained_run, "--save_dir", save,
          "--num_samples", "1", "--n_points", "32", "--sample_steps", "2",
          "--cond", "1.5"])
    assert os.path.isfile(os.path.join(save, "sample_0.ply"))


def test_eval_cli(trained_run, capsys):
    from pcfm.eval.cli import main
    out = main(["--out_dir", trained_run, "--mode", "both",
                "--max_batches", "1", "--sample_steps", "2",
                "--emd_max_points", "64"])
    for k in ("recon_cd", "recon_emd", "recon_fscore", "gen_cd", "gen_emd"):
        assert k in out and np.isfinite(out[k])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["epoch"] == 1


def test_eval_cli_covers_whole_split(trained_run):
    """drop_last=False + tail padding: every test cloud is evaluated even
    when len(test) % batch_size != 0 (64 % 5 = 4 tail clouds)."""
    from pcfm.eval.cli import main
    out = main(["--out_dir", trained_run, "--mode", "recon",
                "--batch_size", "5", "--sample_steps", "2",
                "--emd_max_points", "64"])
    assert out["n_clouds"] == 64
    assert np.isfinite(out["recon_cd"])


def test_pad_batch_roundtrip():
    from pcfm.eval.cli import pad_batch
    x = jnp.arange(12.0).reshape(3, 4)
    y = pad_batch(x, 5)
    assert y.shape == (5, 4)
    np.testing.assert_array_equal(np.asarray(y[:3]), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(y[3]), np.asarray(x[-1]))
    assert pad_batch(None, 5) is None
    assert pad_batch(x, 3) is x


def test_cloud_metrics_identity():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 128, 3))
    m = cloud_metrics(x, x)
    assert float(jnp.max(m["cd"])) < 1e-6
    assert float(jnp.max(m["emd"])) < 1e-4
    np.testing.assert_allclose(np.asarray(m["fscore"]), 1.0, atol=1e-6)
    agg = aggregate([m])
    assert agg["cd"] < 1e-6


def test_cloud_metrics_emd_subsample():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 600, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 500, 3))
    m = cloud_metrics(x, y, emd_max_points=256, key=key)
    assert np.isfinite(float(m["emd"][0]))


def test_cloud_metrics_streamed_emd_large():
    # > emd_max_points with divisible sizes -> streamed full-cloud EMD
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 1536, 3))
    m_small = cloud_metrics(x, x, emd_max_points=512)
    assert float(m_small["emd"][0]) < 1e-3


def test_recon_without_ema(trained_run):
    """ema_eval=False path: recon uses live params, still finite output."""
    from pcfm.sample.cli import load_run
    from pcfm.train.evaluate import make_recon_fn
    cfg, bundle, state, _ = load_run(trained_run, {"sample_steps": 2})
    recon = make_recon_fn(bundle, use_ema=False)
    pts = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 3))
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 1))
    x = recon(state, pts, rgb, cond, jax.random.PRNGKey(3))
    assert x.shape == (2, 32, cfg.pf_point_dim)
    assert np.isfinite(np.asarray(x)).all()


def test_eval_cli_suite_seed_band(trained_run):
    """--suite_seeds with >1 seed: per-seed rows + mean/min/max band per
    metric (r4 protocol — the 1-NNA spread is the size of typical deltas);
    single seed keeps the scalar output shape."""
    from pcfm.eval.cli import main
    out = main(["--out_dir", trained_run, "--mode", "suite",
                "--max_batches", "1", "--sample_steps", "2",
                "--suite_seeds", "11,22", "--suite_emd"])
    assert out["seeds"] == [11, 22] and len(out["per_seed"]) == 2
    for k in ("nna_cd", "cov_cd", "mmd_cd", "nna_emd"):
        band = out[k]
        assert band["min"] <= band["mean"] <= band["max"]
    # same seed twice -> identical suites (deterministic per-batch fold_in)
    assert out["per_seed"][0] != {} \
        and np.isfinite(out["per_seed"][0]["nna_cd"])
    single = main(["--out_dir", trained_run, "--mode", "suite",
                   "--max_batches", "1", "--sample_steps", "2",
                   "--suite_seeds", "11"])
    assert isinstance(single["nna_cd"], float)
    assert abs(single["nna_cd"] - out["per_seed"][0]["nna_cd"]) < 1e-9
