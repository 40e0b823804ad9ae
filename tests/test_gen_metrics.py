"""Generative-suite metrics (MMD / COV / 1-NNA, pcfm/eval/metrics.py)."""
import numpy as np
import jax
import pytest

from pcfm.eval.metrics import cd_matrix, generative_metrics


def _clouds(key, g, n=64, shift=0.0):
    x = jax.random.normal(key, (g, n, 3))
    return np.asarray(x) + shift


def test_cd_matrix_identity_diag():
    a = _clouds(jax.random.PRNGKey(0), 5)
    d = cd_matrix(a, a, pair_block=2)
    assert d.shape == (5, 5)
    assert np.allclose(np.diag(d), 0.0, atol=1e-5)
    assert (d + 1e-7 >= 0).all()
    # symmetric chamfer => symmetric matrix
    assert np.allclose(d, d.T, atol=1e-4)


def test_identical_sets_are_indistinguishable():
    a = _clouds(jax.random.PRNGKey(1), 8)
    m = generative_metrics(a.copy(), a.copy(), pair_block=4)
    assert m["mmd_cd"] < 1e-5          # every ref has an exact match
    assert m["cov_cd"] == 1.0          # each ref covered by its twin
    # with exact duplicates the cross distance is 0 <= self distance,
    # so the 1-NN classifier cannot beat chance
    assert m["nna_cd"] <= 0.5


def test_shifted_set_is_detected():
    key = jax.random.PRNGKey(2)
    ref = _clouds(key, 8)
    gen = _clouds(jax.random.PRNGKey(3), 8, shift=5.0)  # far-off mode
    m = generative_metrics(gen, ref, pair_block=4)
    assert m["mmd_cd"] > 1.0           # no gen cloud near any ref
    assert m["nna_cd"] > 0.9           # trivially separable
    # binomial SE over 16 LOO classifications: sqrt(p(1-p)/16)
    p = m["nna_cd"]
    assert m["nna_cd_se"] == pytest.approx(
        np.sqrt(max(p * (1 - p), 1e-12) / 16), abs=1e-9)
    assert m["nna_cd_se"] < 0.13


def test_eval_cli_suite_mode(tmp_path):
    from pcfm.config import Config
    from pcfm.train.loop import train
    out = str(tmp_path / "run")
    cfg = Config(dataset_type="synthetic", pf_backbone="mlp", latent_dim=16,
                 enc_width=16, enc_depth=4, pf_width=32, pf_depth=3,
                 pf_emb_dim=16, lf_width=32, lf_depth=3, lf_emb_dim=16,
                 warmup_steps=0, amp=False, epochs=1, save_every=1,
                 batch_size=4, tr_max_sample_points=32,
                 te_max_sample_points=32, num_workers=0, out_dir=out,
                 vis_count=1, geom_warmup_epochs=0, sample_steps=2)
    train(cfg, verbose=False)
    from pcfm.eval.cli import main
    res = main(["--out_dir", out, "--mode", "suite", "--suite_size", "8"])
    assert res["n_clouds"] == 8
    for k in ("mmd_cd", "cov_cd", "nna_cd"):
        assert np.isfinite(res[k])
    assert 0.0 <= res["cov_cd"] <= 1.0 and 0.0 <= res["nna_cd"] <= 1.0


@pytest.mark.parametrize("nb", [48, 32])
def test_cd_matrix_matches_per_pair(nb):
    """The batched lax.map matrix (one device call, r4) must equal the
    per-pair computation — rectangular sets + a gb not divisible by
    pair_block exercise the padding path; nb != 48 pins the batched path
    for clouds of DIFFERENT point counts (N != M), which cd_matrix's
    (Ga,N,3) vs (Gb,M,3) contract permits (r4 ADVICE)."""
    from pcfm.ops.chamfer import chamfer_distance
    from pcfm.ops.emd import earth_mover_distance
    import jax.numpy as jnp
    a = _clouds(jax.random.PRNGKey(6), 4, n=48)
    b = _clouds(jax.random.PRNGKey(7), 5, n=nb)   # 5 % pair_block(3) != 0
    for metric in ("cd", "emd"):
        got = cd_matrix(a, b, pair_block=3, metric=metric)
        for i in range(4):
            for j in range(5):
                x = jnp.asarray(a[i:i + 1], jnp.float32)
                y = jnp.asarray(b[j:j + 1], jnp.float32)
                if metric == "cd":
                    d1, d2, _, _ = chamfer_distance(x, y)
                    want = float(jnp.mean(d1) + jnp.mean(d2))
                else:
                    want = float(earth_mover_distance(x, y)[0])
                assert got[i, j] == pytest.approx(want, rel=2e-5, abs=2e-5)


def test_suite_emd_metric():
    """metrics=("cd","emd"): identical sets indistinguishable under both;
    a shifted set detected under both."""
    a = _clouds(jax.random.PRNGKey(4), 6, n=32)
    m = generative_metrics(a.copy(), a.copy(), pair_block=3,
                           metrics=("cd", "emd"))
    assert m["mmd_cd"] < 1e-5 and m["mmd_emd"] < 1e-3
    assert m["cov_cd"] == m["cov_emd"] == 1.0
    far = _clouds(jax.random.PRNGKey(5), 6, n=32, shift=5.0)
    m2 = generative_metrics(far, a, pair_block=3, metrics=("emd",))
    assert m2["mmd_emd"] > 1.0 and m2["nna_emd"] > 0.9
