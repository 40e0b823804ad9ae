"""Training-DYNAMICS parity gate: the reference recipe (torch mirrors) and
pcfm train on IDENTICAL batches; late-training losses and recon CD must
agree statistically (RNG engines differ, so the gate is tolerance-based).

The full 80-epoch run is recorded in docs/dyn_parity.json
(scripts/dyn_parity.py):
  rel_diff loss_point 2.2%, loss_latent 10.5%, recon CD 29.5%
  (pcfm CD 0.333 vs torch 0.472 — pcfm better).
This test runs a shortened 40-epoch version with proportionally looser
gates so the suite stays fast.
"""
import pytest


@pytest.mark.slow
def test_training_dynamics_match_reference_recipe():
    from scripts.dyn_parity import run
    out = run(epochs=40, size=32, n_points=128, batch=8, latent=32,
              enc_width=32, pf_width=64, lf_width=64, emb=32,
              sample_steps=8, verbose=False)
    # late-training FM losses agree
    assert out["rel_diff_lp_last5"] < 0.15, out
    assert out["rel_diff_ll_last5"] < 0.35, out
    # recon quality the same order; both actually reconstruct
    cd_t, cd_p = out["torch"]["recon_cd"], out["pcfm"]["recon_cd"]
    assert cd_p < 3.0 and cd_t < 3.0, (cd_t, cd_p)
    assert max(cd_p, cd_t) / max(1e-9, min(cd_p, cd_t)) < 2.5, (cd_t, cd_p)


@pytest.mark.slow
def test_hybrid_training_dynamics_match_reference_recipe():
    """Same gate for the FLAGSHIP backbone: HybridMLP (PVConv ContextNet)
    under the reference recipe vs the torch hybrid mirror.  The full
    80-epoch run is recorded in docs/dyn_parity_hybrid.json."""
    from scripts.dyn_parity import run
    out = run(epochs=30, size=32, n_points=128, batch=8, latent=32,
              enc_width=32, pf_width=64, lf_width=64, emb=32,
              sample_steps=8, verbose=False, backbone="hybrid")
    assert out["rel_diff_lp_last5"] < 0.2, out
    assert out["rel_diff_ll_last5"] < 0.35, out
    cd_t, cd_p = out["torch"]["recon_cd"], out["pcfm"]["recon_cd"]
    assert cd_p < 3.0 and cd_t < 3.0, (cd_t, cd_p)
    assert max(cd_p, cd_t) / max(1e-9, min(cd_p, cd_t)) < 2.5, (cd_t, cd_p)
