"""Smoke-test the gen-quality hardware harness (scripts/gen_quality_tpu.py)
on CPU at toy scale: train -> eval -> save -> final seed-band protocol,
then resume from the state pickle and extend the run.

The harness is the instrument behind every docs/genq claim and its resume
path has bitten a real run once (r4: a session death at ep100 of run7);
this pins the train/save/resume contract (epoch continuity, history
replay, loud config-mismatch) at test scale.
"""
import importlib.util
import json
import os

import numpy as np
import pytest

_SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                       "gen_quality_tpu.py")

_TOY_ENV = {
    "GENQ_CPU": "1",
    "EPOCHS": "2",
    "EVAL_EVERY": "1",
    "SAVE_EVERY": "1",
    "SIZE": "8",
    "TEST": "4",
    "NPTS": "32",
    "BATCH": "4",
    "BUDGET_S": "100000",
    "NNA_TARGET": "0.0",          # never early-stop at toy scale
    "COV_TARGET": "1.1",
    "FINAL_SEEDS": "5,6",
    "SWEEP_SEEDS": "5,6",
    "GUIDANCE_SWEEP": "",
    "GUIDANCE": "0.0",
    "SAMPLE_STEPS": "2",
    "PF_WIDTH": "32",
    "PF_DEPTH": "2",
    "CTX_DIM": "8",
    "LATENT": "8",
    "GEOM_WARMUP": "0",
    "CTX_RES": "8,4",
    "CTX_CH": "8,8",
    "CTX_BLOCKS": "1,1",
    "RESUME": "",
}


def _run_harness(env, tag):
    """Import the script fresh (env is read at module scope) and run main."""
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        spec = importlib.util.spec_from_file_location(
            f"genq_harness_{tag}", _SCRIPT)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@pytest.fixture(scope="module")
def toy_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("genq"))
    _run_harness({**_TOY_ENV, "OUT": out}, "fresh")
    return out


def test_genq_fresh_run_artifacts(toy_run):
    hist = json.load(open(os.path.join(toy_run, "history.json")))
    assert [r["epoch"] for r in hist] == [1, 2]
    # EVAL_EVERY=1: every row carries the suite metrics
    for r in hist:
        assert np.isfinite(r["nna_cd"]) and np.isfinite(r["loss_point"])
    final = json.load(open(os.path.join(toy_run, "final_suite.json")))
    assert final["protocol"]["seeds"] == [5, 6]
    # repeated-seed band with CD + EMD variants (r4 protocol)
    for k in ("nna_cd", "mmd_cd", "cov_cd", "nna_emd", "mmd_emd"):
        band = final["default"][k]
        assert band["min"] <= band["mean"] <= band["max"]
    assert len(final["default_per_seed"]) == 2
    gen = np.load(os.path.join(toy_run, "gen_final.npy"))
    assert gen.shape == (4, 32, 3) and np.isfinite(gen).all()
    assert os.path.exists(os.path.join(toy_run, "state_latest.pkl"))
    assert os.path.exists(os.path.join(toy_run, "gen_0.ply"))


def test_genq_resume_extends_history(toy_run, tmp_path):
    # copy the finished 2-epoch run and resume it to epoch 3
    import shutil
    out2 = str(tmp_path / "resumed")
    shutil.copytree(toy_run, out2)
    _run_harness({**_TOY_ENV, "OUT": out2, "EPOCHS": "3",
                  "RESUME": os.path.join(out2, "state_latest.pkl")},
                 "resume")
    hist = json.load(open(os.path.join(out2, "history.json")))
    assert [r["epoch"] for r in hist] == [1, 2, 3]
    # epochs 1-2 replayed verbatim from the interrupted run's history
    orig = json.load(open(os.path.join(toy_run, "history.json")))
    assert hist[:2] == orig[:2]
    assert np.isfinite(hist[2]["nna_cd"])


def test_genq_resume_of_finished_run_is_eval_only(toy_run, tmp_path):
    """RESUME with EPOCHS == saved epoch trains nothing and re-runs just
    the final protocol (post-hoc sampler/guidance re-band on a trained
    state) — no state re-save, fresh final_suite.json in the new OUT."""
    out4 = str(tmp_path / "evalonly")
    _run_harness({**_TOY_ENV, "OUT": out4, "FINAL_SEEDS": "9",
                  "SWEEP_SEEDS": "9", "SAMPLE_STEPS": "4",
                  "RECIPES": '[{"guidance": 0.5, "steps": 3, '
                             '"oversample": 2.0}]',
                  "RESUME": os.path.join(toy_run, "state_latest.pkl")},
                 "evalonly")
    # nothing trained: no history rows, no state pickle written to OUT
    assert not os.path.exists(os.path.join(out4, "state_latest.pkl"))
    final = json.load(open(os.path.join(out4, "final_suite.json")))
    assert final["protocol"]["seeds"] == [9]
    assert final["protocol"]["sample_steps"] == 4
    assert np.isfinite(final["default"]["nna_cd"]["mean"])
    # r4 recipe sweep: every recipe banded with cd+emd, best-by-EMD kept
    sweep = json.load(open(os.path.join(out4, "guidance_sweep.json")))
    assert sweep[0]["recipe"] == {"guidance": 0.5, "steps": 3,
                                  "oversample": 2.0}
    assert np.isfinite(sweep[0]["agg"]["nna_emd"]["mean"])
    assert final["best_emd_recipe"] == sweep[0]["recipe"]


def test_genq_resume_rejects_config_mismatch(toy_run, tmp_path):
    out3 = str(tmp_path / "badresume")
    with pytest.raises(ValueError, match="resume shape mismatch"):
        _run_harness({**_TOY_ENV, "OUT": out3, "PF_WIDTH": "48",
                      "RESUME": os.path.join(toy_run, "state_latest.pkl")},
                     "badcfg")
