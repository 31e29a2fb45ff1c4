"""Full-fidelity kill-and-resume: a run stopped at chunk 3 and resumed must
reproduce the uninterrupted run's chunk stream exactly (CPU kernels are
bitwise-deterministic; SURVEY §5's checkpoint spec: params/opt-state/normalizer
stats/RNG keys + curriculum state)."""
import json
import os

import numpy as np


def _run_sac(argv):
    from hope_tpu.train.train_sac import main

    main(argv)


def _metrics(log_dir, step):
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if d.get("step") == step:
                return d
    raise AssertionError(f"no metrics line for step {step} in {log_dir}")


def test_kill_and_resume_reproduces_run(tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    b2 = str(tmp_path / "b2")
    common = ["--smoke", "--no-tensorboard", "--save-every", "0",
              "--seed", "7"]

    # uninterrupted 6-chunk run
    _run_sac(common + ["--max-chunks", "6", "--log-dir", a])
    # killed at chunk 3 (final save is full-fidelity), resumed to chunk 6
    _run_sac(common + ["--max-chunks", "3", "--log-dir", b])
    _run_sac(common + ["--max-chunks", "6", "--log-dir", b2,
                       "--resume", os.path.join(b, "ckpt_full")])

    ma = _metrics(a, 5)
    mb = _metrics(b2, 5)
    for k in ("episodes", "steps", "reward", "alpha",
              "success/Normal", "success/Complex"):
        assert k in ma, (k, ma)
        np.testing.assert_allclose(ma[k], mb[k], rtol=0, atol=0,
                                   err_msg=f"divergence in {k}")

    # counters in the final checkpoints agree
    ha = json.load(open(os.path.join(a, "ckpt_full", "host_6.json")))
    hb = json.load(open(os.path.join(b2, "ckpt_full", "host_6.json")))
    for k in ("episodes_done", "total_steps", "n_chunk"):
        assert ha["counters"][k] == hb["counters"][k], k
    np.testing.assert_allclose(ha["counters"]["reward_hist"],
                               hb["counters"]["reward_hist"])
    # curriculum chooser rng states advanced identically
    assert (ha["scene_chooser"]["rng"]["state"]
            == hb["scene_chooser"]["rng"]["state"])
