"""Curriculum choosers (reference train/train_HOPE_sac.py:23-97)."""
import numpy as np

from hope_tpu.train.curriculum import LEVELS, TARGET_SUCCESS, DlpCaseChoose, SceneChoose


def test_uniform_phase_balances_levels():
    sc = SceneChoose(rng=np.random.default_rng(0))
    picks = [sc.choose_case() for _ in range(199)]
    # uniform phase = argmin of recent counts -> round-robin-ish coverage
    counts = np.bincount(picks, minlength=4)
    assert counts.min() >= 199 // 4 - 1


def test_worst_performer_oversampled_after_history():
    sc = SceneChoose(history_horizon=10, rng=np.random.default_rng(0))
    # level 2 (Extrem) always fails, others always succeed
    for _ in range(100):
        lvl = sc.choose_case()
        sc.update_success_record(int(lvl != 2))
    picks = np.array([sc.choose_case() for _ in range(400)])
    counts = np.bincount(picks, minlength=4)
    assert counts[2] == counts.max()
    # shortfall weighting: failing level picked far above uniform
    assert counts[2] > 400 / 4


def test_record_episode_feeds_success_rates():
    sc = SceneChoose(rng=np.random.default_rng(0))
    for _ in range(20):
        sc.record_episode(0, 1)
        sc.record_episode(3, 0)
    sr = sc.recent_success()
    assert sr[0] == 1.0 and sr[3] == 0.0


def test_sample_levels_does_not_record():
    sc = SceneChoose(rng=np.random.default_rng(0))
    out = sc.sample_levels(50)
    assert out.shape == (50,)
    assert set(out) <= set(range(len(LEVELS)))
    assert len(sc.scene_record) == 0  # queue sampling leaves history untouched


def test_dlp_case_choose_weights_failures():
    dc = DlpCaseChoose(n_cases=8, rng=np.random.default_rng(0))
    dc.horizon = 10
    # case 0 always fails, all others always succeed
    for i in range(200):
        c = i % 8
        dc.update_success_record(int(c != 0), c)
    picks = np.array([dc.choose_case() for _ in range(500)])
    counts = np.bincount(picks, minlength=8)
    assert counts[0] == counts.max()


def test_targets_match_reference():
    np.testing.assert_allclose(TARGET_SUCCESS, [0.95, 0.95, 0.90, 0.99])


def test_slot_weights_oversample_failing_cases():
    ch = DlpCaseChoose(n_cases=10, rng=np.random.default_rng(3))
    # case 0 always fails, case 1 always succeeds; others unseen
    for _ in range(12):
        ch.update_success_record(0, case_id=0)
        ch.update_success_record(1, case_id=1)
    case_ids = np.arange(10)
    w = ch.slot_weights(case_ids)
    assert w.shape == (10,)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)
    assert w[0] > w[1]                     # failing case oversampled
    assert (w > 0).all()                   # uniform floor keeps everything live
    # repeated case ids get the same weight
    w2 = ch.slot_weights(np.array([0, 0, 1]))
    np.testing.assert_allclose(w2[0], w2[1])


def test_reset_queue_sampler_reweights_dlp_slots():
    from hope_tpu.train.train_sac import ResetQueueSampler

    class FakePool:
        n_levels = 4
        per_level = 8
        dlp_case_ids = np.arange(8)

        def flat_index(self, levels, slots):
            return levels * self.per_level + slots

    ch = DlpCaseChoose(n_cases=8, rng=np.random.default_rng(0))
    for _ in range(12):
        ch.update_success_record(0, case_id=3)   # case 3 always fails
        for c in range(8):
            if c != 3:
                ch.update_success_record(1, case_id=c)
    sc = SceneChoose(rng=np.random.default_rng(1))
    # saturate history so sample_levels draws all levels
    for lv in range(4):
        for _ in range(100):
            sc.record_episode(lv, 1)
    s = ResetQueueSampler(sc, FakePool(), np.random.default_rng(2),
                          fill=4096, dlp_chooser=ch)
    flat = s.sample(4096)
    dlp = flat[(flat >= 3 * 8) & (flat < 4 * 8)] - 3 * 8
    assert len(dlp) > 100
    counts = np.bincount(dlp, minlength=8)
    # failing case 3 drawn far more often than any passing case
    assert counts[3] > 2 * counts[np.arange(8) != 3].max()
