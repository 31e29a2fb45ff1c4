"""Host-side curriculum (reference train/train_HOPE_sac.py:23-97).

``SceneChoose``: uniform over the 4 scene classes for the first 200 episodes,
then 50% worst-performer sampling weighted by target-shortfall.
``DlpCaseChoose``: per-case failure-rate-weighted sampling over the 248 DLP
cases.  Pure numpy — these run between jitted device steps.
"""
from __future__ import annotations

import numpy as np

LEVELS = ["Normal", "Complex", "Extrem", "dlp"]
TARGET_SUCCESS = np.array([0.95, 0.95, 0.90, 0.99])


class SceneChoose:
    def __init__(self, history_horizon: int = 200, rng=None):
        self.rng = rng or np.random.default_rng(0)
        self.success_record = {i: [] for i in range(len(LEVELS))}
        self.scene_record: list[int] = []
        self.history_horizon = history_horizon

    def choose_case(self) -> int:
        if len(self.scene_record) < self.history_horizon or self.rng.random() <= 0.5:
            chosen = self._uniform()
        else:
            chosen = self._worst()
        self.scene_record.append(chosen)
        return chosen

    def choose_batch(self, n: int) -> np.ndarray:
        return np.array([self.choose_case() for _ in range(n)])

    def sample_levels(self, n: int) -> np.ndarray:
        """Draw n levels for a reset queue WITHOUT recording them as started
        episodes (queue entries may never be consumed — the chunked trainer
        records an episode only when its done-log confirms it ran)."""
        rec = list(self.scene_record)
        out = np.empty(n, np.int64)
        for i in range(n):
            if len(rec) < self.history_horizon or self.rng.random() <= 0.5:
                counts = np.zeros(len(LEVELS))
                for s in rec[-self.history_horizon:]:
                    counts[s] += 1
                c = int(np.argmin(counts))
            else:
                c = self._worst()
            rec.append(c)
            out[i] = c
        return out

    def record_episode(self, level: int, success: int):
        """Log one completed episode (chunked-trainer path)."""
        self.scene_record.append(int(level))
        self.success_record[int(level)].append(int(success))

    def update_success_record(self, success: int, scene_id: int | None = None):
        sid = self.scene_record[-1] if scene_id is None else scene_id
        self.success_record[sid].append(int(success))

    def _uniform(self) -> int:
        counts = np.zeros(len(LEVELS))
        for s in self.scene_record[-self.history_horizon:]:
            counts[s] += 1
        return int(np.argmin(counts))

    def _worst(self) -> int:
        rates = []
        for i in range(len(LEVELS)):
            rec = self.success_record[i][-250:]
            rates.append(np.sum(rec) / len(rec) if rec else 0.0)
        fail = np.clip(TARGET_SUCCESS - np.array(rates), 0.01, 1.0)
        fail = fail / fail.sum()
        return int(self.rng.choice(len(LEVELS), p=fail))

    def window_counts(self, window: int = 100) -> np.ndarray:
        """Episodes recorded per level in the recent window — the best-ckpt
        gate requires a minimum so a lucky tiny window (e.g. right after a
        resume reset the histories) can't set an unbeatable bar."""
        return np.array([
            len(self.success_record[i][-window:]) for i in range(len(LEVELS))
        ])

    def recent_success(self, window: int = 100) -> np.ndarray:
        out = []
        for i in range(len(LEVELS)):
            rec = self.success_record[i][-window:]
            out.append(np.mean(rec) if rec else 0.0)
        return np.array(out)

    # ------------------------------------------------------- resume support
    # Only bounded tails of the records are ever inspected (_uniform: last
    # 200, _worst: last 250, recent_success: last 100), so checkpoints carry
    # tails + the original length — the reconstructed head padding is never
    # read, it only preserves the "first N episodes" length conditions.

    def get_state(self) -> dict:
        return {
            "scene_len": len(self.scene_record),
            "scene_tail": self.scene_record[-250:],
            "success": {i: rec[-250:] for i, rec in self.success_record.items()},
            "rng": self.rng.bit_generator.state,
        }

    def set_state(self, st: dict):
        tail = list(st["scene_tail"])
        pad = min(int(st["scene_len"]), 1000) - len(tail)
        self.scene_record = [0] * max(0, pad) + tail
        self.success_record = {int(i): list(v) for i, v in st["success"].items()}
        self.rng.bit_generator.state = st["rng"]


class DlpCaseChoose:
    def __init__(self, n_cases: int = 248, rng=None):
        self.rng = rng or np.random.default_rng(1)
        self.n_cases = n_cases
        self.case_record: list[int] = []
        self.case_success: dict[int, list[int]] = {i: [] for i in range(n_cases)}
        self.horizon = 500

    def choose_case(self) -> int:
        if self.rng.random() < 0.2 or len(self.case_record) < self.horizon:
            return int(self.rng.integers(0, self.n_cases))
        rates = np.array([
            (np.mean(self.case_success[i][-10:]) if len(self.case_success[i]) > 1 else 0.0)
            for i in range(self.n_cases)
        ])
        fail = np.clip(1.0 - rates, 0.005, 1.0)
        fail = fail / fail.sum()
        return int(self.rng.choice(self.n_cases, p=fail))

    def update_success_record(self, success: int, case_id: int):
        self.case_success[case_id].append(int(success))
        self.case_record.append(case_id)

    def get_state(self) -> dict:
        """Bounded-tail snapshot (choose_case/slot_weights read only the last
        10 results per case and the record length vs the 500 horizon)."""
        return {
            "record_len": min(len(self.case_record), 1000),
            "success": {i: rec[-10:] for i, rec in self.case_success.items()
                        if rec},
            "rng": self.rng.bit_generator.state,
        }

    def set_state(self, st: dict):
        self.case_record = [0] * int(st["record_len"])
        self.case_success = {i: [] for i in range(self.n_cases)}
        for i, v in st["success"].items():
            self.case_success[int(i)] = list(v)
        self.rng.bit_generator.state = st["rng"]

    def slot_weights(self, case_ids) -> np.ndarray:
        """Failure-rate sampling weights over the pool's current DLP slots.

        Mirrors the reference's per-episode case re-pick
        (train_HOPE_sac.py:70-97: failure rate of the last 10 attempts, 20%
        uniform exploration) but applied to the slot axis of the device-side
        scene pool, so every reset-queue fill — not just pool refreshes —
        oversamples the currently-failing DLP cases.
        """
        rates = np.array([
            (np.mean(self.case_success[c][-10:])
             if len(self.case_success[c]) > 1 else 0.0)
            for c in np.asarray(case_ids)
        ])
        fail = np.clip(1.0 - rates, 0.005, 1.0)
        fail = fail / fail.sum()
        uniform = np.full(len(fail), 1.0 / len(fail))
        return 0.8 * fail + 0.2 * uniform
