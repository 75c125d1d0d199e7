"""Metrics tracker bookkeeping tests (reference semantics)."""

import numpy as np

from soccerplayershapepose_tpu.metrics import MetricsTracker, EvalMetricsTracker


def test_epoch_means_and_divisors():
    t = MetricsTracker(losses_to_track=["joints2D"],
                       metrics_to_track=["pves", "mpjpes", "joints2D_l2es"])
    # two batches of 2 and 3 samples
    t.update_per_batch("train", loss=1.0, task_losses={"joints2D": 0.5},
                       metric_sums={"pves": 2 * 6890 * 0.01,
                                    "mpjpes": 2 * 14 * 0.1,
                                    "joints2D_l2es": 2 * 17 * 3.0},
                       num_samples=2)
    t.update_per_batch("train", loss=2.0, task_losses={"joints2D": 1.0},
                       metric_sums={"pves": 3 * 6890 * 0.01,
                                    "mpjpes": 3 * 14 * 0.1,
                                    "joints2D_l2es": 3 * 17 * 3.0},
                       num_samples=3)
    t.update_per_batch("val", loss=4.0, task_losses={"joints2D": 2.0},
                       metric_sums={"pves": 6890 * 0.02,
                                    "mpjpes": 14 * 0.2,
                                    "joints2D_l2es": 17 * 6.0},
                       num_samples=1)
    t.update_per_epoch()

    # weighted loss mean: (1*2 + 2*3)/5
    assert abs(t.history["train_losses"][-1] - 1.6) < 1e-9
    assert abs(t.history["train_pves"][-1] - 0.01) < 1e-9
    assert abs(t.history["train_mpjpes"][-1] - 0.1) < 1e-9
    assert abs(t.history["train_joints2D_l2es"][-1] - 3.0) < 1e-9
    assert abs(t.history["val_pves"][-1] - 0.02) < 1e-9


def test_save_rule_all_metrics_must_improve():
    t = MetricsTracker([], ["pves", "mpjpes"])
    t.update_per_batch("val", 0.0, {}, {"pves": 6890 * 1.0,
                                        "mpjpes": 14 * 1.0}, 1)
    t.update_per_epoch()
    best = {"pves": np.inf, "mpjpes": np.inf}
    assert t.determine_save_model_weights_this_epoch(["pves", "mpjpes"], best)

    best = {"pves": 1.0, "mpjpes": 1.0}   # ties still save (rule is >)
    assert t.determine_save_model_weights_this_epoch(["pves", "mpjpes"], best)

    t.update_per_batch("val", 0.0, {}, {"pves": 6890 * 0.5,
                                        "mpjpes": 14 * 2.0}, 1)
    t.update_per_epoch()
    # pves improved but mpjpes regressed → no save
    assert not t.determine_save_model_weights_this_epoch(
        ["pves", "mpjpes"], {"pves": 1.0, "mpjpes": 1.0})


def test_history_save_load(tmp_path):
    p = str(tmp_path / "logs.pkl")
    t = MetricsTracker([], ["pves"], log_path=p)
    for v in (1.0, 0.5, 0.25):
        t.update_per_batch("val", 0.0, {}, {"pves": 6890 * v}, 1)
        t.update_per_epoch()
    t2 = MetricsTracker([], ["pves"])
    t2.load(p, current_epoch=2)
    assert len(t2.history["val_pves"]) == 2
    assert abs(t2.history["val_pves"][1] - 0.5) < 1e-9
    # missing keys fill with zeros
    t3 = MetricsTracker([], ["pves", "mpjpes"])
    t3.load(p, current_epoch=2)
    assert t3.history["val_mpjpes"] == [0.0, 0.0]


def test_eval_tracker_per_sample():
    t = EvalMetricsTracker(["pves"])
    t.update_per_batch({"pves": np.array([6890 * 0.1, 6890 * 0.3])})
    t.update_per_batch({"pves": np.array([6890 * 0.2])})
    out = t.final_metrics()
    assert abs(out["pves"] - 0.2) < 1e-9
