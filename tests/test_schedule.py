"""LR schedule parity with reference lrfn (neural_network.py:109-125)."""

import numpy as np

from anime_recommendations_tpu.train.schedule import lr_for_epoch


def reference_lrfn(epoch, start_lr, min_lr, max_lr, rampup, sustain, decay):
    if epoch < rampup:
        return (max_lr - start_lr) / rampup * epoch + start_lr
    elif epoch < rampup + sustain:
        return max_lr
    else:
        return (max_lr - min_lr) * decay ** (epoch - rampup - sustain) + min_lr


def test_matches_reference_formula():
    for epoch in range(30):
        ours = lr_for_epoch(epoch, 1e-5, 5e-5, 1e-5, 5, 0, 0.8)
        ref = reference_lrfn(epoch, 1e-5, 1e-5, 5e-5, 5, 0, 0.8)
        np.testing.assert_allclose(ours, ref, rtol=0)


def test_golden_epoch14_lr():
    # anime_nn_history.csv row 14 / README.md:88 — lr at the best epoch.
    assert abs(lr_for_epoch(14) - 1.5368709e-05) < 1e-12


def test_sustain_plateau():
    vals = [lr_for_epoch(e, 1e-5, 5e-5, 1e-5, 3, 4, 0.5) for e in range(10)]
    assert vals[3] == vals[4] == vals[5] == vals[6] == 5e-5
    # First decay epoch has exponent 0 -> still max_lr (reference formula).
    assert vals[7] == 5e-5
    assert vals[8] < 5e-5


def test_ramp_is_linear_from_start_lr():
    assert lr_for_epoch(0) == 1e-5
    diffs = np.diff([lr_for_epoch(e) for e in range(5)])
    np.testing.assert_allclose(diffs, diffs[0])
