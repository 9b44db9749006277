"""ROC detector metrics (metrics/roc.py)."""

import numpy as np

import jax.numpy as jnp

from onet_tpu.metrics.roc import fg_score, roc_points, dr_at_far


def _toy():
    rng = np.random.default_rng(0)
    labels = np.zeros((4, 16, 16), np.int32)
    labels[:, 4:8, 4:8] = 1
    score = rng.normal(0, 1, labels.shape).astype(np.float32)
    score += 2.5 * labels  # separable-ish targets
    return jnp.asarray(score), jnp.asarray(labels)


def test_threshold_zero_matches_argmax_convention():
    vt = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8))
                     .astype(np.float32))
    vd = vt + jnp.asarray(np.random.default_rng(2).normal(size=(2, 8, 8))
                          .astype(np.float32))
    s = fg_score(vt, vd, fg_is_down=True)
    np.testing.assert_array_equal(np.asarray(s > 0),
                                  np.asarray(vd > vt))


def test_roc_monotone_and_endpoints():
    score, labels = _toy()
    far, dr, thr = roc_points(score, labels, n=32)
    far, dr = np.asarray(far), np.asarray(dr)
    assert np.all(np.diff(far) <= 1e-6)       # far falls as threshold rises
    assert np.all(np.diff(dr) <= 1e-6)
    assert far[0] > 0.9 and dr[0] > 0.99      # lowest threshold: all fire
    assert far[-1] < 0.05                     # highest: almost none


def test_dr_at_far_meets_budget():
    score, labels = _toy()
    rep = dr_at_far(score, labels, far_targets=(0.1, 0.01))
    for tgt, (far, dr, thr) in rep.items():
        assert far <= tgt + 1e-6
        assert 0.0 <= dr <= 1.0
    assert rep[0.1][1] >= rep[0.01][1]        # looser budget, >= dr


def test_threshold_sweep_by_snr_smoke():
    import jax
    from onet_tpu.models.onet import onet_init
    from onet_tpu.train.sweeps import threshold_sweep_by_snr, per_snr_datasets
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    data = per_snr_datasets(jax.random.key(3), frames_per_level=4,
                            levels=(5,), crop=32)
    rep = threshold_sweep_by_snr(params, bn, data, far_budgets=(0.1,))
    assert 5 in rep and "argmax" in rep[5]
    assert 0.1 in rep[5]["thresh"]
