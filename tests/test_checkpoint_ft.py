"""Fault-tolerance additions: atomic saves, rotation, auto-resume.

(Additive over the reference, which torch.saves in place and restarts only
from an explicitly named file — SURVEY.md section 5.)"""

import os

import numpy as np

import jax

from onet_tpu.core.checkpoint import (
    save_checkpoint, load_checkpoint, latest_checkpoint, rotate_checkpoints)
from onet_tpu.models.onet import onet_init
from onet_tpu.train.simclutter import SimclutterConfig, train
from onet_tpu.data.arrays import ArrayDataset


def _tiny_datasets():
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (8, 32, 32, 1)).astype(np.float32)
    labels = (imgs[..., 0] > 0.8).astype(np.int32)
    ds = ArrayDataset({"imgs": imgs, "labels": labels})
    return ds, ds


def test_atomic_save_leaves_no_tmp(tmp_path):
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, bn, 7)
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")
    p2, b2, ep = load_checkpoint(path, params, bn)
    assert ep == 7


def test_rotation_keeps_newest(tmp_path):
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"ck{i}.npz")
        save_checkpoint(p, params, bn, i)
        os.utime(p, (1000 + i, 1000 + i))
        paths.append(p)
    deleted = rotate_checkpoints(str(tmp_path), keep=2)
    assert sorted(deleted) == sorted(paths[:3])
    assert latest_checkpoint(str(tmp_path)) == paths[4]


def test_driver_resume_continues_epoch_count(tmp_path):
    out = str(tmp_path / "run")
    base = dict(model_name="ft", epoch_nums=4, batch_sz=4, input_sz=32,
                base_channels=8, eval_every=10, out_root=out,
                save_epochs=(), autosave_every=1, autosave_keep=2)
    ds = _tiny_datasets()
    train(SimclutterConfig(**base), datasets=ds, log=False)
    first = latest_checkpoint(out)
    _, _, ep = load_checkpoint(first, *onet_init(jax.random.key(0), 1, base=8))
    assert ep == 3
    # autosave rotation bounded ITS OWN namespace; the final milestone
    # checkpoint is outside it and survives
    import glob
    assert len(glob.glob(os.path.join(out, "ft_autosave_*.npz"))) <= 2
    assert glob.glob(os.path.join(out, "ft_epoch_3_*.npz"))
    # resume with a higher target trains only the remaining epochs
    cfg = SimclutterConfig(**{**base, "epoch_nums": 6, "resume": True})
    _, _, hist = train(cfg, datasets=ds, log=False)
    assert len(hist["loss"]) == 2  # epochs 4 and 5 only
    _, _, ep2 = load_checkpoint(latest_checkpoint(out),
                                *onet_init(jax.random.key(0), 1, base=8))
    assert ep2 == 5


def test_rotation_never_deletes_milestones(tmp_path):
    """Autosave rotation after the final epoch must not rotate away the
    epoch-300-style milestone (VERDICT round-2 weak item 4)."""
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    mile = str(tmp_path / "m_epoch_300_x.npz")
    save_checkpoint(mile, params, bn, 300)
    os.utime(mile, (1000, 1000))  # oldest file in the directory
    for i in range(4):
        p = str(tmp_path / f"m_autosave_{301 + i}_x.npz")
        save_checkpoint(p, params, bn, 301 + i)
        os.utime(p, (2000 + i, 2000 + i))
    deleted = rotate_checkpoints(str(tmp_path), keep=2,
                                 pattern="m_autosave_*.npz")
    assert os.path.exists(mile)
    assert all("autosave" in d for d in deleted)


def test_async_writer_roundtrip_and_rotation(tmp_path):
    """AsyncCheckpointWriter: file lands complete after wait(); rotation
    runs in the writer thread and still spares milestones."""
    from onet_tpu.core.checkpoint import (AsyncCheckpointWriter,
                                          read_checkpoint_meta)

    params, bn = onet_init(jax.random.key(0), 1, base=8)
    w = AsyncCheckpointWriter()
    mile = str(tmp_path / "m_epoch_300_x.npz")
    save_checkpoint(mile, params, bn, 300)
    for i in range(4):
        p = str(tmp_path / f"m_autosave_{i}_x.npz")
        w.save(p, params, bn, i, meta={"arch": "vanilla"},
               rotate=(str(tmp_path), 2, "m_autosave_*.npz"))
        w.wait()
        os.utime(p, (2000 + i, 2000 + i))
    kept = sorted(os.path.basename(f) for f in os.listdir(tmp_path))
    assert "m_epoch_300_x.npz" in kept
    assert sum("autosave" in k for k in kept) == 2
    last = str(tmp_path / "m_autosave_3_x.npz")
    assert read_checkpoint_meta(last) == {"arch": "vanilla"}
    p2, b2, ep = load_checkpoint(last, params, bn)
    assert ep == 3


def test_async_writer_surfaces_io_errors(tmp_path):
    """A failed background write raises from wait(), not silently."""
    import pytest

    from onet_tpu.core.checkpoint import AsyncCheckpointWriter

    params, bn = onet_init(jax.random.key(0), 1, base=8)
    w = AsyncCheckpointWriter()
    # target path is a DIRECTORY -> os.replace fails in the writer thread
    bad = tmp_path / "taken.npz"
    bad.mkdir()
    w.save(str(bad), params, bn, 1)
    with pytest.raises(OSError):
        w.wait()
    # writer is reusable after the error
    good = str(tmp_path / "ok.npz")
    w.save(good, params, bn, 2)
    w.wait()
    assert load_checkpoint(good, params, bn)[2] == 2


def test_optimizer_state_round_trip(tmp_path):
    from onet_tpu.train.optim import adam_init, adam_update

    params, bn = onet_init(jax.random.key(0), 1, base=8)
    opt = adam_init(params)
    grads = jax.tree.map(lambda p: jax.numpy.ones_like(p) * 0.01, params)
    _, opt = adam_update(grads, opt, 1e-3)  # non-trivial moments, count=1
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, bn, 5, opt_state=opt)
    p2, b2, ep, opt2 = load_checkpoint(path, params, bn, opt_template=opt)
    assert ep == 5 and opt2 is not None
    for a, b in zip(jax.tree.leaves(opt), jax.tree.leaves(opt2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # pre-optimizer-state checkpoints stay loadable and flag opt as missing
    old = str(tmp_path / "old.npz")
    save_checkpoint(old, params, bn, 5)
    _, _, _, opt3 = load_checkpoint(old, params, bn, opt_template=opt)
    assert opt3 is None


def test_mismatched_template_fails_with_clear_error(tmp_path):
    """Loading a checkpoint into the wrong model geometry fails AT LOAD
    TIME with an actionable message — not later with a cryptic XLA shape
    error (wrong --base-channels) or a raw KeyError (wrong --arch)."""
    import pytest

    params, bn = onet_init(jax.random.key(0), 1, base=8)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, bn, 1)

    wide, wide_bn = onet_init(jax.random.key(0), 1, base=16)
    with pytest.raises(ValueError, match="base-channels"):
        load_checkpoint(path, wide, wide_bn)

    from onet_tpu.models.swin import swin_onet_init
    sp, ss = swin_onet_init(jax.random.key(0), 1, window=2, embed_dim=12)
    with pytest.raises(KeyError, match="parameter tree"):
        load_checkpoint(path, sp, ss)
