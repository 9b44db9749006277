"""Preemption-safe training: SIGTERM -> drain step -> checkpoint -> clean
exit -> resume. TPU VMs are preemptible and batch schedulers send SIGTERM;
the reference loses the whole run (its only checkpoints are epoch 300 and
the final epoch, Train_Onet_on_simclutter_20250407.py:255-267). Here the
driver checkpoints into the autosave namespace and `resume=True` redoes
the interrupted epoch in full (exactness over wall time).

The SIGTERM half runs in a subprocess (signal handlers are process-global
and the kill must hit a live training loop); resume runs in-process.
"""

import glob
import os
import signal
import subprocess
import sys
import time

import numpy as np

def test_zy3_sigterm_in_process(tmp_path, monkeypatch):
    """The zy3 driver drains SIGTERM too: the signal lands mid-run (sent
    to ourselves from the per-epoch lr hook — delivered at the next
    bytecode boundary in this same main thread), the driver checkpoints
    with the interrupted epoch NOT recorded, and restart_from redoes it."""
    import jax

    import onet_tpu.train.zy3 as Z
    from onet_tpu.data.arrays import ArrayDataset

    rng = np.random.default_rng(1)
    imgs = rng.uniform(0, 1, (6, 32, 32, 3)).astype(np.float32)
    labels = (imgs.mean(-1) > 0.6).astype(np.int32)
    ds = ArrayDataset({"imgs": imgs, "labels": labels})

    real_lr = Z.cosine_warm_restarts

    def lr_hook(base, epoch, **kw):
        if epoch == 2:
            os.kill(os.getpid(), signal.SIGTERM)
        return real_lr(base, epoch, **kw)

    monkeypatch.setattr(Z, "cosine_warm_restarts", lr_hook)
    cfg = Z.Zy3Config(epoch_nums=50, batch_sz=3, base_channels=8,
                      in_channels=3, out_root=str(tmp_path),
                      model_name="z", save_epochs=())
    _, _, hist = Z.train(cfg, ds, ds, log=False)
    assert hist["preempted"] == 2
    assert len(hist["loss"]) == 2            # epochs 0 and 1 completed
    saved = glob.glob(os.path.join(str(tmp_path), "z_preempt1_*.npz"))
    assert saved, "zy3 preemption wrote no checkpoint"
    assert int(np.load(saved[0])["__epoch__"]) == 1

    # restart redoes epoch 2 and finishes
    monkeypatch.setattr(Z, "cosine_warm_restarts", real_lr)
    cfg2 = Z.Zy3Config(epoch_nums=4, batch_sz=3, base_channels=8,
                       in_channels=3, out_root=str(tmp_path),
                       model_name="z", save_epochs=(),
                       restart_from=saved[0])
    _, _, hist2 = Z.train(cfg2, ds, ds, log=False)
    assert "preempted" not in hist2
    assert len(hist2["loss"]) == 2           # epochs 2 and 3


def test_baseline_loop_sigterm_in_process(tmp_path, monkeypatch):
    """The shared baseline trainer (infoseg/iic) drains SIGTERM too."""
    import jax

    import onet_tpu.train.baseline as B
    from onet_tpu.data.arrays import ArrayDataset
    from onet_tpu.train.infoseg import (
        InfoSegConfig, make_infoseg_eval_step, make_infoseg_train_step)
    from onet_tpu.models.infoseg import infoseg_init

    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 1, (6, 32, 32, 1)).astype(np.float32)
    labels = (imgs[..., 0] > 0.8).astype(np.int32)
    ds = ArrayDataset({"imgs": imgs, "labels": labels})

    real_lr = B.step_decay

    def lr_hook(base, epoch, **kw):
        if epoch == 2:
            os.kill(os.getpid(), signal.SIGTERM)
        return real_lr(base, epoch, **kw)

    monkeypatch.setattr(B, "step_decay", lr_hook)
    cfg = InfoSegConfig(epoch_nums=50, batch_sz=3, out_root=str(tmp_path),
                        model_name="isg", eval_every=100)
    params, state = infoseg_init(jax.random.key(0), 1, base=8)
    from onet_tpu.train.optim import adam_init
    _, _, hist = B.baseline_training_loop(
        cfg, params, state, adam_init(params),
        make_infoseg_train_step(), make_infoseg_eval_step(),
        ds, ds, jax.random.key(1), log=False)
    assert hist["preempted"] == 2
    assert glob.glob(os.path.join(str(tmp_path), "isg_preempt1_*.npz"))


def test_sigterm_checkpoints_and_resume(tmp_path):
    out_root = str(tmp_path / "out")
    marker = str(tmp_path / "ready")
    # the worker writes the marker after epoch 2 then trains "forever";
    # the parent SIGTERMs it and expects a clean exit + autosave
    code = f"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from onet_tpu.data.arrays import ArrayDataset
from onet_tpu.train.simclutter import SimclutterConfig, train

rng = np.random.default_rng(0)
imgs = rng.uniform(0, 1, (8, 32, 32, 1)).astype(np.float32)
labels = (imgs[..., 0] > 0.8).astype(np.int32)
ds = ArrayDataset({{"imgs": imgs, "labels": labels}})
cfg = SimclutterConfig(epoch_nums=100000, batch_sz=4, base_channels=8,
                       out_root={out_root!r}, model_name="pre",
                       eval_every=1, save_epochs=())

def cb(epoch, loss, metrics):
    if epoch >= 2 and not os.path.exists({marker!r}):
        open({marker!r}, "w").write(str(epoch))

_, _, hist = train(cfg, datasets=(ds, ds), log=False, progress_cb=cb)
print("PREEMPTED_AT", hist.get("preempted"))
sys.exit(0)
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True, env=env)
    try:
        deadline = time.time() + 300
        while not os.path.exists(marker):
            assert proc.poll() is None, proc.communicate()[1][-2000:]
            assert time.time() < deadline, "worker never reached epoch 2"
            time.sleep(0.2)
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, err[-2000:]
    assert "PREEMPTED_AT" in out and "None" not in out.split()[-1], out

    saved = glob.glob(os.path.join(out_root, "pre_autosave_*.npz"))
    assert saved, "preemption wrote no autosave checkpoint"

    # resume in-process: picks up the autosave, redoes the interrupted
    # epoch, runs to completion
    from onet_tpu.core.checkpoint import read_checkpoint_meta
    from onet_tpu.data.arrays import ArrayDataset
    from onet_tpu.train.simclutter import SimclutterConfig, train

    meta = read_checkpoint_meta(saved[0])
    assert meta.get("arch", "vanilla") == "vanilla"

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (8, 32, 32, 1)).astype(np.float32)
    labels = (imgs[..., 0] > 0.8).astype(np.int32)
    ds = ArrayDataset({"imgs": imgs, "labels": labels})
    saved_epoch = int(np.load(saved[0])["__epoch__"])
    cfg = SimclutterConfig(epoch_nums=saved_epoch + 3, batch_sz=4,
                           base_channels=8, out_root=out_root,
                           model_name="pre", eval_every=100,
                           save_epochs=(), resume=True)
    _, _, hist = train(cfg, datasets=(ds, ds), log=False)
    # resume started after the recorded epoch and trained the remainder
    assert len(hist["loss"]) == 2
    assert "preempted" not in hist

def test_guard_restored_when_trainer_raises(tmp_path, monkeypatch):
    """An exception escaping the epoch loop must still restore the
    previous SIGTERM handler (try/finally) — otherwise long-lived
    in-process callers (sweep loops, test suites) keep a dead guard's
    flag-setter installed. Advisor round-3 finding."""
    import jax
    import pytest

    import onet_tpu.train.zy3 as Z
    from onet_tpu.data.arrays import ArrayDataset

    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    labels = (imgs.mean(-1) > 0.6).astype(np.int32)
    ds = ArrayDataset({"imgs": imgs, "labels": labels})

    def boom(base, epoch, **kw):
        raise RuntimeError("mid-loop failure")

    monkeypatch.setattr(Z, "cosine_warm_restarts", boom)
    before = signal.getsignal(signal.SIGTERM)
    cfg = Z.Zy3Config(epoch_nums=3, batch_sz=2, base_channels=8,
                      in_channels=3, out_root=str(tmp_path),
                      model_name="zboom", save_epochs=())
    with pytest.raises(RuntimeError, match="mid-loop failure"):
        Z.train(cfg, ds, ds, log=False)
    assert signal.getsignal(signal.SIGTERM) is before
