"""Numerical parity of the JAX Onet against the torch oracle.

Checks, at small width (base=8) and 32x32 inputs:
  * eval-mode forward: V logits, probabilities, predicted masks,
  * train-mode forward: branch-grouped BN == torch's two sequential passes,
  * BN running-statistics update (the closed-form double-EMA),
  * JSD loss value and parameter gradients.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from onet_tpu.models import onet_init, onet_forward, compute_loss, predict_label
from tests.torch_mirror import MirrorOnet, t_loss

BASE = 8
HW = 32
B = 3


def copy_params_from_torch(tnet, params, state, share=True):
    """Load the torch mirror's weights into the JAX pytrees."""

    def j(t):
        # jnp.asarray on CPU may alias torch's buffer zero-copy; torch
        # mutates running stats in place, so always deep-copy here.
        return jnp.asarray(np.array(t.detach().numpy(), copy=True))

    def conv_w(m):
        return j(m.weight).transpose(2, 3, 1, 0)

    def fill_dconv(seq, p, s):
        p["conv1"]["w"] = conv_w(seq[0])
        p["conv2"]["w"] = conv_w(seq[3])
        for bn, name in ((seq[1], "bn1"), (seq[4], "bn2")):
            p[name]["scale"] = j(bn.weight)
            p[name]["bias"] = j(bn.bias)
            s[name]["mean"] = j(bn.running_mean)
            s[name]["var"] = j(bn.running_var)

    def fill_unet(tu, p, s):
        fill_dconv(tu.inc, p["inc"], s["inc"])
        for i in range(4):
            fill_dconv(tu.downs[i][1], p[f"down{i+1}"], s[f"down{i+1}"])
        for i in range(4):
            up = tu.ups_t[i]
            p[f"up{i+1}"]["up"]["w"] = j(up.weight).transpose(2, 3, 0, 1)
            p[f"up{i+1}"]["up"]["b"] = j(up.bias)
            fill_dconv(tu.ups_c[i], p[f"up{i+1}"]["conv"], s[f"up{i+1}"]["conv"])

    fill_unet(tnet.topu, params["top"], state["top"])
    if not share:
        fill_unet(tnet.dwnu, params["down"], state["down"])
    return params, state


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(1981)
    tnet = MirrorOnet(cin=1, base=BASE, share=True)
    params, state = onet_init(jax.random.key(0), 1, base=BASE)
    params, state = copy_params_from_torch(tnet, params, state)
    x = np.random.default_rng(7).uniform(0, 1, (B, 1, HW, HW)).astype(np.float32)
    return tnet, params, state, x


def test_eval_forward_parity(pair):
    tnet, params, state, x = pair
    tnet.eval()
    with torch.no_grad():
        lt, vt, ld, vd, s = tnet(torch.from_numpy(x))
    out, _ = onet_forward(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
    np.testing.assert_allclose(np.asarray(out.Vt), vt[:, 0].numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.Vd), vd[:, 0].numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.S[..., 0]), s[:, 0].numpy(), atol=1e-4)
    agree = np.mean(
        np.asarray(predict_label(out.S)) == s.argmax(dim=1).numpy()
    )
    assert agree >= 0.99


def test_train_forward_and_loss_parity(pair):
    tnet, params, state, x = pair
    tnet.train()
    xt = torch.from_numpy(x)
    lt, vt, ld, vd, s = tnet(xt)
    tl = t_loss(lt, s, ld)
    out, new_state = onet_forward(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                  train=True)
    jl = compute_loss(out)
    np.testing.assert_allclose(np.asarray(out.Vt), vt[:, 0].detach().numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.Vd), vd[:, 0].detach().numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(float(jl), float(tl.detach()), atol=1e-4, rtol=1e-4)


def test_bn_running_stats_double_update(pair):
    tnet, params, state, x = pair
    torch.manual_seed(0)
    tnet.train()
    # fresh running stats on the torch side
    for m in tnet.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.reset_running_stats()
    _ = tnet(torch.from_numpy(x))
    _, new_state = onet_forward(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                train=True)
    bn = tnet.topu.inc[1]
    np.testing.assert_allclose(
        np.asarray(new_state["top"]["inc"]["bn1"]["mean"]),
        bn.running_mean.detach().numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state["top"]["inc"]["bn1"]["var"]),
        bn.running_var.detach().numpy(), atol=1e-5, rtol=1e-4)


def test_grad_parity(pair):
    tnet, params, state, x = pair
    tnet.train()
    tnet.zero_grad()
    lt, vt, ld, vd, s = tnet(torch.from_numpy(x))
    t_loss(lt, s, ld).backward()
    tgrad = tnet.topu.inc[0].weight.grad.numpy().transpose(2, 3, 1, 0)

    def loss_fn(p):
        out, _ = onet_forward(p, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                              train=True)
        return compute_loss(out)

    g = jax.grad(loss_fn)(params)
    jgrad = np.asarray(g["top"]["inc"]["conv1"]["w"])
    denom = np.abs(tgrad).max() + 1e-12
    assert np.abs(jgrad - tgrad).max() / denom < 5e-3


def test_bn_folded_inference_matches_eval(pair):
    from onet_tpu.models.infer import fold_onet, onet_infer
    from onet_tpu.models import onet_forward, predict_label
    from onet_tpu.core.policy import DEFAULT
    import jax.numpy as jnp
    _, params, state, x = pair
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    out, _ = onet_forward(params, state, xj, train=False)
    folded = fold_onet(params, state)
    s, labels = onet_infer(folded, xj, policy=DEFAULT)
    np.testing.assert_allclose(np.asarray(s), np.asarray(out.S), atol=2e-3)
    agree = np.mean(np.asarray(labels) == np.asarray(predict_label(out.S)))
    assert agree >= 0.99
