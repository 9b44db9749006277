"""Onet: twin (optionally weight-shared) U-Nets with a JSD mutual-information
head, as a pure-functional TPU model.

Behavior parity with the reference Onet (Onet_vanilla_20240606.py:156-267):

* complementary input X_d = clip(1 - X + bias, 0, 1) (:180),
* per-pixel projection V_i = <L_i, H_i> (:176,182). NOTE on :231-232 the
  reference contracts a 1-channel probability slice against the 64-channel
  local features via torch.einsum broadcasting, so the JSD inner product is
  really S * sum_c(L); ``channel_dot`` reproduces exactly that semantics
  for both the matched- and broadcast-channel cases,
* S = softmax over the [V_t, V_d] pair (:185-189),
* JSD lower bound jsd(L, S, S') = -mean(log1pexp(-<L,S>)) -
  mean(log1pexp(<L,S'>)) and symmetric loss -(jsd_top + jsd_dwn)/2
  (:221-235, :253-267).

TPU design: with weight sharing the two branches run as ONE [2B, H, W, C]
batch (twice the MXU occupancy of sequential passes); branch-grouped
BatchNorm (models/layers.py) keeps the statistics identical to the
reference's two sequential passes. Without sharing, the twin parameter
trees are stacked on a leading axis and vmapped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from onet_tpu.core.policy import Policy, DEFAULT
from onet_tpu.models.unet import (
    unet_init, unet_apply, unet_apply_stacked, DEFAULT_OPS)
from onet_tpu.ops.math import log1pexp
from onet_tpu.ops.normalize import complement

# Weight-shared twin pass layout: channel-stack the complementary branches
# at the 64-channel levels (see unet_apply_stacked). Exact numerics; faster
# on TPU because XLA pads 64-lane tensors to 128 lanes. Trace-time switch
# for A/B benchmarking.
CHANNEL_STACK = True

# Width-pair-packed 512^2 levels on the Pallas kernels (models/wp.py):
# kills the block-diagonal 2x-FLOP tax at the 64-channel sites and fuses
# the BatchNorm statistics into the conv epilogues. Applies only where
# wp_supported() (production geometry); trace-time switch.
PAIR_PACK = False


class OnetOutput(NamedTuple):
    Lt: jnp.ndarray  # [B, H, W, 64] local features, top branch
    Ld: jnp.ndarray  # [B, H, W, 64] local features, down branch
    Vt: jnp.ndarray  # [B, H, W] projection logits, top
    Vd: jnp.ndarray  # [B, H, W] projection logits, down
    S: jnp.ndarray   # [B, H, W, 2] class probabilities (softmax over pair)
    # channel-summed local features [B, H, W, 2] (top, down) — precomputed
    # so the JSD loss never touches Lt/Ld: in the channel-stacked layout the
    # per-branch slices would materialize lane-padded 64-channel tensors in
    # the backward; reducing on the stacked tensor keeps the graph dense.
    Lsum: jnp.ndarray = None


def onet_init(key, in_channels: int = 1, *, weight_share: bool = True,
              dtype=jnp.float32, base: int = 64):
    """Returns (params, state). Twin nets get independent init keys, matching
    the reference's two separately-initialized UNets when bshare=False."""
    if weight_share:
        p, s = unet_init(key, in_channels, dtype, base=base)
        return {"top": p}, {"top": s}
    k1, k2 = jax.random.split(key)
    pt, st = unet_init(k1, in_channels, dtype, base=base)
    pd, sd = unet_init(k2, in_channels, dtype, base=base)
    return {"top": pt, "down": pd}, {"top": st, "down": sd}


def is_weight_shared(params) -> bool:
    return "down" not in params


def channel_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """einsum('bpxy,bpxy->bxy') with torch broadcast semantics, NHWC layout.

    a: [B, H, W, Ca], b: [B, H, W, Cb] with Ca == Cb, or either == 1
    (size-1 channels broadcast, exactly as torch.einsum does for the JSD
    projection of a [B,1,H,W] probability against [B,64,H,W] features).
    """
    ca, cb = a.shape[-1], b.shape[-1]
    if ca == cb:
        return jnp.sum(a * b, axis=-1)
    if cb == 1:
        return jnp.sum(a, axis=-1) * b[..., 0]
    if ca == 1:
        return a[..., 0] * jnp.sum(b, axis=-1)
    raise ValueError(f"incompatible channel dims {ca} vs {cb}")


def _branch_sel(c2: int, dtype=jnp.float32) -> jnp.ndarray:
    """[2C, 2] block-indicator: column b sums channel block b."""
    c = c2 // 2
    one = jnp.ones((c, 1), dtype)
    zero = jnp.zeros((c, 1), dtype)
    return jnp.concatenate(
        [jnp.concatenate([one, zero], 1), jnp.concatenate([zero, one], 1)], 0)


def stacked_head(loc, glob):
    """Per-branch head reductions on channel-stacked (loc, glob).

    Returns (v, lsum), both [B, H, W, 2] float32: v[..., b] = <L_b, H_b>
    and lsum[..., b] = sum_c L_b — the projection logits and channel sums
    of Onet_vanilla_20240606.py:176,182,231-232 for both branches.

    Formulated as [.., 2C]·[2C, 2] indicator contractions rather than a
    [.., 2, C] reshape + reduce: splitting the 128-lane channel dim made
    XLA materialize f32 transposed-layout copies of both 512^2 activations
    in forward AND backward (~13 ms/step at the bench shape, measured);
    the matmul form fuses the f32 converts/multiply into the contraction.
    """
    sel = _branch_sel(loc.shape[-1])
    prod = loc.astype(jnp.float32) * glob.astype(jnp.float32)
    dims = (((prod.ndim - 1,), (0,)), ((), ()))
    # HIGHEST so the f32 parity path stays f32 through the contraction
    # (Precision.DEFAULT evaluates f32 matmuls at bf16 input precision on
    # TPU); the [.., 2C]x[2C, 2] contraction is tiny, cost is negligible.
    v = jax.lax.dot_general(prod, sel, dims,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    lsum = jax.lax.dot_general(loc.astype(jnp.float32), sel, dims,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    return v, lsum


def onet_forward(params, state, x, *, train: bool, bias: float = 0.0,
                 policy: Policy = DEFAULT, reshard=None,
                 channel_stack: bool = None, pair_pack: bool = None,
                 ops=DEFAULT_OPS, dp_local: bool = False):
    """Forward pass on an NHWC batch in [0, 1]. Returns (OnetOutput, state).

    ``dp_local=True`` interleaves the twin-branch batch restack so the
    stacked path stays shard-local under a sharded batch axis (see
    unet_apply_stacked; train/steps.py sets it when built over a mesh).
    """
    xd = complement(x, bias)
    stack = CHANNEL_STACK if channel_stack is None else channel_stack
    wp = PAIR_PACK if pair_pack is None else pair_pack
    if is_weight_shared(params) and wp and reshard is None and ops is DEFAULT_OPS:
        from onet_tpu.models.wp import unet_apply_wp, head_wp, wp_supported
        base = params["top"]["inc"]["conv1"]["w"].shape[-1]
        if wp_supported(x.shape, base):
            xx = jnp.concatenate([x, xd], axis=-1)
            (loc_wp, glob_wp), new_top = unet_apply_wp(
                params["top"], state["top"], xx, train=train, policy=policy)
            v, lsum = head_wp(loc_wp, glob_wp)
            s = jax.nn.softmax(v, axis=-1)
            b = x.shape[0]
            n, h, wpc, _ = loc_wp.shape
            return OnetOutput(
                Lt=loc_wp[:b].reshape(b, h, 2 * wpc, 64),
                Ld=loc_wp[b:].reshape(b, h, 2 * wpc, 64),
                Vt=v[..., 0], Vd=v[..., 1], S=s,
                Lsum=lsum), {"top": new_top}
    if is_weight_shared(params) and stack:
        xx = jnp.concatenate([x, xd], axis=-1)  # [B, H, W, 2C]
        (loc, glob), new_top = unet_apply_stacked(
            params["top"], state["top"], xx, train=train, policy=policy,
            reshard=reshard, ops=ops, dp_local=dp_local)
        c = loc.shape[-1] // 2
        # head reductions directly on the stacked layout: one fused read of
        # (loc, glob) yields both branch dots and both channel sums
        v, lsum = stacked_head(loc, glob)           # [B, H, W, 2] each
        s = jax.nn.softmax(v, axis=-1)
        return OnetOutput(Lt=loc[..., :c], Ld=loc[..., c:],
                          Vt=v[..., 0], Vd=v[..., 1], S=s,
                          Lsum=lsum), {"top": new_top}
    if is_weight_shared(params):
        xx = jnp.concatenate([x, xd], axis=0)  # [2B, H, W, C]
        (loc, glob), new_top = unet_apply(params["top"], state["top"], xx,
                                          train=train, groups=2, policy=policy,
                                          reshard=reshard, ops=ops)
        b = x.shape[0]
        lt, ld = loc[:b], loc[b:]
        ht, hd = glob[:b], glob[b:]
        new_state = {"top": new_top}
    else:
        (lt, ht), new_top = unet_apply(params["top"], state["top"], x,
                                       train=train, groups=1, policy=policy,
                                       reshard=reshard, ops=ops)
        (ld, hd), new_dwn = unet_apply(params["down"], state["down"], xd,
                                       train=train, groups=1, policy=policy,
                                       reshard=reshard, ops=ops)
        new_state = {"top": new_top, "down": new_dwn}

    vt = channel_dot(lt.astype(jnp.float32), ht.astype(jnp.float32))
    vd = channel_dot(ld.astype(jnp.float32), hd.astype(jnp.float32))
    s = jax.nn.softmax(jnp.stack([vt, vd], axis=-1), axis=-1)
    return OnetOutput(Lt=lt, Ld=ld, Vt=vt, Vd=vd, S=s), new_state


def predict_label(s: jnp.ndarray) -> jnp.ndarray:
    """argmax over the class pair: 0 = top wins, 1 = down wins. [B, H, W]."""
    return jnp.argmax(s, axis=-1)


def jsd(l_sum: jnp.ndarray, s_self: jnp.ndarray, s_other: jnp.ndarray) -> jnp.ndarray:
    """JSD lower bound for one branch.

    l_sum: channel-summed local features [B, H, W] (see channel_dot note),
    s_self/s_other: [B, H, W] probabilities of this / the other branch.
    """
    ls = l_sum * s_self
    lsp = l_sum * s_other
    return -jnp.mean(log1pexp(-ls)) - jnp.mean(log1pexp(lsp))


@jax.custom_vjp
def _jsd_loss_pair(lsum, s):
    """-(jsd_top + jsd_dwn)/2 on the pair tensors (Lsum, S), [B, H, W, 2].

    Hand-written VJP: jax AD of the per-branch form saved four
    f32[B,H,W,1] residuals in a pathological {0,2,1,3} layout (a 20 GiB/s
    fusion, ~3 ms/step at the bench shape) — this saves only (Lsum, S),
    which the head backward keeps live anyway, and recomputes the sigmoid
    terms in the backward (log1pexp' = sigmoid; the piecewise branches of
    ops.math.log1pexp differ from sigmoid by < 1e-30 where they diverge).
    Measured +2.3 tiles/s in the full train graph (runs/ab4.py).
    """
    lt, ld = lsum[..., 0], lsum[..., 1]
    st, sd = s[..., 0], s[..., 1]
    return (jnp.mean(log1pexp(-lt * st)) + jnp.mean(log1pexp(lt * sd))
            + jnp.mean(log1pexp(-ld * sd))
            + jnp.mean(log1pexp(ld * st))) / 2.0


def _jsd_loss_pair_fwd(lsum, s):
    return _jsd_loss_pair(lsum, s), (lsum, s)


def _jsd_loss_pair_bwd(res, g):
    lsum, s = res
    lt, ld = lsum[..., 0], lsum[..., 1]
    st, sd = s[..., 0], s[..., 1]
    k = g / (2.0 * lt.size)
    sig_a = jax.nn.sigmoid(-lt * st)
    sig_b = jax.nn.sigmoid(lt * sd)
    sig_c = jax.nn.sigmoid(-ld * sd)
    sig_d = jax.nn.sigmoid(ld * st)
    dlsum = jnp.stack([k * (-sig_a * st + sig_b * sd),
                       k * (-sig_c * sd + sig_d * st)], -1)
    ds = jnp.stack([k * (-sig_a * lt + sig_d * ld),
                    k * (sig_b * lt - sig_c * ld)], -1)
    return dlsum, ds


_jsd_loss_pair.defvjp(_jsd_loss_pair_fwd, _jsd_loss_pair_bwd)


def compute_loss(out: OnetOutput) -> jnp.ndarray:
    """Symmetric JSD loss, float32.

    The stacked path uses the custom-VJP pair form (_jsd_loss_pair). The
    per-branch fallback keeps the reference's form: pair-tensor
    RE-FORMULATIONS under jax AD (channel-reverse / 1-S) measured 4-5 t/s
    SLOWER (runs/ab2.py) — only the hand-written VJP wins (runs/ab4.py).
    """
    if out.Lsum is not None:
        return _jsd_loss_pair(out.Lsum, out.S)
    ct = jnp.sum(out.Lt.astype(jnp.float32), axis=-1)
    cd = jnp.sum(out.Ld.astype(jnp.float32), axis=-1)
    st = out.S[..., 0]
    sd = out.S[..., 1]
    jsd_top = jsd(ct, st, sd)
    jsd_dwn = jsd(cd, sd, st)
    return -(jsd_top + jsd_dwn) / 2.0


def compute_loss_rsn(out: OnetOutput) -> jnp.ndarray:
    """RSN ablation loss: Random-Sampling-Negative JSD.

    The reference ablates its complement-branch negative against the
    classic MI-estimator convention of randomly sampled negatives (the
    commented ``onet_ablation_RSN_20230626`` module, "ablation on random
    sampling negative", Train_Onet_on_simclutter_20250407.py:37,551-607 and
    Train_Onet_on_zy3_20240606.py:225-270; the module is absent from the
    snapshot — SURVEY section 2.9). Rebuilt per the Deep-InfoMax
    negative-sampling convention the name describes: each branch's negative
    score map comes from ANOTHER image in the batch (batch roll — the
    in-batch pairing DIM uses) instead of the complement branch's aligned
    map. Needs batch >= 2 or the negative degenerates to the positive.
    """
    if out.S.shape[0] < 2:
        raise ValueError("RSN loss needs batch >= 2 (in-batch negatives)")
    if out.Lsum is not None:
        lt, ld = out.Lsum[..., 0], out.Lsum[..., 1]
    else:
        lt = jnp.sum(out.Lt.astype(jnp.float32), axis=-1)
        ld = jnp.sum(out.Ld.astype(jnp.float32), axis=-1)
    st, sd = out.S[..., 0], out.S[..., 1]
    jsd_top = jsd(lt, st, jnp.roll(st, 1, axis=0))
    jsd_dwn = jsd(ld, sd, jnp.roll(sd, 1, axis=0))
    return -(jsd_top + jsd_dwn) / 2.0


LOSSES = {"jsd": compute_loss, "rsn": compute_loss_rsn}


def stateless_onet_forward(apply_fn, params, state, x, *, bias: float = 0.0,
                           policy: Policy = DEFAULT):
    """Onet container for stateless (LayerNorm) backbones — the shared
    machinery of the transformer/ConvNeXt ablation families (models/arch.py).

    ``apply_fn(branch_params, x, policy=...) -> (loc, glob)`` with both
    outputs [N, H, W, C]. Normalization without cross-sample statistics
    makes the weight-shared [2B] batch-stacked twin pass STRUCTURALLY equal
    to two sequential branch passes (the BatchNorm backbone needs grouped
    statistics for the same contract, models/layers.py). Head semantics are
    the unchanged reference machinery (Onet_vanilla_20240606.py:174-191).
    """
    xd = complement(x, bias)
    b = x.shape[0]
    if "down" not in params:
        xx = jnp.concatenate([x, xd], axis=0)           # [2B, H, W, C]
        loc, glob = apply_fn(params["top"], xx, policy=policy)
        lt, ld = loc[:b], loc[b:]
        ht, hd = glob[:b], glob[b:]
    else:
        lt, ht = apply_fn(params["top"], x, policy=policy)
        ld, hd = apply_fn(params["down"], xd, policy=policy)
    vt = channel_dot(lt.astype(jnp.float32), ht.astype(jnp.float32))
    vd = channel_dot(ld.astype(jnp.float32), hd.astype(jnp.float32))
    s = jax.nn.softmax(jnp.stack([vt, vd], axis=-1), axis=-1)
    lsum = jnp.stack([jnp.sum(lt.astype(jnp.float32), axis=-1),
                      jnp.sum(ld.astype(jnp.float32), axis=-1)], axis=-1)
    return OnetOutput(Lt=lt, Ld=ld, Vt=vt, Vd=vd, S=s, Lsum=lsum), state


def get_label(vt: jnp.ndarray, vd: jnp.ndarray):
    """Re-softmax raw projection maps into (labels, probabilities) — the
    no-grad Onet.get_label path (Onet_vanilla_20240606.py:204-219)."""
    s = jax.nn.softmax(jnp.stack([vt, vd], axis=-1), axis=-1)
    return jnp.argmax(s, axis=-1), s


def determine_fg_mark(pred: jnp.ndarray, labels: jnp.ndarray) -> str:
    """Which branch carries the foreground, decided on one labelled batch
    (assign_fg_mark, uti_zy3_test_20240123.py:99-149): 'top' if the raw
    argmax already agrees with the Hungarian-aligned labels, else 'down'.
    Returns a host-side string — called once outside jit."""
    from onet_tpu.metrics.segmentation import align_labels_hungarian

    aligned = align_labels_hungarian(pred, labels)
    return "top" if bool(jnp.all(pred == aligned)) else "down"
