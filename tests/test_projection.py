"""HLO collective-byte extraction + ICI pricing (utils/projection.py).

The round-3 verdict asked for a falsifiable v5e-8 projection built from
the compiled HLO's collective bytes; these tests pin the extraction on
(a) hand-written HLO lines with known payloads, (b) an explicit psum of
known size through the real compiler, and (c) the actual data-parallel
train step, whose all-reduce payload must cover the fp32 gradient bytes.
The projection table itself is runs/project_v5e8.py (RESULTS.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onet_tpu.utils.projection import (
    Collective, ici_seconds, parse_collectives, project_step, summarize)


def test_parse_known_hlo_lines():
    hlo = """
  %all-reduce.1 = f32[1024]{0} all-reduce(%x), replica_groups=[1,8]<=[8], to_apply=%add
  %all-reduce.2 = (f32[16]{0}, bf16[32]{0}) all-reduce(%a, %b), replica_groups=[2,4]<=[8], to_apply=%add
  %ag = bf16[8,128]{1,0} all-gather(%y), replica_groups={{0,1},{2,3},{4,5},{6,7}}, dimensions={0}
  %rs = f32[64]{0} reduce-scatter(%z), replica_groups=[1,4]<=[4], to_apply=%add
  %cp = bf16[2,16,16,8]{3,2,1,0} collective-permute(%h), source_target_pairs={{0,1},{1,0}}
  %ar-start = f32[256]{0} all-reduce-start(%w), replica_groups=[1,8]<=[8], to_apply=%add
  %ar-done = f32[256]{0} all-reduce-done(%ar-start)
  %gte = f32[16]{0} get-tuple-element(%all-reduce.2), index=0
"""
    cols = parse_collectives(hlo, default_group=8)
    by = {c.name: c for c in cols}
    assert len(cols) == 6                      # -done and GTE skipped
    assert by["all-reduce.1"].payload_bytes == 4096
    assert by["all-reduce.1"].group_size == 8
    # tuple payload: 16*4 + 32*2
    assert by["all-reduce.2"].payload_bytes == 64 + 64
    assert by["all-reduce.2"].group_size == 4  # [2,4]<=[8]: rows of 4
    assert by["ag"].payload_bytes == 8 * 128 * 2
    assert by["ag"].group_size == 2            # literal groups
    assert by["rs"].group_size == 4
    assert by["cp"].payload_bytes == 2 * 16 * 16 * 8 * 2
    assert by["ar-start"].payload_bytes == 1024

    # A2 wire volumes
    assert by["all-reduce.1"].wire_bytes() == pytest.approx(
        2 * 4096 * 7 / 8)
    assert by["ag"].wire_bytes() == pytest.approx(2048 * 1 / 2)
    assert by["rs"].wire_bytes() == pytest.approx(64 * 4 * 3)
    assert by["cp"].wire_bytes() == by["cp"].payload_bytes

    s = summarize(cols)
    assert s["all-reduce"]["ops"] == 3
    assert s["all-reduce"]["payload_bytes"] == 4096 + 128 + 1024


def test_psum_known_payload_through_compiler():
    """An explicit shard_map psum of f32[128] compiles to exactly one
    all-reduce of 512 bytes over the full 8-group."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from onet_tpu.core.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(shape=(8, 1))

    def f(x):
        return jax.lax.psum(x, "data")

    fn = jax.jit(shard_map(f, mesh=mesh, in_specs=P("data"),
                           out_specs=P()))
    hlo = fn.lower(jax.ShapeDtypeStruct((8, 128), jnp.float32)
                   ).compile().as_text()
    ars = [c for c in parse_collectives(hlo, default_group=8)
           if c.kind == "all-reduce"]
    assert len(ars) == 1, hlo
    assert ars[0].payload_bytes == 128 * 4
    assert ars[0].group_size == 8


def test_train_step_collectives_cover_gradient_bytes():
    """The dp-8 train step's all-reduce payload must include the full
    fp32 gradient (one float per parameter), all over groups of 8."""
    from onet_tpu.core.mesh import make_mesh
    from onet_tpu.models.onet import onet_init
    from onet_tpu.train.optim import adam_init
    from onet_tpu.train.steps import make_train_step

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    mesh = make_mesh(shape=(8, 1))
    step = make_train_step(mesh=mesh)
    x = jax.ShapeDtypeStruct((8, 32, 32, 1), jnp.float32)
    hlo = step.lower(params, bn, adam_init(params), x, 1e-4
                     ).compile().as_text()
    cols = parse_collectives(hlo, default_group=8)
    assert cols, "expected collectives in the dp-8 train step"
    # every group must be a mesh subgroup (GSPMD reshards the twin-branch
    # batch stack via subgroup permutes / all-to-alls / all-reduces)
    assert all(c.group_size in (2, 4, 8) for c in cols), summarize(cols)
    param_bytes = 4 * sum(int(np.prod(a.shape))
                          for a in jax.tree.leaves(params))
    # gradient all-reduces span the FULL mesh; their payload must cover
    # one fp32 float per parameter
    ar_payload = sum(c.payload_bytes for c in cols
                     if c.kind == "all-reduce" and c.group_size == 8)
    assert ar_payload >= param_bytes, (ar_payload, param_bytes)
    # ... and not absurdly more: within 4x counting ALL reduces (BN stats
    # + loss terms + subgroup reshards ride along; a blowup here would
    # mean GSPMD re-reducing activations)
    total_ar = sum(c.payload_bytes for c in cols if c.kind == "all-reduce")
    assert total_ar < 4 * param_bytes, summarize(cols)


def test_scan_body_collectives_marked_in_loop():
    """Collectives inside a lax.scan body print once in the HLO but must
    carry in_loop=True so project_step can multiply by the trip count
    (A5, the pipeline-microbatch pricing)."""
    from jax.sharding import PartitionSpec as P
    from onet_tpu.core.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(shape=(8, 1))

    def f(x):
        def body(c, _):
            c = jax.lax.ppermute(c, "data",
                                 [(i, (i + 1) % 8) for i in range(8)])
            return c + jax.lax.psum(c, "data"), None
        y, _ = jax.lax.scan(body, x, None, length=5)
        return y + jax.lax.psum(y, "data")     # one collective OUTSIDE

    fn = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("data"),
                               out_specs=P("data")))
    hlo = fn.lower(jax.ShapeDtypeStruct((8, 64), jnp.float32)
                   ).compile().as_text()
    cols = parse_collectives(hlo, default_group=8)
    inside = [c for c in cols if c.in_loop]
    outside = [c for c in cols if not c.in_loop]
    assert {c.kind for c in inside} == {"collective-permute", "all-reduce"}
    assert len(outside) == 1 and outside[0].kind == "all-reduce"
    # loop_trips multiplies only the in-loop ops
    t1 = project_step(0.0, cols, tiles_per_step=1, loop_trips=1,
                      latency_s=0.0)["t_ici_ms"]
    t5 = project_step(0.0, cols, tiles_per_step=1, loop_trips=5,
                      latency_s=0.0)["t_ici_ms"]
    wire_in = sum(c.wire_bytes() for c in inside)
    wire_out = outside[0].wire_bytes()
    from onet_tpu.utils.projection import V5E_AXIS_BW
    assert t1 == pytest.approx((wire_in + wire_out) / V5E_AXIS_BW * 1e3)
    assert t5 == pytest.approx((5 * wire_in + wire_out) / V5E_AXIS_BW * 1e3)


def test_project_step_arithmetic():
    cols = [Collective("all-reduce", 9e10, 8, "ar.0"),      # 2*(7/8)*1s
            Collective("collective-permute", 9e10, 2, "scan.cp")]
    t = ici_seconds(cols, axis_bw=9e10, latency_s=0.0)
    assert t == pytest.approx(2 * 7 / 8 + 1.0)
    # scan-body op repeated 4x (A5)
    rec = project_step(1.0, cols, tiles_per_step=10,
                       repeat={"scan.": 4}, axis_bw=9e10, latency_s=0.0)
    expect = 1.0 + 2 * 7 / 8 + 4.0
    assert rec["t_step_ms"] == pytest.approx(expect * 1e3)
    assert rec["tiles_per_s"] == pytest.approx(10 / expect)
    assert 0 < rec["ici_fraction"] < 1


def test_mesh_train_step_has_no_activation_resharding():
    """Round-5 regression guard for the interleaved twin restack: a
    mesh-built train step (dp_local set automatically) must compile with
    ZERO collective-permute / all-to-all / all-gather — activation
    resharding would mean the restack crossed the data-axis shard
    boundary again (3.7 GB/step at bench shapes, RESULTS.md round 5).
    Only gradient/BN-stat all-reduces are allowed."""
    from onet_tpu.core.mesh import make_mesh
    from onet_tpu.models.onet import onet_init
    from onet_tpu.train.optim import adam_init
    from onet_tpu.train.steps import make_train_step

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    mesh = make_mesh(shape=(8, 1))
    step = make_train_step(mesh=mesh)
    x = jax.ShapeDtypeStruct((8, 32, 32, 1), jnp.float32)
    hlo = step.lower(params, bn, adam_init(params), x, 1e-4
                     ).compile().as_text()
    cols = parse_collectives(hlo, default_group=8)
    bad = [c for c in cols if c.kind != "all-reduce"]
    assert not bad, f"activation resharding reappeared: {summarize(bad)}"


def test_mesh_infer_dp_local_collective_free():
    """Plain-jit dp inference with dp_local=True must compile with no
    collectives at all (matches the shard_map serving path)."""
    from onet_tpu.core.mesh import (batch_sharding, make_mesh, replicated)
    from onet_tpu.models.infer import fold_onet, onet_infer
    from onet_tpu.models.onet import onet_init

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params, bn = onet_init(jax.random.key(0), 1, base=8)
    mesh = make_mesh(shape=(8, 1))
    folded = jax.jit(fold_onet)(params, bn)
    folded = jax.device_put(folded, replicated(mesh))
    x = jax.ShapeDtypeStruct((8, 32, 32, 1), jnp.float32,
                             sharding=batch_sharding(mesh))
    fn = jax.jit(lambda f, xx: onet_infer(f, xx, dp_local=True))
    hlo = fn.lower(folded, x).compile().as_text()
    cols = parse_collectives(hlo, default_group=8)
    assert not cols, f"dp_local inference must be collective-free: " \
                     f"{summarize(cols)}"
