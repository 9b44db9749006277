"""Falsifiable v5e-8 throughput projection (round-3 verdict, item 4).

For each parallel-axis combo the FULL train step is compiled at the
bench shapes (512^2 tiles, base=64, per-chip batch 8, BF16_COMPUTE) on
the 8-virtual-device CPU mesh — GSPMD decides the collective set and
payload bytes before backend codegen, so the collectives are exactly
what a v5e-8 would run. Each combo's projected step time is

    t_step = t_compute (measured single-chip, scaled per A6)
           + t_ICI     (priced from the compiled HLO per A1-A5)

with every assumption stated in onet_tpu/utils/projection.py. The
measured anchors default to BENCH_r03.json (train 47.48 t/s, infer
168.03 t/s, int8 infer 226.41 t/s, batch 8 @ 512^2 on the real v5e
chip) and are CLI-overridable so the table regenerates against any
newer bench:

    python runs/project_v5e8.py [--train T] [--infer I] [--int8 Q]

Writes runs/project_v5e8.json and prints the RESULTS.md table.
Reference anchor: none — the reference is single-GPU (SURVEY.md §2.10);
the 2,000-tiles/s v5e-8 target comes from BASELINE.json.
"""

import argparse
import json
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from onet_tpu.core.mesh import (DATA_AXIS, SPACE_AXIS, SPACEW_AXIS,
                                make_mesh, batch_sharding, replicated)
from onet_tpu.core.policy import BF16_COMPUTE
from onet_tpu.models.onet import onet_init
from onet_tpu.train.optim import adam_init
from onet_tpu.train.steps import make_train_step
from onet_tpu.utils.projection import (parse_collectives, project_step,
                                       summarize)
from onet_tpu.utils.summary import model_summary

TILE = 512
PER_CHIP_BATCH = 8          # the bench batch: anchors measured at this
N_DEV = 8


def shapes(base=64):
    """ShapeDtypeStruct trees for (params, bn_state, opt_state) — compile
    without allocating the 31M-param model on the host."""
    params, bn = jax.eval_shape(
        lambda: onet_init(jax.random.key(0), 1, base=base))
    opt = jax.eval_shape(lambda: adam_init(params))
    return params, bn, opt


def with_sharding(tree, sharding):
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding),
        tree)


def compiled_collectives(step, mesh, batch, xspec_rank4=None, extra=()):
    params, bn, opt = shapes()
    rep = replicated(mesh)
    params, bn, opt = (with_sharding(t, rep) for t in (params, bn, opt))
    xsh = xspec_rank4 or batch_sharding(mesh)
    x = jax.ShapeDtypeStruct((batch, TILE, TILE, 1), jnp.float32,
                             sharding=xsh)
    hlo = step.lower(params, bn, opt, x, 1e-4, *extra).compile().as_text()
    return parse_collectives(hlo, default_group=N_DEV)


def stage_flop_shares():
    """Encoder vs decoder forward-FLOP share at 512^2 (the pipeline cut,
    parallel/pipeline.py: encoder = inc+down1..4 | decoder = up1..4)."""
    params, _, _ = shapes()
    rows = model_summary(params, input_hw=(TILE, TILE), in_channels=1)
    enc = sum(r["fwd_flops"] for r in rows
              if r["name"] == "inc" or r["name"].startswith("down"))
    dec = sum(r["fwd_flops"] for r in rows if r["name"].startswith("up"))
    return enc / (enc + dec), dec / (enc + dec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", type=float, default=47.48,
                    help="measured single-chip train tiles/s (BENCH detail)")
    ap.add_argument("--infer", type=float, default=168.03)
    ap.add_argument("--int8", type=float, default=226.41)
    args = ap.parse_args()

    t_train = PER_CHIP_BATCH / args.train    # s/step, batch 8 @ 512^2
    combos = {}

    # --- train dp8: the production exact-training config ---------------
    mesh = make_mesh(shape=(N_DEV, 1))
    step = make_train_step(mesh=mesh, policy=BF16_COMPUTE)
    cols = compiled_collectives(step, mesh, N_DEV * PER_CHIP_BATCH)
    combos["train dp8"] = {
        "proj": project_step(t_train, cols,
                             tiles_per_step=N_DEV * PER_CHIP_BATCH),
        "collectives": summarize(cols),
        "t_compute_basis": "measured single-chip step, per-chip work "
                           "identical to bench (8 tiles)",
    }

    # --- train dp8 via shard_map: same math, no GSPMD resharding --------
    # Since round 5 the jit/GSPMD step above is ALSO reshard-free:
    # make_train_step(mesh=...) interleaves the twin-branch restack
    # (dp_local=True, models/unet.py::unet_apply_stacked) so the unstack
    # never crosses the data-axis shard boundary; both rows now carry the
    # gradient all-reduce only.
    from onet_tpu.parallel.halo import make_spatial_train_step
    mesh = make_mesh(shape=(N_DEV, 1))
    step = make_spatial_train_step(mesh, policy=BF16_COMPUTE)
    cols = compiled_collectives(step, mesh, N_DEV * PER_CHIP_BATCH)
    combos["train dp8 shard_map"] = {
        "proj": project_step(t_train, cols,
                             tiles_per_step=N_DEV * PER_CHIP_BATCH),
        "collectives": summarize(cols),
        "t_compute_basis": "measured single-chip step (per-chip work "
                           "identical to bench); exact halo path, space=1",
    }

    # --- train dp4 x sp2: exact halo-exchange spatial partitioning ------
    mesh = make_mesh(shape=(4, 2))
    step = make_spatial_train_step(mesh, policy=BF16_COMPUTE)
    cols = compiled_collectives(
        step, mesh, 4 * PER_CHIP_BATCH,
        xspec_rank4=batch_sharding(mesh, spatial=True))
    combos["train dp4xsp2"] = {
        "proj": project_step(t_train / 2, cols,
                             tiles_per_step=4 * PER_CHIP_BATCH),
        "collectives": summarize(cols),
        "t_compute_basis": "A6: half the rows per chip -> t_single/2 "
                           "(optimistic at shallow levels)",
    }

    # --- train dp2 x sp2 x spw2: 2-D spatial grid -----------------------
    mesh = make_mesh(shape=(2, 2, 2),
                     axis_names=(DATA_AXIS, SPACE_AXIS, SPACEW_AXIS))
    step = make_spatial_train_step(mesh, policy=BF16_COMPUTE)
    from jax.sharding import NamedSharding, PartitionSpec as P
    xsh = NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, SPACEW_AXIS, None))
    cols = compiled_collectives(step, mesh, 2 * PER_CHIP_BATCH,
                                xspec_rank4=xsh)
    combos["train dp2xsp2x2"] = {
        "proj": project_step(t_train / 4, cols,
                             tiles_per_step=2 * PER_CHIP_BATCH),
        "collectives": summarize(cols),
        "t_compute_basis": "A6: quarter tile per chip -> t_single/4",
    }

    # --- train dp4 x pp2 (4 microbatches) -------------------------------
    from onet_tpu.parallel.pipeline import (STAGE_AXIS, N_STAGES,
                                            make_pp_train_step)
    M = 4
    mesh = make_mesh(shape=(4, N_STAGES), axis_names=(DATA_AXIS, STAGE_AXIS))
    step = make_pp_train_step(mesh, microbatches=M, policy=BF16_COMPUTE)
    cols = compiled_collectives(step, mesh, 4 * PER_CHIP_BATCH)
    enc_share, dec_share = stage_flop_shares()
    ticks = M + N_STAGES - 1
    # per-tick stage time = slowest stage share of a microbatch's step;
    # assumes bwd splits like fwd (both stages are the same conv mix)
    t_pp = t_train * max(enc_share, dec_share) * (ticks / M)
    combos["train dp4xpp2 (m=4)"] = {
        "proj": project_step(t_pp, cols,
                             tiles_per_step=4 * PER_CHIP_BATCH,
                             loop_trips=ticks),
        "collectives": summarize(cols),
        "t_compute_basis": f"slowest-stage share {max(enc_share, dec_share):.3f} "
                           f"x bubble {(ticks / M):.2f} x t_single "
                           "(A5: scan-body collectives priced x%d)" % ticks,
    }

    # --- infer dp8: the shipped shard_map serving path (serve --dp) -----
    from jax.sharding import PartitionSpec as P  # noqa: shadows above import
    from onet_tpu.models.infer import fold_onet, onet_infer
    mesh = make_mesh(shape=(N_DEV, 1))
    folded = jax.eval_shape(fold_onet, *shapes()[:2])
    rep = replicated(mesh)
    folded = with_sharding(folded, rep)
    x = jax.ShapeDtypeStruct((N_DEV * PER_CHIP_BATCH, TILE, TILE, 1),
                             jnp.float32, sharding=batch_sharding(mesh))
    t_infer = PER_CHIP_BATCH / args.infer

    serve = jax.jit(jax.shard_map(
        lambda f, xx: onet_infer(f, xx, policy=BF16_COMPUTE),
        mesh=mesh, in_specs=(P(), P("data")), out_specs=P("data")))
    cols = parse_collectives(serve.lower(folded, x).compile().as_text(),
                             default_group=N_DEV)
    assert not cols, f"serving shard_map must be collective-free: {cols}"
    combos["infer dp8"] = {
        "proj": project_step(t_infer, cols,
                             tiles_per_step=N_DEV * PER_CHIP_BATCH),
        "collectives": summarize(cols),
        "t_compute_basis": "measured single-chip folded-infer step; "
                           "shard_map serving compiles to ZERO collectives "
                           "(asserted) — embarrassingly parallel",
    }

    # contrast rows: the same inference under plain jit/GSPMD. With the
    # default block restack GSPMD reshards the twin-branch unstack; with
    # dp_local=True (the round-5 interleaved restack) the graph compiles
    # to ZERO collectives, matching shard_map.
    for label, dpl in (("infer dp8 jit/GSPMD (block)", False),
                       ("infer dp8 jit/GSPMD (dp_local)", True)):
        fn = jax.jit(lambda f, xx, _d=dpl: onet_infer(
            f, xx, policy=BF16_COMPUTE, dp_local=_d))
        cols = parse_collectives(fn.lower(folded, x).compile().as_text(),
                                 default_group=N_DEV)
        combos[label] = {
            "proj": project_step(t_infer, cols,
                                 tiles_per_step=N_DEV * PER_CHIP_BATCH),
            "collectives": summarize(cols),
            "t_compute_basis": ("same anchor; GSPMD reshards the block "
                                "batch restack" if not dpl else
                                "same anchor; interleaved restack is "
                                "shard-local (zero collectives)"),
        }
    assert not combos["infer dp8 jit/GSPMD (dp_local)"]["collectives"], \
        "dp_local inference must compile collective-free"

    # --- combined headline (bench harmonic mean, 8 chips) ---------------
    # best exact dp8 training path (shard_map wins when GSPMD reshards)
    tr = max(combos["train dp8"]["proj"]["tiles_per_s"],
             combos["train dp8 shard_map"]["proj"]["tiles_per_s"])
    inf = combos["infer dp8"]["proj"]["tiles_per_s"]
    combined = 2.0 / (1.0 / tr + 1.0 / inf)
    t_q = PER_CHIP_BATCH / args.int8
    q8 = combos["infer dp8"]["proj"]["t_ici_ms"] / 1e3 + t_q
    int8_dp8 = N_DEV * PER_CHIP_BATCH / q8
    combined_int8 = 2.0 / (1.0 / tr + 1.0 / int8_dp8)

    out = {
        "anchors": {"train_tps": args.train, "infer_tps": args.infer,
                    "int8_tps": args.int8, "batch": PER_CHIP_BATCH,
                    "tile": TILE},
        "combos": combos,
        "headline": {
            "train_dp8_tiles_per_s": round(tr, 1),
            "infer_dp8_tiles_per_s": round(inf, 1),
            "infer_int8_dp8_tiles_per_s": round(int8_dp8, 1),
            "combined_v5e8": round(combined, 1),
            "combined_v5e8_int8_serving": round(combined_int8, 1),
            "target": 2000.0,
            "vs_target": round(combined / 2000.0, 3),
        },
    }
    path = os.path.join(os.path.dirname(__file__), "project_v5e8.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)

    print(f"{'combo':22s} {'t_comp ms':>9s} {'t_ici ms':>8s} "
          f"{'ici %':>6s} {'tiles/s':>8s} {'/chip':>6s}")
    for name, c in combos.items():
        p = c["proj"]
        print(f"{name:22s} {p['t_compute_ms']:9.1f} {p['t_ici_ms']:8.2f} "
              f"{100 * p['ici_fraction']:5.1f}% {p['tiles_per_s']:8.1f} "
              f"{p['tiles_per_s'] / N_DEV:6.1f}")
    h = out["headline"]
    print(f"\ncombined v5e-8 (train+infer harmonic): {h['combined_v5e8']} "
          f"tiles/s  ({h['vs_target']:.3f}x of the 2000 target)")
    print(f"with int8 serving: {h['combined_v5e8_int8_serving']} tiles/s")
    print(f"json -> {path}")


if __name__ == "__main__":
    main()
