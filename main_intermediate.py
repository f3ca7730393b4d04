#!/usr/bin/env python
"""Driver for the intermediate-fusion family — MMTM, SE-fusion, mmformer-N
under the AUXI/DGL-style multi-task loss.

The reference builds these nets (models/mmtm_net.py, sefusion.py,
surf_mmfomer.py — the configs named in BASELINE.json) but ships NO driver:
they are reachable only by editing main_dgl.py (SURVEY §2.6). This driver
gives them the same CLI surface as main_dgl.py plus `--model`:

    python main_intermediate.py --train --ckpt_path ckpt --dataset CREMAD \
        --model mmtm --alpha 2 --learning_rate 2e-3

Audio-visual inputs go through the reference's AV adapter
(mmtm_net.py:381-387): the spectrogram becomes a 3-channel 224² 'rgb'
stream, the (single) video frame the 'depth' stream.
"""

import argparse
import os

import jax

from gdl_tpu.config import add_arguments, from_args
from gdl_tpu.data.datasets import make_dataset
from gdl_tpu.data.loader import Loader
from gdl_tpu.data.preprocess import make_eval_preprocess, make_train_preprocess
from gdl_tpu.models.intermediate import build_intermediate
from gdl_tpu.parallel.distributed import maybe_initialize
from gdl_tpu.parallel.mesh import batch_sharding, make_mesh, state_sharding
from gdl_tpu.train.auxi import make_auxi_train_step
from gdl_tpu.train.dgl import TrainState, cross_entropy
from gdl_tpu.train.optim import make_optimizer
from gdl_tpu.utils.checkpoint import save_legacy_checkpoint
from gdl_tpu.utils.logging import CSVLogger
from gdl_tpu.utils.metrics import PerClassAccuracy
from gdl_tpu.utils.seed import setup_seed

import jax.numpy as jnp
import optax


def get_arguments():
    parser = argparse.ArgumentParser()
    add_arguments(parser, dgl=True)
    parser.add_argument("--model", default="mmtm",
                        choices=["mmtm", "sefusion", "mmformer_n"])
    parser.add_argument("--share_unimodal_streams", default=-1, type=int,
                        help="mmformer_n only: reuse each modality's "
                        "intra token stream across the fused/unimodal "
                        "passes (+15%% step throughput, eval "
                        "bit-identical; accuracy-neutral in the "
                        "round-4 convergence study, "
                        "tools/share_streams_ab.py). Default -1 = on "
                        "unless --strict_compat (the reference's three "
                        "fusion passes draw independent dropout masks "
                        "and triple-count BN running stats, "
                        "surf_mmfomer.py:337-351); 0/1 force")
    parser.add_argument("--batched_inter", default=0, type=int,
                        help="mmformer_n only: run the three fusion "
                        "passes' BN-free inter half as one batched "
                        "[3B] call (eval bit-identical; train keeps "
                        "the dropout distribution). Measured a WASH "
                        "at bs64 on v5e — kept as an experiment flag")
    parser.add_argument("--export_path", default=None, type=str,
                        help="write an AOT serving artifact (jax.export, "
                        "weights baked in) of this model's eval forward "
                        "from the checkpoint FILE at --ckpt_path, then "
                        "exit — the valid.py --export_path equivalent "
                        "for the intermediate family")
    parser.add_argument("--export_poly_batch", default=0, type=int,
                        help="1 = export a symbolic batch dimension (one "
                        "artifact serves any batch size; forces the XLA "
                        "eval attention path). 0 = pin the config batch")
    return parser.parse_args()


def resolve_share_streams(flag: int, strict_compat: bool) -> bool:
    """--share_unimodal_streams tri-state: -1 (default) resolves to ON
    except under --strict_compat, which keeps the reference's independent
    dropout masks / triple-counted BN running stats
    (surf_mmfomer.py:337-351). The round-4 convergence study measured the
    shared mode accuracy-neutral (tools/share_streams_ab.py; disposition
    in benchmarks/RESULTS.md), so the +15% step throughput is the
    default. 0/1 force either mode regardless of strict_compat."""
    if flag >= 0:
        return bool(flag)
    return not strict_compat


def build_model(name: str, n_classes: int, width: int = 64,
                dtype=jnp.float32, share_streams: bool = False,
                batched_inter: bool = False):
    return build_intermediate(name, n_classes, width, dtype=dtype,
                              share_streams=share_streams,
                              batched_inter=batched_inter)


def make_sefusion_step(model, cfg, optimizer, base_rng):
    """Plain CE for SURF_Multi's single-logits forward (sefusion.py:52-63).
    """

    def loss_fn(params, batch_stats, batch):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["audio"], batch["visual"], train=True, av_inputs=True,
            mutable=["batch_stats"])
        loss = cross_entropy(out, batch["label"])
        return loss, (mutated["batch_stats"],
                      {"loss": loss, "loss_f": loss, "loss_a": loss,
                       "loss_v": loss})

    def step(state: TrainState, batch):
        (loss, (stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=stats, opt_state=opt_state), metrics

    return step


def main():
    maybe_initialize()
    args = get_arguments()
    from gdl_tpu.utils.compilation_cache import enable as _cc
    _cc(getattr(args, 'compilation_cache_dir', None))
    cfg = from_args(args)
    cfg.fps = 1  # the AV adapter squeezes a single frame
    share_streams = resolve_share_streams(args.share_unimodal_streams,
                                          cfg.strict_compat)
    print(cfg, "model:", args.model)

    if args.export_path:
        from gdl_tpu.serve import export_intermediate_from_checkpoint

        export_intermediate_from_checkpoint(
            cfg, args.model, cfg.ckpt_path, args.export_path,
            share_streams=share_streams,
            poly_batch=bool(args.export_poly_batch),
            batched_inter=bool(args.batched_inter))
        print("Serving artifact written to", args.export_path)
        return

    rng = setup_seed(cfg.random_seed)
    dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
             else jnp.float32)
    model, kind = build_model(args.model, cfg.n_classes,
                              cfg.encoder_width, dtype=dtype,
                              share_streams=share_streams,
                              batched_inter=bool(args.batched_inter))
    train_set = make_dataset(cfg, "train")
    test_set = make_dataset(cfg, "test")
    train_loader = Loader(train_set, cfg.batch_size, shuffle=True,
                          drop_last=True, num_workers=cfg.num_workers,
                          seed=cfg.random_seed)
    test_loader = Loader(test_set, cfg.batch_size, shuffle=False,
                         drop_last=cfg.eval_drop_last,
                         num_workers=cfg.num_workers)
    optimizer = make_optimizer(cfg, max(len(train_loader), 1))

    train_pre = make_train_preprocess(cfg)
    eval_pre = make_eval_preprocess(cfg)

    # init with dataset-shaped dummies
    f, t = cfg.spec_shape
    dummy_a = jnp.zeros((2, f, t, 1))
    dummy_v = jnp.zeros((2, cfg.fps, 224, 224, 3))
    variables = model.init(
        {"params": rng, "drop": rng, "dropout": rng, "pe": rng},
        dummy_a, dummy_v, train=False, av_inputs=True)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=optimizer.init(variables["params"]))
    if cfg.pretrained_path:
        # the reference's resnet18_se ImageNet partial-load
        # (models/resnet18_se.py:228-248): filter by key+shape per stem
        from gdl_tpu.utils.torch_interop import load_pretrained_encoders

        state, _ = load_pretrained_encoders(state, cfg.pretrained_path)

    mesh = make_mesh(cfg.dp, cfg.mp)
    state = jax.device_put(state, state_sharding(state, mesh))
    batch_sh = batch_sharding(mesh)

    if kind == "single":
        raw_step = make_sefusion_step(model, cfg, optimizer, rng)
    else:
        raw_step = make_auxi_train_step(model, cfg, optimizer,
                                        seven_tuple=kind == "seven",
                                        base_rng=rng, av_inputs=True)

    def train_step(state, batch):
        rngk = jax.random.fold_in(rng, state.step)
        return raw_step(state, train_pre(batch, rngk))

    def eval_step(state, batch):
        b = eval_pre(batch)
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          b["audio"], b["visual"], train=False,
                          av_inputs=True)
        if kind == "triple":
            o, oa, ov = out
        elif kind == "seven":
            o, oa, ov = out[0], out[5], out[6]
        else:
            o = oa = ov = out
        return {"pred": jnp.argmax(o, -1), "pred_a": jnp.argmax(oa, -1),
                "pred_v": jnp.argmax(ov, -1), "label": batch["label"]}

    train_step = jax.jit(train_step, donate_argnums=(0,))
    eval_step = jax.jit(eval_step)

    os.makedirs(cfg.ckpt_path, exist_ok=True)
    acc_csv = CSVLogger(os.path.join(
        cfg.ckpt_path, f"{cfg.dataset}_{args.model}.csv"),
        sentinel=[1000, 1000, 1000])

    best_acc = 0.0
    for epoch in range(cfg.epochs):
        print("Epoch: {}: ".format(epoch))
        for batch in train_loader:
            batch = {k: jax.device_put(v, batch_sh)
                     for k, v in batch.items()}
            state, metrics = train_step(state, batch)
        counters = PerClassAccuracy(cfg.n_classes)
        from gdl_tpu.train.loop import _pad_batch

        for batch in test_loader:
            batch, n = _pad_batch(batch, cfg.batch_size)
            batch = {k: jax.device_put(v, batch_sh)
                     for k, v in batch.items()}
            out = jax.device_get(eval_step(state, batch))
            counters.update(out["pred"][:n], out["pred_a"][:n],
                            out["pred_v"][:n], out["label"][:n])
        acc, acc_a, acc_v = counters.results()
        acc_csv.write_row([acc, acc_a, acc_v])
        acc_csv.flush()
        print("Acc: {:.3f} (a {:.3f}, v {:.3f}), loss {:.3f}".format(
            acc, acc_a, acc_v, float(jax.device_get(metrics["loss"]))))
        if acc > best_acc and epoch:
            best_acc = float(acc)
            path = save_legacy_checkpoint(cfg, state, epoch, acc)
            print("The best model has been saved at {}.".format(path))
    acc_csv.close()


if __name__ == "__main__":
    main()
