"""AUXI multi-task training for the intermediate-fusion nets.

Under the reference's DGL driver the fusion-grad erasure keys on parameter
names containing 'fusion' (main_dgl.py:114-119); MMTM_Net / SE-fusion /
mmformer expose no such names and MMTM's fused path is not actually
detached (mmtm_net.py:391-393), so "DGL" over these nets degenerates to
plain multi-task AUXI:  loss = alpha·(CE_rgb + CE_depth) + CE_fused with
every parameter live. This step implements exactly that (and doubles as
the trainer for SURF_Fomer_N's 7-tuple with its PE-KL term).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax

from gdl_tpu.config import Config
from gdl_tpu.train.dgl import TrainState, cross_entropy, fast_stream
from gdl_tpu.train.joint import regurize


def make_auxi_train_step(model, cfg: Config,
                         optimizer: optax.GradientTransformation,
                         seven_tuple: bool = False,
                         base_rng: Optional[jax.Array] = None,
                         **apply_kwargs) -> Callable:
    """seven_tuple=False: model returns (out, out_a, out_b) (MMTMNet);
    seven_tuple=True: SURF_Fomer_N's (x_f, mu_a, std_a, mu_b, std_b,
    x_a, x_b) with the KL regularizer weighted by cfg.beta."""
    if base_rng is None:
        base_rng = jax.random.PRNGKey(cfg.random_seed)

    def loss_fn(params, batch_stats, batch, rng):
        rng = fast_stream(rng, getattr(cfg, "fast_dropout_rng", True))
        rngs = {"drop": rng, "dropout": rng, "pe": rng}
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["audio"], batch["visual"], train=True, rngs=rngs,
            mutable=["batch_stats"], **apply_kwargs)
        labels = batch["label"]
        if seven_tuple:
            x_f, mu_a, std_a, mu_b, std_b, x_a, x_b = outputs
            kl = regurize(mu_a, std_a) + regurize(mu_b, std_b)
        else:
            x_f, x_a, x_b = outputs
            kl = 0.0
        loss_f = cross_entropy(x_f, labels)
        loss_a = cross_entropy(x_a, labels)
        loss_b = cross_entropy(x_b, labels)
        loss = cfg.alpha * (loss_a + loss_b) + loss_f + cfg.beta * kl
        metrics = {"loss": loss, "loss_f": loss_f, "loss_a": loss_a,
                   "loss_v": loss_b}
        return loss, (mutated["batch_stats"], metrics)

    def train_step(state: TrainState, batch):
        rng = jax.random.fold_in(base_rng, state.step)
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=new_stats, opt_state=new_opt), metrics

    return train_step
