"""Convergence A/B for MMFormerN --share_unimodal_streams (VERDICT r3
item 5; same protocol as examples/dgl_vs_joint_demo.py).

Eval forwards are bit-identical either way (tests/test_intermediate.py);
sharing changes TRAIN dynamics only: the per-pass dropout masks become
correlated across the fused/unimodal fusion passes and the projection BNs
accumulate one running update per step instead of three
(/root/reference/models/surf_mmfomer.py:337-351 draws independently).
This study trains shared vs unshared from IDENTICAL initial weights on
class-templated synthetic data for N seeds and compares final eval
accuracy distributions — the measured basis for the default
(+13% throughput if accuracy-neutral, benchmarks/RESULTS.md).

Run: python tools/share_streams_ab.py [--seeds 5 --epochs 6]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def make_data(rng, n, n_classes=6, hw=64, sep=1.2, templates=None):
    """Class-templated gaussian data. `templates` (ta, tb) must be SHARED
    between the train and test draws of one seed — the first revision of
    this study drew fresh test templates, which made generalization
    impossible by construction and left every eval at chance while train
    accuracy hit 1.0 (the round-4 'neutral at chance' non-result)."""
    if templates is None:
        templates = (rng.standard_normal((n_classes, hw, hw, 3)),
                     rng.standard_normal((n_classes, hw, hw, 3)))
    ta, tb = templates
    y = rng.integers(0, n_classes, n)
    a = (sep * ta[y] + rng.standard_normal((n, hw, hw, 3))).astype(
        np.float32)
    b = (sep * tb[y] + rng.standard_normal((n, hw, hw, 3))).astype(
        np.float32)
    return (a, b, y.astype(np.int32)), templates


def run_variant(share: bool, seed: int, train, test, epochs: int,
                batch: int, steps_cache={}):
    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.models.intermediate import MMFormerN
    from gdl_tpu.train.auxi import make_auxi_train_step
    from gdl_tpu.train.dgl import TrainState
    from gdl_tpu.train.optim import make_optimizer

    cfg = Config(dataset="CREMAD", learning_rate=8e-3, optimizer="sgd",
                 lr_decay_step=[10 ** 6], alpha=0.3, beta=1e-2,
                 batch_size=batch, log_grad_csv=False)
    model = MMFormerN(num_classes=6, embed_dim=64, width=8, seq_len=16,
                      share_streams=share)
    a, b, y = train
    rng = jax.random.PRNGKey(seed)
    # IDENTICAL init for both variants (share_streams is forward-only)
    variables = model.init({"params": jax.random.PRNGKey(seed),
                            "drop": rng, "dropout": rng, "pe": rng},
                           jnp.asarray(a[:2]), jnp.asarray(b[:2]),
                           train=False, av_inputs=False)
    optimizer = make_optimizer(cfg, steps_per_epoch=10 ** 6)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=optimizer.init(variables["params"]))
    key = ("step", share)
    if key not in steps_cache:
        raw = make_auxi_train_step(model, cfg, optimizer,
                                   seven_tuple=True,
                                   base_rng=jax.random.PRNGKey(1234),
                                   av_inputs=False)
        steps_cache[key] = jax.jit(raw, donate_argnums=(0,))

        def eval_fn(params, stats, xa, xb):
            out = model.apply({"params": params, "batch_stats": stats},
                              xa, xb, train=False, av_inputs=False)
            return jnp.argmax(out[0], -1)

        steps_cache[("eval", share)] = jax.jit(eval_fn)
    step_fn = steps_cache[key]
    eval_fn = steps_cache[("eval", share)]

    def test_acc(state):
        ta_, tb_, ty = test
        preds = []
        for s in range(len(ty) // batch):
            sl = slice(s * batch, (s + 1) * batch)
            preds.append(np.asarray(eval_fn(state.params,
                                            state.batch_stats,
                                            jnp.asarray(ta_[sl]),
                                            jnp.asarray(tb_[sl]))))
        preds = np.concatenate(preds)
        return float((preds == ty[:len(preds)]).mean())

    n = len(y)
    order_rng = np.random.default_rng(seed * 7 + 1)
    accs = []  # per-epoch eval accuracy (convergence trajectory)
    for _ in range(epochs):
        order = order_rng.permutation(n)
        for s in range(n // batch):
            sel = order[s * batch:(s + 1) * batch]
            state, _ = step_fn(state, {
                "audio": jnp.asarray(a[sel]), "visual": jnp.asarray(b[sel]),
                "label": jnp.asarray(y[sel])})
        accs.append(test_acc(state))
    return accs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--sep", type=float, default=1.2,
                    help="class-template separation (higher = easier "
                         "task = more statistical power)")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                    help="cpu (default): a convergence study needs no "
                         "accelerator and must not steal the exclusive "
                         "TPU tunnel from measurement jobs")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        # authoritative backend switch (the site env pins axon;
        # the env var alone does not override it)
        jax.config.update("jax_platforms", "cpu")

    results = {False: [], True: []}   # per-seed final accuracy
    aucs = {False: [], True: []}      # per-seed mean-over-epochs accuracy
    for seed in range(args.seeds):
        data_rng = np.random.default_rng(100 + seed)
        train, templates = make_data(data_rng, 96, sep=args.sep)
        test, _ = make_data(np.random.default_rng(900 + seed), 128,
                            sep=args.sep, templates=templates)
        for share in (False, True):
            accs = run_variant(share, seed, train, test, args.epochs,
                               args.batch)
            results[share].append(accs[-1])
            aucs[share].append(float(np.mean(accs)))
            print(f"seed {seed} share={share}: final {accs[-1]:.4f} "
                  f"auc {np.mean(accs):.4f}  traj "
                  f"{np.round(accs, 3).tolist()}", flush=True)

    for label, d in (("final", results), ("auc (convergence)", aucs)):
        u, s = np.array(d[False]), np.array(d[True])
        print(f"\n[{label}]")
        print("unshared: mean %.4f std %.4f  %s" % (u.mean(), u.std(),
                                                    np.round(u, 4)))
        print("shared:   mean %.4f std %.4f  %s" % (s.mean(), s.std(),
                                                    np.round(s, 4)))
        print("delta (shared - unshared): %.4f  (pooled std %.4f)"
              % (s.mean() - u.mean(), np.sqrt((u.var() + s.var()) / 2)))


if __name__ == "__main__":
    main()
