"""Joint-path (main.py) update-rule trajectory parity — VERDICT round-2
item 5.

The torch side implements the reference's LIVE joint loop plus the only
modulation spec that exists (the commented block):
  - loss = CE(fused) + beta * (regurize_a + regurize_v)   (main.py:175-213)
  - loss.backward(); clip_grad_norm_(40)                  (main.py:240)
  - OGM / OGM-GE per-modality conv-grad scaling inside the
    [modulation_starts, modulation_ends] epoch window     (main.py:286-332)
  - SGD(momentum=0.9, weight_decay=1e-4)                  (main.py:510)
  - GradualWarmupScheduler(multiplier=1) stepped at each epoch TOP
    (main.py:131-132, :390-391): lr = base * e / total_epoch
and the flax side is make_joint_train_step + make_optimizer(clip_norm=None)
— the exact production chain (train/loop.py:79-80).

The PE reparameterization draws eps ~ N(0,1) (and OGM_GE draws per-tensor
noise); torch and JAX RNGs can never produce the same stream, so the test
monkeypatches jax.random.normal with a shape-checked queue of numpy draws
and feeds the torch oracle the SAME arrays — the trajectory then verifies
every deterministic piece of the update rule given identical noise.
"""

import numpy as np
import torch
import torch.nn as tnn

from gdl_tpu.config import Config
from tests.test_torch_interop import TorchRefResNet

WIDTH = 8
STAGES = (1, 1, 1, 1)
DIM = WIDTH * 8
N_CLASSES = 6
BATCH = 4
FRAMES = 2
BETA = 0.05
ALPHA = 0.8  # OGM tanh coefficient
LR = 0.01
TOTAL_EPOCH = 10  # warmup length
STEPS_PER_EPOCH = 2


class TorchPEHead(tnn.Module):
    """Mirror of gdl_tpu PEHead (1x1 conv + BN mu / logvar branches,
    reparameterized sample); eps is injected, not drawn."""

    def __init__(self, dim):
        super().__init__()
        self.mu_conv = tnn.Conv2d(dim, dim, 1)
        self.mu_bn = tnn.BatchNorm2d(dim)
        self.logvar_conv = tnn.Conv2d(dim, dim, 1)
        self.logvar_bn = tnn.BatchNorm2d(dim)

    def forward(self, x, eps):
        mu = self.mu_bn(self.mu_conv(x))
        logvar = self.logvar_bn(self.logvar_conv(x))
        std = torch.exp(0.5 * logvar)
        return mu + eps * std, mu, std


class TorchJointFusion(tnn.Module):
    """ConcatFusion (fusion_modules.py:33-42): plain fc_out."""

    def __init__(self):
        super().__init__()
        self.fc_out = tnn.Linear(2 * DIM, N_CLASSES)

    def forward(self, x, y):
        return x, y, self.fc_out(torch.cat((x, y), dim=1))


class TorchAVClassifierJoint(tnn.Module):
    """Torch mirror of gdl_tpu AVClassifier (the reconstructed 11-tuple
    joint model) at tiny width, attribute names matching the exporter."""

    def __init__(self):
        super().__init__()
        self.audio_net = TorchRefResNet(1, WIDTH, STAGES)
        self.visual_net = TorchRefResNet(3, WIDTH, STAGES)
        self.fusion_module = TorchJointFusion()
        self.audio_pe = TorchPEHead(DIM)
        self.visual_pe = TorchPEHead(DIM)

    def forward(self, spec, image, eps_a, eps_v):
        a_feature = self.audio_net(spec)
        B, C3, T, H, W = image.shape
        v_feature = self.visual_net(
            image.permute(0, 2, 1, 3, 4).reshape(B * T, C3, H, W))

        a_map, a_mul, a_std = self.audio_pe(a_feature, eps_a)
        v_map, v_mul, v_std = self.visual_pe(v_feature, eps_v)

        a = torch.flatten(tnn.functional.adaptive_avg_pool2d(a_map, 1), 1)
        _, C, h, w = v_map.shape
        v = v_map.view(B, T, C, h, w).mean(dim=(1, 3, 4))

        _, _, out = self.fusion_module(a, v)
        _, _, out_a = self.fusion_module(a, torch.zeros_like(v))
        _, _, out_v = self.fusion_module(torch.zeros_like(a), v)
        return (a, v, out, a_feature, v_feature,
                a_mul, a_std, v_mul, v_std, out_a, out_v)


def _torch_regurize(mul, std):
    """main.py:92-102."""
    var = (std ** 2).reshape(std.shape[0], -1)
    mu = mul.reshape(mul.shape[0], -1)
    kl = 0.5 * (var + mu ** 2 - torch.log(var + 1e-8) - 1.0)
    return kl.sum(dim=1).mean()


def _warmup_lr(epoch):
    """GradualWarmupScheduler(multiplier=1) stepped with e = epoch+1 at the
    epoch top (main.py:131-132, :390-391); milestones far away."""
    e = epoch + 1
    return LR * min(float(e), TOTAL_EPOCH) / TOTAL_EPOCH


def _reference_joint_loop(model, batches, modulation, mod_starts, mod_ends,
                          ge_noise=None):
    """The live main.py loop + the commented modulation spec, verbatim
    semantics. ge_noise: {param_name: unit_normal_array} for OGM_GE."""
    criterion = tnn.CrossEntropyLoss()
    opt = torch.optim.SGD(model.parameters(), lr=LR, momentum=0.9,
                          weight_decay=1e-4)
    losses = []
    applied_coeffs = []  # power check: modulation must actually bite
    model.train()
    for step, (spec, image, label, eps_a, eps_v) in enumerate(batches):
        epoch = step // STEPS_PER_EPOCH
        if step % STEPS_PER_EPOCH == 0:  # scheduler at the epoch TOP
            for g in opt.param_groups:
                g["lr"] = _warmup_lr(epoch)
        (a, v, out, _, _, a_mul, a_std, v_mul, v_std,
         out_a, out_v) = model(torch.from_numpy(spec),
                               torch.from_numpy(image),
                               torch.from_numpy(eps_a),
                               torch.from_numpy(eps_v))
        loss_f = criterion(out, torch.from_numpy(label))
        loss = loss_f + BETA * (_torch_regurize(a_mul, a_std)
                                + _torch_regurize(v_mul, v_std))
        opt.zero_grad()
        loss.backward()
        tnn.utils.clip_grad_norm_(model.parameters(), max_norm=40,
                                  norm_type=2)

        if modulation in ("OGM", "OGM_GE"):
            softmax = tnn.Softmax(dim=1)
            lab = torch.from_numpy(label)
            score_v = sum(softmax(out_v)[i][lab[i]]
                          for i in range(out_v.size(0)))
            score_a = sum(softmax(out_a)[i][lab[i]]
                          for i in range(out_a.size(0)))
            ratio_v = score_v / score_a
            ratio_a = 1 / ratio_v
            if ratio_v > 1:
                coeff_v = 1 - torch.tanh(
                    ALPHA * torch.relu(ratio_v)).item()
                coeff_a = 1.0
            else:
                coeff_a = 1 - torch.tanh(
                    ALPHA * torch.relu(ratio_a)).item()
                coeff_v = 1.0
            if mod_starts <= epoch <= mod_ends:
                applied_coeffs.append(min(coeff_a, coeff_v))
                for name, parms in model.named_parameters():
                    layer = name.split(".")[0]
                    coeff = None
                    if "audio" in layer and parms.grad.dim() == 4:
                        coeff = coeff_a
                    elif "visual" in layer and parms.grad.dim() == 4:
                        coeff = coeff_v
                    if coeff is not None:
                        if modulation == "OGM_GE":
                            noise = torch.from_numpy(ge_noise[name]) * (
                                parms.grad.std().item() + 1e-8)
                            parms.grad = parms.grad * coeff + noise
                        else:
                            parms.grad = parms.grad * coeff
        opt.step()
        losses.append(float(loss))
    return losses, applied_coeffs


class _QueueNormal:
    """Shape-checked replacement for jax.random.normal: pops pre-drawn
    numpy arrays so torch and flax consume identical noise."""

    def __init__(self):
        self.queue = []

    def push(self, arr):
        self.queue.append(np.asarray(arr, np.float32))

    def __call__(self, key, shape=(), dtype=np.float32):
        assert self.queue, "unexpected jax.random.normal draw"
        arr = self.queue.pop(0)
        assert tuple(arr.shape) == tuple(shape), (arr.shape, shape)
        import jax.numpy as jnp

        return jnp.asarray(arr, dtype)


def _joint_cfg(modulation, mod_starts, mod_ends):
    return Config(dataset="CREMAD", fusion_method="concat", modality="full",
                  modulation=modulation, fps=FRAMES, batch_size=BATCH,
                  alpha=ALPHA, beta=BETA, pe=1, drop=0, learning_rate=LR,
                  optimizer="sgd", lr_decay_step=[10 ** 6], warmup=True,
                  total_epoch=TOTAL_EPOCH, encoder_width=WIDTH,
                  encoder_stages=list(STAGES),
                  modulation_starts=mod_starts, modulation_ends=mod_ends,
                  log_grad_csv=False)


def _eligible_conv_paths(params):
    """Flax paths (in apply_ogm's flatten order) of grads that receive GE
    noise: first component contains audio/visual, leaf is 4-D."""
    import jax

    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = [getattr(p, "key", "") for p in path]
        top = names[0] if names else ""
        if ("audio" in top or "visual" in top) and np.ndim(leaf) == 4:
            out.append((names, np.shape(leaf)))
    return out


def _flax_path_to_torch_name(names):
    """audio_net/layer1_0/conv1/kernel -> audio_net.layer1.0.conv1.weight"""
    parts = []
    for n in names[:-1]:
        if n.startswith("layer") and "_" in n:
            s, b = n.split("_")
            parts += [s, b]
        elif n == "downsample_conv":
            parts += ["downsample", "0"]
        elif n == "downsample_bn":
            parts += ["downsample", "1"]
        else:
            parts.append(n)
    assert names[-1] == "kernel"
    return ".".join(parts + ["weight"])


def _run_joint_parity(steps, modulation, mod_starts, mod_ends,
                      monkeypatch):
    import jax
    import jax.numpy as jnp

    from gdl_tpu.models.classifier import AVClassifier
    from gdl_tpu.train.dgl import TrainState
    from gdl_tpu.train.joint import make_joint_train_step
    from gdl_tpu.train.optim import make_optimizer
    from gdl_tpu.utils.torch_interop import flax_to_torch_state_dict

    cfg = _joint_cfg(modulation, mod_starts, mod_ends)
    model = AVClassifier(config=cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((2, 32, 24, 1)),
                           jnp.zeros((2, FRAMES, 32, 32, 3)), train=False)

    tmodel = TorchAVClassifierJoint()
    sd = flax_to_torch_state_dict(variables["params"],
                                  variables["batch_stats"], prefix="")
    tmodel.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                            for k, v in sd.items()}, strict=True)

    rng = np.random.default_rng(3)
    fh, fw = 1, 1  # layer-4 map is 1x1 at 32x24 spec / 32^2 frames
    batches = []
    for _ in range(steps):
        spec = rng.standard_normal((BATCH, 1, 32, 24)).astype(np.float32)
        image = rng.standard_normal(
            (BATCH, 3, FRAMES, 32, 32)).astype(np.float32)
        label = rng.integers(0, N_CLASSES, BATCH).astype(np.int64)
        eps_a = rng.standard_normal((BATCH, DIM, fh, fw)).astype(np.float32)
        eps_v = rng.standard_normal(
            (BATCH * FRAMES, DIM, fh, fw)).astype(np.float32)
        batches.append((spec, image, label, eps_a, eps_v))

    ge_paths = _eligible_conv_paths(variables["params"])
    ge_noise_flax = []  # per-step list of unit normals in flatten order
    ge_noise_torch = None
    if modulation == "OGM_GE":
        ge_noise_torch = {}
        for names, shape in ge_paths:
            arr = rng.standard_normal(shape).astype(np.float32)
            ge_noise_flax.append(arr)
            # flax conv kernel [kh, kw, I, O] -> torch grad [O, I, kh, kw]
            ge_noise_torch[_flax_path_to_torch_name(names)] = (
                np.ascontiguousarray(arr.transpose(3, 2, 0, 1)))

    # ---- torch side ----
    ref_losses, applied_coeffs = _reference_joint_loop(
        tmodel, batches, modulation, mod_starts, mod_ends,
        ge_noise=ge_noise_torch)

    # ---- flax side (eager; jax.random.normal queue-patched) ----
    qn = _QueueNormal()
    monkeypatch.setattr(jax.random, "normal", qn)
    optimizer = make_optimizer(cfg, STEPS_PER_EPOCH, clip_norm=None)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=optimizer.init(variables["params"]))
    step_fn = make_joint_train_step(model, cfg, optimizer, STEPS_PER_EPOCH)
    our_losses = []
    for step, (spec, image, label, eps_a, eps_v) in enumerate(batches):
        epoch = step // STEPS_PER_EPOCH
        qn.push(eps_a.transpose(0, 2, 3, 1))  # NHWC draw order: audio pe,
        qn.push(eps_v.transpose(0, 2, 3, 1))  # then visual pe,
        if (modulation == "OGM_GE"
                and mod_starts <= epoch <= mod_ends):
            for arr in ge_noise_flax:  # then GE noise in flatten order
                qn.push(arr)
        batch = {"audio": jnp.asarray(spec.transpose(0, 2, 3, 1)),
                 "visual": jnp.asarray(image.transpose(0, 2, 3, 4, 1)),
                 "label": jnp.asarray(label)}
        state, metrics = step_fn(state, batch)
        our_losses.append(float(metrics["loss"]))
        assert not qn.queue, "unconsumed queued noise"
    if modulation in ("OGM", "OGM_GE"):
        # vacuity guard: the window opened AND the coefficient moved
        assert applied_coeffs and min(applied_coeffs) < 0.9, applied_coeffs
    return ref_losses, our_losses, tmodel, state, variables


def _assert_trajectories_match(ref_losses, our_losses, tmodel, state,
                               steps):
    from gdl_tpu.utils.torch_interop import flax_to_torch_state_dict

    for k, (r, o) in enumerate(zip(ref_losses, our_losses)):
        np.testing.assert_allclose(o, r, rtol=3e-4 * (k + 1),
                                   atol=3e-4 * (k + 1), err_msg=f"step {k}")
    ours = flax_to_torch_state_dict(state.params, state.batch_stats,
                                    prefix="")
    theirs = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    checked = 0
    for k, v in ours.items():
        if k.endswith(("running_mean", "running_var",
                       "num_batches_tracked")):
            continue
        np.testing.assert_allclose(
            v, theirs[k], rtol=2e-2, atol=2e-3,
            err_msg=f"param {k} diverged after {steps} joint steps")
        checked += 1
    assert checked > 50


def test_joint_ogm_trajectory_with_warmup_and_window(monkeypatch):
    """6 steps over 3 'epochs' (steps_per_epoch=2): warmup LR changes at
    every epoch top, and the OGM window [1, 1] switches modulation ON only
    for epoch 1 — verifying the epoch gating and clip->modulate order."""
    steps = 6
    ref_losses, our_losses, tmodel, state, _ = _run_joint_parity(
        steps, "OGM", 1, 1, monkeypatch)
    _assert_trajectories_match(ref_losses, our_losses, tmodel, state, steps)


def test_joint_ogm_ge_single_step(monkeypatch):
    """OGM_GE for 2 steps with the epoch window open from step 0: the
    per-tensor Gaussian noise (std(grad)+1e-8 scaled) is shared between
    the two sides through the queue + name-map, so the GE branch's full
    update is checked deterministically."""
    steps = 2
    ref_losses, our_losses, tmodel, state, _ = _run_joint_parity(
        steps, "OGM_GE", 0, 10, monkeypatch)
    _assert_trajectories_match(ref_losses, our_losses, tmodel, state, steps)


def test_joint_normal_trajectory(monkeypatch):
    """modulation=Normal: the live loop exactly (no modulation block)."""
    steps = 4
    ref_losses, our_losses, tmodel, state, _ = _run_joint_parity(
        steps, "Normal", 0, 50, monkeypatch)
    _assert_trajectories_match(ref_losses, our_losses, tmodel, state, steps)
