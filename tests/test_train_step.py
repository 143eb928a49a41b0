"""Training-step tests: optimizer/EMA/scheduler parity + distributed DP.

The distributed test exploits an exact invariant: when every mesh replica
sees the identical local batch, the data-parallel step (per-replica BN,
pmean'd grads) must produce bitwise-matching state to a single-device step
on that batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _toy_batch(size=64, batch=2):
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (batch, size, size, 3)).astype(np.float32)
    labels = np.zeros((batch, 8, 5), np.float32)
    labels[:, 0] = [1, size / 2, size / 2, size / 3, size / 3]
    labels[:, 1] = [5, size / 4, size / 4, size / 4, size / 5]
    return x, labels


@pytest.fixture(scope="module")
def tiny_module():
    from yolox_tpu import YoloxConfig, YoloxModule

    cfg = YoloxConfig.get_named_config("yolox_nano")  # smallest/fastest
    return YoloxModule.from_config(cfg), cfg


@pytest.mark.slow
def test_loss_decreases(tiny_module):
    from yolox_tpu.core import init_train_state, make_train_step

    module, cfg = tiny_module
    state = init_train_state(module.params)
    step = make_train_step(module, cfg.num_classes)
    x, labels = _toy_batch()
    # SimOTA re-assignment makes per-step losses noisy; compare windowed
    # means rather than two individual steps.
    losses = []
    for _ in range(16):
        state, m = step(state, x, labels, jnp.float32(0.01))
        losses.append(float(m["total_loss"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


@pytest.mark.slow
def test_distributed_matches_single_device(tiny_module):
    from yolox_tpu.core import init_train_state, make_train_step
    from yolox_tpu.parallel.mesh import (
        data_parallel_mesh, replicate, shard_batch)

    module, cfg = tiny_module
    n = min(8, jax.device_count())
    assert n >= 2, "conftest should provide 8 virtual devices"

    x, labels = _toy_batch(batch=2)

    # single device
    state1 = init_train_state(module.params)
    step1 = make_train_step(module, cfg.num_classes)
    state1, m1 = step1(state1, x, labels, jnp.float32(0.01))

    # n devices, identical local batch on each replica
    mesh = data_parallel_mesh(n)
    xn = np.tile(x, (n, 1, 1, 1))
    labelsn = np.tile(labels, (n, 1, 1))
    staten = replicate(mesh, init_train_state(module.params))
    stepn = make_train_step(module, cfg.num_classes, mesh=mesh)
    xn, labelsn = shard_batch(mesh, xn, labelsn)
    staten, mn = stepn(staten, xn, labelsn, jnp.float32(0.01))

    assert float(mn["total_loss"]) == pytest.approx(
        float(m1["total_loss"]), rel=1e-5)
    p1 = jax.tree.leaves(state1["params"])
    pn = jax.tree.leaves(staten["params"])
    for a, b in zip(p1, pn):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    s1 = jax.tree.leaves(state1["stats"])
    sn = jax.tree.leaves(staten["stats"])
    for a, b in zip(s1, sn):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_sgd_matches_torch():
    import torch

    from yolox_tpu.core.optimizer import init_momentum, sgd_update

    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 4)).astype(np.float32)   # "conv weight": decay
    b = rng.normal(size=(4,)).astype(np.float32)     # "bias": no decay
    g_w = [rng.normal(size=(4, 4)).astype(np.float32) for _ in range(3)]
    g_b = [rng.normal(size=(4,)).astype(np.float32) for _ in range(3)]

    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b.copy()))
    opt = torch.optim.SGD([tw], lr=0.01, momentum=0.9, nesterov=True,
                          weight_decay=5e-4)
    opt.add_param_group({"params": [tb], "weight_decay": 0.0})
    for gw, gb in zip(g_w, g_b):
        opt.zero_grad()
        tw.grad = torch.from_numpy(gw.copy())
        tb.grad = torch.from_numpy(gb.copy())
        opt.step()

    params = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    # hand-build the mask (weight_decay_mask wants 4-D conv kernels)
    mask = {"weight": 1.0, "bias": 0.0}
    buf = init_momentum(params)
    for gw, gb in zip(g_w, g_b):
        grads = {"weight": jnp.asarray(gw), "bias": jnp.asarray(gb)}
        params, buf = sgd_update(params, grads, buf, mask, lr=0.01,
                                 momentum=0.9, weight_decay=5e-4)

    np.testing.assert_allclose(np.asarray(params["weight"]),
                               tw.detach().numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["bias"]),
                               tb.detach().numpy(), rtol=1e-6, atol=1e-7)


def test_ema_matches_reference_formula():
    from yolox_tpu.utils.ema import ema_update, init_ema

    p0 = {"w": jnp.ones((3,)) * 2.0, "n": jnp.zeros((), jnp.int32)}
    ema = init_ema(p0)
    p1 = {"w": jnp.ones((3,)) * 4.0, "n": jnp.ones((), jnp.int32)}
    ema = ema_update(ema, p1, jnp.int32(1), decay=0.9998)
    d = 0.9998 * (1 - np.exp(-1 / 2000))
    expect = 2.0 * d + 4.0 * (1 - d)
    np.testing.assert_allclose(np.asarray(ema["w"]), expect, rtol=1e-6)
    assert int(ema["n"]) == 1  # non-float leaves copy through


def test_lr_scheduler_matches_reference():
    from tests._reference_oracle import load_reference, reference_available

    if not reference_available():
        pytest.skip("/root/reference not available")
    load_reference()
    from yolox.utils.lr_scheduler import LRScheduler as RefLR

    from yolox_tpu.utils.lr_scheduler import LRScheduler

    kwargs = dict(warmup_epochs=5, warmup_lr_start=0, no_aug_epochs=15,
                  min_lr_ratio=0.05)
    ref = RefLR("yoloxwarmcos", 0.01, 100, 300, **kwargs)
    ours = LRScheduler("yoloxwarmcos", 0.01, 100, 300, **kwargs)
    for it in [0, 1, 250, 499, 500, 501, 5000, 15000, 28499, 28500, 29999]:
        assert ours.update_lr(it) == pytest.approx(ref.update_lr(it),
                                                   rel=1e-12), it
    for name in ("cos", "warmcos", "multistep"):
        kw = dict(kwargs)
        if name == "multistep":
            kw["milestones"] = [150, 250]
        ref = RefLR(name, 0.01, 50, 300, **kw)
        ours = LRScheduler(name, 0.01, 50, 300, **kw)
        for it in [0, 10, 100, 5000, 14999]:
            assert ours.update_lr(it) == pytest.approx(
                ref.update_lr(it), rel=1e-12), (name, it)


def test_freeze_prefix_pins_params(tiny_module):
    from yolox_tpu.core import init_train_state, make_train_step
    from yolox_tpu.models.weights import nested_to_flat

    module, cfg = tiny_module
    state = init_train_state(module.params)
    step = make_train_step(module, cfg.num_classes,
                           freeze_prefix="backbone")
    x, labels = _toy_batch()
    before = {k: np.asarray(v).copy()
              for k, v in nested_to_flat(state["params"]).items()}
    stats_before = {k: np.asarray(v).copy()
                    for k, v in nested_to_flat(state["stats"]).items()}
    for _ in range(2):
        state, _ = step(state, x, labels, jnp.float32(0.02))
    after = nested_to_flat(state["params"])
    changed = {k for k in before
               if not np.array_equal(before[k], np.asarray(after[k]))}
    assert all(not k.startswith("backbone") for k in changed), (
        sorted(changed)[:5])
    assert any(k.startswith("head") for k in changed)
    # frozen modules run in eval mode (reference freeze_module puts them in
    # eval()): their BN running stats must not move; head stats must
    stats_after = nested_to_flat(state["stats"])
    stats_changed = {
        k for k in stats_before
        if not np.array_equal(stats_before[k], np.asarray(stats_after[k]))}
    assert all(not k.startswith("backbone") for k in stats_changed), (
        sorted(stats_changed)[:5])
    assert any(k.startswith("head") for k in stats_changed)


@pytest.mark.slow
def test_bf16_train_step_runs_and_learns(tiny_module):
    """AMP path: f32 master weights, bf16 compute (--fp16 flag)."""
    from yolox_tpu.core import init_train_state, make_train_step

    module, cfg = tiny_module
    state = init_train_state(module.params)
    step = make_train_step(module, cfg.num_classes,
                           compute_dtype=jnp.bfloat16)
    x, labels = _toy_batch()
    losses = []
    for _ in range(12):
        state, m = step(state, x, labels, jnp.float32(0.01))
        losses.append(float(m["total_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    # master params stayed f32
    assert all(
        a.dtype == jnp.float32
        for a in jax.tree.leaves(state["params"])
        if jnp.issubdtype(a.dtype, jnp.floating))


@pytest.mark.slow
def test_remat_matches_no_remat(tiny_module):
    """jax.checkpoint remat must not change the step's numerics."""
    from yolox_tpu.core import init_train_state, make_train_step

    module, cfg = tiny_module
    x, labels = _toy_batch()
    outs = []
    for remat in (False, True):
        state = init_train_state(module.params)
        step = make_train_step(module, cfg.num_classes, remat=remat)
        state, m = step(state, x, labels, jnp.float32(0.01))
        outs.append((state, float(m["total_loss"])))
    assert outs[0][1] == pytest.approx(outs[1][1], rel=1e-6)
    for a, b in zip(jax.tree.leaves(outs[0][0]["params"]),
                    jax.tree.leaves(outs[1][0]["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_overfit_two_images_yields_correct_detection(tiny_module):
    """End-to-end coherence of the full training loop: assignment ->
    losses -> gradients -> decode -> NMS. Overfit yolox-nano on two
    fixed noise images sharing one gt box; after 600 steps the
    postprocessed output must contain a confident detection of the
    right class centered inside the gt box. (Assertions are chosen to
    be robust to the chaotic SGD trajectory of random-init + tiny data:
    they catch decode sign errors, class mix-ups, and NMS breakage —
    things the loss-goes-down test above cannot see. Analog of the
    reference's train-regression oracle,
    /root/reference/tests/test_training.py:10-51, without the dataset.

    The confidence gate is deliberately loose (0.05): the 600-step
    endpoint is chaotic in the host's fp reduction order — the same
    bitwise program reaches obj*cls 0.70 on a plain CPU backend but
    0.10 under the suite's --xla_force_host_platform_device_count=8
    partitioning (measured, 2026-08; class and box center agree in
    both). Decode/NMS/assignment bugs miss by orders of magnitude,
    not 2x, so the loose gate keeps full bug-catching power.)
    """
    from yolox_tpu import YoloxModule
    from yolox_tpu.core import full_params, init_train_state, make_train_step
    from yolox_tpu.ops.nms import postprocess_device

    module, cfg = tiny_module
    size = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (2, size, size, 3)), jnp.float32)
    labels = np.zeros((2, 5, 5), np.float32)
    labels[:, 0] = [3, 64, 64, 48, 40]          # cls 3, cxcywh
    labels = jnp.asarray(labels)

    step = make_train_step(module, cfg.num_classes, use_ema=False)
    state = init_train_state(module.params, use_ema=False)
    for i in range(600):
        lr = 0.02 if i > 50 else 0.02 * (i / 50) ** 2
        state, _ = step(state, x, labels, jnp.float32(lr))

    trained = YoloxModule.from_config(cfg)
    trained.params = full_params(state)
    dets, valid = postprocess_device(
        trained(x), cfg.num_classes, conf_thre=0.05, nms_thre=0.65)
    d = np.asarray(dets[0])
    assert int(np.asarray(valid[0]).sum()) >= 1, "no detection survived"
    top = d[0]
    assert int(top[6]) == 3, top                 # right class
    assert top[4] * top[5] > 0.05, top           # obj * cls confidence
    cx, cy = (top[0] + top[2]) / 2, (top[1] + top[3]) / 2
    # centered inside the gt box (8 px slack: convergence at 600 chaotic
    # SGD steps is approximate; decode bugs are off by >> this)
    assert 32 < cx < 96 and 36 < cy < 92, top


def test_fused_augment_step_matches_separate(tiny_module):
    """make_augmented_train_step (ONE program) must equal
    device_augment_batch -> make_train_step run as separate programs,
    including the multiscale resize stage against the trainer's
    `_multiscale_resize` math."""
    from yolox_tpu.core import (
        init_train_state,
        make_augmented_train_step,
        make_train_step,
    )
    from yolox_tpu.data.device_augment import device_augment_batch

    module, cfg = tiny_module
    size = 64
    rng = np.random.default_rng(3)
    b = 2
    tiles = jnp.asarray(rng.integers(
        0, 255, (b, 5, size, size, 3), dtype=np.uint8))
    hw = jnp.full((b, 5, 2), float(size), jnp.float32)
    labels = np.zeros((b, 5, 6, 5), np.float32)
    labels[..., 0, :] = [10, 10, 40, 40, 1]
    labels[..., 1, :] = [5, 20, 30, 55, 7]
    labels = jnp.asarray(labels)
    key = jax.random.PRNGKey(11)
    lr = jnp.float32(0.01)

    step = make_train_step(module, cfg.num_classes, use_ema=False)
    fused = make_augmented_train_step(
        module, cfg.num_classes, use_ema=False,
        augment_kwargs=dict(max_labels=16))

    # separate programs
    imgs, packed = device_augment_batch(
        tiles, hw, labels, key, out_size=(size, size), max_labels=16)
    state_a = init_train_state(module.params, use_ema=False)
    state_a, m_a = step(state_a, imgs, packed, lr)

    # one fused program (train_size == out_size: no resize stage)
    state_b = init_train_state(module.params, use_ema=False)
    state_b, m_b = fused(state_b, tiles, hw, labels, key, lr,
                         (size, size))
    np.testing.assert_allclose(float(m_a["total_loss"]),
                               float(m_b["total_loss"]), rtol=1e-6)
    flat_a = jax.tree.leaves(state_a["params"])
    flat_b = jax.tree.leaves(state_b["params"])
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)

    # the fused resize stage == resize-then-step on the augmented batch
    tsize = (96, 96)
    sy, sx = tsize[0] / size, tsize[1] / size
    imgs_r = jax.image.resize(
        imgs, (b, tsize[0], tsize[1], 3), method="bilinear",
        antialias=False)
    packed_r = packed * jnp.asarray([1.0, sx, sy, sx, sy], packed.dtype)
    state_c = init_train_state(module.params, use_ema=False)
    state_c, m_c = step(state_c, imgs_r, packed_r, lr)
    state_d = init_train_state(module.params, use_ema=False)
    state_d, m_d = fused(state_d, tiles, hw, labels, key, lr,
                         (size, size), tsize)
    np.testing.assert_allclose(float(m_c["total_loss"]),
                               float(m_d["total_loss"]), rtol=1e-6)


def test_pipelined_step_matches_serial_fused(tiny_module):
    """make_pipelined_train_step (step n + augment n+1 in one program)
    must produce the same state trajectory as make_augmented_train_step
    over a 3-iteration run with per-iteration keys and a multiscale
    bucket switch, and its carried batch must equal prime()'s output."""
    from yolox_tpu.core import (
        init_train_state,
        make_augmented_train_step,
        make_pipelined_train_step,
    )

    module, cfg = tiny_module
    size = 64
    rng = np.random.default_rng(9)
    b = 2
    tiles = jnp.asarray(rng.integers(
        0, 255, (b, 5, size, size, 3), dtype=np.uint8))
    hw = jnp.full((b, 5, 2), float(size), jnp.float32)
    labels = np.zeros((b, 5, 6, 5), np.float32)
    labels[..., 0, :] = [12, 12, 44, 44, 0]
    labels[..., 1, :] = [5, 18, 28, 50, 6]
    labels = jnp.asarray(labels)
    lr = jnp.float32(0.01)
    keys = [jax.random.PRNGKey(100 + i) for i in range(4)]
    tsizes = [(size, size), (96, 96), (size, size)]

    serial = make_augmented_train_step(
        module, cfg.num_classes, use_ema=False,
        augment_kwargs=dict(max_labels=16))
    prime, pipe = make_pipelined_train_step(
        module, cfg.num_classes, use_ema=False,
        augment_kwargs=dict(max_labels=16))

    state_a = init_train_state(module.params, use_ema=False)
    metrics_a = []
    for i in range(3):
        state_a, m = serial(state_a, tiles, hw, labels, keys[i], lr,
                            (size, size), tsizes[i])
        metrics_a.append(float(m["total_loss"]))

    state_b = init_train_state(module.params, use_ema=False)
    imgs, packed = prime(tiles, hw, labels, keys[0], (size, size))
    metrics_b = []
    for i in range(3):
        state_b, m, imgs, packed = pipe(
            state_b, imgs, packed, tiles, hw, labels, keys[i + 1], lr,
            (size, size), tsizes[i])
        metrics_b.append(float(m["total_loss"]))

    np.testing.assert_allclose(metrics_a, metrics_b, rtol=1e-6)
    for la, lb in zip(jax.tree.leaves(state_a["params"]),
                      jax.tree.leaves(state_b["params"])):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)
    # the carried batch left over equals a fresh prime with the last key
    # (tolerance, not bitwise: the augment subgraph is compiled standalone
    # in prime() but fused into the larger step_pipe program, and XLA
    # does not guarantee bit-identical f32 across different programs)
    imgs_p, packed_p = prime(tiles, hw, labels, keys[3], (size, size))
    np.testing.assert_allclose(np.asarray(imgs), np.asarray(imgs_p),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(packed_p),
                               rtol=1e-5, atol=1e-4)


def test_static_prob_fast_paths_match_generic(tiny_module):
    """mosaic_prob/hsv_prob == 1.0 take trace-time fast paths (the plain
    image path and the HSV select are skipped); the result must equal the
    generic path at a prob of 1.0 - eps, which computes the selects."""
    from yolox_tpu.data.device_augment import device_augment_batch

    size = 64
    rng = np.random.default_rng(5)
    b = 3
    tiles = jnp.asarray(rng.integers(
        0, 255, (b, 5, size, size, 3), dtype=np.uint8))
    hw = jnp.full((b, 5, 2), float(size), jnp.float32)
    labels = np.zeros((b, 5, 4, 5), np.float32)
    labels[..., 0, :] = [8, 8, 30, 30, 2]
    labels = jnp.asarray(labels)
    key = jax.random.PRNGKey(7)

    img_fast, lab_fast = device_augment_batch(
        tiles, hw, labels, key, out_size=(size, size), max_labels=8,
        mosaic_prob=1.0, hsv_prob=1.0)
    # 1 - 2^-30: every uniform draw in [0, 1) compares identically, but
    # the < 1.0 trace-time branch is not taken
    p = 1.0 - 2.0**-30
    img_gen, lab_gen = device_augment_batch(
        tiles, hw, labels, key, out_size=(size, size), max_labels=8,
        mosaic_prob=p, hsv_prob=p)
    np.testing.assert_allclose(np.asarray(img_fast), np.asarray(img_gen),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(lab_fast), np.asarray(lab_gen),
                               atol=1e-5)
