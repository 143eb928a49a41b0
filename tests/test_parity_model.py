"""Numerical parity of the JAX model vs the reference torch implementation.

Builds the reference torch model with seeded random weights, converts the
state dict to our pytree, and compares eval-mode forward outputs elementwise
(f32). Covers: plain conv path (yolox-s), depthwise path (yolox-nano),
non-square inputs, train-mode BatchNorm, and the legacy Darknet/YoloFpn.
"""

import numpy as np
import pytest

from tests._reference_oracle import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not available")


def _torch_model(name: str):
    import torch

    ref = load_reference()
    torch.manual_seed(0)
    cfg = ref.config.YoloxConfig.get_named_config(name)
    # the reference registry shares config instances and get_model() caches
    # the model on the config (`config.py:168,466-469`) — reset for isolation
    cfg.model = None
    model = cfg.get_model()
    model.eval()
    model.head.training = False
    model.training = False
    return model, cfg


def _convert(model):
    from yolox_tpu.models.weights import state_dict_to_pytree

    return state_dict_to_pytree(model.state_dict())


@pytest.mark.parametrize(
    "name,size",
    [("yolox_s", (256, 320)), ("yolox_nano", (224, 224)),
     ("yolox_m", (160, 160))],
)
def test_eval_forward_parity(name, size):
    import torch

    from yolox_tpu import YoloxConfig, YoloxModule

    tmodel, _ = _torch_model(name)
    params = _convert(tmodel)

    rng = np.random.default_rng(42)
    x = rng.uniform(0, 255, (2, 3, size[0], size[1])).astype(np.float32)

    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x)).numpy()

    module = YoloxModule.from_config(YoloxConfig.get_named_config(name))
    module.load_params(params)
    out = np.asarray(module(x.transpose(0, 2, 3, 1)))

    assert out.shape == ref_out.shape
    # reg/wh are in image-pixel units (up to ~size), obj/cls in [0,1]
    diff = np.abs(out - ref_out)
    rel = diff / (np.abs(ref_out) + 1.0)
    assert rel.max() < 1e-4, (rel.max(), diff.max())


def test_train_mode_bn_parity():
    """Train-mode forward + running-stat updates match torch BatchNorm."""
    import torch

    from yolox_tpu.models.blocks import BaseConv, BNCollector, Ctx
    from yolox_tpu.models.weights import state_dict_to_pytree

    ref = load_reference()
    from yolox.models.network_blocks import BaseConv as TorchBaseConv

    torch.manual_seed(1)
    tconv = TorchBaseConv(8, 16, 3, 2, act="silu")
    for m in tconv.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps = 1e-3
            m.momentum = 0.03
    tconv.train()

    x = np.random.default_rng(7).normal(size=(4, 8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_y = tconv(torch.from_numpy(x)).numpy()
    ref_mean = tconv.bn.running_mean.numpy()
    ref_var = tconv.bn.running_var.numpy()

    conv = BaseConv(8, 16, 3, 2, act="silu")
    params = state_dict_to_pytree(
        {k: v for k, v in tconv.state_dict().items()})
    # torch state dict was mutated by the forward above; rebuild fresh stats
    params["bn"]["running_mean"] = np.zeros(16, np.float32)
    params["bn"]["running_var"] = np.ones(16, np.float32)

    collector = BNCollector()
    y = np.asarray(
        conv(params, x.transpose(0, 2, 3, 1), Ctx(True, collector), "c"))

    np.testing.assert_allclose(
        y, ref_y.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(collector.updates["c.bn.running_mean"]), ref_mean,
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(collector.updates["c.bn.running_var"]), ref_var,
        rtol=1e-5, atol=1e-7)


def test_yolofpn_darknet_parity():
    """Legacy Darknet-53 + YoloFpn feature parity (yolov3 model family)."""
    import torch

    from yolox_tpu.models.weights import state_dict_to_pytree
    from yolox_tpu.models.yolo_fpn import YoloFpn

    ref = load_reference()
    from yolox.models.yolo_fpn import YoloFpn as TorchYoloFpn

    torch.manual_seed(2)
    tfpn = TorchYoloFpn(depth=21)  # depth 21: same code path, faster test
    # Mirror the reference model factory's init_yolo (`config.py:162-166`),
    # which every live reference path applies: BN eps=1e-3, momentum=0.03.
    for m in tfpn.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps = 1e-3
            m.momentum = 0.03
    tfpn.eval()

    x = np.random.default_rng(3).uniform(
        0, 255, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref_outs = [o.numpy() for o in tfpn(torch.from_numpy(x))]

    fpn = YoloFpn(depth=21)
    params = state_dict_to_pytree(tfpn.state_dict())
    outs = fpn(params, x.transpose(0, 2, 3, 1))

    for o, r in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.asarray(o), r.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


def test_param_census_matches_torch():
    """Every torch state-dict key exists in our pytree with the same shape."""
    from yolox_tpu.models.weights import param_census

    tmodel, _ = _torch_model("yolox_s")
    ref_census = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}

    from yolox_tpu import YoloxConfig, YoloxModule

    module = YoloxModule.from_config(YoloxConfig.get_named_config("yolox_s"))
    ours = param_census(module.params)
    assert ours == ref_census


def test_spp_cascade_identity():
    """The SPPF cascade (pool9 = pool5 o pool5, pool13 = pool5^3) must be
    bit-exact vs the reference's independent 9x9/13x13 pools, including at
    image borders where -inf padding composes (`network_blocks.py:120-142`
    uses independent pools; blocks.SPPBottleneck cascades them)."""
    import jax.numpy as jnp

    from yolox_tpu.models.blocks import max_pool_same

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 17, 23, 8)).astype(np.float32))
    p5 = max_pool_same(x, 5)
    p9 = max_pool_same(p5, 5)
    p13 = max_pool_same(p9, 5)
    assert bool(jnp.all(p9 == max_pool_same(x, 9)))
    assert bool(jnp.all(p13 == max_pool_same(x, 13)))


def test_spp_non_chain_kernels_fall_back():
    """Kernel sets that are not an arithmetic chain keep independent
    pools (cascade flag off)."""
    from yolox_tpu.models.blocks import SPPBottleneck

    assert SPPBottleneck(64, 64).cascade
    assert SPPBottleneck(64, 64, kernel_sizes=(3, 5, 7)).cascade
    assert not SPPBottleneck(64, 64, kernel_sizes=(5, 9, 11)).cascade
