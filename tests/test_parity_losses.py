"""Training-path parity: batched SimOTA + losses vs the reference.

Runs the reference torch model in train mode (full get_losses with its
per-image SimOTA python loop) and our vmapped fixed-shape implementation on
identical weights/batches, comparing every loss component. This is the
hardest numerical-parity surface (SURVEY.md §3.4).
"""

import numpy as np
import pytest

from tests._reference_oracle import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not available")


def _make_labels(rng, batch, max_labels, n_range, size):
    """Padded (B, M, 5) labels: (cls, cx, cy, w, h), zero rows = padding."""
    labels = np.zeros((batch, max_labels, 5), np.float32)
    for b in range(batch):
        n = int(rng.integers(*n_range))
        cx = rng.uniform(10, size - 10, n)
        cy = rng.uniform(10, size - 10, n)
        w = rng.uniform(8, size / 2, n)
        h = rng.uniform(8, size / 2, n)
        cls = rng.integers(0, 80, n)
        labels[b, :n] = np.stack([cls, cx, cy, w, h], axis=1)
    return labels


@pytest.fixture(scope="module", params=[False, True], ids=["no_l1", "l1"])
def parity_setup(request):
    import torch

    ref = load_reference()
    torch.manual_seed(0)
    cfg = ref.config.YoloxConfig.get_named_config("yolox_s")
    cfg.model = None  # reference caches the model on the shared config
    tmodel = cfg.get_model()
    with torch.no_grad():
        # widen predicted boxes so IoUs (and dynamic_k) spread realistically
        for conv in tmodel.head.reg_preds:
            conv.weight *= 10.0
            conv.bias += torch.randn_like(conv.bias)
    tmodel.train()
    tmodel.head.use_l1 = request.param
    return tmodel, request.param


def test_losses_parity(parity_setup):
    import torch

    tmodel, use_l1 = parity_setup

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.models.assign import compute_losses
    from yolox_tpu.models.blocks import BNCollector
    from yolox_tpu.models.weights import state_dict_to_pytree

    size = 128
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 255, (2, 3, size, size)).astype(np.float32)
    labels = _make_labels(rng, 2, 20, (3, 8), size)

    with torch.no_grad():
        ref_losses = tmodel(torch.from_numpy(x), torch.from_numpy(labels))
    # re-extract a clean state dict (train forward mutated BN stats)
    params = state_dict_to_pytree(tmodel.state_dict())

    module = YoloxModule.from_config(YoloxConfig.get_named_config("yolox_s"))
    module.load_params(params)
    head_out = module.apply_train(module.params, x.transpose(0, 2, 3, 1),
                                  BNCollector())
    ours = compute_losses(head_out, labels, num_classes=80, use_l1=use_l1)

    # NOTE: BN stats in `params` were already mutated by the torch forward;
    # that does not matter — train mode normalizes with batch stats.
    for key in ("total_loss", "iou_loss", "conf_loss", "cls_loss", "l1_loss",
                "num_fg"):
        ref_v = float(ref_losses[key])
        our_v = float(np.asarray(ours[key]))
        assert our_v == pytest.approx(ref_v, rel=2e-3, abs=2e-4), (
            key, our_v, ref_v)


def test_assignment_matches_reference():
    """Compare raw SimOTA assignment (fg mask, matched gt, matched IoU)."""
    import torch

    ref = load_reference()
    torch.manual_seed(3)
    cfg = ref.config.YoloxConfig.get_named_config("yolox_s")
    cfg.model = None  # reference caches the model on the shared config
    tmodel = cfg.get_model()
    with torch.no_grad():
        for conv in tmodel.head.reg_preds:
            conv.weight *= 10.0
    tmodel.train()
    head = tmodel.head

    size = 128
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 255, (1, 3, size, size)).astype(np.float32)
    labels = _make_labels(rng, 1, 20, (5, 10), size)

    # reference forward pieces to reach get_assignments
    with torch.no_grad():
        fpn = tmodel.backbone(torch.from_numpy(x))
        outputs, x_shifts, y_shifts, expanded_strides = [], [], [], []
        for k, (cls_conv, reg_conv, stride, xf) in enumerate(
                zip(head.cls_convs, head.reg_convs, head.strides, fpn)):
            xf = head.stems[k](xf)
            cls_out = head.cls_preds[k](cls_conv(xf))
            reg_feat = reg_conv(xf)
            reg_out = head.reg_preds[k](reg_feat)
            obj_out = head.obj_preds[k](reg_feat)
            out = torch.cat([reg_out, obj_out, cls_out], 1)
            out, grid = head.get_output_and_grid(out, k, stride, xf.type())
            x_shifts.append(grid[:, :, 0])
            y_shifts.append(grid[:, :, 1])
            expanded_strides.append(
                torch.zeros(1, grid.shape[1]).fill_(stride))
            outputs.append(out)
        outputs = torch.cat(outputs, 1)
        x_shifts = torch.cat(x_shifts, 1)
        y_shifts = torch.cat(y_shifts, 1)
        expanded_strides = torch.cat(expanded_strides, 1)

        num_gt = int((torch.from_numpy(labels).sum(2) > 0).sum(1)[0])
        (gt_matched_classes, fg_mask, pred_ious, matched_gt_inds,
         num_fg) = head.get_assignments(
            0, num_gt,
            torch.from_numpy(labels[0, :num_gt, 1:5]),
            torch.from_numpy(labels[0, :num_gt, 0]),
            outputs[0, :, :4],
            expanded_strides, x_shifts, y_shifts,
            outputs[:, :, 5:], outputs[:, :, 4:5])

    from yolox_tpu.models.assign import simota_assign

    out_np = outputs[0].numpy()
    ours = simota_assign(
        labels[0], out_np[:, :4], out_np[:, 4], out_np[:, 5:],
        x_shifts[0].numpy(), y_shifts[0].numpy(),
        expanded_strides[0].numpy(), 80)

    our_fg = np.asarray(ours["fg_mask"])
    np.testing.assert_array_equal(our_fg, fg_mask.numpy())
    assert int(np.asarray(ours["num_fg"]).sum()) == int(num_fg)
    np.testing.assert_array_equal(
        np.asarray(ours["matched_gt"])[our_fg], matched_gt_inds.numpy())
    np.testing.assert_allclose(
        np.asarray(ours["matched_iou"])[our_fg], pred_ious.numpy(),
        rtol=1e-5, atol=1e-6)


def test_candidate_compaction_exact_vs_full():
    """Compacted SimOTA (N slots) must equal the same computation with the
    cap lifted to all anchors, including crowded-scene label counts."""
    import jax
    import jax.numpy as jnp

    from yolox_tpu.models.assign import simota_assign

    rng = np.random.default_rng(11)
    # A small 3-level grid: strides 8/16/32 over a 128px image
    grids = [(16, 16, 8), (8, 8, 16), (4, 4, 32)]
    xs, ys, ss = [], [], []
    for h, w, s in grids:
        yy, xx = np.mgrid[0:h, 0:w]
        xs.append(xx.ravel()); ys.append(yy.ravel())
        ss.append(np.full(h * w, s))
    x_shifts = jnp.asarray(np.concatenate(xs), jnp.float32)
    y_shifts = jnp.asarray(np.concatenate(ys), jnp.float32)
    strides = jnp.asarray(np.concatenate(ss), jnp.float32)
    a = x_shifts.shape[0]

    for n_gt in (3, 40, 120):  # crowded case stresses the cap
        labels = np.zeros((120, 5), np.float32)
        labels[:n_gt, 0] = rng.integers(0, 80, n_gt)
        labels[:n_gt, 1:3] = rng.uniform(8, 120, (n_gt, 2))
        labels[:n_gt, 3:5] = rng.uniform(6, 60, (n_gt, 2))
        preds = np.zeros((a, 4), np.float32)
        preds[:, 0] = (np.asarray(x_shifts) + 0.5) * np.asarray(strides)
        preds[:, 1] = (np.asarray(y_shifts) + 0.5) * np.asarray(strides)
        preds[:, 2:] = rng.uniform(4, 80, (a, 2))
        obj = rng.normal(size=(a,)).astype(np.float32)
        cls = rng.normal(size=(a, 80)).astype(np.float32)

        args = (jnp.asarray(labels), jnp.asarray(preds), jnp.asarray(obj),
                jnp.asarray(cls), x_shifts, y_shifts, strides, 80)
        compact = simota_assign(*args, num_candidates=256)
        full = simota_assign(*args, num_candidates=a)
        if int(full["num_cand"]) <= 256:
            for key in ("fg_mask", "matched_gt", "matched_iou", "num_fg"):
                np.testing.assert_array_equal(
                    np.asarray(compact[key]), np.asarray(full[key]),
                    err_msg=f"{key} n_gt={n_gt}")
        else:
            # overflow must be visible in telemetry (crowded-scene case)
            assert int(compact["num_cand"]) > 256


def test_simota_overflow_is_loud_at_640():
    """A dense 640px scene (120 well-separated gts) exceeds an explicit
    2048-candidate cap; the cand_overflow metric must fire, and a larger
    cap (4096) — or the dense-exact default (None) — must be exact."""
    import jax.numpy as jnp

    from yolox_tpu.models.assign import compute_losses

    xs, ys, ss = [], [], []
    for n, s in ((80, 8), (40, 16), (20, 32)):
        yy, xx = np.mgrid[0:n, 0:n]
        xs.append(xx.ravel()); ys.append(yy.ravel())
        ss.append(np.full(n * n, s))
    x_shifts = jnp.asarray(np.concatenate(xs), jnp.float32)
    y_shifts = jnp.asarray(np.concatenate(ys), jnp.float32)
    strides = jnp.asarray(np.concatenate(ss), jnp.float32)
    a = int(x_shifts.shape[0])
    assert a == 8400

    # 120 gts on an 11x11 grid, 54px apart — far enough that stride-8
    # candidate windows never overlap
    coords = [(40 + 54 * i, 40 + 54 * j)
              for i in range(11) for j in range(11)][:120]
    labels = np.zeros((1, 120, 5), np.float32)
    for k, (cx, cy) in enumerate(coords):
        labels[0, k] = [k % 80, cx, cy, 20, 20]

    outputs = np.zeros((1, a, 85), np.float32)
    outputs[0, :, 0] = (np.asarray(x_shifts) + 0.5) * np.asarray(strides)
    outputs[0, :, 1] = (np.asarray(y_shifts) + 0.5) * np.asarray(strides)
    outputs[0, :, 2:4] = 16.0
    head_out = {
        "outputs": jnp.asarray(outputs),
        "x_shifts": x_shifts,
        "y_shifts": y_shifts,
        "expanded_strides": strides,
    }

    overflowed = compute_losses(
        head_out, jnp.asarray(labels), 80, num_candidates=2048)
    assert float(overflowed["cand_overflow"]) > 0

    exact = compute_losses(
        head_out, jnp.asarray(labels), 80, num_candidates=4096)
    assert float(exact["cand_overflow"]) == 0.0

    dense = compute_losses(head_out, jnp.asarray(labels), 80)  # default
    assert float(dense["cand_overflow"]) == 0.0
    for k in ("total_loss", "iou_loss", "conf_loss", "cls_loss"):
        assert float(dense[k]) == pytest.approx(float(exact[k]), rel=1e-5)
