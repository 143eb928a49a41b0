"""Data pipeline tests on a synthesized COCO-format dataset.

Builds a tiny on-disk COCO dataset (images + annotation json), then drives
CocoDataset -> MosaicDetection -> DataLoader end to end, checking shapes,
label format, worker/determinism invariants, and the mosaic on/off switch.
"""

import numpy as np

def _make_loader(coco_dir, num_workers, seed=0, mosaic=True, batch_size=4):
    from yolox_tpu.data import (
        CocoDataset, DataLoader, InfiniteSampler, MosaicDetection,
        TrainTransform, YoloBatchSampler)

    dataset = CocoDataset(
        data_dir=coco_dir, json_file="instances_train2017.json",
        name="train2017", img_size=(64, 64),
        preproc=TrainTransform(max_labels=50))
    dataset = MosaicDetection(
        dataset=dataset, mosaic=mosaic, img_size=(64, 64),
        preproc=TrainTransform(max_labels=120),
        degrees=10.0, translate=0.1, mosaic_scale=(0.1, 2),
        mixup_scale=(0.5, 1.5), shear=2.0, enable_mixup=True,
        mosaic_prob=1.0, mixup_prob=1.0)
    sampler = InfiniteSampler(len(dataset), seed=seed)
    batch_sampler = YoloBatchSampler(
        sampler=sampler, batch_size=batch_size, mosaic=mosaic, seed=seed)
    return DataLoader(dataset, batch_sampler=batch_sampler,
                      num_workers=num_workers)


def _take(loader, n):
    out = []
    for i, batch in enumerate(loader):
        out.append(batch)
        if i + 1 >= n:
            break
    return out


def test_batch_shapes_and_label_format(coco_dir):
    loader = _make_loader(coco_dir, num_workers=0)
    batches = _take(iter(loader), 2)
    for imgs, targets, infos, ids in batches:
        assert imgs.shape == (4, 64, 64, 3) and imgs.dtype == np.float32
        assert targets.shape == (4, 120, 5)
        # labels are (cls, cx, cy, w, h) with real rows nonzero
        real = targets[targets.sum(-1) > 0]
        assert len(real) > 0
        assert np.all(real[:, 3] > 0) and np.all(real[:, 4] > 0)
        assert np.all(real[:, 1] <= 64) and np.all(real[:, 2] <= 64)
    loader.close()


def test_determinism_independent_of_workers(coco_dir):
    a = _take(iter(_make_loader(coco_dir, num_workers=0, seed=7)), 3)
    b = _take(iter(_make_loader(coco_dir, num_workers=2, seed=7)), 3)
    for (ia, ta, _, _), (ib, tb, _, _) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ta, tb)


def test_different_seed_different_stream(coco_dir):
    a = _take(iter(_make_loader(coco_dir, num_workers=0, seed=1)), 1)
    b = _take(iter(_make_loader(coco_dir, num_workers=0, seed=2)), 1)
    assert not np.array_equal(a[0][0], b[0][0])


def test_close_mosaic(coco_dir):
    loader = _make_loader(coco_dir, num_workers=0, mosaic=True)
    loader.close_mosaic()
    imgs, targets, _, _ = _take(iter(loader), 1)[0]
    assert imgs.shape == (4, 64, 64, 3)
    # non-mosaic path pads labels to the same max_labels
    assert targets.shape == (4, 120, 5)


def test_rank_sharding_disjoint(coco_dir):
    from yolox_tpu.data import InfiniteSampler

    import itertools

    streams = [
        list(itertools.islice(iter(
            InfiniteSampler(10, seed=3, rank=r, world_size=2)), 5))
        for r in range(2)
    ]
    # same underlying permutation, strided: interleaving reconstructs it
    merged = [x for pair in zip(*streams) for x in pair]
    full = list(itertools.islice(iter(InfiniteSampler(10, seed=3)), 10))
    assert merged == full


def test_infinite_sampler_rank_sharding():
    """Ranks see disjoint strided slices of the SAME seeded stream — the
    data-parallel sharding contract (`samplers.py:28-83`)."""
    from yolox_tpu.data.samplers import InfiniteSampler

    import itertools

    world = 4
    streams = []
    for rank in range(world):
        s = InfiniteSampler(size=32, shuffle=True, seed=7, rank=rank,
                            world_size=world)
        streams.append(list(itertools.islice(iter(s), 16)))
    # interleaving the rank streams reconstructs the single-rank stream
    merged = [streams[i % world][i // world] for i in range(world * 16)]
    single = list(itertools.islice(iter(InfiniteSampler(
        size=32, shuffle=True, seed=7, rank=0, world_size=1)), world * 16))
    assert merged == single
    # per-epoch permutation covers the dataset exactly once
    assert sorted(single[:32]) == list(range(32))


def test_concat_dataset_routing():
    from yolox_tpu.data.datasets.datasets_wrapper import (
        ConcatDataset, Dataset, MixConcatDataset)

    class Fake(Dataset):
        def __init__(self, tag, n):
            super().__init__((32, 32))
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def __getitem__(self, idx):
            return (self.tag, idx)

        def pull_item(self, idx):
            return (self.tag, idx)

    ds = ConcatDataset([Fake("a", 3), Fake("b", 2)])
    assert len(ds) == 5
    assert ds[0] == ("a", 0) and ds[2] == ("a", 2)
    assert ds[3] == ("b", 0) and ds[4] == ("b", 1)
    assert ds[-1] == ("b", 1)            # negative indexing
    assert ds.pull_item(4) == ("b", 1)

    mix = MixConcatDataset([Fake("a", 3), Fake("b", 2)])
    # mix accepts (flag, idx, ...) tuples, remapping the middle element
    # and forwarding the tuple (the child's mosaic_getitem strips it)
    assert mix[(True, 4, 0)] == ("b", (True, 1, 0))


def test_model_info_and_fuse():
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.utils.model_utils import (
        adjust_status, fuse_model_params, get_model_info)

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = YoloxModule.from_config(cfg)
    info = get_model_info(module, (416, 416))
    assert "0.91" in info and "Gflops" in info  # published nano params

    # fused params produce identical eval outputs
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (1, 128, 128, 3)), jnp.float32)
    want = np.asarray(module(x))
    fused = fuse_model_params(module.params)
    got = np.asarray(module(x, params=fused))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    with adjust_status(module, training=False) as m:
        assert m is module


def test_loader_prefetch_is_bounded(coco_dir, tmp_path):
    """The worker pool must apply backpressure: with a slow consumer, at
    most num_workers + 2 batches may be built ahead of consumption.
    Regression for the unbounded `pool.imap` result queue, which buffered
    an entire epoch of decoded batches in host RAM whenever the consumer
    stalled (found by the reference-scale eval run: 24 GB RSS at 5 000
    images; scripts/eval_at_scale.py)."""
    import os
    import time

    from yolox_tpu.data import CocoDataset, DataLoader, ValTransform
    from yolox_tpu.data.samplers import SequentialBatchSampler

    counter_dir = tmp_path / "pulls"
    counter_dir.mkdir()

    class CountingDataset(CocoDataset):
        def __getitem__(self, idx):
            # visible across forked workers via the filesystem
            (counter_dir / f"{os.getpid()}_{time.monotonic_ns()}").touch()
            return super().__getitem__(idx)

    dataset = CountingDataset(
        data_dir=coco_dir, json_file="instances_train2017.json",
        name="train2017", img_size=(64, 64), preproc=ValTransform())
    batch_size, num_workers = 2, 2
    sampler = SequentialBatchSampler(len(dataset), batch_size=batch_size)
    loader = DataLoader(dataset, batch_sampler=sampler,
                        num_workers=num_workers)
    try:
        it = iter(loader)
        next(it)                      # consume ONE batch, then stall
        time.sleep(2.0)               # let the pool run ahead if it can
        pulled = len(list(counter_dir.iterdir()))
        # consumed 1 + at most (num_workers + 2) in flight/queued
        bound = (1 + num_workers + 2) * batch_size
        assert pulled <= bound, (pulled, bound)
        # and the loader still yields the remaining batches in order
        rest = list(it)
        assert len(rest) + 1 == len(sampler)
    finally:
        loader.close()
