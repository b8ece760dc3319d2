"""Data layer tests: datasets, synthesis parity, concat/sampler/loader."""

import os

import cv2
import numpy as np
import pytest

import dcpt_tpu.data  # noqa: F401  (registers datasets)
from dcpt_tpu.data import ConcatDataset, DataLoader, EnlargedSampler, build_dataloader, build_dataset


@pytest.fixture(scope="module")
def image_dirs(tmp_path_factory):
    """Tiny GT/LQ folders with deterministic images."""
    root = tmp_path_factory.mktemp("data")
    gt_dir = root / "gt"
    lq_dir = root / "lq"
    gt_dir.mkdir()
    lq_dir.mkdir()
    rng = np.random.default_rng(42)
    for i in range(4):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(gt_dir / f"img{i}.png"), img)
        lq = cv2.GaussianBlur(img, (5, 5), 1.5)
        cv2.imwrite(str(lq_dir / f"img{i}.png"), lq)
    return str(gt_dir), str(lq_dir)


def _opt(gt_dir, lq_dir=None, **kw):
    opt = {
        "name": "tiny",
        "phase": "test",
        "scale": 1,
        "io_backend": {"type": "disk"},
        "dataroot_gt": gt_dir,
    }
    if lq_dir is not None:
        opt["dataroot_lq"] = lq_dir
    opt.update(kw)
    return opt


class TestDatasets:
    def test_paired_dataset(self, image_dirs):
        gt_dir, lq_dir = image_dirs
        ds = build_dataset(_opt(gt_dir, lq_dir, type="PairedImageDataset"))
        assert len(ds) == 4
        sample = ds[0]
        assert sample["gt"].shape == (48, 64, 3)
        assert sample["lq"].dtype == np.float32
        assert 0 <= sample["lq"].min() and sample["lq"].max() <= 1

    def test_denoise_matches_reference_seeding(self, reference, image_dirs):
        """LQ synthesis must be bit-identical to the reference dataset."""
        import torch  # noqa: F401

        from basicsr.data.paired_image_dataset import PairedImageDenoiseDataset as RefDS

        gt_dir, _ = image_dirs
        opt = _opt(gt_dir, type="PairedImageDenoiseDataset", sigma_type="constant", sigma_range=25)
        ours_ds = build_dataset(opt)
        ref_ds = RefDS(dict(opt))
        ours = ours_ds[1]
        theirs = ref_ds[1]
        ours_lq = ours["lq"].transpose(2, 0, 1)
        np.testing.assert_allclose(ours_lq, theirs["lq"].numpy(), atol=1e-6)

    def test_jpeg_matches_reference(self, reference, image_dirs):
        from basicsr.data.paired_image_dataset import PairedImageJPEGCARDataset as RefDS

        gt_dir, _ = image_dirs
        opt = _opt(gt_dir, type="PairedImageJPEGCARDataset", q_type="constant", q_range=10)
        ours = build_dataset(opt)[2]
        theirs = RefDS(dict(opt))[2]
        np.testing.assert_allclose(ours["lq"].transpose(2, 0, 1), theirs["lq"].numpy(), atol=1e-6)

    def test_mosaic_matches_reference(self, reference, image_dirs):
        from basicsr.data.paired_image_dataset import PairedImageMosaicDataset as RefDS

        gt_dir, _ = image_dirs
        opt = _opt(gt_dir, type="PairedImageMosaicDataset")
        ours = build_dataset(opt)[0]
        theirs = RefDS(dict(opt))[0]
        np.testing.assert_allclose(ours["lq"].transpose(2, 0, 1), theirs["lq"].numpy(), atol=1e-6)
        np.testing.assert_allclose(ours["gt"].transpose(2, 0, 1), theirs["gt"].numpy(), atol=1e-6)

    def test_inpainting_runs(self, image_dirs):
        gt_dir, _ = image_dirs
        ds = build_dataset(_opt(gt_dir, type="PairedImageInpaintingDataset"))
        sample = ds[0]
        assert sample["lq"].shape == sample["gt"].shape
        assert not np.allclose(sample["lq"], sample["gt"])  # strokes applied

    def test_single_image_dataset(self, image_dirs):
        _, lq_dir = image_dirs
        ds = build_dataset(_opt(lq_dir, type="SingleImageDataset", dataroot_lq=lq_dir))
        sample = ds[0]
        assert sample["lq"].shape == (48, 64, 3)

    def test_train_phase_crop_augment(self, image_dirs):
        gt_dir, lq_dir = image_dirs
        ds = build_dataset(
            _opt(gt_dir, lq_dir, type="PairedImageDataset", phase="train", gt_size=32, use_hflip=True, use_rot=True)
        )
        sample = ds[0]
        assert sample["gt"].shape == (32, 32, 3)


class TestConcatAndSampler:
    def test_concat_stamps_dataset_idx(self, image_dirs):
        gt_dir, lq_dir = image_dirs
        d1 = build_dataset(_opt(gt_dir, lq_dir, type="PairedImageDataset"))
        d2 = build_dataset(_opt(gt_dir, type="PairedImageDenoiseDataset", sigma_type="constant", sigma_range=15))
        cat = ConcatDataset([d1, d2], enlarge_ratios=[2, 1])
        assert len(cat) == 2 * 4 + 4
        assert cat[0]["dataset_idx"] == 0
        assert cat[4]["dataset_idx"] == 0  # enlarged wrap of d1
        assert cat[8]["dataset_idx"] == 1

    def test_enlarged_sampler_shards_disjoint(self, image_dirs):
        gt_dir, lq_dir = image_dirs
        ds = build_dataset(_opt(gt_dir, lq_dir, type="PairedImageDataset"))
        s0 = EnlargedSampler(ds, num_replicas=2, rank=0, ratio=4)
        s1 = EnlargedSampler(ds, num_replicas=2, rank=1, ratio=4)
        i0, i1 = list(s0), list(s1)
        assert len(i0) == len(i1) == 8
        # epochs reshuffle
        s0.set_epoch(1)
        assert list(s0) != i0

    def test_enlarged_sampler_torch_compat_replays_reference_order(self, image_dirs):
        """torch_compat=True must emit the reference's EXACT index sequence
        (epoch-seeded ``torch.randperm`` + modulo + rank stride —
        /root/reference/basicsr/data/data_sampler.py:30-43), so a migrating
        user can replay a torch run's data order bit-for-bit."""
        torch = pytest.importorskip("torch")
        gt_dir, lq_dir = image_dirs
        ds = build_dataset(_opt(gt_dir, lq_dir, type="PairedImageDataset"))
        for epoch in (0, 3):
            for rank in (0, 1):
                s = EnlargedSampler(ds, num_replicas=2, rank=rank, ratio=4, torch_compat=True)
                s.set_epoch(epoch)
                g = torch.Generator()
                g.manual_seed(epoch)
                ref = [v % len(ds) for v in torch.randperm(s.total_size, generator=g).tolist()]
                ref = ref[rank : s.total_size : 2]
                assert list(s) == ref

    def test_dataloader_batching(self, image_dirs):
        gt_dir, lq_dir = image_dirs
        ds = build_dataset(_opt(gt_dir, lq_dir, type="PairedImageDataset"))
        loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["gt"].shape == (2, 48, 64, 3)
        assert isinstance(batches[0]["gt_path"], list)

    def test_build_dataloader_phases(self, image_dirs):
        gt_dir, lq_dir = image_dirs
        opt = _opt(gt_dir, lq_dir, type="PairedImageDataset", phase="train", gt_size=32, use_hflip=True, use_rot=True)
        opt["batch_size_per_gpu"] = 2
        opt["num_worker_per_gpu"] = 0
        ds = build_dataset(opt)
        loader = build_dataloader(ds, opt, num_gpu=1, seed=0)
        batch = next(iter(loader))
        assert batch["gt"].shape == (2, 32, 32, 3)

    def test_device_prefetcher(self, image_dirs):
        import jax

        from dcpt_tpu.data import DevicePrefetcher

        gt_dir, lq_dir = image_dirs
        ds = build_dataset(_opt(gt_dir, lq_dir, type="PairedImageDataset"))
        loader = DataLoader(ds, batch_size=2, shuffle=False)
        pf = DevicePrefetcher(loader)
        batch = pf.next()
        assert isinstance(batch["lq"], jax.Array)
        n = 1
        while pf.next() is not None:
            n += 1
        assert n == 2


class TestMultiPairedDataset:
    def test_multi_lq_concat(self, image_dirs, tmp_path):
        """One GT vs a directory of LQ variants, concatenated channel-wise."""
        import shutil

        gt_dir, lq_dir = image_dirs
        multi_root = tmp_path / "multi_lq"
        for i in range(4):
            d = multi_root / f"img{i}"
            d.mkdir(parents=True)
            for v in range(2):  # two LQ variants per GT
                shutil.copy(os.path.join(lq_dir, f"img{i}.png"), d / f"v{v}.png")

        ds = build_dataset(_opt(gt_dir, str(multi_root), type="MultiPairedImageDataset", multi=True))
        sample = ds[0]
        assert sample["lq"].shape[-1] == 6  # 2 variants × 3 channels
        assert sample["gt"].shape[-1] == 3


class _SeedProbeDataset:
    """Returns the worker's np.random stream — pins the reference seed rule."""

    def __len__(self):
        return 6

    def __getitem__(self, idx):
        return {"idx": idx, "v": np.random.random()}


class TestProcessWorkers:
    def test_process_mode_matches_sync_deterministic(self, image_dirs):
        """On a randomness-free val dataset, process workers must reproduce the
        synchronous loader's batches exactly, in order."""
        from dcpt_tpu.data import DataLoader, build_dataset

        gt_dir, lq_dir = image_dirs
        ds = build_dataset({
            "name": "t", "phase": "val", "scale": 1, "type": "PairedImageDataset",
            "io_backend": {"type": "disk"}, "dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
        })
        sync = list(DataLoader(ds, batch_size=2, num_workers=0))
        proc = list(DataLoader(ds, batch_size=2, num_workers=2, worker_mode="process", seed=0))
        assert len(sync) == len(proc)
        for a, b in zip(sync, proc):
            np.testing.assert_array_equal(a["lq"], b["lq"])
            assert a["lq_path"] == b["lq_path"]

    def test_worker_seed_rule(self):
        """worker_seed = num_workers * rank + worker_id + seed
        (reference: data/__init__.py:121-125)."""
        from dcpt_tpu.data import DataLoader

        ds = _SeedProbeDataset()
        # single worker: its stream is np.random seeded with 1*3 + 0 + 10 = 13
        loader = DataLoader(ds, batch_size=2, num_workers=1, worker_mode="process", seed=10, rank=3)
        got = np.concatenate([b["v"] for b in loader])
        rng_expect = np.random.RandomState(13)
        np.testing.assert_allclose(got, rng_expect.random_sample(6), rtol=0, atol=0)

    def test_two_workers_distinct_streams(self):
        """Static round-robin batch→worker assignment (torch semantics):
        batch i is fetched by worker i % num_workers, so the interleaving of
        the two seeded streams is fully deterministic — not just 'both
        streams appear' (the old dynamic-queue loader could time-dependently
        let one worker drain everything)."""
        from dcpt_tpu.data import DataLoader

        ds = _SeedProbeDataset()
        loader = DataLoader(ds, batch_size=1, num_workers=2, worker_mode="process", seed=0)
        vals = np.concatenate([b["v"] for b in loader])
        s0 = np.random.RandomState(0).random_sample(3)
        s1 = np.random.RandomState(1).random_sample(3)
        expect = np.stack([s0, s1], axis=1).reshape(-1)  # s0[0], s1[0], s0[1], …
        np.testing.assert_allclose(vals, expect, rtol=0, atol=0)
