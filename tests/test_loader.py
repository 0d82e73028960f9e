"""DataLoader tests: ordering, seeding, None filtering, prefetch bounds."""

import time

import numpy as np
import pytest

from centerpose_tpu.data.loader import DataLoader


class FakeDataset:
    """Returns {'idx': i, 'noise': rng draw}; every 7th sample is corrupt."""

    def __init__(self, n=64, delay=0.0):
        self.n = n
        self.delay = delay
        self.rng = np.random.RandomState(0)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        if i % 7 == 3:
            return None
        return {
            "idx": np.array([i], np.int64),
            "noise": np.array([self.rng.randn()], np.float32),
            "meta": {"path": f"sample_{i}"},
        }


def _collate(samples):
    return {
        "idx": np.concatenate([s["idx"] for s in samples]),
        "noise": np.concatenate([s["noise"] for s in samples]),
    }


class TestDataLoader:
    def test_ordered_and_complete(self):
        ds = FakeDataset(64)
        dl = DataLoader(ds, 8, shuffle=False, num_workers=3, collate_fn=_collate)
        seen = []
        for batch in dl:
            seen.extend(batch["idx"].tolist())
        expected = [i for i in range(64) if i % 7 != 3]
        assert seen == expected  # ordered despite 3 workers

    def test_none_filtering_shrinks_batches(self):
        ds = FakeDataset(28)
        dl = DataLoader(ds, 7, shuffle=False, num_workers=2, collate_fn=_collate)
        sizes = [len(b["idx"]) for b in dl]
        assert sizes == [6, 6, 6, 6]  # one corrupt sample per 7

    def test_shuffle_deterministic_per_epoch(self):
        ds = FakeDataset(32)
        dl = DataLoader(ds, 8, shuffle=True, num_workers=2, seed=5,
                        collate_fn=_collate)
        dl.set_epoch(1)
        run1 = [b["idx"].tolist() for b in dl]
        dl.set_epoch(1)
        run2 = [b["idx"].tolist() for b in dl]
        assert run1 == run2
        dl.set_epoch(2)
        run3 = [b["idx"].tolist() for b in dl]
        assert run1 != run3

    def test_worker_rng_streams_reproducible(self):
        # Same epoch => same per-worker seeds => identical augmentation noise.
        def noise_of(run_seed_epoch):
            ds = FakeDataset(32)
            dl = DataLoader(ds, 8, shuffle=False, num_workers=2, seed=9,
                            collate_fn=_collate)
            dl.set_epoch(run_seed_epoch)
            return np.concatenate([b["noise"] for b in dl])

        np.testing.assert_array_equal(noise_of(1), noise_of(1))
        assert not np.array_equal(noise_of(1), noise_of(2))

    def test_synchronous_path_matches_workers(self):
        ds = FakeDataset(40)
        dl0 = DataLoader(ds, 8, shuffle=False, num_workers=0, collate_fn=_collate)
        dl2 = DataLoader(ds, 8, shuffle=False, num_workers=2, collate_fn=_collate)
        ids0 = [b["idx"].tolist() for b in dl0]
        ids2 = [b["idx"].tolist() for b in dl2]
        assert ids0 == ids2

    def test_drop_last(self):
        ds = FakeDataset(30)
        dl = DataLoader(ds, 8, shuffle=False, num_workers=1, drop_last=True,
                        collate_fn=_collate)
        assert len(list(dl)) == 3
        dl2 = DataLoader(ds, 8, shuffle=False, num_workers=1, drop_last=False,
                         collate_fn=_collate)
        assert len(list(dl2)) == 4

    def test_overlap_speedup(self):
        # With per-sample delay, 4 workers must beat synchronous loading.
        ds = FakeDataset(32, delay=0.01)
        dl0 = DataLoader(ds, 8, shuffle=False, num_workers=0, collate_fn=_collate)
        dl4 = DataLoader(ds, 8, shuffle=False, num_workers=4, collate_fn=_collate)
        t0 = time.time()
        list(dl0)
        t_sync = time.time() - t0
        t0 = time.time()
        list(dl4)
        t_par = time.time() - t0
        assert t_par < t_sync * 0.6, (t_sync, t_par)

    def test_real_dataset_integration(self, tmp_path):
        # End-to-end with the actual ObjectPoseDataset over a toy DOPE dir.
        import json
        from PIL import Image

        from centerpose_tpu.config import preset
        from centerpose_tpu.data.dataset import ObjectPoseDataset

        vid = tmp_path / "video_0"
        vid.mkdir()
        rng = np.random.RandomState(0)
        for i in range(4):
            Image.fromarray(
                (rng.rand(96, 128, 3) * 255).astype(np.uint8)
            ).save(vid / f"{i:05d}.png")
            kps9 = [[64, 48]] + [
                [64 + dx, 48 + dy] for dx in (-20, 20) for dy in (-15, 15)
            ] * 2
            ann = {
                "camera_data": {"width": 128, "height": 96,
                                "intrinsics": {"fx": 120.0, "fy": 120.0,
                                               "cx": 64.0, "cy": 48.0}},
                "objects": [{"name": "shoe_0", "location": [0, 0, 1],
                             "quaternion_xyzw": [0, 0, 0, 1],
                             "projected_cuboid": kps9[:9],
                             "scale": [0.1, 0.1, 0.25],
                             "keypoints_3d": np.zeros((9, 3)).tolist()}],
            }
            json.dump(ann, open(vid / f"{i:05d}.json", "w"))

        cfg = preset("centerpose", input_h=64, input_w=64, batch_size=2)
        ds = ObjectPoseDataset(str(tmp_path), cfg, split="train")
        dl = DataLoader(ds, 2, shuffle=True, num_workers=2, seed=0)
        batches = list(dl)
        assert len(batches) == 2
        for b in batches:
            assert b["input"].shape == (2, 64, 64, 3)


class TestWorkerFailure:
    def test_thread_worker_exception_propagates(self):
        class Exploding(FakeDataset):
            def __getitem__(self, i):
                if i == 5:
                    raise ValueError("corrupt sample")
                return super().__getitem__(i)

        dl = DataLoader(Exploding(16), 4, shuffle=False, num_workers=2,
                        collate_fn=_collate)
        with pytest.raises(RuntimeError, match="worker failed"):
            list(dl)

    def test_process_worker_exception_propagates(self):
        dl = DataLoader(_ExplodingPicklable(16), 4, shuffle=False,
                        num_workers=2, collate_fn=_collate, mode="process")
        with pytest.raises(RuntimeError, match="worker"):
            list(dl)


class _ExplodingPicklable(FakeDataset):
    def __getitem__(self, i):
        if i == 5:
            raise ValueError("corrupt sample")
        return super().__getitem__(i)
