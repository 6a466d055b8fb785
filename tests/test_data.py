"""Data engine tests: crop math, buckets, dummy backend, samplers, loader,
collate homogenization, placeholder fault tolerance."""

import time

import numpy as np
import pandas as pd
import pytest

from f_lite_tpu.data import (
    DataLoader,
    ImageDataset,
    ResolutionBucketSampler,
    StatefulDistributedSampler,
    center_crop_arr,
    center_crop_arr_simulator,
    generate_crop_size_list,
)


def _write_parquet_dataset(tmp_path, n=32, seed=0):
    rs = np.random.RandomState(seed)
    sizes = [(640, 480), (512, 512), (300, 700), (1024, 768)]
    rows = []
    for i in range(n):
        w, h = sizes[i % len(sizes)]
        rows.append({
            "source_id": f"img{i}",
            "media_path": f"dummy://bucket/img_{i}.jpg",
            "captions": [f"caption {i}", f"alt caption {i}"],
            "width": w,
            "height": h,
            "media_source": "freepik" if i % 5 else "laion",
            "media_type": "real" if i % 2 else "ai",
        })
    d = tmp_path / "coll" / "a" / "b"
    d.mkdir(parents=True)
    pd.DataFrame(rows).to_parquet(d / "part0.parquet")
    return tmp_path


class PicklableTagged:
    """Module-level (hence picklable) dataset for the forkserver path."""

    def __init__(self, tag, n=8):
        self.tag, self.n = tag, n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"tag": self.tag, "idx": i}

    @staticmethod
    def collate_fn(items):
        return items


class TestCropMath:
    def test_crop_size_list_square(self):
        sizes = generate_crop_size_list(256, max_ratio=1.0)
        assert (256, 256) in sizes
        for w, h in sizes:
            assert w % 16 == 0 and h % 16 == 0

    def test_crop_size_list_aspects(self):
        sizes = generate_crop_size_list(256, max_ratio=2.0)
        assert any(w > h for w, h in sizes)
        assert any(h > w for w, h in sizes)
        for w, h in sizes:
            assert min(w, h) >= 256

    def test_simulator_matches_real_crop(self):
        from PIL import Image

        for orig in [(640, 480), (300, 700), (512, 512)]:
            sim = center_crop_arr_simulator(orig, 256, 2.0)
            img = Image.new("RGB", orig)
            real = center_crop_arr(img, 256, 2.0).size
            assert sim == real

    def test_crop_output_in_range(self):
        from PIL import Image

        from f_lite_tpu.data.dataset import normalize_image

        img = Image.effect_noise((300, 200), 64).convert("RGB")
        arr = normalize_image(center_crop_arr(img, 128, 2.0))
        assert arr.min() >= -1.0 and arr.max() <= 1.0
        assert arr.dtype == np.float32


class TestImageDataset:
    def test_load_and_getitem(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset(
            "coll", base_image_dir=str(root), resolution=128,
            center_crop=False, base_url="dummy://",
        )
        # laion rows filtered out
        assert (ds.data["media_source"] != "laion").all()
        item = ds[0]
        assert item["image"].ndim == 3 and item["image"].shape[2] == 3
        assert item["caption"].startswith(("caption", "alt caption"))
        assert item["media_type"] in ("real", "ai")

    def test_dummy_pixels_fabricated_at_native_bucket_size(self, tmp_path):
        """The hermetic backend must produce pixels at the row's bucket
        resolution (reference data.py:384-385 keeps placeholders at real
        bucket shapes), not low-res noise Lanczos-upscaled to fit —
        upscaled noise has statistics unlike any training input."""
        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset(
            "coll", base_image_dir=str(root), resolution=128,
            center_crop=False, base_url="dummy://",
        )
        for idx in range(3):
            row = ds.data.iloc[idx]
            w, h = center_crop_arr_simulator(
                (int(row["width"]), int(row["height"])), 128, 2.0
            )
            img, ok = ds._dummy_client(
                row["media_path"],
                (int(row["width"]), int(row["height"])),
            )
            assert ok and img.size == (w, h)  # native, pre-crop
            item = ds[idx]
            assert item["image"].shape == (h, w, 3)
            # identity crop preserved the raw noise: adjacent-pixel
            # correlation stays near zero (upscaled noise would be
            # strongly correlated)
            g = item["image"].mean(axis=2)
            a, b = g[:, :-1].ravel(), g[:, 1:].ravel()
            corr = np.corrcoef(a, b)[0, 1]
            assert abs(corr) < 0.1, corr

    def test_buckets_group_by_shape(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset(
            "coll", base_image_dir=str(root), resolution=128,
            center_crop=False,
        )
        buckets = ds.setup_aspect_ratio_buckets()
        assert sum(len(v) for v in buckets.values()) == len(ds)
        assert len(buckets) > 1  # multiple aspect ratios present

    def test_failure_placeholder(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset(
            "coll", base_image_dir=str(root), resolution=128,
            center_crop=False, base_url="file://",  # paths don't exist
        )
        item = ds[0]
        assert item["_id"] == "-1"
        assert item["caption"] == ""
        # placeholder has the bucket shape the real image would have had
        w, h = center_crop_arr_simulator(
            (int(ds.data.iloc[0]["width"]), int(ds.data.iloc[0]["height"])),
            128, 2.0,
        )
        assert item["image"].shape == (h, w, 3)

    def test_collate_homogenizes(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset("coll", base_image_dir=str(root), resolution=128,
                          center_crop=False)
        a = {"image": np.zeros((128, 128, 3), np.float32), "caption": "a",
             "index": 0}
        b = {"image": np.zeros((128, 128, 3), np.float32), "caption": "b",
             "index": 1}
        c = {"image": np.zeros((112, 144, 3), np.float32), "caption": "c",
             "index": 2}
        out = ds.collate_fn([a, b, c])
        assert out["image"].shape == (3, 128, 128, 3)

    def test_json_metadata(self, tmp_path):
        import json

        rows = [{
            "source_id": "x", "media_path": "dummy://x.jpg",
            "captions": ["hi"], "width": 512, "height": 512,
            "media_source": "freepik", "media_type": "real",
        }]
        (tmp_path / "c.json").write_text(json.dumps(rows))
        ds = ImageDataset("c", base_image_dir=str(tmp_path),
                          root_dir_type="json", resolution=128)
        assert len(ds.data) == 1
        assert ds[0]["caption"] == "hi"


class TestSamplers:
    def _ds(self, n=100):
        class _D:
            def __len__(self):
                return n

        return _D()

    def test_rank_striding_partitions(self):
        ds = self._ds(100)
        seen = []
        for rank in range(4):
            s = StatefulDistributedSampler(ds, batch_size=2, num_replicas=4,
                                           rank=rank)
            seen.extend(list(s))
        assert sorted(seen) == list(range(100))

    def test_resume_state(self):
        ds = self._ds(100)
        s = StatefulDistributedSampler(ds, batch_size=4, num_replicas=1,
                                       rank=0)
        state = s.state_dict(global_step=7)
        assert state["start_index"] == 28
        s2 = StatefulDistributedSampler(ds, batch_size=4, num_replicas=1,
                                        rank=0)
        s2.load_state_dict(state)
        assert list(s2) == list(range(28, 100))

    def test_shuffle_deterministic_per_epoch(self):
        ds = self._ds(50)
        s = StatefulDistributedSampler(ds, 2, 1, 0, shuffle=True, seed=1)
        s.set_epoch(3)
        a = list(s)
        s.set_epoch(3)
        assert list(s) == a
        s.set_epoch(4)
        assert list(s) != a

    def test_bucket_sampler_batches_one_bucket(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset("coll", base_image_dir=str(root), resolution=128,
                          center_crop=False)
        bs = ResolutionBucketSampler(ds, batch_size=2, num_replicas=2,
                                     rank=0, seed=0)
        inv = {}
        for aspect, idxs in ds.aspect_ratio_buckets.items():
            for i in idxs:
                inv[i] = aspect
        for batch in bs:
            aspects = {inv[i] for i in batch}
            assert len(aspects) == 1
            assert len(batch) == 2

    def test_bucket_sampler_resume(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset("coll", base_image_dir=str(root), resolution=128,
                          center_crop=False)
        bs = ResolutionBucketSampler(ds, batch_size=2, shuffle=True, seed=5)
        all_batches = list(bs)
        bs.load_state_dict({"start_batch_index": 3, "epoch": 0, "seed": 5})
        assert list(bs) == all_batches[3:]

    def test_resume_preserves_epoch(self):
        """The shuffle key is seed+epoch: resuming a run interrupted in
        epoch 2 must continue epoch 2's permutation, not epoch 0's."""
        ds = self._ds(60)
        s = StatefulDistributedSampler(ds, 2, 1, 0, shuffle=True, seed=9)
        s.set_epoch(2)
        full_epoch2 = list(s)
        state = s.state_dict(global_step=5)  # 10 samples consumed
        assert state["epoch"] == 2
        s2 = StatefulDistributedSampler(ds, 2, 1, 0, shuffle=True, seed=9)
        s2.load_state_dict(state)
        assert s2.epoch == 2
        assert list(s2) == full_epoch2[10:]

    def test_bucket_state_modulus_ignores_resume_offset(self, tmp_path):
        """state_dict's position modulus is the FULL epoch length:
        len(self) shrinks by the restored offset after a resume, which
        mapped later saves to the wrong position."""
        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset("coll", base_image_dir=str(root), resolution=128,
                          center_crop=False)
        bs = ResolutionBucketSampler(ds, batch_size=2, shuffle=True, seed=5)
        n = bs._total_batches()
        assert n > 3
        bs.load_state_dict({"start_batch_index": 3, "epoch": 1, "seed": 5})
        # one full epoch of steps must wrap back to position 0
        assert bs.state_dict(global_step=n)["start_batch_index"] == 0
        assert bs.state_dict(global_step=n + 2)["start_batch_index"] == 2


class TestLoader:
    def test_iterates_batches(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset("coll", base_image_dir=str(root), resolution=128,
                          center_crop=True)
        dl = DataLoader(ds, batch_size=4, num_workers=2, drop_last=True)
        batches = list(dl)
        assert len(batches) == len(ds) // 4 == len(dl)
        b = batches[0]
        assert b["image"].shape[0] == 4
        assert len(b["caption"]) == 4

    def test_bucket_loader(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset("coll", base_image_dir=str(root), resolution=128,
                          center_crop=False)
        bs = ResolutionBucketSampler(ds, batch_size=2)
        dl = DataLoader(ds, batch_sampler=bs, num_workers=2)
        n = 0
        for b in dl:
            assert b["image"].shape[0] == 2
            n += 1
        assert n == len(bs)


class TestLoaderRobustness:
    def test_abandoned_iterator_releases_producer(self, tmp_path):
        """Breaking out of a loader mid-epoch (eval loop, max_steps,
        preemption) must not leave the producer thread blocked in q.put
        holding the worker pool open."""
        import threading
        import time

        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset("coll", base_image_dir=str(root), resolution=128,
                          center_crop=True)
        before = threading.active_count()
        for _ in range(3):  # each abandonment must clean up
            it = iter(DataLoader(ds, batch_size=2, num_workers=2,
                                 prefetch=1))
            next(it)
            it.close()  # generator finally -> stop.set()
        deadline = time.time() + 10
        while time.time() < deadline:
            if threading.active_count() <= before:
                break
            time.sleep(0.1)
        assert threading.active_count() <= before

    def test_concurrent_process_loaders_keep_their_datasets(self, tmp_path):
        """Two process-worker loaders iterated concurrently must each
        serve their OWN dataset (the fork registry is per-loader)."""
        class Tagged:
            def __init__(self, tag, n=8):
                self.tag, self.n = tag, n

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return {"tag": self.tag, "idx": i}

            @staticmethod
            def collate_fn(items):
                return items

        a = DataLoader(Tagged("A"), batch_size=2, num_workers=2,
                       worker_type="process", prefetch=1)
        b = DataLoader(Tagged("B"), batch_size=2, num_workers=2,
                       worker_type="process", prefetch=1)
        ita, itb = iter(a), iter(b)
        for _ in range(3):  # interleave: A forks, then B re-registers
            batch_a, batch_b = next(ita), next(itb)
            assert all(x["tag"] == "A" for x in batch_a), batch_a
            assert all(x["tag"] == "B" for x in batch_b), batch_b
        ita.close()
        itb.close()

    def test_pool_creation_failure_surfaces(self, tmp_path, monkeypatch):
        """If worker-pool creation fails (fork unavailable, EMFILE), the
        consumer must receive the error — not block forever on q.get()
        because the producer died before posting the end marker."""
        import pytest

        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset("coll", base_image_dir=str(root), resolution=128,
                          center_crop=True)
        dl = DataLoader(ds, batch_size=2, num_workers=2)

        def boom(self):
            raise OSError("no pipes left")

        monkeypatch.setattr(DataLoader, "_make_pool", boom)
        with pytest.raises(OSError, match="no pipes left"):
            next(iter(dl))

    def test_picklable_dataset_uses_forkserver_not_fork(self):
        """A picklable dataset must run under the forkserver pool (no
        fork-with-threads hazard): no _FORK_DATASETS entry is ever
        created, and items come back correct from the spawned workers."""
        from f_lite_tpu.data import loader as loader_mod

        before = set(loader_mod._FORK_DATASETS)
        dl = DataLoader(PicklableTagged("FS", n=8), batch_size=2,
                        num_workers=2, worker_type="process", prefetch=1)
        batches = list(dl)
        # no NEW registry entries (subset, not equality: an earlier
        # fork-fallback test's producer thread may unregister its token
        # asynchronously during this test)
        assert set(loader_mod._FORK_DATASETS) <= before  # fork path unused
        flat = [x for b in batches for x in b]
        assert sorted(x["idx"] for x in flat) == list(range(8))
        assert all(x["tag"] == "FS" for x in flat)

    def test_unguarded_main_script_is_not_reexecuted(self, tmp_path):
        """Forkserver children must never re-import the user's __main__
        (spawn.prepare re-runs an unguarded `python script.py` once per
        worker — verified to crash the pool before _no_main_reimport).
        The script has NO __main__ guard; its module level appends to a
        sentinel file, which must end up with exactly one line."""
        import subprocess
        import sys as _sys

        sentinel = tmp_path / "ran.txt"
        script = tmp_path / "train_script.py"
        script.write_text(
            "import sys\n"
            f"open({str(sentinel)!r}, 'a').write('ran\\n')\n"
            "sys.path.insert(0, {!r})\n".format(
                str(__import__('pathlib').Path(__file__).parents[1]))
            + "from tests.test_data import PicklableTagged\n"
            "from f_lite_tpu.data.loader import DataLoader\n"
            "dl = DataLoader(PicklableTagged('M', n=6), batch_size=2,\n"
            "                num_workers=2, worker_type='process')\n"
            "items = [x for b in dl for x in b]\n"
            "assert sorted(x['idx'] for x in items) == list(range(6))\n"
        )
        r = subprocess.run([_sys.executable, str(script)], timeout=300,
                           capture_output=True, text=True,
                           cwd=str(script.parent))
        assert r.returncode == 0, r.stderr[-2000:]
        assert sentinel.read_text().count("ran") == 1

    def test_forkserver_prespawns_all_workers(self):
        """Workers must all exist right after pool construction: spawning
        is then a one-time startup event under the __spec__ patch, never
        recurring per batch (where it could race user code's own
        concurrent Process spawns)."""
        dl = DataLoader(PicklableTagged("PS", n=4), batch_size=2,
                        num_workers=3, worker_type="process")
        pool, getitem, token = dl._make_pool()
        with pool:
            assert len(pool._ex._processes) == 3
            assert list(pool.map(getitem, [0, 1])) == [
                {"tag": "PS", "idx": 0}, {"tag": "PS", "idx": 1}]

    def test_main_defined_dataset_falls_back_to_fork(self, tmp_path):
        """A dataset class defined at the top level of the user's script
        pickles by reference to __main__, which forkserver workers never
        import — the loader must detect this and fall back to the fork
        pool (which inherits the class via memory) instead of crashing
        with BrokenProcessPool."""
        import subprocess
        import sys as _sys

        script = tmp_path / "inline_ds.py"
        script.write_text(
            "import sys\n"
            "sys.path.insert(0, {!r})\n".format(
                str(__import__('pathlib').Path(__file__).parents[1]))
            + "class InlineDS:\n"
            "    def __len__(self): return 6\n"
            "    def __getitem__(self, i): return {'idx': i}\n"
            "    @staticmethod\n"
            "    def collate_fn(items): return items\n"
            "from f_lite_tpu.data.loader import DataLoader\n"
            "dl = DataLoader(InlineDS(), batch_size=2, num_workers=2,\n"
            "                worker_type='process')\n"
            "items = [x for b in dl for x in b]\n"
            "assert sorted(x['idx'] for x in items) == list(range(6))\n"
            "print('fallback-ok')\n"
        )
        r = subprocess.run([_sys.executable, str(script)], timeout=300,
                           capture_output=True, text=True,
                           cwd=str(script.parent))
        assert r.returncode == 0, r.stderr[-2000:]
        assert "fallback-ok" in r.stdout
        assert "falling back" not in r.stderr or "__main__" in r.stderr

    def test_preexisting_forkserver_warns_once(self, caplog):
        """If user code started the singleton forkserver before the
        loader (env strip can no longer apply), the loader must warn
        loudly instead of silently believing workers are clean."""
        import logging

        from f_lite_tpu.data import loader as loader_mod

        # ensure a forkserver is running (any prior pool started it),
        # then make the loader re-evaluate as if seeing it first
        dl0 = DataLoader(PicklableTagged("W", n=2), batch_size=1,
                         num_workers=1, worker_type="process")
        list(dl0)
        loader_mod._forkserver_started = False
        try:
            with caplog.at_level(logging.WARNING,
                                 logger="f_lite_tpu.data.loader"):
                dl = DataLoader(PicklableTagged("W2", n=4), batch_size=2,
                                num_workers=1, worker_type="process")
                items = [x for b in dl for x in b]
            assert sorted(x["idx"] for x in items) == list(range(4))
            assert any("already running" in r.message for r in
                       caplog.records)
        finally:
            loader_mod._forkserver_started = True

    def test_forkserver_preload_is_jax_free(self):
        """The ONLY module the forkserver preloads must import without
        pulling jax (via the f_lite_tpu package __init__ chain): jax in
        the server process would reintroduce the fork-with-threads
        hazard the forkserver exists to avoid."""
        import subprocess
        import sys as _sys

        r = subprocess.run(
            [_sys.executable, "-c",
             "import sys; import f_lite_tpu.data.dataset; "
             "sys.exit(1 if 'jax' in sys.modules else 0)"],
            timeout=120, capture_output=True, text=True,
            cwd=str(__import__('pathlib').Path(__file__).parents[1]),
            env={"PATH": "/usr/bin:/bin:/usr/local/bin",
                 "PYTHONPATH": str(
                     __import__('pathlib').Path(__file__).parents[1])},
        )
        assert r.returncode == 0, (r.stdout, r.stderr[-1000:])

    def test_imagedataset_pickles_without_network_clients(self, tmp_path):
        """ImageDataset must pickle (forkserver contract), dropping its
        lazy HTTP/S3 clients so workers re-create their own."""
        import pickle

        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset("coll", base_image_dir=str(root), resolution=128,
                          center_crop=True)
        ds._session = object()  # simulate a used (unpicklable) session
        clone = pickle.loads(pickle.dumps(ds))
        assert clone._session is None and clone._s3 is None
        assert clone[0]["image"].shape == ds[0]["image"].shape

    def test_fork_registry_unregisters_after_iteration(self):
        """Process-worker loaders must drop their registry entry when the
        pool shuts down — a leaked entry pins the dataset for the process
        lifetime."""
        from f_lite_tpu.data import loader as loader_mod

        class Tiny:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                return {"idx": i}

            @staticmethod
            def collate_fn(items):
                return items

        # compare by set-difference, not equality: an earlier test's
        # closed loaders unregister asynchronously (produce()'s finally
        # runs after pool shutdown), so stale entries may vanish from
        # under an exact-dict snapshot mid-test
        before = set(loader_mod._FORK_DATASETS)
        dl = DataLoader(Tiny(), batch_size=2, num_workers=2,
                        worker_type="process", prefetch=1)
        assert len(list(dl)) == 2
        deadline = time.time() + 10
        while time.time() < deadline and set(loader_mod._FORK_DATASETS) - before:
            time.sleep(0.05)
        assert not set(loader_mod._FORK_DATASETS) - before


class TestEpochAugmentation:
    def test_caption_and_flip_vary_across_epochs(self, tmp_path):
        """(seed, epoch, idx)-keyed item RNG: same item re-draws caption
        choice across epochs (a (seed, idx)-only key pinned each image's
        caption/flip for the whole run) while staying deterministic
        within an epoch (resume replays the same draws)."""
        root = _write_parquet_dataset(tmp_path)
        ds = ImageDataset("coll", base_image_dir=str(root), resolution=128,
                          center_crop=True, random_flip=True, seed=5)
        caps = set()
        for epoch in range(8):
            ds.set_epoch(epoch)
            first = ds[0]["caption"]
            again = ds[0]["caption"]
            assert first == again  # deterministic within the epoch
            caps.add(first)
        assert len(caps) > 1, caps  # both captions drawn across epochs
