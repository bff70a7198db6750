"""Dataset construction + batched loader.

Reference-compatible behavior (``data/image_dataset.py:41-81``):
- per-key recursive glob with natural sorting,
- optional split-index files,
- ves-seg: shorter lists cycled (np.resize) to the longest,
- gan-ves-seg: UnalignedZip pairing (sequential real_A(+seg), random real_B
  and background per item, ``data/unalignedZipDataset.py:38-59``),
- shuffle except in the Test phase.

The loader is a thread-prefetched iterator producing collated numpy/jax
batches; heavy transforms inside the Compose already run on device.
"""
from __future__ import annotations

import os
import re
import atexit
import threading
from glob import glob
from queue import Queue
from typing import Any

import numpy as np

from octa_tpu.data.transforms import Compose, RngPool, get_data_augmentations
from octa_tpu.utils.enums import Phase, Task


def natsorted(paths):
    def key(s):
        return [int(t) if t.isdigit() else t
                for t in re.split(r"(\d+)", str(s))]

    return sorted(paths, key=key)


def _resolve_data_paths(data_settings: dict) -> dict[str, list[str]]:
    data = {}
    for key, val in data_settings.items():
        paths = natsorted(glob(val["files"], recursive=True))
        assert len(paths) > 0, (
            f"Error: Your provided file path {val['files']} for {key} does "
            "not match any files!")
        if "split" in val and val["split"]:
            assert os.path.isfile(val["split"]), (
                f"Error: Your provided split file path {val['split']} for "
                f"{key} does not exist.")
            with open(val["split"]) as f:
                indices = [int(line.rstrip()) for line in f if line.strip()]
            assert max(indices) < len(paths), (
                f"Error: split file for {key} requests index {max(indices)} "
                f"but the dataset only contains {len(paths)} files.")
            paths = np.array(paths)[indices].tolist()
            assert len(paths) > 0
        data[key] = paths
    return data


class VesSegDataset:
    """Paired dataset: all keys cycled to equal length."""

    def __init__(self, data: dict[str, list[str]], transform: Compose):
        max_len = max(len(v) for v in data.values())
        self.data = {
            k: np.resize(np.array(v), max_len).tolist() for k, v in data.items()
        }
        self.keys = list(data.keys())
        self.transform = transform
        self.length = max_len

    def __len__(self):
        return self.length

    def __getitem__(self, i):
        item = {}
        for k in self.keys:
            item[k] = self.data[k][i]
            item[k + "_path"] = self.data[k][i]
        return self.transform(item)


class UnalignedZipDataset:
    """GAN pairing (reference ``unalignedZipDataset.py``)."""

    def __init__(self, data: dict[str, list[str]], transform: Compose,
                 phase: Phase, rng: np.random.Generator):
        self.a = data.get("real_A")
        self.a_seg = data.get("real_A_seg")
        self.b = data.get("real_B")
        self.bg = data.get("background")
        self.transform = transform
        self.phase = phase
        self.rng = rng
        self.a_size = len(self.a) if self.a else 0
        self.b_size = len(self.b) if self.b else 0

    def __len__(self):
        return max(self.a_size, self.b_size)

    def __getitem__(self, i):
        item: dict[str, Any] = {}
        if self.a is not None:
            p = self.a[i % self.a_size]
            item["real_A"] = p
            item["real_A_path"] = p
        if self.b is not None:
            ib = int(self.rng.integers(0, self.b_size)) if "real_A" in item else i
            item["real_B"] = self.b[ib]
            item["real_B_path"] = self.b[ib]
        if self.a_seg is not None:
            p = self.a_seg[i % self.a_size]
            item["real_A_seg"] = p
            item["real_A_seg_path"] = p
        if self.bg is not None:
            item["background"] = self.bg[int(self.rng.integers(0, len(self.bg)))]
        return self.transform(item)


def collate(samples: list[dict[str, Any]]) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], str):
            out[k] = vals
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    """Thread-prefetched batch iterator (shuffling per epoch)."""

    def __init__(self, dataset, batch_size=1, shuffle=True, seed=0,
                 prefetch=2, drop_last=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
            yield collate([self.dataset[int(i)] for i in sel])

    def __iter__(self):
        q: Queue = Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except Exception:
                    continue
            return False

        def worker():
            try:
                for batch in self._batches():
                    if stop.is_set() or not put(batch):
                        return
            except BaseException as e:  # surfaced in the consumer
                put(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        _register_loader_thread(stop, t)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


_LOADER_THREADS: list = []


def _register_loader_thread(stop: threading.Event, t: threading.Thread):
    _LOADER_THREADS.append((stop, t))


def _shutdown_loader_threads():
    """Stop prefetch workers before interpreter teardown: a daemon thread
    dying mid-XLA-call aborts the process with
    'terminate called after throwing an instance of ...' at exit."""
    for stop, t in _LOADER_THREADS:
        stop.set()
    for _, t in _LOADER_THREADS:
        if t.is_alive():
            t.join(timeout=2.0)
    _LOADER_THREADS.clear()


atexit.register(_shutdown_loader_threads)


def get_post_transformation(config: dict, phase) -> dict[str, Compose]:
    """Post-processing Composes for prediction/label
    (reference ``image_dataset.py:26-38``)."""
    aug_config: dict = config[phase]["post_processing"]
    out = {}
    for k, v in (aug_config or {}).items():
        out[k] = Compose(get_data_augmentations(
            v, seed=config["General"].get("seed", 42)))
    return out


def get_dataset(config: dict, phase, batch_size=None, num_workers=None
                ) -> DataLoader:
    """Create the loader for a phase (reference ``image_dataset.py:41-81``)."""
    task = config["General"]["task"]
    seed = config["General"].get("seed", 42)
    import jax.numpy as jnp

    amp = bool(config["General"].get("amp"))
    dtype = jnp.bfloat16 if (phase == Phase.TRAIN and amp) else np.float32
    rng = RngPool(seed)
    transform = Compose(get_data_augmentations(
        config[phase]["data_augmentation"], seed, dtype, rng=rng))
    data = _resolve_data_paths(config[phase]["data"])

    if task == Task.GAN_VESSEL_SEGMENTATION and phase != Phase.VALIDATION:
        ds = UnalignedZipDataset(data, transform, phase, rng.np)
    else:
        ds = VesSegDataset(data, transform)

    return DataLoader(
        ds,
        batch_size=batch_size or config[phase].get("batch_size") or 1,
        shuffle=phase != Phase.TEST,
        seed=seed,
    )
