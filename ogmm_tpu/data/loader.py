"""Batched prefetching loader — the host side of the TPU input pipeline.

Replaces the reference's torch DataLoader with 6 worker processes
(datasets/dataloader.py:25-62). Here: a thread pool maps `__getitem__`
over index batches and a bounded queue keeps `prefetch` collated fixed-shape
numpy batches ready, so the device never waits on augmentation
(SURVEY.md §2.9 row 7). Batches are plain dict[str, np.ndarray] —
jax.device_put happens in the train loop (double-buffered by dispatch).

Determinism: datasets whose test protocol seeds global numpy per item
(SetDeterministic / per-index np.random.seed) are fetched under a lock so
thread interleaving cannot break the seed->draw sequence; the training split
runs fully parallel.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def _collate(items) -> Dict[str, np.ndarray]:
    first = items[0]
    if isinstance(first, dict):
        return {k: np.stack([it[k] for it in items], axis=0) for k in first}
    if isinstance(first, (list, tuple)):
        return tuple(np.stack([it[i] for it in items], axis=0)
                     for i in range(len(first)))
    return np.stack(items, axis=0)


class PrefetchLoader:
    """Iterable over collated batches with background prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 6,
                 prefetch: int = 2, seed: Optional[int] = None,
                 serialize_items: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.serialize_items = serialize_items
        self._epoch = 0
        self._lock = threading.Lock()

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(
                None if self.seed is None else self.seed + self._epoch)
            rng.shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, n, self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def _fetch(self, idxs) -> Dict[str, np.ndarray]:
        if self.serialize_items:
            with self._lock:
                items = [self.dataset[int(i)] for i in idxs]
        else:
            items = [self.dataset[int(i)] for i in idxs]
        return _collate(items)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batch_indices()
        self._epoch += 1
        if not batches:
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        it = iter(batches)
        it_lock = threading.Lock()

        def worker():
            while not stop.is_set():
                with it_lock:
                    idxs = next(it, None)
                if idxs is None:
                    break
                try:
                    q.put((self._fetch(idxs), None))
                except Exception as e:  # surface worker errors to the consumer
                    q.put((None, e))
                    break

        n_workers = 1 if self.serialize_items else min(
            self.num_workers, len(batches))
        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(n_workers)]
        for t in threads:
            t.start()
        try:
            for _ in range(len(batches)):
                batch, err = q.get()
                if err is not None:
                    raise err
                yield batch
        finally:
            stop.set()
            # drain so producer threads unblock
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class ListAsDict:
    """Adapt list-contract datasets ([src, tgt, tsfm], the DeepGMR family:
    ModelNetDV/GMR, IclNuim-style) to the dict contract the trainer consumes
    (reference train_base.py unpacks positionally; train.py by key)."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        item = self.dataset[i]
        if isinstance(item, dict):
            return item
        src, tgt, tsfm = item[0], item[1], item[2]
        return {
            'src_xyz': src.astype(np.float32),
            'tgt_xyz': tgt.astype(np.float32),
            'src_overlap': np.ones(len(src), np.float32),
            'tgt_overlap': np.ones(len(tgt), np.float32),
            'transform_gt': np.asarray(tsfm, np.float32)[:3, :4],
        }


def _check_overlap_thresh(dataset_cls, t):
    """device_overlap recomputes the host labels in the jitted step with
    TrainConfig.overlap_thresh — fail loudly if it disagrees with the
    dataset's own radius (ADVICE r4: enabling device_overlap
    programmatically on icl_nuim silently used the 7scene radius)."""
    if t.device_overlap and t.overlap_thresh != dataset_cls.overlap_thresh:
        raise ValueError(
            f"TrainConfig.overlap_thresh={t.overlap_thresh} but "
            f"{dataset_cls.__name__} computes host labels at "
            f"{dataset_cls.overlap_thresh}; set overlap_thresh="
            f"{dataset_cls.overlap_thresh} when device_overlap is on")


def data_loader(cfg):
    """Dataset factory — reference datasets/dataloader.py:25-62.

    cfg: ogmm_tpu.configs.Config. Returns (train_loader, test_loader).
    """
    from ogmm_tpu.data.modelnet import (ModelNetCP, ModelNetDV, ModelNetHdf,
                                        get_transforms)
    from ogmm_tpu.data.realdata import IclNuim, Scene7

    d = cfg.data
    t = cfg.train
    name = d.dataset
    if name in ("modelnet", "synthetic"):
        root = d.root if d.root.startswith("synthetic") else (
            "synthetic" if name == "synthetic" else d.root)
        train_tf, test_tf = get_transforms(d.noise_type, d.rot_mag,
                                           d.trans_mag, d.n_points,
                                           list(d.partial))
        train_data = ModelNetHdf(root, unseen=d.unseen, transform=train_tf,
                                 partition='train')
        test_data = ModelNetHdf(root, unseen=d.unseen, transform=test_tf,
                                partition='test')
        serialize_test = True          # SetDeterministic seeds global numpy
    elif name == "modelnetcp":
        train_data = ModelNetCP(d.root, d.n_points, d.rot_mag, d.trans_mag,
                                d.unseen, list(d.partial)[:1], d.noise_type,
                                partition='train')
        test_data = ModelNetCP(d.root, d.n_points, d.rot_mag, d.trans_mag,
                               d.unseen, list(d.partial)[:1], d.noise_type,
                               partition='test')
        serialize_test = True
    elif name == "modelnetdv":
        train_data = ListAsDict(
            ModelNetDV(d.root, partition='train', unseen=d.unseen))
        test_data = ListAsDict(
            ModelNetDV(d.root, partition='test', unseen=d.unseen))
        serialize_test = True
    elif name == "7scene":
        co = not t.device_overlap       # labels recomputed in the jitted step
        _check_overlap_thresh(Scene7, t)
        train_data = Scene7(d.root, d.n_points, list(d.partial), 'train',
                            fix_tgt_overlap=d.fix_tgt_overlap,
                            compute_overlap=co)
        test_data = Scene7(d.root, d.n_points, list(d.partial), 'test',
                           fix_tgt_overlap=d.fix_tgt_overlap,
                           compute_overlap=co)
        serialize_test = False
    elif name == "icl_nuim":
        co = not t.device_overlap
        _check_overlap_thresh(IclNuim, t)
        train_data = IclNuim(d.root, d.n_points, list(d.partial), 'train',
                             fix_tgt_overlap=d.fix_tgt_overlap,
                             compute_overlap=co)
        test_data = IclNuim(d.root, d.n_points, list(d.partial), 'test',
                            fix_tgt_overlap=d.fix_tgt_overlap,
                            compute_overlap=co)
        serialize_test = True
    else:
        raise ValueError(f"unknown dataset {name!r}")

    train_loader = PrefetchLoader(train_data, t.batch_size, shuffle=True,
                                  drop_last=True, num_workers=d.num_workers,
                                  seed=t.seed)
    test_loader = PrefetchLoader(test_data, t.test_batch_size, shuffle=False,
                                 drop_last=False, num_workers=d.num_workers,
                                 serialize_items=serialize_test)
    return train_loader, test_loader
