"""Threaded, prefetching host data loader with distributed sharding.

Replaces the reference's torch DataLoader + samplers
(/root/reference/utils/data_utils.py:14-42,
/root/reference/utils/samplers.py:8-65). Decode/augment runs in a host
thread pool overlapping TPU step time; batches come out as numpy arrays
ready for ``jax.device_put`` onto a data-sharded mesh.

``RepeatAugSampler`` is the RASampler analogue: each epoch every selected
image appears ``num_repeats`` times (with independent augmentations),
sharded across hosts, epoch-seeded shuffle.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator

import numpy as np


class RepeatAugSampler:
    """Epoch-seeded shuffle, each sample repeated ``num_repeats`` times,
    then sharded to ``num_shards`` hosts (samplers.py:8-65 semantics)."""

    def __init__(self, n: int, num_repeats: int = 3, shard: int = 0,
                 num_shards: int = 1, seed: int = 0):
        self.n = n
        self.num_repeats = num_repeats
        self.shard = shard
        self.num_shards = num_shards
        self.seed = seed

    def epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(self.n)
        rep = np.repeat(order, self.num_repeats)
        # pad to a multiple of num_shards, then interleave-shard
        total = int(np.ceil(len(rep) / self.num_shards)) * self.num_shards
        rep = np.concatenate([rep, rep[: total - len(rep)]])
        mine = rep[self.shard :: self.num_shards]
        # keep only ceil(n / num_shards) per epoch (RASampler truncation)
        keep = int(np.ceil(self.n / self.num_shards))
        return mine[:keep]


class ShuffleSampler:
    """Plain epoch-seeded shuffle with host sharding (RandomSampler +
    DistributedSampler semantics)."""

    def __init__(self, n: int, shard: int = 0, num_shards: int = 1,
                 seed: int = 0, shuffle: bool = True):
        self.n = n
        self.shard = shard
        self.num_shards = num_shards
        self.seed = seed
        self.shuffle = shuffle

    def epoch_indices(self, epoch: int) -> np.ndarray:
        order = (
            np.random.default_rng(self.seed + epoch).permutation(self.n)
            if self.shuffle
            else np.arange(self.n)
        )
        return order[self.shard :: self.num_shards]


# -- process-worker plumbing (spawn): state is installed once per
# worker by the pool initializer; the task fn is module-level so it
# pickles. The rng derivation matches the in-process path exactly, so
# thread and process loaders produce bit-identical batches.
_MP_STATE: dict = {}


def _mp_init(dataset, transform, seed, epoch):
    _MP_STATE["dataset"] = dataset
    _MP_STATE["transform"] = transform
    _MP_STATE["seed"] = seed
    _MP_STATE["epoch"] = epoch


def _mp_load(args):
    pos, idx = args
    img, label = _MP_STATE["dataset"].load(int(idx))
    rng = np.random.default_rng(
        (_MP_STATE["seed"], _MP_STATE["epoch"], pos, int(idx))
    )
    arr = _MP_STATE["transform"](img, rng)
    if hasattr(img, "close"):
        img.close()
    return arr, label


class DataLoader:
    """Iterable over (images[B,H,W,C] f32, labels[B] i32) numpy batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        transform: Callable,
        sampler=None,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        use_processes: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.transform = transform
        self.sampler = sampler or ShuffleSampler(len(dataset), seed=seed)
        self.drop_last = drop_last
        # 0 means "no parallelism" in the torch idiom the reference's
        # flags use; a 0-worker executor would raise, so clamp to one
        # worker thread (still fully synchronous semantics).
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0
        # Worker processes sidestep the GIL for the PIL/numpy transform
        # pipeline (the reference's torch DataLoader also uses worker
        # processes). Spawn start method: children never inherit live
        # TPU/relay client state. Requires a picklable dataset and
        # transform (transforms.TrainTransform / EvalTransform).
        self.use_processes = use_processes

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.sampler.epoch_indices(0))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        indices = self.sampler.epoch_indices(self.epoch)
        nb = len(self)
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_one(args):
            pos, idx = args
            img, label = self.dataset.load(int(idx))
            rng = np.random.default_rng(
                (self.seed, self.epoch, pos, int(idx))
            )
            arr = self.transform(img, rng)
            if hasattr(img, "close"):
                img.close()
            return arr, label

        def make_pool():
            if self.use_processes:
                import multiprocessing as mp
                from concurrent.futures import ProcessPoolExecutor

                return ProcessPoolExecutor(
                    self.num_workers,
                    mp_context=mp.get_context("spawn"),
                    initializer=_mp_init,
                    initargs=(self.dataset, self.transform, self.seed,
                              self.epoch),
                )
            return ThreadPoolExecutor(self.num_workers)

        load = _mp_load if self.use_processes else load_one

        def producer():
            try:
                with make_pool() as pool:
                    for b in range(nb):
                        if stop.is_set():
                            return
                        batch_idx = indices[
                            b * self.batch_size : (b + 1) * self.batch_size
                        ]
                        results = list(
                            pool.map(
                                load,
                                [
                                    (b * self.batch_size + j, i)
                                    for j, i in enumerate(batch_idx)
                                ],
                            )
                        )
                        images = np.stack([r[0] for r in results]).astype(
                            np.float32
                        )
                        labels = np.asarray(
                            [r[1] for r in results], np.int32
                        )
                        out_q.put((images, labels))
            except BaseException as e:  # propagate to the consumer —
                # a swallowed producer error would otherwise look like
                # an EMPTY epoch (zero batches, silent no-op training)
                out_q.put(e)
            finally:
                out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def build_dataloaders(args, dataset_train, dataset_val, num_shards=1, shard=0):
    """The ``dataloader(args)`` analogue (data_utils.py:14-42): train uses
    shuffled (or repeated-aug) sampling with drop_last, val is sequential
    with a 1.5× batch."""
    from .transforms import EvalTransform, TrainTransform

    tf_train = TrainTransform(
        size=args.input_size,
        color_jitter_strength=args.color_jitter,
        reprob=args.reprob,
        crop_scale=(getattr(args, "min_crop_scale", 0.08), 1.0),
        use_rand_augment=getattr(args, "aa", "rand") not in ("", "none"),
    )
    tf_eval = EvalTransform(size=args.input_size)
    use_procs = bool(getattr(args, "loader_procs", False))

    sampler_cls = (
        RepeatAugSampler(len(dataset_train), shard=shard, num_shards=num_shards,
                         seed=args.seed)
        if getattr(args, "repeated_aug", False)
        else ShuffleSampler(len(dataset_train), shard=shard,
                            num_shards=num_shards, seed=args.seed)
    )
    train_loader = DataLoader(
        dataset_train,
        args.batch_size,
        tf_train,
        sampler=sampler_cls,
        drop_last=True,
        num_workers=args.num_workers,
        seed=args.seed,
        use_processes=use_procs,
    )
    val_loader = DataLoader(
        dataset_val,
        int(args.batch_size * 1.5),
        tf_eval,
        sampler=ShuffleSampler(
            len(dataset_val), shard=shard, num_shards=num_shards, shuffle=False
        ),
        drop_last=False,
        num_workers=args.num_workers,
        seed=args.seed,
        use_processes=use_procs,
    )
    return train_loader, val_loader
