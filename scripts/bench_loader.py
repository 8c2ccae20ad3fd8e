"""Input-pipeline throughput proof (VERDICT r3 item 7).

Measures the host data loader's aggregate img/s on a synthetic-disk
ImageFolder (real JPEG decode + the full DeiT train transform at 224²),
across the thread and process worker configurations the trainer
exposes (``--num-workers`` / ``--loader-procs``), plus the single-image
decode/transform costs that set the per-core ceiling.

This box has ONE CPU core, so the aggregate here IS the per-core
ceiling; the recorded recipe for a real multi-core/multi-host machine
is in BENCH_NOTES (input-pipeline section): per-core rate × cores,
and past one host, `--distributed` shards the sampler per process
(data/loader.py ShuffleSampler shard/num_shards) so loading scales
with hosts, never funneling through one.

Usage: python scripts/bench_loader.py [n_images] [batch]
"""

import io
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from PIL import Image


def make_folder(root, n=256, size=256, classes=8):
    from ivit_tpu.data.datasets import SyntheticDataset

    ds = SyntheticDataset(n=n, size=size, num_classes=classes, seed=0)
    for i in range(n):
        img, label = ds.load(i)
        d = os.path.join(root, f"class_{label:03d}")
        os.makedirs(d, exist_ok=True)
        img.convert("RGB").save(
            os.path.join(d, f"img_{i:05d}.jpg"), quality=90
        )
    return n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    root = "/tmp/bench_imgfolder"
    if not os.path.isdir(root):
        os.makedirs(root)
        make_folder(root, n)
    from ivit_tpu.data.datasets import ImageFolder
    from ivit_tpu.data.loader import DataLoader
    from ivit_tpu.data.transforms import TrainTransform

    ds = ImageFolder(root)
    n = len(ds)
    tf = TrainTransform(size=224)

    # single-image attribution: decode vs transform
    raw = open(os.path.join(
        root, sorted(os.listdir(root))[0],
        sorted(os.listdir(os.path.join(root, sorted(os.listdir(root))[0])))[0]
    ), "rb").read()
    t0 = time.perf_counter()
    K = 50
    for _ in range(K):
        img = Image.open(io.BytesIO(raw))
        img.load()
    t_dec = (time.perf_counter() - t0) / K
    rng = np.random.default_rng(0)
    img = Image.open(io.BytesIO(raw))
    img.load()
    t0 = time.perf_counter()
    for _ in range(K):
        tf(img, rng)
    t_tf = (time.perf_counter() - t0) / K
    print(
        f"single-core: decode {t_dec*1e3:.2f} ms + transform "
        f"{t_tf*1e3:.2f} ms = {1.0/(t_dec+t_tf):.1f} img/s ceiling/core"
    )

    for use_procs, workers in (
        (False, 4), (False, 8), (True, 2), (True, 4), (True, 8)
    ):
        dl = DataLoader(
            ds, batch, tf, num_workers=workers, use_processes=use_procs,
            drop_last=True,
        )
        it = iter(dl)
        next(it)  # warm the pool (process spawn cost excluded)
        t0 = time.perf_counter()
        seen = 0
        for images, labels in it:
            seen += images.shape[0]
        dt = time.perf_counter() - t0
        kind = "procs" if use_procs else "threads"
        print(
            f"{kind:7s} x{workers}: {seen/dt:7.1f} img/s aggregate "
            f"({seen} imgs in {dt:.1f}s)"
        )


if __name__ == "__main__":
    main()
