"""Datasets + batching loader with fixed shapes and device prefetch.

Host-side equivalents of the reference DetectionDatset/SkipSubset
(effdet/data/dataset.py:12-97), DetectionFastCollate + PrefetchLoader
(effdet/data/loader.py:15-142): images are decoded in a thread pool,
GT is padded to a fixed max_instances (fill -1, loader.py:12,31-33),
and ready batches are device_put ahead of consumption (double buffering
— the CUDA-stream prefetcher's TPU equivalent).
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np

from .parsers import Parser
from .transforms import transforms_coco_eval, transforms_coco_train

MAX_INSTANCES = 100


class DetectionDataset:
    """Image + annotation dataset (reference DetectionDatset, dataset.py:12-65)."""

    def __init__(self, data_dir: str, parser: Parser,
                 transform: Optional[Callable] = None):
        self.data_dir = data_dir
        self.parser = parser
        self.transform = transform

    def __len__(self):
        return len(self.parser)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, Dict]:
        from PIL import Image
        info = self.parser.get_img_info(idx)
        ann = self.parser.get_ann(idx)
        anno = dict(
            bbox=ann["bbox"].copy(), cls=ann["cls"].copy(),
            img_id=info["id"],
            img_size=(info["width"], info["height"]))
        # evaluator flags (VOC difficult / OpenImages group-of) ride along
        # so driver evaluation sees them (reference evaluator.py:45-49)
        for k in ("difficult", "group_of"):
            if k in ann:
                anno[k] = ann[k].copy()
        path = os.path.join(self.data_dir, info["file_name"])
        img = None
        if path.lower().endswith((".jpg", ".jpeg")):
            # native libjpeg decode (csrc/data_core.cpp) — GIL-free, then
            # wrapped as PIL so the transform pipeline is unchanged
            from . import native_decode
            if native_decode.available():
                try:
                    arr = native_decode.decode_jpeg(
                        open(path, "rb").read())
                except OSError:
                    arr = None
                if arr is not None:
                    img = Image.fromarray(arr)
        if img is None:
            img = Image.open(path).convert("RGB")
        if self.transform is not None:
            img, anno = self.transform(img, anno)
        return img, anno


class SkipSubset:
    """Every-nth-sample view (reference SkipSubset, dataset.py:68-97)."""

    def __init__(self, dataset, n: int = 2):
        self.dataset = dataset
        self.n = max(n, 1)
        self.indices = list(range(0, len(dataset), self.n))

    @property
    def parser(self):
        return self.dataset.parser

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


class SyntheticDetectionDataset:
    """Fixed-seed synthetic dataset: class-colored rectangles rendered on
    noise backgrounds — a *learnable* stand-in for LVIS/COCO paths
    (SURVEY §4 test strategy): each class has a distinctive color, so a
    detector trained on it must produce real detections."""

    def __init__(self, num_images: int = 64, image_size: Tuple[int, int] = (512, 512),
                 num_classes: int = 10, max_boxes: int = 8, seed: int = 0,
                 color_seed: int = 1234):
        self.num_images = num_images
        self.image_size = image_size
        self.num_classes = num_classes
        self.max_boxes = max_boxes
        self.seed = seed
        # class colors are shared across seeds so train/val agree
        self.colors = np.random.default_rng(color_seed).integers(
            60, 255, (num_classes + 1, 3))

    def __len__(self):
        return self.num_images

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        h, w = self.image_size
        img = rng.integers(0, 50, (h, w, 3)).astype(np.uint8)
        n = int(rng.integers(1, self.max_boxes + 1))
        ymin = rng.uniform(0, h * 0.8, n)
        xmin = rng.uniform(0, w * 0.8, n)
        bh = rng.uniform(h * 0.08, h * 0.3, n)
        bw = rng.uniform(w * 0.08, w * 0.3, n)
        bbox = np.stack(
            [ymin, xmin, np.minimum(ymin + bh, h - 1),
             np.minimum(xmin + bw, w - 1)],
            axis=1).astype(np.float32)
        cls = rng.integers(1, self.num_classes + 1, n).astype(np.int32)
        for (y0, x0, y1, x1), c in zip(bbox, cls):
            img[int(y0):int(y1), int(x0):int(x1)] = self.colors[c]
        anno = dict(bbox=bbox, cls=cls, img_id=idx, img_size=(w, h),
                    img_scale=1.0)
        return img, anno


def pad_annotations(anno: Dict, max_instances: int = MAX_INSTANCES) -> Dict:
    """Pad bbox/cls to fixed size with -1 fill (loader.py:31-33 semantics)."""
    n = min(len(anno["cls"]), max_instances)
    bbox = np.full((max_instances, 4), -1.0, np.float32)
    cls = np.full((max_instances,), -1, np.int32)
    bbox[:n] = anno["bbox"][:n]
    cls[:n] = anno["cls"][:n]
    out = dict(anno)
    out["bbox"] = bbox
    out["cls"] = cls
    for k in ("difficult", "group_of"):
        if k in anno:
            flags = np.zeros((max_instances,), np.int32)
            flags[:n] = anno[k][:n]
            out[k] = flags
    return out


def _numeric_id(img_id) -> int:
    """Image ids must be device-puttable ints; string ids (OpenImages)
    map to a stable CRC32 key (uniqueness is what the evaluators need)."""
    if isinstance(img_id, (int, np.integer)):
        return int(img_id)
    import zlib
    return zlib.crc32(str(img_id).encode()) & 0x7FFFFFFF


def collate_batch(samples: List[Tuple[np.ndarray, Dict]],
                  max_instances: int = MAX_INSTANCES) -> Dict[str, np.ndarray]:
    """Stack into fixed-shape arrays (DetectionFastCollate, loader.py:15-100)."""
    imgs = np.stack([s[0] for s in samples])
    annos = [pad_annotations(s[1], max_instances) for s in samples]
    batch = {
        "image": imgs,
        "bbox": np.stack([a["bbox"] for a in annos]),
        "cls": np.stack([a["cls"] for a in annos]),
        "img_id": np.asarray([_numeric_id(a.get("img_id", -1))
                              for a in annos], np.int64),
    }
    for k in ("difficult", "group_of"):
        if k in annos[0]:
            batch[k] = np.stack([a[k] for a in annos])
    if "img_scale" in annos[0]:
        batch["img_scale"] = np.asarray(
            [a["img_scale"] for a in annos], np.float32)[:, None]
    if "img_size" in annos[0]:
        batch["img_size"] = np.asarray(
            [a["img_size"] for a in annos], np.float32)
    return batch


class PrefetchLoader:
    """Threaded batch producer with device prefetch.

    Host threads decode/transform; ready batches are normalized and
    device_put ahead of consumption (reference PrefetchLoader's CUDA
    double-buffering, loader.py:104-170, the TPU way).

    Multihost: ``process_index``/``process_count`` shard the sample order
    per process with the reference samplers' semantics
    (effdet/data/loader.py:207-214): the epoch order (shuffled with a
    seed every process shares, or sequential for eval — timm's
    OrderedDistributedSampler) is padded by wrapping to a multiple of
    ``process_count``, then strided ``order[rank::world]`` so ranks cover
    disjoint samples (up to the <world wrap duplicates of the pad).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 workers: int = 4, max_instances: int = MAX_INSTANCES,
                 drop_last: bool = True, prefetch: int = 2,
                 seed: int = 0, device_put: bool = True,
                 normalize: bool = True,
                 mean=None, std=None,
                 re_prob: float = 0.0, re_mode: str = "pixel",
                 re_count: int = 1,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = workers
        self.max_instances = max_instances
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.device_put = device_put
        self.normalize = normalize
        self.mean = mean
        self.std = std
        # RandomErasing after normalization, on device (reference
        # PrefetchLoader wiring, effdet/data/loader.py:115-130)
        self.re_prob = re_prob
        self.re_mode = re_mode
        self.re_count = re_count
        self.process_index = process_index or 0
        self.process_count = process_count or 1
        if not (0 <= self.process_index < self.process_count):
            raise ValueError(
                f"process_index {self.process_index} out of range for "
                f"process_count {self.process_count}")
        # epoch counter: each __iter__ pass reshuffles with a fresh
        # (seed, epoch) stream, the DistributedSampler.set_epoch semantic
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _epoch_order(self, epoch: int) -> np.ndarray:
        """This process's sample order for one epoch (shared-seed shuffle,
        wrap-pad to a multiple of world, stride by rank)."""
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        world = self.process_count
        if world > 1:
            total = -(-len(order) // world) * world
            if total > len(order):
                order = np.concatenate([order, order[:total - len(order)]])
            order = order[self.process_index::world]
        return order

    def __len__(self):
        per_proc = -(-len(self.dataset) // self.process_count)
        n = per_proc // self.batch_size
        if not self.drop_last and per_proc % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[Dict]:
        import jax

        from .device_preproc import normalize_uint8

        epoch = self._epoch
        self._epoch += 1

        order = self._epoch_order(epoch)

        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        norm_kwargs = {}
        if self.mean is not None:
            norm_kwargs["mean"] = tuple(self.mean)
        if self.std is not None:
            norm_kwargs["std"] = tuple(self.std)

        def produce():
            try:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(
                        max_workers=max(1, self.workers)) as pool:
                    for bi, idxs in enumerate(batches):
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, idxs))
                        batch = collate_batch(samples, self.max_instances)
                        if self.device_put:
                            batch = {k: jax.device_put(v)
                                     for k, v in batch.items()}
                            if self.normalize and batch["image"].dtype == np.uint8:
                                batch["image"] = normalize_uint8(
                                    batch["image"], **norm_kwargs)
                            if self.re_prob > 0:
                                from .random_erasing import random_erasing
                                key = jax.random.key(
                                    hash((self.seed, epoch, bi)) & 0x7FFFFFFF)
                                batch["image"] = random_erasing(
                                    key, batch["image"],
                                    probability=self.re_prob,
                                    mode=self.re_mode,
                                    max_count=self.re_count)
                        q.put(batch)
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()


def create_loader(dataset, input_size: Tuple[int, int], batch_size: int,
                  is_training: bool = False, workers: int = 4,
                  interpolation: str = "bilinear",
                  fill_color: Tuple[int, int, int] = (124, 116, 104),
                  mean=None, std=None,
                  re_prob: float = 0.0, re_mode: str = "pixel",
                  re_count: int = 1,
                  max_instances: int = MAX_INSTANCES, seed: int = 0,
                  distributed: bool = False,
                  process_index: Optional[int] = None,
                  process_count: Optional[int] = None):
    """Dataset + transform + prefetch loader (reference create_loader,
    loader.py:173-232). mean/std default to ImageNet; re_prob > 0 enables
    on-device RandomErasing after normalization (loader.py:115-130).

    ``distributed=True`` shards samples per jax process (the reference's
    DistributedSampler / OrderedDistributedSampler split, loader.py:207-214);
    process_index/process_count override the jax.process_* defaults."""
    if getattr(dataset, "transform", None) is None and hasattr(dataset, "transform"):
        tf = (transforms_coco_train(input_size, fill_color=fill_color)
              if is_training else
              transforms_coco_eval(input_size,
                                   interpolation=interpolation,
                                   fill_color=fill_color))
        dataset.transform = tf
    if distributed and process_count is None:
        import jax
        process_index = jax.process_index()
        process_count = jax.process_count()
    return PrefetchLoader(
        dataset, batch_size=batch_size, shuffle=is_training, workers=workers,
        max_instances=max_instances, drop_last=is_training, seed=seed,
        mean=mean, std=std,
        re_prob=re_prob if is_training else 0.0,
        re_mode=re_mode, re_count=re_count,
        process_index=process_index, process_count=process_count)
