"""Host input pipeline: dataset + balanced sampling + device prefetch.

Replaces torch DataLoader/ImageFolder/WeightedRandomSampler
(``train/train_resnet.py:74-223``) with a numpy/PIL loader whose batches
are produced on a background thread and double-buffered onto the device —
the async producer/consumer upgrade of the reference's 10 ms busy-poll
queue (``app.py:106-121``; SURVEY.md §2a "double-buffered HBM batches").
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp")


class ImageFolderDataset:
    """Directory-per-class image dataset (torchvision ImageFolder layout:
    root/<class_name>/<image>)."""

    def __init__(self, root: str, image_size: Tuple[int, int] = (224, 224),
                 class_names: Optional[Sequence[str]] = None):
        self.root = root
        self.image_size = tuple(image_size)
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        if class_names is not None:
            classes = [c for c in class_names if c in classes] + [
                c for c in classes if c not in class_names
            ]
        self.class_names = classes
        self.samples: List[Tuple[str, int]] = []
        for idx, cls in enumerate(classes):
            cdir = os.path.join(root, cls)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(IMAGE_EXTENSIONS):
                    self.samples.append((os.path.join(cdir, fname), idx))
        self.labels = np.asarray([lbl for _, lbl in self.samples], dtype=np.int32)

    def __len__(self) -> int:
        return len(self.samples)

    def load(self, index: int) -> Tuple[np.ndarray, int]:
        from PIL import Image

        path, label = self.samples[index]
        img = Image.open(path).convert("RGB").resize(
            (self.image_size[1], self.image_size[0])
        )
        return np.asarray(img, dtype=np.uint8), label

    def class_counts(self) -> np.ndarray:
        return np.bincount(self.labels, minlength=len(self.class_names))


class ArrayDataset:
    """In-memory dataset (tests / synthetic data)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 class_names: Optional[Sequence[str]] = None):
        assert len(images) == len(labels)
        self.images = images
        self.labels = np.asarray(labels, dtype=np.int32)
        self.class_names = list(class_names or [str(i) for i in range(int(labels.max()) + 1)])

    def __len__(self) -> int:
        return len(self.images)

    def load(self, index: int) -> Tuple[np.ndarray, int]:
        return self.images[index], int(self.labels[index])

    def class_counts(self) -> np.ndarray:
        return np.bincount(self.labels, minlength=len(self.class_names))


def balanced_sample_indices(labels: np.ndarray, n: int, rng: np.random.Generator) -> np.ndarray:
    """WeightedRandomSampler equivalent (train_resnet.py:208-223):
    sample with per-class inverse-frequency probabilities."""
    counts = np.bincount(labels)
    weights = 1.0 / np.maximum(counts[labels], 1)
    probs = weights / weights.sum()
    return rng.choice(len(labels), size=n, replace=True, p=probs)


class DataLoader:
    """Batched iterator with optional balancing and background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        balanced: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.balanced = balanced
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.balanced:
            labels = getattr(self.dataset, "labels")
            return balanced_sample_indices(labels, n, self._rng)
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def _make_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._epoch_indices()
        nb = len(self)
        for b in range(nb):
            sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
            if len(sel) == 0:
                break
            images, labels = zip(*(self.dataset.load(i) for i in sel))
            yield {
                "images": np.stack(images),
                "labels": np.asarray(labels, dtype=np.int32),
            }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Background-thread producer with a bounded queue: host IO/decode
        overlaps device compute (double buffering)."""
        if self.prefetch <= 0:
            yield from self._make_batches()
            return
        q: queue.Queue = queue.Queue(self.prefetch)
        _END = object()
        errors: List[BaseException] = []

        def producer():
            try:
                for batch in self._make_batches():
                    q.put(batch)
            except BaseException as e:  # surfaced to the consumer
                errors.append(e)
            finally:
                q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
        if errors:
            raise errors[0]


def device_prefetch(iterator: Iterator, sharding=None, size: int = 2,
                    leaves=None):
    """Move batches to device ahead of consumption (jax equivalent of the
    double-buffered HBM transfer): keeps `size` batches in flight.

    ``leaves``: for dict batches, transfer only these keys (the rest pass
    through untouched — e.g. host-side metadata accompanying a packed
    buffer)."""
    import collections

    buf = collections.deque()

    def put(batch):
        if leaves is not None and isinstance(batch, dict):
            out = dict(batch)
            for k in leaves:
                out[k] = (jax.device_put(batch[k], sharding)
                          if sharding is not None else jax.device_put(batch[k]))
            return out
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        yield buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
