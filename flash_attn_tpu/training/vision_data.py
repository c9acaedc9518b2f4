"""Image-classification datamodule.

Counterpart of the reference's ImageNet datamodule
(`training/src/datamodules/imagenet.py`, Lightning + timm transforms).
TPU-first split of responsibilities:

* The **host side** only indexes and stacks pre-sized uint8 arrays (or
  decodes image files once into a cached array) — no per-step CPU
  augmentation workers.
* **Augmentation runs on device** inside the jitted train step
  (`augment_batch`): pad-crop + horizontal flip + normalisation are a few
  VPU ops fused into the first conv, keyed by (seed, step) so the stream
  is deterministic and resumable — the fault-tolerance story matches the
  token loader (`data.py`).

Sources: synthetic class-conditional images (tests/benchmarks), ``.npz``
/``.npy`` shards (``images`` uint8 (N, H, W, 3) + ``labels``), or an
ImageFolder-style directory tree decoded via PIL when available.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np

from flash_attn_tpu.training.data import LoaderState

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def synthetic_images(num: int, image_size: int, num_classes: int,
                     seed: int = 0):
    """Class-conditional gaussian blobs: learnable by a small ViT in a few
    steps, so smoke-training has a decreasing loss to assert on."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num).astype(np.int32)
    # per-class mean color + low-frequency pattern
    base = rng.uniform(64, 192, (num_classes, 1, 1, 3))
    imgs = base[labels] + rng.normal(0, 24, (num, image_size, image_size, 3))
    return np.clip(imgs, 0, 255).astype(np.uint8), labels


def _load_array_source(path: Path):
    if path.suffix == ".npz":
        z = np.load(path)
        return np.asarray(z["images"]), np.asarray(z["labels"], np.int32)
    # directory with images.npy / labels.npy
    return (np.load(path / "images.npy"),
            np.asarray(np.load(path / "labels.npy"), np.int32))


def _load_image_folder(root: Path, image_size: int):
    """ImageFolder layout (class-name subdirectories of image files),
    decoded once with PIL into a uint8 array."""
    try:
        from PIL import Image  # type: ignore
    except ImportError as e:  # pragma: no cover - env without PIL
        raise RuntimeError(
            "image-folder datasets need PIL; preprocess to .npz instead"
        ) from e
    classes = sorted(p.name for p in root.iterdir() if p.is_dir())
    imgs, labels = [], []
    for ci, cname in enumerate(classes):
        for f in sorted((root / cname).iterdir()):
            if f.suffix.lower() not in (".jpg", ".jpeg", ".png", ".bmp"):
                continue
            im = Image.open(f).convert("RGB").resize(
                (image_size, image_size))
            imgs.append(np.asarray(im, np.uint8))
            labels.append(ci)
    return np.stack(imgs), np.asarray(labels, np.int32)


class ImageDataset:
    def __init__(self, images: np.ndarray, labels: np.ndarray):
        assert images.ndim == 4 and images.shape[0] == labels.shape[0]
        self.images = images
        self.labels = labels

    def __len__(self):
        return self.images.shape[0]


class VisionLoader:
    """Deterministic resumable (images, labels) batch stream — the same
    (seed, epoch)-pure permutation + batch counter recovery semantics as
    `FaultTolerantLoader` (`fault_tolerant_sampler.py:10` role)."""

    def __init__(self, dataset: ImageDataset, batch_size: int, seed: int = 0,
                 state: Optional[LoaderState] = None, shuffle: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.state = state or LoaderState(seed=seed)
        self.batches_per_epoch = max(1, len(dataset) // batch_size)

    def _epoch_perm(self, epoch):
        if not self.shuffle:
            return np.arange(len(self.dataset))
        rng = np.random.default_rng((self.state.seed, epoch))
        return rng.permutation(len(self.dataset))

    def __iter__(self):
        return self

    def __next__(self):
        st = self.state
        if st.batches_served >= self.batches_per_epoch:
            st.epoch += 1
            st.batches_served = 0
        perm = self._epoch_perm(st.epoch)
        i0 = st.batches_served * self.batch_size
        idx = perm[i0:i0 + self.batch_size]
        if len(idx) < self.batch_size:  # tiny datasets: wrap
            idx = np.resize(idx, self.batch_size)
        st.batches_served += 1
        return self.dataset.images[idx], self.dataset.labels[idx]


def make_image_loader(data_cfg, num_classes: int) -> VisionLoader:
    """Build the loader from a DataConfig (dataset = "synthetic", a .npz
    /array-shard path, or an ImageFolder directory)."""
    size = int(getattr(data_cfg, "image_size", 224) or 224)
    ds_name = data_cfg.dataset
    if ds_name in (None, "", "synthetic"):
        n = data_cfg.max_examples or 512
        images, labels = synthetic_images(n, size, num_classes,
                                          seed=data_cfg.seed)
    else:
        path = Path(ds_name)
        if path.suffix == ".npz" or (path / "images.npy").exists():
            images, labels = _load_array_source(path)
        else:
            images, labels = _load_image_folder(path, size)
        if data_cfg.max_examples:
            images = images[: data_cfg.max_examples]
            labels = labels[: data_cfg.max_examples]
    return VisionLoader(ImageDataset(images, labels), data_cfg.batch_size,
                        seed=data_cfg.seed)


def augment_batch(images, rng_key, *, train: bool, pad: int = 4):
    """Device-side augmentation + normalisation (timm-transform role).

    images: (b, h, w, 3) uint8.  Train: reflect-pad `pad` px, random crop
    back, random horizontal flip — all branch-free gathers/selects that XLA
    fuses ahead of the patch-embed conv.  Eval: normalise only.
    """
    import jax
    import jax.numpy as jnp

    x = images.astype(jnp.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    if not train:
        return x
    b, h, w, _ = x.shape
    kc, kf = jax.random.split(rng_key)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    oy = jax.random.randint(kc, (b,), 0, 2 * pad + 1)
    ox = jax.random.randint(jax.random.fold_in(kc, 1), (b,), 0, 2 * pad + 1)
    rows = oy[:, None] + jnp.arange(h)[None, :]          # (b, h)
    cols = ox[:, None] + jnp.arange(w)[None, :]
    x = jax.vmap(lambda img, r, c: img[r][:, c])(xp, rows, cols)
    flip = jax.random.bernoulli(kf, 0.5, (b,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    return x
