"""COCO captioning dataset + batching, designed for a TPU input pipeline.

Reference semantics reproduced (utils.py:23-103):
  * one sample per *annotation* (caption), not per image (utils.py:32);
  * JPEG -> RGB -> resize to 224x224 (utils.py:45, 84) — done on host with
    PIL exactly like torchvision's Resize on a PIL image;
  * captions lowercased + nltk-tokenized, wrapped with <start>/<end>
    (utils.py:50-51);
  * batches sorted by descending caption length and zero-padded
    (utils.py:61-77); train loader shuffles and drops the last partial
    batch (utils.py:92-94), test loader doesn't shuffle (utils.py:97-99).

TPU-first differences (deliberate):
  * images travel host->device as uint8 NHWC; the augmenting transform
    (random flips, /255, mean/std normalize — utils.py:84-88) runs on
    device inside the jitted step (`show_tell_tpu.data.transforms`), so the
    PCIe/ICI transfer is 4x smaller and the elementwise work fuses into the
    encoder's first conv;
  * captions are padded to a *fixed* length per loader (static shapes — one
    XLA program instead of one per batch-max-length); an explicit lengths
    vector replaces torch's pack_padded_sequence;
  * batches are produced by a background prefetch thread so host decode
    overlaps device compute.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from show_tell_tpu.data.coco import CocoCaptions
from show_tell_tpu.native import fastimage as native_fastimage
from show_tell_tpu.vocab.tokenize import word_tokenize

IMAGE_SIZE = 224
# Fixed caption pad length: COCO train2014 captions tokenize to <= ~55
# tokens; 64 (incl. <start>/<end>) covers all of them with headroom while
# staying one static XLA shape.
DEFAULT_PAD_LENGTH = 64


class MSCOCO:
    """Annotation-keyed COCO captions dataset (reference utils.py:23-59)."""

    def __init__(
        self,
        ann_path: str,
        data_path: str,
        vocab,
        train: bool = True,
        use_native_decode: Optional[bool] = None,
        fast_jpeg: bool = False,
        image_cache: Optional[str] = None,
    ):
        self.data_path = data_path
        self.vocab = vocab
        self.train = train
        if use_native_decode is None:
            use_native_decode = native_fastimage.is_available()
        self.use_native_decode = use_native_decode
        # fast_jpeg: DCT-domain scaled JPEG decode (libjpeg scale_num/denom;
        # PIL's Image.draft on the fallback path). ~2x faster per image,
        # pixels within a few LSB of the full-resolution decode — opt-in
        # extension (--fast_jpeg), off by default for reference parity.
        self.fast_jpeg = fast_jpeg
        if ann_path.endswith(".tsv"):
            # Flickr30k-style image<TAB>caption file (--data_source
            # Flickr); same annotation-keyed semantics via a
            # CocoCaptions-shaped index.
            from show_tell_tpu.data.coco import FlickrCaptions

            coco = FlickrCaptions(ann_path)
        else:
            coco = CocoCaptions(ann_path)
        self.annotation_ids = list(coco.anns.keys())
        self.annotation_obj = coco
        # --image_cache DIR: decode each JPEG once per DATASET, not ~5x
        # per epoch x 100 epochs (annotation-keyed sampling shares images
        # across samples; device-side augmentation makes pre-augment uint8
        # pixels epoch-invariant). See data/image_cache.py.
        self.image_cache = None
        if image_cache:
            from show_tell_tpu.data.image_cache import ImageCache

            names = [img["file_name"] for img in coco.imgs.values()]
            self.image_cache = ImageCache(image_cache, names, IMAGE_SIZE, fast_jpeg=fast_jpeg)

    def __len__(self) -> int:
        return len(self.annotation_ids)

    def caption_ids(self, sample_idx: int) -> List[int]:
        ann = self.annotation_obj.anns[self.annotation_ids[sample_idx]]
        tokens = word_tokenize(str(ann["caption"]).lower())
        v = self.vocab
        return [v("<start>")] + [v(t) for t in tokens] + [v("<end>")]

    def _load_image(self, image_path: str) -> np.ndarray:
        """image_path is the annotation-relative file name — also the
        cache key (consistent with the loader's native batch path)."""
        full_path = os.path.join(self.data_path, image_path)
        if self.image_cache is not None:
            cached = self.image_cache.get(image_path)
            if cached is not None:
                return cached
            img = self._decode_image(full_path)
            self.image_cache.put(image_path, img)
            return img
        return self._decode_image(full_path)

    def _decode_image(self, full_path: str) -> np.ndarray:
        if self.use_native_decode:
            # Native libjpeg decode + PIL-equivalent antialiased bilinear
            # resize (within 1 LSB of PIL); releases the GIL and thread-
            # scales on multi-core hosts (show_tell_tpu/native).
            try:
                with open(full_path, "rb") as f:
                    return native_fastimage.decode_resize(
                        f.read(), IMAGE_SIZE, IMAGE_SIZE, fast_scale=self.fast_jpeg
                    )
            except ValueError:
                pass  # non-JPEG or corrupt: fall through to PIL
        img = Image.open(full_path)
        if self.fast_jpeg:
            img.draft("RGB", (IMAGE_SIZE, IMAGE_SIZE))  # no-op for non-JPEG
        img = img.convert("RGB")
        # torchvision Resize((224,224)) on a PIL image == PIL bilinear
        # resize with antialias (utils.py:84).
        img = img.resize((IMAGE_SIZE, IMAGE_SIZE), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)

    def sample_meta(self, sample_idx: int) -> Tuple[str, List[int]]:
        """(image file name, caption ids) without decoding the image."""
        ann = self.annotation_obj.anns[self.annotation_ids[sample_idx]]
        image_path = self.annotation_obj.loadImgs(ann["image_id"])[0]["file_name"]
        return image_path, self.caption_ids(sample_idx)

    def __getitem__(self, sample_idx: int) -> Tuple[str, np.ndarray, List[int]]:
        image_path, caption = self.sample_meta(sample_idx)
        image = self._load_image(image_path)
        return image_path, image, caption


def _descending_length_order(captions: Sequence[List[int]]) -> List[int]:
    """The collate sort (stable, descending untruncated caption length)
    as an index permutation — shared by create_batch and the multi-host
    process-sharded loader so the two can never drift (every host must
    agree on the global row order down to tie-breaks)."""
    return sorted(range(len(captions)), key=lambda k: len(captions[k]), reverse=True)


def _collate_captions(
    captions: Sequence[List[int]], pad_length: Optional[int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad (already-sorted) captions to the static pad_length (or
    the batch max when None); lengths are clamped to the pad target.
    Shared by create_batch and the process-sharded loader."""
    lengths = np.array([min(len(c), pad_length) if pad_length else len(c) for c in captions], dtype=np.int32)
    T = pad_length if pad_length else int(lengths.max())
    target = np.zeros((len(captions), T), dtype=np.int32)
    for i, cap in enumerate(captions):
        L = lengths[i]
        target[i, :L] = cap[:L]
    return target, lengths


def create_batch(
    samples: Sequence[Tuple[str, np.ndarray, List[int]]],
    pad_length: Optional[int] = DEFAULT_PAD_LENGTH,
) -> Tuple[Tuple[str, ...], np.ndarray, np.ndarray, np.ndarray]:
    """Collate samples: sort by descending caption length, zero-pad.

    Matches reference utils.py:61-77 except the pad target is the fixed
    ``pad_length`` (static shapes) instead of the batch max; tokens beyond
    ``pad_length`` are truncated (never happens on real COCO at 64).
    Returns (paths, images uint8 [B,H,W,3], captions int32 [B,T],
    lengths int32 [B]).
    """
    order = _descending_length_order([s[2] for s in samples])
    samples = [samples[k] for k in order]
    paths, images, captions = zip(*samples)
    images = np.stack(images, 0)
    target, lengths = _collate_captions(captions, pad_length)
    return paths, images, target, lengths


class DataLoader:
    """Batched iterator with shuffling, drop_last, and thread prefetch."""

    def __init__(
        self,
        dataset: MSCOCO,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        pad_length: int = DEFAULT_PAD_LENGTH,
        seed: int = 1,
        prefetch: int = 2,
        process_shard: Optional[Tuple[int, int]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.pad_length = pad_length
        self.prefetch = prefetch
        # (process_id, num_processes): multi-host mode.  Every host walks
        # the same shuffled index stream (same seed) but DECODES only its
        # 1/Nth of each batch; captions/lengths/paths stay global (they
        # are metadata — no decode).  batch_size must divide evenly.
        if process_shard is not None and batch_size % process_shard[1]:
            raise ValueError(
                "batch_size %d does not divide over %d processes" % (batch_size, process_shard[1])
            )
        if process_shard is not None and not drop_last:
            # A ragged final batch would give each host a different local
            # row count while put_sharded(local_rows=True) reconstructs
            # global_shape as local*nproc — the processes would disagree
            # on the global shape at the epoch's last batch.
            raise ValueError("process_shard requires drop_last=True")
        self.process_shard = process_shard
        self._rng = np.random.RandomState(seed)
        # One decode pool per loader, shared across epochs (__iter__ calls);
        # long in-process sweeps must not accumulate thread pools.
        self._pool: Optional[ThreadPoolExecutor] = None
        # All live producer threads (one per active iterator; pruned as
        # they finish).  `_producer` keeps the most recent for tests.
        self._producers: List[threading.Thread] = []
        self._producer: Optional[threading.Thread] = None

    def close(self) -> None:
        """Join outstanding producers and release the decode pool
        (idempotent; loader stays reusable)."""
        for t in self._producers:
            t.join(timeout=5.0)
        self._producers = [t for t in self._producers if t.is_alive()]
        if self._pool is not None:
            self._pool.shutdown(wait=True)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[np.ndarray]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        nb = len(self)
        return [order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]

    def _load_batch(self, idxs: np.ndarray, pool: ThreadPoolExecutor):
        if self.process_shard is not None:
            return self._load_batch_sharded(idxs, pool)
        ds = self.dataset
        if getattr(ds, "use_native_decode", False) and native_fastimage.is_available():
            samples = self._load_batch_native([ds.sample_meta(int(i)) for i in idxs], pool)
        else:
            samples = list(pool.map(ds.__getitem__, idxs))
        return create_batch(samples, self.pad_length)

    def _load_batch_sharded(self, idxs: np.ndarray, pool: ThreadPoolExecutor):
        """Multi-host batch: global sort + captions from metadata (cheap),
        image decode only for this process's slice of the sorted batch.

        The sort and caption padding are create_batch's own helpers
        (_descending_length_order / _collate_captions) so every host's
        global row order is the single-host order by construction; the
        local slice is then contiguous rows [lo, hi) of it — the rows
        this host's mesh devices own (mesh.put_sharded local_rows=True).
        Returns (paths_global, images_LOCAL, captions_global,
        lengths_global)."""
        pid, nproc = self.process_shard
        ds = self.dataset
        metas = [ds.sample_meta(int(i)) for i in idxs]
        order = _descending_length_order([m[1] for m in metas])
        B = len(order)
        lo, hi = pid * B // nproc, (pid + 1) * B // nproc
        # Decode straight from the metas in hand (not via __getitem__,
        # which would tokenize every local caption a second time).
        local_metas = [metas[k] for k in order[lo:hi]]
        if getattr(ds, "use_native_decode", False) and native_fastimage.is_available():
            samples = self._load_batch_native(local_metas, pool)
            images = np.stack([s[1] for s in samples], 0)  # already in global-sorted order
        else:
            images = np.stack(list(pool.map(lambda m: ds._load_image(m[0]), local_metas)), 0)

        caps = [metas[k][1] for k in order]
        target, lengths = _collate_captions(caps, self.pad_length)
        paths = tuple(metas[k][0] for k in order)
        return paths, images, target, lengths

    def _load_batch_native(self, metas: List[Tuple[str, List[int]]], pool: ThreadPoolExecutor):
        """Batch path through the native decoder: one GIL-free threaded
        C++ call decodes+resizes the whole batch (native/fastimage.cpp
        st_decode_resize_batch) instead of one Python->C round trip per
        image; non-JPEG/corrupt files fall back to PIL individually.
        Takes (path, caption) metas so callers that already hold them
        (the process-sharded loader) don't tokenize twice."""
        ds = self.dataset

        cache = ds.image_cache
        cached: Dict[int, np.ndarray] = {}
        todo = list(range(len(metas)))
        if cache is not None:
            todo = []
            for k, (path, _) in enumerate(metas):
                img = cache.get(path)
                if img is None:
                    todo.append(k)
                else:
                    cached[k] = img

        def read(path: str) -> bytes:
            with open(os.path.join(ds.data_path, path), "rb") as f:
                return f.read()

        images, statuses = None, []
        if todo:
            bufs = list(pool.map(read, [metas[k][0] for k in todo]))
            images, statuses = native_fastimage.decode_resize_batch(
                bufs, IMAGE_SIZE, IMAGE_SIZE, n_threads=self.num_workers, fast_scale=ds.fast_jpeg
            )
        samples: List[Tuple[str, np.ndarray, List[int]]] = [None] * len(metas)  # type: ignore[list-item]
        for j, k in enumerate(todo):
            path, caption = metas[k]
            img = images[j] if statuses[j] == 0 else ds._decode_image(os.path.join(ds.data_path, path))
            if cache is not None:
                cache.put(path, img)
            samples[k] = (path, img, caption)
        for k, img in cached.items():
            path, caption = metas[k]
            samples[k] = (path, img, caption)
        return samples

    def __iter__(self) -> Iterator[Tuple[Tuple[str, ...], np.ndarray, np.ndarray, np.ndarray]]:
        batches = self._batch_indices()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        pool = self._pool

        def put_or_stop(item) -> bool:
            # Bounded put: never block forever if the consumer went away
            # (early `break` from the epoch loop, exception, GC).
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # A load failure must NOT masquerade as end-of-epoch: enqueue
            # the exception and re-raise it in the consumer, else a single
            # corrupt file silently truncates every epoch at that batch.
            try:
                for idxs in batches:
                    if stop.is_set() or not put_or_stop(self._load_batch(idxs, pool)):
                        return
            except BaseException as e:  # noqa: BLE001 — forwarded, not dropped
                put_or_stop(e)
                return
            finally:
                put_or_stop(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        self._producers = [p for p in self._producers if p.is_alive()]
        self._producers.append(t)
        self._producer = t
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
            t.join(timeout=5.0)


def get_data_loader(vocab, params: Dict[str, Any], run_type: str) -> DataLoader:
    """Loader factory mirroring reference utils.py:79-103."""
    fast_jpeg = bool(params.get("fast_jpeg", 0))
    # One cache subdirectory per split: train/test index different images.
    cache_root = str(params.get("image_cache", "") or "")
    cache_for = lambda split: os.path.join(cache_root, split) if cache_root else None
    if run_type == "train":
        dataset = MSCOCO(
            params["ann_path_train"], params["data_path_train"], vocab, train=True,
            fast_jpeg=fast_jpeg, image_cache=cache_for("train"),
        )
        # Multi-host: decode only this process's 1/Nth of every batch.
        # Requires the dp mesh to actually form over ALL global devices
        # (mirrors train/loop.py's mesh condition) so the locally-decoded
        # rows are exactly the rows this host's devices own; any other
        # configuration keeps the simple identical-global-batch mode.
        process_shard = None
        if params.get("multihost"):
            import jax

            n_dev = params.get("dp", 0) or jax.device_count()
            if (
                jax.process_count() > 1
                and n_dev == jax.device_count()
                and params["batch_size"] % n_dev == 0
            ):
                process_shard = (jax.process_index(), jax.process_count())
        return DataLoader(
            dataset,
            batch_size=params["batch_size"],
            shuffle=bool(params.get("shuffle", True)),
            drop_last=True,
            num_workers=params.get("num_workers", 0),
            pad_length=params.get("pad_length", DEFAULT_PAD_LENGTH),
            seed=params.get("seed", 1),
            process_shard=process_shard,
        )
    elif run_type == "test":
        dataset = MSCOCO(
            params["ann_path_test"], params["data_path_test"], vocab, train=False,
            fast_jpeg=fast_jpeg, image_cache=cache_for("test"),
        )
        return DataLoader(
            dataset,
            batch_size=params["batch_size"],
            shuffle=False,
            drop_last=False,
            num_workers=params.get("num_workers", 0),
            pad_length=params.get("pad_length", DEFAULT_PAD_LENGTH),
            seed=params.get("seed", 1),
        )
    raise ValueError("Please specify a valid run type for data loader. %s doesn't exist." % (run_type,))
