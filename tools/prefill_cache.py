"""Prefill the decoded-image cache (--image_cache) ahead of training.

The cache (show_tell_tpu/data/image_cache.py) fills lazily on first
touch, so epoch 1 of a training run pays JPEG decode for every unique
image. This tool fills it up front at the native decoder's full
threaded batch rate — useful to front-load the one-time decode cost
(e.g. on a beefier prep machine, or overnight) so even the first
training epoch streams from the memmap.

    python tools/prefill_cache.py --ann_path data/COCO/annotations/captions_train2014.json \
        --img_dir data/COCO/train2014 --image_cache cache/train [--fast_jpeg] [--batch 256]

Point --image_cache at the same per-split subdirectory the CLI will use
(`--image_cache DIR` on the CLI maps train -> DIR/train, test -> DIR/test).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def prefill(ann_path: str, img_dir: str, cache_dir: str, batch: int = 256, fast_jpeg: bool = False,
            n_threads: int = 0) -> int:
    from show_tell_tpu.data.coco import CocoCaptions, FlickrCaptions
    from show_tell_tpu.data.dataset import IMAGE_SIZE
    from show_tell_tpu.data.image_cache import ImageCache
    from show_tell_tpu.native import fastimage

    # Same index rule as the dataset: .tsv = Flickr-style annotations.
    coco = FlickrCaptions(ann_path) if ann_path.endswith(".tsv") else CocoCaptions(ann_path)
    names = sorted({img["file_name"] for img in coco.imgs.values()})
    # fast_jpeg is part of the cache identity (index.json): a training
    # run must request the same decode mode to use this cache.
    cache = ImageCache(cache_dir, names, IMAGE_SIZE, fast_jpeg=fast_jpeg)
    todo = [n for n in names if cache.get(n) is None]
    print("%d images, %d to decode (%.0f%% already cached)" % (
        len(names), len(todo), 100.0 * (1 - len(todo) / max(1, len(names)))))

    t0 = time.perf_counter()
    done = 0
    use_native = fastimage.is_available()
    for lo in range(0, len(todo), batch):
        chunk = todo[lo : lo + batch]
        if use_native:
            bufs = []
            for name in chunk:
                with open(os.path.join(img_dir, name), "rb") as f:
                    bufs.append(f.read())
            imgs, statuses = fastimage.decode_resize_batch(
                bufs, IMAGE_SIZE, IMAGE_SIZE, n_threads=n_threads, fast_scale=fast_jpeg
            )
        else:
            imgs, statuses = [], []
        for k, name in enumerate(chunk):
            if use_native and statuses[k] == 0:
                img = imgs[k]
            else:  # PIL fallback for odd files (or no native lib)
                import numpy as np
                from PIL import Image

                im = Image.open(os.path.join(img_dir, name))
                if fast_jpeg:
                    im.draft("RGB", (IMAGE_SIZE, IMAGE_SIZE))
                img = np.asarray(
                    im.convert("RGB").resize((IMAGE_SIZE, IMAGE_SIZE), Image.BILINEAR), dtype=np.uint8
                )
            cache.put(name, img)
            done += 1
        if done and done % (batch * 4) == 0:
            rate = done / (time.perf_counter() - t0)
            print("  %d/%d (%.0f img/s, ~%.0fs left)" % (done, len(todo), rate, (len(todo) - done) / rate))
    dt = time.perf_counter() - t0
    print("prefilled %d images in %.1fs (%.0f img/s); cache at %s" % (
        done, dt, done / dt if dt > 0 else 0.0, cache_dir))
    return done


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ann_path", required=True, help="COCO captions annotation JSON")
    p.add_argument("--img_dir", required=True, help="image directory")
    p.add_argument("--image_cache", required=True, help="cache directory for this split")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--fast_jpeg", action="store_true", help="DCT-domain scaled decode (~2x)")
    p.add_argument("--n_threads", type=int, default=0, help="decoder threads (0 = all cores)")
    args = p.parse_args(argv)
    prefill(args.ann_path, args.img_dir, args.image_cache, args.batch, args.fast_jpeg, args.n_threads)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
