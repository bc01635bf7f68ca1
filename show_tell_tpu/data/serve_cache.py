"""Decoded-image cache for the serving CLI (`--image_cache DIR`).

Training uses the memmap ImageCache (data/image_cache.py) because its
file set is fixed by the dataset index.  Serving has no fixed set —
users point the CLI at changing directories — so this cache stores one
``.npy`` per image, keyed by a hash of (absolute path, file size,
mtime_ns, image size, decode mode).  The mtime/size key means a
replaced image file is re-decoded automatically (the staleness the
training cache documents away), and unrelated serve runs can share one
cache directory.

Writes are atomic (tmp + rename), so concurrent serve processes can
share a directory; a duplicated decode is the worst-case race cost.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Optional

import numpy as np


class ServeImageCache:
    def __init__(self, cache_dir: str, image_size: int, fast_jpeg: bool = False):
        os.makedirs(cache_dir, exist_ok=True)
        self.dir = cache_dir
        self.image_size = image_size
        self.fast_jpeg = bool(fast_jpeg)
        self.hits = 0
        self.misses = 0

    def _key(self, path: str) -> Optional[str]:
        try:
            st = os.stat(path)
        except OSError:
            return None
        ident = "%s|%d|%d|%d|%d" % (
            os.path.abspath(path), st.st_size, st.st_mtime_ns, self.image_size, self.fast_jpeg
        )
        return hashlib.sha1(ident.encode()).hexdigest()

    def get(self, path: str) -> Optional[np.ndarray]:
        key = self._key(path)
        if key is None:
            return None
        try:
            arr = np.load(os.path.join(self.dir, key + ".npy"))
        except (OSError, ValueError):
            self.misses += 1
            return None
        if arr.shape != (self.image_size, self.image_size, 3) or arr.dtype != np.uint8:
            self.misses += 1  # corrupt/foreign entry: re-decode instead of serving it
            return None
        self.hits += 1
        return arr

    def put(self, path: str, image: np.ndarray) -> None:
        key = self._key(path)
        if key is None:
            return
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.save(f, np.ascontiguousarray(image))
            os.replace(tmp, os.path.join(self.dir, key + ".npy"))
        except OSError:
            pass
        finally:
            if os.path.exists(tmp):  # failed before the rename, any cause
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
