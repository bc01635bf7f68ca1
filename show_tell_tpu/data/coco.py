"""Pure-Python COCO captions index (replaces the pycocotools C extension).

The reference builds ``pycocotools.coco.COCO`` over the captions JSON and
uses exactly three things (reference utils.py:32-42, vocab_builder.py:76-80):
  * ``coco.anns``        — dict annotation_id -> annotation record,
  * iteration order of ``coco.anns.keys()`` (drives vocab word ids),
  * ``coco.loadImgs(image_id)[0]['file_name']``.

pycocotools fills ``anns``/``imgs`` by iterating the JSON arrays in file
order into Python dicts, so insertion order == file order; ``json.load``
preserves that order too, which keeps downstream vocab ids bit-exact.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List


class CocoCaptions:
    """Minimal COCO captions API: anns / imgs / imgToAnns / loadImgs."""

    def __init__(self, annotation_file: str):
        with open(annotation_file, "r") as f:
            dataset = json.load(f)
        self.dataset = dataset
        self.anns: Dict[int, Dict[str, Any]] = {}
        self.imgs: Dict[int, Dict[str, Any]] = {}
        self.imgToAnns: Dict[int, List[Dict[str, Any]]] = {}
        for ann in dataset.get("annotations", []):
            self.anns[ann["id"]] = ann
            self.imgToAnns.setdefault(ann["image_id"], []).append(ann)
        for img in dataset.get("images", []):
            self.imgs[img["id"]] = img

    def loadImgs(self, ids) -> List[Dict[str, Any]]:
        if isinstance(ids, (list, tuple)):
            return [self.imgs[i] for i in ids]
        return [self.imgs[ids]]

    def getAnnIds(self, imgIds=None) -> List[int]:
        if imgIds is None:
            return list(self.anns.keys())
        if not isinstance(imgIds, (list, tuple)):
            imgIds = [imgIds]
        out: List[int] = []
        for img_id in imgIds:
            out.extend(a["id"] for a in self.imgToAnns.get(img_id, []))
        return out
