"""End-to-end learning demonstration on a synthetic grounded dataset.

Generates a COCO-format dataset of colored-shape images whose captions
describe visible content ("a red circle on a dark background"), trains a
captioner through the normal pipeline, and evaluates BLEU — showing the
full framework actually learns image->caption grounding (not just loss
descent), even with the reference's frozen random-init backbone (color
statistics survive any pooling).

Run: python tools/demo_synthetic.py [--images 400] [--epochs 12]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image, ImageDraw

COLORS = {
    "red": (220, 40, 40),
    "green": (40, 200, 60),
    "blue": (50, 80, 230),
    "yellow": (230, 220, 50),
    "purple": (160, 60, 200),
    "orange": (240, 150, 40),
}
SHAPES = ["circle", "square", "triangle"]
BACKGROUNDS = {"dark": (25, 25, 30), "light": (235, 235, 225)}

TEMPLATES = [
    "a {color} {shape} on a {bg} background.",
    "there is a {color} {shape} here.",
    "the image shows a {color} {shape}.",
]


def _draw_shape(d, shape, box, c):
    if shape == "circle":
        d.ellipse(box, fill=c)
    elif shape == "square":
        d.rectangle(box, fill=c)
    else:
        x0, y0, x1, y1 = box
        d.polygon([((x0 + x1) // 2, y0), (x0, y1), (x1, y1)], fill=c)


def draw_sample(rng, size=224):
    color = rng.choice(list(COLORS))
    shape = rng.choice(SHAPES)
    bg = rng.choice(list(BACKGROUNDS))
    img = Image.new("RGB", (size, size), BACKGROUNDS[bg])
    d = ImageDraw.Draw(img)
    m, M = size // 5, 4 * size // 5
    _draw_shape(d, shape, [m, m, M, M], COLORS[color])
    return img, color, shape, bg


def draw_compositional(rng, size=224):
    """Two objects with a left/right relation — pooled features cannot
    represent WHICH side each object is on; spatial attention can."""
    (c1, s1), (c2, s2) = rng.sample(
        [(c, s) for c in COLORS for s in SHAPES], 2
    )
    bg = rng.choice(list(BACKGROUNDS))
    img = Image.new("RGB", (size, size), BACKGROUNDS[bg])
    d = ImageDraw.Draw(img)
    q, h = size // 4, size // 2
    _draw_shape(d, s1, [q - 40, h - 40, q + 40, h + 40], COLORS[c1])   # left
    _draw_shape(d, s2, [3 * q - 40, h - 40, 3 * q + 40, h + 40], COLORS[c2])  # right
    caption = "a %s %s left of a %s %s." % (c1, s1, c2, s2)
    return img, caption, (c1, s1, c2, s2)


def build_dataset(root, n_images, seed=0, compositional=False):
    rng = random.Random(seed)
    img_dir = os.path.join(root, "train2014")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    images, anns = [], []
    ann_id = 1
    for img_id in range(1, n_images + 1):
        fname = "COCO_train2014_%012d.jpg" % img_id
        if compositional:
            img, caption, _ = draw_compositional(rng)
            captions = [caption, caption.replace("a ", "one ", 1)]
        else:
            img, color, shape, bg = draw_sample(rng)
            captions = [tpl.format(color=color, shape=shape, bg=bg) for tpl in rng.sample(TEMPLATES, 2)]
        img.save(os.path.join(img_dir, fname), quality=92)
        images.append({"id": img_id, "file_name": fname})
        for cap in captions:
            anns.append({"id": ann_id, "image_id": img_id, "caption": cap})
            ann_id += 1
    with open(os.path.join(ann_dir, "captions_train2014.json"), "w") as f:
        json.dump({"images": images, "annotations": anns}, f)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=400)
    parser.add_argument("--epochs", type=int, default=12)
    parser.add_argument("--root", default="/tmp/shape_demo")
    parser.add_argument("--variant", default="gru", choices=["gru", "lstm", "attn", "attn_lstm"])
    parser.add_argument("--next_token", action="store_true", help="corrected attention alignment (--attn_next_token)")
    parser.add_argument("--compositional", action="store_true", help="two-object left/right task (pooling-breaking)")
    args = parser.parse_args()

    import shutil

    shutil.rmtree(args.root, ignore_errors=True)
    data_root = os.path.join(args.root, "data")
    out_dir = os.path.join(args.root, "out")
    build_dataset(data_root, args.images, compositional=args.compositional)
    os.makedirs(out_dir, exist_ok=True)

    from show_tell_tpu.cli.run import run

    extra = []
    if args.variant.startswith("attn"):
        extra = ["--nos_cnn_filters", "512", "--attn_dim", "64", "--alpha_c", "0.1"]
        if args.next_token:
            extra += ["--attn_next_token", "1"]
    res = run(
        args.variant,
        extra + [
            "--data_dir", data_root, "--output_dir", out_dir,
            "--train_ann_path", "annotations/captions_train2014.json",
            "--test_ann_path", "annotations/captions_train2014.json",
            "--train_img_dir", "train2014", "--test_img_dir", "train2014",
            "--vocab_threshold", "1", "--embedding_length", "64",
            "--num_hidden_units", "128", "--num_layers", "1",
            "--batch_size", "32", "--num_epochs", str(args.epochs),
            "--resnet_version", "18", "--lr", "0.002", "--optimizer_type", "Adam",
            "--is_training", "1", "--is_testing", "1",
            "--load_model_test", "model_%d" % args.epochs,
            "--eval_augment", "0", "--keep_checkpoints", "1",
        ],
    )
    scores = res["scores"]
    print("\n=== synthetic grounding demo ===")
    for k in ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L", "test_loss"]:
        print("%-10s %.4f" % (k, scores[k]))

    if args.compositional:
        return
    # Generalization probe: caption UNSEEN images; count attribute hits.
    from show_tell_tpu.serve import Captioner

    cap = Captioner.from_checkpoint(
        os.path.join(out_dir, "model_%d.ckpt" % args.epochs),
        os.path.join(out_dir, "vocab.pkl"),
        variant=args.variant, resnet_version=18, embed_dim=64, hidden_dim=128,
        num_layers=1, compute_dtype="float32",
        nos_filters=512, attn_dim=64,
    )
    rng = random.Random(999)  # never used for training data
    imgs, truths = [], []
    for _ in range(16):
        img, color, shape, bg = draw_sample(rng)
        imgs.append(np.asarray(img, dtype=np.uint8))
        truths.append((color, shape))
    captions = cap.caption(np.stack(imgs))
    cc = sum(c in t for (cl, sh), t in zip(truths, captions) for c in [cl])
    sc = sum(sh in t for (cl, sh), t in zip(truths, captions))
    print("unseen-image color accuracy: %d/16 (chance ~2.7)" % cc)
    print("unseen-image shape accuracy: %d/16 (chance ~5.3; frozen RANDOM" % sc)
    print("backbone pools away shape — pretrained weights or the attention")
    print("variant are the shape path, as in the reference)")


if __name__ == "__main__":
    main()
