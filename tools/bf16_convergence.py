"""bf16-compute training convergence A/B (VERDICT r4 item 6).

Trains the synthetic grounded-captioning demo (tools/demo_synthetic.py's
task — the full pipeline the reference's main.py drives, rebuilt here)
TWICE at identical seeds / data / epochs: once in the f32 parity dtype
and once with `--train_dtype bfloat16` (bf16 forward/backward inside the
loss, f32 master weights / grads / optimizer state / BN stats — see
train/train_step.py), then evaluates both through the reference-parity
test loop and prints a side-by-side metric table.  "Convergence
equivalence" here means the bf16 run's BLEU/ROUGE land within the
seed-to-seed noise of f32 at equal epochs — the check that makes bf16 a
usable training mode rather than a bench-only number.

Each run executes in a SUBPROCESS so the two trainings cannot share jit
caches or global RNG state; scores come back via a JSON file.

Run: python tools/bf16_convergence.py [--images 400] [--epochs 12]
     (~10-20 min on one chip; add --out to save the table as JSON)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_CODE = """
import json, os, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "tools"))
from demo_synthetic import build_dataset
from show_tell_tpu.cli.run import run

root = {root!r}
dtype = {dtype!r}
build_dataset(os.path.join(root, "data"), {images})  # idempotent per seed
out_dir = os.path.join(root, "out_" + dtype)
os.makedirs(out_dir, exist_ok=True)
res = run("gru", [
    "--data_dir", os.path.join(root, "data"), "--output_dir", out_dir,
    "--train_ann_path", "annotations/captions_train2014.json",
    "--test_ann_path", "annotations/captions_train2014.json",
    "--train_img_dir", "train2014", "--test_img_dir", "train2014",
    "--vocab_threshold", "1", "--embedding_length", "64",
    "--num_hidden_units", "128", "--num_layers", "1",
    "--batch_size", "32", "--num_epochs", str({epochs}),
    "--resnet_version", "18", "--lr", "0.002", "--optimizer_type", "Adam",
    "--train_dtype", dtype,
    "--is_training", "1", "--is_testing", "1",
    "--load_model_test", "model_%d" % {epochs},
    "--eval_augment", "0", "--keep_checkpoints", "1",
])
with open(os.path.join(out_dir, "scores.json"), "w") as f:
    json.dump({{k: float(v) for k, v in res["scores"].items()}}, f)
"""

KEYS = ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L", "test_loss"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=400)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--root", default="/tmp/bf16_conv")
    p.add_argument("--out", default="", help="optional JSON output path")
    args = p.parse_args()

    scores = {}
    for dtype in ("float32", "bfloat16"):
        print("== training %s (%d epochs) ==" % (dtype, args.epochs), flush=True)
        code = RUN_CODE.format(repo=REPO, root=args.root, dtype=dtype,
                               images=args.images, epochs=args.epochs)
        subprocess.run([sys.executable, "-c", code], check=True, timeout=3600)
        with open(os.path.join(args.root, "out_" + dtype, "scores.json")) as f:
            scores[dtype] = json.load(f)

    print("\n=== bf16-compute training convergence (synthetic demo, equal seeds/epochs) ===")
    print("%-10s %12s %12s %10s" % ("metric", "f32", "bf16", "delta"))
    table = {}
    for k in KEYS:
        a, b = scores["float32"][k], scores["bfloat16"][k]
        table[k] = {"f32": a, "bf16": b, "delta": b - a}
        print("%-10s %12.4f %12.4f %+10.4f" % (k, a, b, b - a))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"epochs": args.epochs, "images": args.images, "table": table}, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
