"""Mini-COCO fixture: synthetic JPEGs + handwritten annotation JSON."""

import json
import os

import numpy as np
from PIL import Image

CAPTIONS = [
    (1, 100, "A man riding a wave on top of a surfboard."),
    (2, 100, "a man on a surfboard rides a big wave"),
    (3, 101, "Two dogs playing with a red ball in the park."),
    (4, 101, "a dog runs after a ball on green grass"),
    (5, 102, "A plate of food with rice and vegetables."),
    (6, 102, "rice and vegetables served on a white plate"),
    (7, 103, "A group of people standing around a kitchen table."),
    (8, 103, "people gather near a table in the kitchen"),
    (9, 104, "A red bus driving down a city street."),
    (10, 104, "the bus is driving down the street"),
    (11, 105, "A cat sleeping on top of a wooden chair."),
    (12, 105, "a cat sleeps on a chair near the window"),
    (13, 106, "A man riding a horse on the beach at sunset."),
    (14, 106, "a horse and rider walk along the beach"),
    (15, 107, "A plate with a sandwich and a cup of coffee."),
    (16, 107, "a sandwich sits on a plate next to coffee"),
]

IMAGE_IDS = sorted({img_id for _, img_id, _ in CAPTIONS})


def build_mini_coco(root, split="train2014", image_size=64, seed=0):
    """Create data_dir layout matching the reference config expectations."""
    img_dir = os.path.join(root, split)
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    rng = np.random.RandomState(seed)
    images = []
    for img_id in IMAGE_IDS:
        fname = "COCO_%s_%012d.jpg" % (split, img_id)
        arr = rng.randint(0, 255, (image_size, image_size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, fname), quality=90)
        images.append({"id": img_id, "file_name": fname, "height": image_size, "width": image_size})

    anns = [
        {"id": ann_id, "image_id": img_id, "caption": caption}
        for ann_id, img_id, caption in CAPTIONS
    ]
    ann = {"info": {}, "images": images, "annotations": anns, "licenses": []}
    ann_file = "captions_%s.json" % split
    with open(os.path.join(ann_dir, ann_file), "w") as f:
        json.dump(ann, f)
    return os.path.join(ann_dir, ann_file), img_dir


def mini_params(root, out_dir, split="train2014", **overrides):
    """Flat params dict pointing at the mini fixture."""
    params = {
        "data_dir": root,
        "output_dir": out_dir,
        "train_ann_path": "annotations/captions_%s.json" % split,
        "test_ann_path": "annotations/captions_%s.json" % split,
        "vocabulary_path": "vocab.pkl",
        "train_img_dir": split,
        "test_img_dir": split,
        "vocab_threshold": 1,
        "embedding_length": 32,
        "num_hidden_units": 48,
        "optimizer_type": "SGD",
        "resnet_version": 18,
        "lr": 0.01,
        "momentum": 0.9,
        "num_epochs": 1,
        "num_layers": 2,
        "batch_size": 4,
        "shuffle": 1,
        "num_workers": 0,
        "resume_training": 0,
        "resume_model_train": "model_1",
        "is_training": 1,
        "is_testing": 0,
        "load_model_test": "model_1",
        "device": "tpu",
        "sub_batch_test": 2,
        "beam_size": 0,
        "seed": 1,
        "pad_length": 24,
        "variant": "gru",
        "data_source": "MSCOCO",
        "compute_dtype": "float32",
        "dp": 0,
        "use_pallas": 0,
        "faithful_beam": 0,
        "max_caption_length": 25,
    }
    params.update(overrides)
    params["vocab_path"] = os.path.join(out_dir, params["vocabulary_path"])
    params["ann_path_train"] = os.path.join(root, params["train_ann_path"])
    params["data_path_train"] = os.path.join(root, params["train_img_dir"])
    params["ann_path_test"] = os.path.join(root, params["test_ann_path"])
    params["data_path_test"] = os.path.join(root, params["test_img_dir"])
    os.makedirs(out_dir, exist_ok=True)
    return params


def build_mini_flickr(root, image_size=64, seed=0):
    """data_dir laid out per the config's Flickr block: annotations/
    captions.tsv (headerless image<TAB>caption) + train/ images."""
    img_dir = os.path.join(root, "train")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    rng = np.random.RandomState(seed)
    rows = []
    for _ann_id, img_id, caption in CAPTIONS:
        fname = "flickr_%04d.jpg" % img_id
        path = os.path.join(img_dir, fname)
        if not os.path.isfile(path):
            arr = rng.randint(0, 255, (image_size, image_size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(path, quality=90)
        rows.append("%s\t%s" % (fname, caption))
    tsv = os.path.join(ann_dir, "captions.tsv")
    with open(tsv, "w") as f:
        f.write("\n".join(rows) + "\n")
    return tsv, img_dir


def _load_reference_module(relpath, fake_names=(), setup=None, add_sys_path=None):
    """Shared loader for live-differential imports of reference modules.

    Installs empty fake modules for each missing name in ``fake_names``
    (so heavy deps the tested code never touches don't block the
    import), runs ``setup(fakes)`` to populate them, optionally extends
    sys.path, execs the file, and restores EVERYTHING it touched:
    installed fakes, any sys.modules entries the import itself added
    (e.g. utils.py caching the reference's vendored `evaluation`
    package), and sys.path.  Returns the module, or None when the
    reference checkout or torch is absent."""
    import importlib.util
    import sys
    import types

    path = os.path.join("/root/reference", relpath)
    if not os.path.exists(path):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None

    fakes = {name: types.ModuleType(name) for name in fake_names if name not in sys.modules}
    if setup is not None:
        setup(fakes)  # may ADD fake entries that shadow real installed modules
    before = set(sys.modules)
    shadowed = {name: sys.modules[name] for name in fakes if name in sys.modules}
    sys.modules.update(fakes)
    if add_sys_path:
        sys.path.insert(0, add_sys_path)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_" + relpath.replace("/", "_").replace(".py", ""), path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        if add_sys_path:
            sys.path.remove(add_sys_path)
        for name in set(sys.modules) - before:  # anything the import cached
            sys.modules.pop(name, None)
        for name in fakes:
            sys.modules.pop(name, None)
        sys.modules.update(shadowed)  # put real modules a fake displaced back


def load_reference_rnn_module(relpath="rnn.py"):
    """Import an ACTUAL reference decoder module (/root/reference) live,
    for differential tests against its decode paths.  `cnn` and
    `torchvision` are consumed only by rnn.py's __main__ CIFAR demo
    (rnn.py:113-149), never by the classes under test; LSTM/rnn_lstm.py
    and Attention/rnn_attn*.py import cleanly."""

    def setup(fakes):
        if "cnn" in fakes:
            fakes["cnn"].ResNet = object
        if "torchvision" in fakes and "torchvision.transforms" in fakes:
            fakes["torchvision"].transforms = fakes["torchvision.transforms"]

    return _load_reference_module(
        relpath, ("cnn", "torchvision", "torchvision.transforms"), setup)


def load_reference_utils_module():
    """Import the ACTUAL reference utils.py live (create_batch,
    create_caption_word_format, ... — utils.py:61-123).  Heavy deps its
    import pulls that the tested functions never touch are faked
    (torchvision incl. .models/.transforms, pycocotools); its vendored
    scorer package imports with /root/reference on sys.path (and is
    un-cached again afterwards by the shared loader)."""

    def setup(fakes):
        if "torchvision" in fakes:
            fakes["torchvision"].transforms = fakes.get("torchvision.transforms")
            fakes["torchvision"].models = fakes.get("torchvision.models")
        if "pycocotools.coco" in fakes:
            fakes["pycocotools.coco"].COCO = object
            if "pycocotools" in fakes:
                fakes["pycocotools"].coco = fakes["pycocotools.coco"]

    return _load_reference_module(
        "utils.py",
        ("torchvision", "torchvision.transforms", "torchvision.models",
         "pycocotools", "pycocotools.coco"),
        setup,
        add_sys_path="/root/reference",
    )


def load_reference_cnn_module(resnet_factories, relpath="cnn.py"):
    """Import the ACTUAL reference cnn.py (or Attention/cnn_attn.py) live.
    Its `torchvision.models` import is faked with the given factories
    ({version: callable(pretrained=...) -> torch module}) — standing in
    for the pretrained download, exactly like --backbone_weights does in
    the real CLI.  The factories go onto the FAKE models module only; a
    real installed torchvision is never mutated (a fresh fake shadows it
    for the duration of the import instead)."""
    import sys
    import types

    def setup(fakes):
        if "torchvision.models" not in fakes:
            # torchvision genuinely installed: shadow it with a fake for
            # the import rather than setattr-ing factories onto the real
            # module (cross-test contamination otherwise).
            fakes["torchvision.models"] = types.ModuleType("torchvision.models")
            if "torchvision" not in fakes:
                fakes["torchvision"] = types.ModuleType("torchvision")
        models_mod = fakes["torchvision.models"]
        for version, factory in resnet_factories.items():
            setattr(models_mod, "resnet%d" % version, factory)
        fakes["torchvision"].models = models_mod
        if "torchvision.transforms" in fakes:
            fakes["torchvision"].transforms = fakes["torchvision.transforms"]

    return _load_reference_module(
        relpath, ("torchvision", "torchvision.models", "torchvision.transforms"), setup)
