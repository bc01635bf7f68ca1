"""High-level serving API: checkpoint -> captions.

The deployment-facing wrapper over the compiled serving path (the
reference has no serving story — captions only fall out of test_model).

    captioner = Captioner.from_checkpoint("output/COCO/model_50.ckpt",
                                          "output/COCO/vocab.pkl",
                                          variant="gru")
    captions = captioner.caption(images_u8)          # [B,224,224,3] uint8
    captions = captioner.caption_files(paths)        # JPEG files
    captions = captioner.caption(images, beam_size=3)

Images are preprocessed on device; decode is batched greedy (or beam).
``compute_dtype="bfloat16"`` serves at full speed, f32 for parity.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from show_tell_tpu.data.dataset import IMAGE_SIZE
from show_tell_tpu.data.transforms import preprocess_images
from show_tell_tpu.decode.beam import attn_beam_search_decode, beam_search_decode
from show_tell_tpu.evaluation.tester import create_caption_word_format
from show_tell_tpu.models.captioner import (
    CaptionerConfig,
    captioner_greedy_decode,
)
from show_tell_tpu.models.encoder import encoder_forward


class Captioner:
    def __init__(
        self,
        params: Dict[str, Any],
        bn_state: Dict[str, Any],
        cfg: CaptionerConfig,
        vocab,
        compute_dtype: str = "bfloat16",
        dp: int = 1,
        mp: int = 1,
        early_exit: bool = False,
        s2d: bool = False,
    ):
        """early_exit stops the decode loop (greedy AND beam) once every
        sequence/beam in the batch emitted <end> (identical captions —
        greedy formatting truncates there anyway, and the beam engine's
        skipped tail is provably a no-op; trained models skip ~half the
        25 steps).  Off by default: the reference always runs the full
        25 (rnn.py:39).

        s2d serves through the host-emitted space-to-depth input path
        (`bench.py --s2d`, +0.9% headline, BENCH_GRID_r05): the native
        decoder emits [112,112,12] uint8 directly (zero extra host
        cost; PIL/cache paths relayout on the host), the device
        preprocess runs in s2d coordinates, and conv1 refolds by the
        by-name weight transform (models/resnet.py) — same pixels, same
        conv, summation order shifts by ≤2e-4 in the encoder (argmax-
        robust; identical captions by test, tests/test_serve.py).
        Same bytes over H2D.

        dp > 1 shards serving batches over the mesh's dp axis (the
        v5e-8 scale-out path; params replicated along dp).  mp > 1
        additionally tensor-shards the decoder's vocab-sized tensors
        (output projection, embedding) along the mp axis — GSPMD turns
        the per-step softmax/argmax and embedding gathers into ICI
        collectives (same rule as training, parallel/mesh.py).  Verified
        bit-equal to single-device decode on the virtual mesh
        (tests/test_serve.py)."""
        self.cfg = cfg
        self.vocab = vocab
        self.early_exit = early_exit
        self.s2d = s2d
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self._dtype = dtype
        cast = lambda t: jax.tree.map(lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t)
        self.params = cast(params)
        self.bn_state = cast(bn_state)
        self.mesh = None
        if dp > 1 or mp > 1:
            from show_tell_tpu.parallel.mesh import (
                decoder_param_shardings,
                make_mesh,
                replicate,
            )

            self.mesh = make_mesh(dp=dp, mp=mp)
            if mp > 1:
                pad = (-cfg.vocab_size) % mp
                if pad:  # vocab not divisible by mp: pad with -inf logits
                    # (never argmax-selected; embedding pad rows never
                    # gathered) — decode output is exactly unchanged.
                    dec = dict(self.params["decoder"])
                    dec["embedding"] = jnp.pad(dec["embedding"], ((0, pad), (0, 0)))
                    lin = dict(dec["linear"])
                    lin["w"] = jnp.pad(lin["w"], ((0, 0), (0, pad)))
                    lin["b"] = jnp.concatenate(
                        [lin["b"], jnp.full((pad,), -1e9, lin["b"].dtype)]
                    )
                    dec["linear"] = lin
                    self.params = {**self.params, "decoder": dec}
                shardings = decoder_param_shardings(self.mesh, self.params)
                self.params = jax.tree.map(jax.device_put, self.params, shardings)
            else:
                self.params = replicate(self.mesh, self.params)
            self.bn_state = replicate(self.mesh, self.bn_state)
        self._jitted: Dict[int, Any] = {}

    # ------------------------------------------------------------ loading

    @classmethod
    def from_checkpoint(
        cls,
        ckpt_path: str,
        vocab_path: str,
        variant: str = "gru",
        resnet_version: int = 101,
        embed_dim: int = 256,
        hidden_dim: int = 512,
        num_layers: int = 5,
        compute_dtype: str = "bfloat16",
        dp: int = 1,
        mp: int = 1,
        early_exit: bool = False,
        s2d: bool = False,
        **cfg_kw,
    ) -> "Captioner":
        """Load either our pickle checkpoint or a reference torch .ckpt."""
        from show_tell_tpu.vocab.vocabulary import load_vocab

        vocab = load_vocab(vocab_path)
        # Like end_idx in _decode_fn: a foreign/legacy vocab need not put
        # <start> at the builder's id 1, and the attention families embed
        # the start token at step 0 — derive it from the loaded vocab.
        cfg_kw.setdefault(
            "start_token", vocab.word_to_index.get(vocab.start_token(), 1)
        )
        cfg = CaptionerConfig(
            variant=variant,
            resnet_version=resnet_version,
            embed_dim=embed_dim,
            hidden_dim=hidden_dim,
            vocab_size=len(vocab),
            num_layers=num_layers,
            **cfg_kw,
        )
        params, bn_state = cls._load_any_checkpoint(ckpt_path, cfg)
        return cls(params, bn_state, cfg, vocab, compute_dtype, dp=dp, mp=mp,
                   early_exit=early_exit, s2d=s2d)

    @staticmethod
    def _load_any_checkpoint(ckpt_path: str, cfg: CaptionerConfig):
        from show_tell_tpu.train.checkpoint import import_torch_checkpoint, load_checkpoint

        try:
            ckpt = load_checkpoint(ckpt_path)
            is_ours = isinstance(ckpt, dict) and ckpt.get("format", "").startswith("show_tell_tpu")
        except Exception as ours_err:
            # Not loadable as ours: try the torch importer, but if BOTH
            # fail, surface both errors — a torn/corrupt checkpoint of OUR
            # format would otherwise hide behind an unrelated torch
            # deserialization message.
            try:
                return import_torch_checkpoint(ckpt_path, cfg)
            except Exception as torch_err:
                raise ValueError(
                    "%s loads neither as a show_tell_tpu checkpoint (%s: %s) "
                    "nor as a torch checkpoint (%s: %s)"
                    % (ckpt_path, type(ours_err).__name__, ours_err,
                       type(torch_err).__name__, torch_err)
                ) from torch_err
        if not is_ours:
            return import_torch_checkpoint(ckpt_path, cfg)
        enc = ckpt["encoder_state_dict"]
        params = {
            "encoder": {
                "resnet": enc["frozen"]["resnet"],
                "linear_secondlast_layer": enc["trainable"]["linear_secondlast_layer"],
                "last_layer": enc["trainable"]["last_layer"],
            },
            "decoder": ckpt["decoder_state_dict"],
        }
        params = jax.tree.map(jnp.asarray, params)
        bn_state = jax.tree.map(jnp.asarray, enc["bn_state"])
        return params, bn_state

    # ------------------------------------------------------------ serving

    def _decode_fn(self, beam_size: int):
        if beam_size not in self._jitted:
            cfg = self.cfg

            # Beam retirement (and early_exit) key on the loaded vocab's
            # actual <end> id — a foreign/legacy vocab need not use the
            # builder's id 2 (review finding; the eval path threads the
            # same id through make_test_step).
            end_idx = self.vocab.word_to_index[self.vocab.end_token()]

            @jax.jit
            def run(images_u8):
                if self.s2d:
                    from show_tell_tpu.data.transforms import preprocess_images_s2d

                    images = preprocess_images_s2d(
                        images_u8, jax.random.PRNGKey(0), augment=False, dtype=self._dtype
                    )
                else:
                    images = preprocess_images(
                        images_u8, jax.random.PRNGKey(0), augment=False, dtype=self._dtype
                    )
                if beam_size > 0:
                    feats, _ = encoder_forward(
                        self.params["encoder"], self.bn_state, cfg.encoder_config(), images, training=False
                    )
                    if cfg.is_attention:
                        return attn_beam_search_decode(
                            self.params["decoder"], cfg.decoder_config(), feats, beam_size,
                            cfg.start_token, end_token=end_idx, early_exit=self.early_exit,
                        )
                    return beam_search_decode(
                        self.params["decoder"], cfg.decoder_config(), feats, beam_size,
                        end_token=end_idx, early_exit=self.early_exit,
                    )
                # early_exit routes to the shared while_loop engine inside
                # the same dispatch; the measured-auto Pallas kernel policy
                # applies identically either way (kernels trace under
                # lax.while_loop like under scan).
                return captioner_greedy_decode(
                    self.params, self.bn_state, cfg, images,
                    end_token=end_idx if self.early_exit else None,
                )

            self._jitted[beam_size] = run
        return self._jitted[beam_size]

    def stage(self, images_u8: np.ndarray) -> jax.Array:
        """Host uint8 batch -> device-resident (sharded, under a mesh)
        array.  Callable from a background thread: the pipeline stages
        batch k+1 while the chip captions batch k, so the H2D transfer
        overlaps compute instead of serializing in front of it (the
        training loop's device_prefetch pattern)."""
        if self.mesh is not None:
            from show_tell_tpu.parallel.mesh import shard_batch

            dp = self.mesh.shape["dp"]
            if len(images_u8) % dp:
                raise ValueError(
                    "serving batch of %d does not divide over dp=%d; pass a batch "
                    "that is a multiple of dp (pad with repeated images and slice "
                    "the outputs, as the CLI does)" % (len(images_u8), dp)
                )
            return shard_batch(self.mesh, np.asarray(images_u8))
        return jnp.asarray(images_u8)

    def caption_ids(self, images_u8, beam_size: int = 0) -> np.ndarray:
        """uint8 [B,224,224,3] ([B,112,112,12] under s2d; host numpy or
        pre-``stage``d device array) -> token ids [B, max_caption_length]."""
        images = images_u8 if isinstance(images_u8, jax.Array) else self.stage(images_u8)
        return np.asarray(self._decode_fn(beam_size)(images))

    def caption(self, images_u8, beam_size: int = 0) -> List[str]:
        """uint8 [B,224,224,3] (host or staged) -> caption strings
        (<end>-truncated)."""
        ids = self.caption_ids(images_u8, beam_size)
        words = create_caption_word_format(ids, self.vocab, False)
        return [" ".join(w) for w in words]

    def load_files(
        self, paths: Sequence[str], fast_jpeg: bool = False, rgb: bool = False
    ) -> np.ndarray:
        """JPEG file paths -> uint8 in the Captioner's serving layout:
        [N,224,224,3], or [N,112,112,12] under s2d (the native decoder
        emits it directly; PIL-fallback rows relayout on the host).
        rgb=True forces the RGB layout regardless of s2d — the
        layout-stable form the serve image cache stores.

        fast_jpeg: DCT-domain scaled decode — ~2x faster on the host,
        pixels within a few LSB of the full-resolution decode (see
        docs/DATA.md "JPEG decode paths")."""
        from show_tell_tpu.native import fastimage

        s2d = self.s2d and not rgb
        if fastimage.is_available():
            bufs = [open(p, "rb").read() for p in paths]
            batch, statuses = fastimage.decode_resize_batch(
                bufs, IMAGE_SIZE, IMAGE_SIZE, fast_scale=fast_jpeg, s2d=s2d
            )
            for i, s in enumerate(statuses):
                if s != 0:  # fall back to PIL for odd files
                    row = self._pil_load(paths[i])
                    batch[i] = _to_s2d(row[None])[0] if s2d else row
            return batch
        batch = np.stack([self._pil_load(p) for p in paths])
        return _to_s2d(batch) if s2d else batch

    def caption_files(
        self, paths: Sequence[str], beam_size: int = 0, fast_jpeg: bool = False
    ) -> List[str]:
        """JPEG file paths -> caption strings."""
        return self.caption(self.load_files(paths, fast_jpeg), beam_size)

    @staticmethod
    def _pil_load(path: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(path).convert("RGB").resize((IMAGE_SIZE, IMAGE_SIZE), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)


def _to_s2d(batch_rgb: np.ndarray) -> np.ndarray:
    """uint8 [B,224,224,3] -> [B,112,112,12] on the host (numpy
    relayout; same bytes — see data/transforms.host_space_to_depth)."""
    from show_tell_tpu.data.transforms import host_space_to_depth

    return host_space_to_depth(batch_rgb)


def _load_with_cache(captioner: Captioner, paths, cache, fast_jpeg: bool) -> np.ndarray:
    """load_files with optional ServeImageCache: cached rows are served
    from .npy, only the misses hit the JPEG decoder (and are cached).
    The cache always stores the RGB layout (layout-stable across s2d
    and stock Captioners sharing one cache dir); an s2d Captioner
    relayouts the assembled batch on the host."""
    if cache is None:
        return captioner.load_files(paths, fast_jpeg=fast_jpeg)
    out = [cache.get(p) for p in paths]
    miss = [i for i, a in enumerate(out) if a is None]
    if miss:
        decoded = captioner.load_files([paths[i] for i in miss], fast_jpeg=fast_jpeg, rgb=True)
        for j, i in enumerate(miss):
            out[i] = decoded[j]
            cache.put(paths[i], decoded[j])
    batch = np.stack(out)
    return _to_s2d(batch) if captioner.s2d else batch


def caption_paths(
    captioner: Captioner,
    paths: Sequence[str],
    batch_size: int,
    beam_size: int = 0,
    cache=None,
    fast_jpeg: bool = False,
    overlap: bool = True,
):
    """Caption files in fixed-size batches, yielding (path, caption).

    overlap=True (the CLI default) double-buffers: the host decodes AND
    device-stages batch k+1 on a background thread while the chip
    captions batch k (the training loop's prefetch pattern,
    data/device_prefetch.py; libjpeg/PIL release the GIL, and staging
    in the loader overlaps the H2D transfer with compute — on hosts
    with slow device links the transfer, not the decode, can be the
    bottleneck once pixels are cached).  overlap=False is the serial
    A-side for bench.py --serve_e2e."""
    B = batch_size
    chunks = [paths[lo : lo + B] for lo in range(0, len(paths), B)]
    if not chunks:
        return

    def load(chunk):
        imgs = _load_with_cache(captioner, chunk, cache, fast_jpeg)
        if len(chunk) < B:  # pad decoded pixels, not paths: static batch
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], B - len(chunk), axis=0)])
        return captioner.stage(imgs)

    if not overlap:
        for chunk in chunks:
            for pair in zip(chunk, captioner.caption(load(chunk), beam_size)[: len(chunk)]):
                yield pair
        return

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(1) as pool:
        nxt = pool.submit(load, chunks[0])
        for i, chunk in enumerate(chunks):
            imgs = nxt.result()
            if i + 1 < len(chunks):
                nxt = pool.submit(load, chunks[i + 1])
            for pair in zip(chunk, captioner.caption(imgs, beam_size)[: len(chunk)]):
                yield pair


def main(argv: Optional[Sequence[str]] = None) -> int:
    """Deployment CLI: ``python -m show_tell_tpu.serve --ckpt model.ckpt
    --vocab vocab.pkl img1.jpg photos_dir/ ...``

    Loads a checkpoint (ours or a reference torch .ckpt), captions the
    given JPEG files/directories in fixed-size batches (one compiled
    program — the last partial batch is padded, outputs sliced), and
    prints one ``path<TAB>caption`` line per image (``--json`` for one
    JSON object per line).  The reference has no serving entry point;
    this is the framework's (its test_model only scores a dataset).
    """
    import argparse
    import json as _json
    import os
    import sys

    p = argparse.ArgumentParser(prog="python -m show_tell_tpu.serve", description="Caption images from a checkpoint.")
    p.add_argument("images", nargs="+", help="JPEG files and/or directories of JPEGs")
    p.add_argument("--ckpt", required=True, help="checkpoint path (show_tell_tpu pickle/orbax or reference torch .ckpt)")
    p.add_argument("--vocab", required=True, help="vocab.pkl path (ours or the reference's)")
    p.add_argument("--variant", default="gru", choices=["gru", "lstm", "attn", "attn_lstm"])
    p.add_argument("--resnet_version", type=int, default=101)
    p.add_argument("--embedding_length", type=int, default=0, help="0 = reference default for the variant (256 gru, 512 others)")
    p.add_argument("--num_hidden_units", type=int, default=512)
    p.add_argument("--num_layers", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--beam_size", type=int, default=0, help="0 = greedy")
    p.add_argument("--compute_dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--dp", type=int, default=1, help="shard serving batches over this many devices")
    p.add_argument("--mp", type=int, default=1, help="tensor-shard vocab-sized decoder params over this many devices")
    p.add_argument("--nos_cnn_filters", type=int, default=0, help="attention variants: encoder channels the checkpoint was trained with (0 = the backbone's native width, 2048 for ResNet-50/101/152, 512 for 18/34 — the reference default)")
    p.add_argument("--attn_dim", type=int, default=512, help="attention variants: attention hidden dim the checkpoint was trained with (reference default 512)")
    p.add_argument("--early_exit", type=int, default=0, help="stop decode (greedy or beam) when every sequence/beam emitted <end>; identical output")
    p.add_argument("--s2d", type=int, default=0, help="host-emitted space-to-depth input path (relayout-free stem; identical captions, bench.py --s2d A/B)")
    p.add_argument("--fast_jpeg", type=int, default=0, help="DCT-domain scaled JPEG decode (~2x host decode speed)")
    p.add_argument("--image_cache", default="", help="decoded-image cache dir (.npy per image keyed by path+size+mtime: stale entries re-decode automatically; shareable across serve runs)")
    p.add_argument("--json", action="store_true", help='emit {"image": ..., "caption": ...} JSON lines')
    args = p.parse_args(argv)

    paths: List[str] = []
    for item in args.images:
        if os.path.isdir(item):
            paths.extend(
                os.path.join(item, f)
                for f in sorted(os.listdir(item))
                if f.lower().endswith((".jpg", ".jpeg", ".png"))
            )
        elif os.path.isfile(item):
            paths.append(item)
        else:
            # Fail fast and on stderr: a typo'd path would otherwise crash
            # with a raw traceback from the prefetch thread mid-stream,
            # after checkpoint load/compile and earlier batches' output.
            print("image path does not exist: %s" % item, file=sys.stderr)
            return 2
    if not paths:
        print("no images found", file=sys.stderr)
        return 2

    embed = args.embedding_length or (256 if args.variant == "gru" else 512)
    cfg_kw = {}
    if args.variant.startswith("attn"):
        nos = args.nos_cnn_filters or (512 if args.resnet_version in (18, 34) else 2048)
        cfg_kw = dict(nos_filters=nos, attn_dim=args.attn_dim)
    captioner = Captioner.from_checkpoint(
        args.ckpt,
        args.vocab,
        variant=args.variant,
        resnet_version=args.resnet_version,
        embed_dim=embed,
        hidden_dim=args.num_hidden_units,
        num_layers=args.num_layers,
        compute_dtype=args.compute_dtype,
        dp=args.dp,
        mp=args.mp,
        early_exit=bool(args.early_exit),
        s2d=bool(args.s2d),
        **cfg_kw,
    )

    B = max(1, args.batch_size)
    if args.dp > 1 and B % args.dp:
        B += args.dp - B % args.dp  # batches shard over dp; round up
        print("batch_size rounded up to %d (multiple of dp=%d)" % (B, args.dp), file=sys.stderr)

    cache = None
    if args.image_cache:
        from show_tell_tpu.data.serve_cache import ServeImageCache

        cache = ServeImageCache(args.image_cache, IMAGE_SIZE, fast_jpeg=bool(args.fast_jpeg))

    for path, cap in caption_paths(
        captioner, paths, B, args.beam_size, cache=cache, fast_jpeg=bool(args.fast_jpeg)
    ):
        if args.json:
            print(_json.dumps({"image": path, "caption": cap}))
        else:
            print("%s\t%s" % (path, cap))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
