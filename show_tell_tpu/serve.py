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
    ):
        """early_exit stops greedy decode once every sequence in the
        batch emitted <end> (identical captions — formatting truncates
        there anyway; trained models skip ~half the 25 steps).  Off by
        default: the reference always runs the full 25 (rnn.py:39).

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
        self.early_exit = early_exit and not cfg.is_attention
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
        **cfg_kw,
    ) -> "Captioner":
        """Load either our pickle checkpoint or a reference torch .ckpt."""
        from show_tell_tpu.vocab.vocabulary import load_vocab

        vocab = load_vocab(vocab_path)
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
        return cls(params, bn_state, cfg, vocab, compute_dtype, dp=dp, mp=mp, early_exit=early_exit)

    @staticmethod
    def _load_any_checkpoint(ckpt_path: str, cfg: CaptionerConfig):
        from show_tell_tpu.train.checkpoint import import_torch_checkpoint, load_checkpoint

        try:
            ckpt = load_checkpoint(ckpt_path)
            is_ours = isinstance(ckpt, dict) and ckpt.get("format", "").startswith("show_tell_tpu")
        except Exception:
            is_ours = False
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

            @jax.jit
            def run(images_u8):
                images = preprocess_images(
                    images_u8, jax.random.PRNGKey(0), augment=False, dtype=self._dtype
                )
                if beam_size > 0:
                    feats, _ = encoder_forward(
                        self.params["encoder"], self.bn_state, cfg.encoder_config(), images, training=False
                    )
                    if cfg.is_attention:
                        return attn_beam_search_decode(
                            self.params["decoder"], cfg.decoder_config(), feats, beam_size, cfg.start_token
                        )
                    return beam_search_decode(self.params["decoder"], cfg.decoder_config(), feats, beam_size)
                if self.early_exit:
                    from show_tell_tpu.models.decoder import greedy_decode

                    feats, _ = encoder_forward(
                        self.params["encoder"], self.bn_state, cfg.encoder_config(), images, training=False
                    )
                    end_idx = self.vocab.word_to_index[self.vocab.end_token()]
                    return greedy_decode(self.params["decoder"], cfg.decoder_config(), feats, end_token=end_idx)
                return captioner_greedy_decode(self.params, self.bn_state, cfg, images)

            self._jitted[beam_size] = run
        return self._jitted[beam_size]

    def caption_ids(self, images_u8: np.ndarray, beam_size: int = 0) -> np.ndarray:
        """uint8 [B,224,224,3] -> token ids [B, max_caption_length]."""
        if self.mesh is not None:
            from show_tell_tpu.parallel.mesh import shard_batch

            images = shard_batch(self.mesh, np.asarray(images_u8))
        else:
            images = jnp.asarray(images_u8)
        return np.asarray(self._decode_fn(beam_size)(images))

    def caption(self, images_u8: np.ndarray, beam_size: int = 0) -> List[str]:
        """uint8 [B,224,224,3] -> caption strings (<end>-truncated)."""
        ids = self.caption_ids(images_u8, beam_size)
        words = create_caption_word_format(ids, self.vocab, False)
        return [" ".join(w) for w in words]

    def caption_files(self, paths: Sequence[str], beam_size: int = 0) -> List[str]:
        """JPEG file paths -> caption strings (native decode if built)."""
        from show_tell_tpu.native import fastimage

        imgs = []
        if fastimage.is_available():
            bufs = [open(p, "rb").read() for p in paths]
            batch, statuses = fastimage.decode_resize_batch(bufs, IMAGE_SIZE, IMAGE_SIZE)
            for i, s in enumerate(statuses):
                if s != 0:  # fall back to PIL for odd files
                    batch[i] = self._pil_load(paths[i])
            imgs = batch
        else:
            imgs = np.stack([self._pil_load(p) for p in paths])
        return self.caption(imgs, beam_size)

    @staticmethod
    def _pil_load(path: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(path).convert("RGB").resize((IMAGE_SIZE, IMAGE_SIZE), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)
