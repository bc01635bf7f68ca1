"""The Captioner: encoder + decoder composition for all four model families.

Mirrors the reference wiring (main.py:92-93, LSTM/main_lstm.py,
Attention/main_attn{,_LSTM}.py:86-87):

  variant 'gru'       ResNet pooled [B,E]   -> GRU decoder    (main.py)
  variant 'lstm'      ResNet pooled [B,E]   -> LSTM decoder   (main_lstm.py)
  variant 'attn'      ResNet spatial [B,C,49] -> attention GRU (main_attn.py)
  variant 'attn_lstm' ResNet spatial [B,C,49] -> attention LSTM

Only decoder + encoder-head parameters are trainable (main.py:96); the
backbone is frozen (stop_gradient) but its BatchNorm running stats update
in train mode, exactly like the reference's ``cnn.train()``.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from show_tell_tpu.models import attention as attn_mod
from show_tell_tpu.models import decoder as dec_mod
from show_tell_tpu.models.encoder import EncoderConfig, encoder_forward, init_encoder_params


class CaptionerConfig(NamedTuple):
    variant: str  # 'gru' | 'lstm' | 'attn' | 'attn_lstm'
    resnet_version: int
    embed_dim: int
    hidden_dim: int
    vocab_size: int
    num_layers: int
    nos_filters: int = 2048
    attn_dim: int = 512
    alpha_c: float = 1.0
    max_caption_length: int = 25
    start_token: int = 1
    # False = faithful reference alignment for attention variants
    # (w_t -> w_t copy task, SURVEY.md 3.2); True = proper next-token.
    attn_next_token: bool = False

    @property
    def is_attention(self) -> bool:
        return self.variant in ("attn", "attn_lstm")

    @property
    def cell_type(self) -> str:
        return "gru" if self.variant in ("gru", "attn") else "lstm"

    def encoder_config(self) -> EncoderConfig:
        return EncoderConfig(self.resnet_version, self.embed_dim, spatial=self.is_attention)

    def decoder_config(self):
        if self.is_attention:
            return attn_mod.AttnDecoderConfig(
                self.cell_type,
                self.embed_dim,
                self.nos_filters,
                self.attn_dim,
                self.hidden_dim,
                self.vocab_size,
                self.num_layers,
                self.max_caption_length,
            )
        return dec_mod.DecoderConfig(
            self.cell_type,
            self.embed_dim,
            self.hidden_dim,
            self.vocab_size,
            self.num_layers,
            self.max_caption_length,
        )


def init_captioner(key: jax.Array, cfg: CaptionerConfig):
    """Returns (params, state): params = {'encoder': .., 'decoder': ..}."""
    if cfg.is_attention:
        # Spatial feature channels are set by the backbone: 512 for
        # ResNet-18/34 (basic blocks), 2048 for 50/101/152 (bottleneck).
        # The reference hits the same constraint as an opaque torch shape
        # error; fail early with the fix spelled out.
        expected = 512 if cfg.resnet_version in (18, 34) else 2048
        if cfg.nos_filters != expected:
            raise ValueError(
                "nos_cnn_filters=%d does not match ResNet-%d's spatial feature "
                "channels (%d); pass --nos_cnn_filters %d"
                % (cfg.nos_filters, cfg.resnet_version, expected, expected)
            )
    k_enc, k_dec = jax.random.split(key)
    enc_params, enc_state = init_encoder_params(k_enc, cfg.encoder_config())
    if cfg.is_attention:
        dec_params = attn_mod.init_attn_decoder_params(k_dec, cfg.decoder_config())
    else:
        dec_params = dec_mod.init_decoder_params(k_dec, cfg.decoder_config())
    return {"encoder": enc_params, "decoder": dec_params}, enc_state


def split_trainable(params: Dict[str, Any]):
    """(trainable, frozen): decoder + encoder head train; backbone doesn't
    (reference main.py:96 optimizes rnn + linear_secondlast + last_layer)."""
    trainable = {
        "decoder": params["decoder"],
        "encoder": {
            "linear_secondlast_layer": params["encoder"]["linear_secondlast_layer"],
            "last_layer": params["encoder"]["last_layer"],
        },
    }
    frozen = {"encoder": {"resnet": params["encoder"]["resnet"]}}
    return trainable, frozen


def merge_params(trainable: Dict[str, Any], frozen: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "decoder": trainable["decoder"],
        "encoder": {
            "resnet": frozen["encoder"]["resnet"],
            "linear_secondlast_layer": trainable["encoder"]["linear_secondlast_layer"],
            "last_layer": trainable["encoder"]["last_layer"],
        },
    }


def captioner_loss(
    params: Dict[str, Any],
    state: Dict[str, Any],
    cfg: CaptionerConfig,
    images: jax.Array,  # [B,224,224,3] normalized float
    captions: jax.Array,  # [B,T] int32
    lengths: jax.Array,  # [B] int32
    training: bool = True,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Teacher-forced loss (masked CE == packed CE; + alpha_c penalty for
    attention variants, main_attn.py:130-131).  Returns (loss, new_state)."""
    feats, new_state = encoder_forward(params["encoder"], state, cfg.encoder_config(), images, training)
    if cfg.is_attention:
        if cfg.attn_next_token:
            # Corrected alignment (--attn_next_token): step t consumes
            # caption[t] and predicts caption[t+1]; valid steps t < len-1.
            lengths_nt = jnp.maximum(lengths - 1, 0)
            preds, alphas = attn_mod.attn_decoder_forward(
                params["decoder"], cfg.decoder_config(), feats, captions, lengths_nt
            )
            targets = jnp.concatenate([captions[:, 1:], jnp.zeros_like(captions[:, :1])], axis=1)
            loss = dec_mod.masked_cross_entropy(preds, targets, lengths_nt)
        else:
            # Faithful reference alignment: w_t -> w_t (SURVEY.md 3.2).
            preds, alphas = attn_mod.attn_decoder_forward(
                params["decoder"], cfg.decoder_config(), feats, captions, lengths
            )
            loss = dec_mod.masked_cross_entropy(preds, captions, lengths)
        loss = loss + cfg.alpha_c * attn_mod.doubly_stochastic_penalty(alphas)
    else:
        logits = dec_mod.decoder_forward(params["decoder"], cfg.decoder_config(), feats, captions, lengths)
        loss = dec_mod.masked_cross_entropy(logits, captions, lengths)
    return loss, new_state


def captioner_greedy_decode(
    params: Dict[str, Any],
    state: Dict[str, Any],
    cfg: CaptionerConfig,
    images: jax.Array,
    use_pallas: "bool | None" = None,
    end_token: "int | None" = None,
    vocab_sharded: "bool | None" = None,
) -> jax.Array:
    """Eval-mode encode + 25-step batched greedy decode -> [B, 25] ids.

    use_pallas: None = measured auto policy (tools/tpu_smoke.py --bench,
    v5e serving shapes): attention decode uses the FULLY fused step
    (attention + embed-space context + recurrence + projection + argmax
    in ONE invocation, ops/fused_attn_pallas.py — 1.38x GRU / 1.34x LSTM
    over the previous composite kernels, 2.28x over XLA; the composite
    remains the mp-sharded-vocab / f32 fallback); pooled GRU greedy uses the FULLY
    fused step kernel (ops/fused_step_pallas.py — recurrence +
    projection + argmax in one Mosaic invocation, 1.09x/step at
    T-amplified measurement, the reference's always-on cuDNN hot-loop
    analogue); the pooled LSTM fused step measured ~1% slower and auto
    keeps it on the XLA scan.  f32 parity shapes exceed the kernel's
    VMEM budget and transparently keep the XLA scan (guard in
    greedy_decode_pallas).
    Every kernel carries a batch-parallel GSPMD rule (ops/partition.py),
    so auto holds under dp / dp x mp meshes too; with an mp-sharded
    vocab projection only that projection falls back to XLA (see
    ops.vocab_projection_is_sharded).  True/False force the choice
    (--use_pallas 1/0).

    end_token: early-exit decode — stop as soon as every row has emitted
    <end> (the shared `lax.while_loop` engine; same kernels, same
    captions, <pad> after <end>).  None = the reference's fixed-T scan.

    vocab_sharded: statically-known sharding of the output projection.
    None = inspect params — correct for concrete arrays, but a caller
    that jits THIS function must pass the flag computed on the concrete
    params, because inspecting traced params conservatively reports
    sharded and would silently disable the vocab/fused-step kernels
    (evaluation/tester.py does this)."""
    feats, _ = encoder_forward(params["encoder"], state, cfg.encoder_config(), images, training=False)
    if cfg.is_attention:
        if use_pallas is None:
            from show_tell_tpu.ops import pallas_auto_default

            use_pallas = pallas_auto_default()
        if use_pallas:
            vs = vocab_sharded
            if vs is None:
                from show_tell_tpu.ops import vocab_projection_is_sharded

                vs = vocab_projection_is_sharded(params["decoder"]["linear"])
            dtype = params["decoder"]["embedding"].dtype
            # Shape + VMEM envelope (the shared seam next to the policy
            # flags): bf16 serving shapes fit, f32 parity shapes keep
            # the composite path (whose projection kernel has its own
            # envelope), H > 2E configs can't use the kernel's scratch.
            from show_tell_tpu.ops import fused_attn_step_fits

            fits = fused_attn_step_fits(
                cfg.decoder_config().cell_type, cfg.hidden_dim, cfg.embed_dim, dtype,
                interpret=jax.default_backend() != "tpu",
            )
            if not vs and fits:
                # FULLY fused decode step: attention + embed-space context
                # + recurrence + projection + argmax in ONE invocation
                # (ops/fused_attn_pallas.py — measured 1.38x over the
                # composite kernels, 2.28x over XLA at T=200 B=256).
                from show_tell_tpu.ops.fused_attn_pallas import attn_greedy_decode_fused_pallas

                return attn_greedy_decode_fused_pallas(
                    params["decoder"], cfg.decoder_config(), feats, cfg.start_token,
                    end_token=end_token,
                )
            from show_tell_tpu.ops.attention_pallas import attn_greedy_decode_pallas

            # mp-sharded vocab (XLA projection keeps GSPMD's vocab-axis
            # collectives) or f32 shapes: the composite context(+proj)
            # kernel path.
            return attn_greedy_decode_pallas(
                params["decoder"], cfg.decoder_config(), feats, cfg.start_token,
                end_token=end_token, vocab_sharded=vs,
            )
        return attn_mod.attn_greedy_decode(
            params["decoder"], cfg.decoder_config(), feats, cfg.start_token, end_token=end_token
        )
    if use_pallas is None:
        from show_tell_tpu.ops import pallas_auto_default

        # Measured per cell (T=200-amplified interleaved A/B, see
        # ARCHITECTURE.md): the fused step wins for GRU (1.09x/step);
        # the LSTM variant is ~1% slower (its 4-gate weight blocks
        # throttle the grid pipeline), so auto keeps LSTM on the XLA
        # scan (--use_pallas 1 still forces the kernel).
        use_pallas = pallas_auto_default() and cfg.cell_type == "gru"
    if use_pallas:
        from show_tell_tpu.ops.rnn_pallas import greedy_decode_pallas

        return greedy_decode_pallas(
            params["decoder"], cfg.decoder_config(), feats,
            end_token=end_token, vocab_sharded=vocab_sharded,
        )
    return dec_mod.greedy_decode(params["decoder"], cfg.decoder_config(), feats, end_token=end_token)


def config_from_params(params: Dict[str, Any], vocab_size: int, variant: str = "gru", **kw) -> CaptionerConfig:
    """Convenience: infer dims from a params pytree."""
    emb = params["decoder"]["embedding"]
    hid = params["decoder"]["linear"]["w"].shape[0]
    layers = len(params["decoder"]["rnn"])
    return CaptionerConfig(
        variant=variant,
        resnet_version=kw.get("resnet_version", 101),
        embed_dim=emb.shape[1],
        hidden_dim=hid,
        vocab_size=vocab_size,
        num_layers=layers,
        **{k: v for k, v in kw.items() if k != "resnet_version"},
    )
