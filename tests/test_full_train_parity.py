"""Full train-step lockstep parity: our jitted step vs a torch re-enactment
of the reference training semantics (main.py:136-152) with identical
weights and batches — the end-to-end numerics check on top of the
per-component parity tests."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from show_tell_tpu.models.captioner import CaptionerConfig
from show_tell_tpu.models.convert import decoder_params_from_torch
from show_tell_tpu.models.encoder import EncoderConfig, encoder_params_from_torch
from show_tell_tpu.train.optim import make_optimizer
from show_tell_tpu.train.train_step import TrainState, make_train_step
from show_tell_tpu.models.captioner import split_trainable

from torch_resnet_oracle import TorchResNet

B, T, E, H, V, L = 6, 10, 12, 16, 30, 2
IMG = 64
STEPS = 4
LR, MOMENTUM = 0.05, 0.9


def build_torch_models():
    torch.manual_seed(0)
    backbone = TorchResNet(18)
    lin = torch.nn.Linear(512, E)
    lin.weight.data.normal_(0, 0.05)
    bn = torch.nn.BatchNorm1d(E, momentum=0.01)
    bn.bias.data.fill_(0)

    emb = torch.nn.Embedding(V, E)
    unit = torch.nn.GRU(E, H, L, batch_first=True)
    out = torch.nn.Linear(H, V)
    return backbone, lin, bn, emb, unit, out


def to_jax_state(backbone, lin, bn, emb, unit, out):
    idx_map = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5", "layer3": "6", "layer4": "7"}
    enc_sd = {}
    for k, v in backbone.state_dict().items():
        if k.startswith("fc."):
            continue
        root = k.split(".")[0]
        enc_sd["model." + idx_map[root] + k[len(root):]] = v
    for k, v in lin.state_dict().items():
        enc_sd["linear_secondlast_layer." + k] = v
    for k, v in bn.state_dict().items():
        enc_sd["last_layer." + k] = v
    dec_sd = {"embeddings.weight": emb.weight}
    for k, v in unit.state_dict().items():
        dec_sd["unit." + k] = v
    dec_sd["linear.weight"], dec_sd["linear.bias"] = out.weight, out.bias

    cfg = CaptionerConfig("gru", 18, E, H, V, L)
    enc_params, enc_state = encoder_params_from_torch(enc_sd, cfg.encoder_config())
    dec_params = decoder_params_from_torch(dec_sd, L)
    return cfg, {"encoder": enc_params, "decoder": dec_params}, enc_state


def torch_reference_steps(backbone, lin, bn, emb, unit, out, batches):
    """Reference training semantics: frozen detached backbone in train
    mode, packed CE over prepended-feature GRU outputs, SGD+momentum over
    decoder + head (main.py:96-98,136-152)."""
    backbone.train(), lin.train(), bn.train(), emb.train(), unit.train(), out.train()
    trainable = (
        list(emb.parameters()) + list(unit.parameters()) + list(out.parameters())
        + list(lin.parameters()) + list(bn.parameters())
    )
    optim = torch.optim.SGD(trainable, lr=LR, momentum=MOMENTUM)
    loss_fn = torch.nn.CrossEntropyLoss()
    losses = []
    for images, captions, lengths in batches:
        xt = torch.from_numpy(np.transpose(images, (0, 3, 1, 2)).copy())
        with torch.no_grad():
            fmap = backbone.features(xt)  # train-mode BN: batch stats + drift
        pooled = backbone.avgpool(fmap).flatten(1)
        feat = bn(lin(pooled))
        cap_t = torch.from_numpy(captions.astype(np.int64))
        raw = torch.cat((feat.unsqueeze(1), emb(cap_t)), 1)
        packed = torch.nn.utils.rnn.pack_padded_sequence(raw, list(lengths), batch_first=True)
        logits = out(unit(packed)[0][0])
        targets = torch.nn.utils.rnn.pack_padded_sequence(cap_t, list(lengths), batch_first=True)[0]
        loss = loss_fn(logits, targets)
        optim.zero_grad()
        loss.backward()
        optim.step()
        losses.append(float(loss))
    return losses


def test_lockstep_losses_match():
    backbone, lin, bn, emb, unit, out = build_torch_models()
    cfg, params, enc_state = to_jax_state(backbone, lin, bn, emb, unit, out)

    rng = np.random.RandomState(0)
    batches = []
    for _ in range(STEPS):
        # float images in [0,1]-ish via uint8 -> the SAME normalized pixels
        # feed both sides: our step preprocesses uint8 on device
        # (augment off), torch gets the identical normalized tensor.
        images_u8 = rng.randint(0, 255, (B, IMG, IMG, 3), dtype=np.uint8)
        lengths = np.sort(rng.randint(3, T + 1, B))[::-1].astype(np.int32)
        captions = rng.randint(4, V, (B, T)).astype(np.int32)
        for i, l in enumerate(lengths):
            captions[i, l:] = 0
        batches.append((images_u8, captions, np.ascontiguousarray(lengths)))

    from show_tell_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    def normalize(u8):
        return ((u8.astype(np.float32) / 255.0) - np.array(IMAGENET_MEAN, np.float32)) / np.array(
            IMAGENET_STD, np.float32
        )

    ref_losses = torch_reference_steps(
        backbone, lin, bn, emb, unit, out,
        [(normalize(im), cap, lens) for im, cap, lens in batches],
    )

    optimizer = make_optimizer("SGD", LR, MOMENTUM)
    trainable, frozen = split_trainable(params)
    ts = TrainState(trainable, frozen, enc_state, optimizer.init(trainable), jax.random.PRNGKey(0), jnp.int32(0))
    step = make_train_step(cfg, optimizer, augment=False)

    our_losses = []
    for images_u8, captions, lengths in batches:
        ts, loss = step(ts, images_u8, jnp.asarray(captions), jnp.asarray(lengths))
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-4, atol=5e-4)
    # Losses should actually move (optimizer steps took effect).
    assert our_losses[-1] != our_losses[0]
