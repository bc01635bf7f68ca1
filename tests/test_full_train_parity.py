"""Full train-step lockstep parity: our jitted step vs a torch re-enactment
of the reference training semantics with identical weights and batches —
the end-to-end numerics check on top of the per-component parity tests,
and the strongest available substitute for unreproducible BLEU tables.

Covered lockstep (8 steps each):
  * pooled GRU + SGD/momentum      (reference main.py:96-98,136-152)
  * pooled GRU + Adam              (main.py:99-100)
  * pooled LSTM + Adam             (LSTM/main_lstm.py:100-139)
  * attention GRU + SGD            (Attention/main_attn.py:103-146:
                                    alpha_c penalty, init_h gradients,
                                    shrinking-batch loop)
  * attention LSTM + Adam          (main_attn_LSTM.py: + init_c gradients)
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from show_tell_tpu.models.captioner import CaptionerConfig, split_trainable
from show_tell_tpu.models.convert import (
    attn_decoder_params_from_torch,
    decoder_params_from_torch,
)
from show_tell_tpu.models.encoder import encoder_params_from_torch
from show_tell_tpu.train.optim import make_optimizer
from show_tell_tpu.train.train_step import TrainState, make_train_step

from torch_resnet_oracle import TorchResNet

B, T, E, H, V, L = 6, 10, 12, 16, 30, 2
A = 14  # attention dim
C = 512  # resnet18 feature channels
IMG = 64
STEPS = 8
MOMENTUM = 0.9


def _lr(opt_type):
    return 0.05 if opt_type == "SGD" else 0.01


def make_torch_optimizer(opt_type, params_list, lr):
    if opt_type == "SGD":
        return torch.optim.SGD(params_list, lr=lr, momentum=MOMENTUM)
    return torch.optim.Adam(params_list, lr=lr)


def build_torch_encoder():
    backbone = TorchResNet(18)
    lin = torch.nn.Linear(C, E)
    lin.weight.data.normal_(0, 0.05)
    bn = torch.nn.BatchNorm1d(E, momentum=0.01)
    bn.bias.data.fill_(0)
    return backbone, lin, bn


def encoder_sd(backbone, lin, bn):
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
    return enc_sd


def make_batches(rng, steps=STEPS, full_first=False):
    batches = []
    for _ in range(steps):
        images_u8 = rng.randint(0, 255, (B, IMG, IMG, 3), dtype=np.uint8)
        lengths = np.sort(rng.randint(3, T + 1, B))[::-1].astype(np.int32)
        if full_first:
            # Attention re-enactment: keep batch_size_t >= 1 at every step
            # of the reference's shrinking-batch loop (T == batch max there).
            lengths[0] = T
        captions = rng.randint(4, V, (B, T)).astype(np.int32)
        for i, l in enumerate(lengths):
            captions[i, l:] = 0
        batches.append((images_u8, captions, np.ascontiguousarray(lengths)))
    return batches


def normalize(u8):
    from show_tell_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    return ((u8.astype(np.float32) / 255.0) - np.array(IMAGENET_MEAN, np.float32)) / np.array(
        IMAGENET_STD, np.float32
    )


def run_our_steps(cfg, params, enc_state, opt_type, batches):
    optimizer = make_optimizer(opt_type, _lr(opt_type), MOMENTUM)
    trainable, frozen = split_trainable(params)
    ts = TrainState(
        trainable, frozen, enc_state, optimizer.init(trainable), jax.random.PRNGKey(0), jnp.int32(0)
    )
    step = make_train_step(cfg, optimizer, augment=False)
    losses = []
    for images_u8, captions, lengths in batches:
        ts, loss = step(ts, images_u8, jnp.asarray(captions), jnp.asarray(lengths))
        losses.append(float(loss))
    return losses


# ----------------------- pooled variants (GRU/LSTM) -------------------- #


def build_torch_pooled(cell):
    torch.manual_seed(0)
    backbone, lin, bn = build_torch_encoder()
    emb = torch.nn.Embedding(V, E)
    unit_cls = torch.nn.GRU if cell == "gru" else torch.nn.LSTM
    unit = unit_cls(E, H, L, batch_first=True)
    out = torch.nn.Linear(H, V)
    return backbone, lin, bn, emb, unit, out


def torch_pooled_steps(backbone, lin, bn, emb, unit, out, opt_type, batches, optim=None):
    """Reference training semantics: frozen detached backbone in train
    mode, packed CE over prepended-feature RNN outputs, SGD/Adam over
    decoder + head (main.py:96-102,136-152).  optim: pass an existing
    optimizer to CONTINUE its momentum/Adam state across calls (the
    multi-epoch loop lockstep — our loop keeps one optimizer for the
    whole run and checkpoints restore it across resume)."""
    backbone.train(), lin.train(), bn.train(), emb.train(), unit.train(), out.train()
    trainable = (
        list(emb.parameters()) + list(unit.parameters()) + list(out.parameters())
        + list(lin.parameters()) + list(bn.parameters())
    )
    if optim is None:
        optim = make_torch_optimizer(opt_type, trainable, _lr(opt_type))
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


def _pooled_lockstep(cell, opt_type, steps, data_seed):
    """Shared body: torch model -> converted params -> N lockstep steps;
    returns (our_losses, ref_losses)."""
    backbone, lin, bn, emb, unit, out = build_torch_pooled(cell)

    enc_sd = encoder_sd(backbone, lin, bn)
    dec_sd = {"embeddings.weight": emb.weight}
    for k, v in unit.state_dict().items():
        dec_sd["unit." + k] = v
    dec_sd["linear.weight"], dec_sd["linear.bias"] = out.weight, out.bias

    cfg = CaptionerConfig(cell, 18, E, H, V, L)
    enc_params, enc_state = encoder_params_from_torch(enc_sd, cfg.encoder_config())
    params = {"encoder": enc_params, "decoder": decoder_params_from_torch(dec_sd, L)}

    batches = make_batches(np.random.RandomState(data_seed), steps=steps)
    ref_losses = torch_pooled_steps(
        backbone, lin, bn, emb, unit, out, opt_type,
        [(normalize(im), cap, lens) for im, cap, lens in batches],
    )
    our_losses = run_our_steps(cfg, params, enc_state, opt_type, batches)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-3, atol=1e-3)
    return our_losses, ref_losses


@pytest.mark.parametrize(
    "cell,opt_type",
    [("gru", "SGD"), ("gru", "Adam"), ("lstm", "Adam")],
)
def test_pooled_lockstep_losses_match(cell, opt_type):
    our_losses, _ = _pooled_lockstep(cell, opt_type, steps=STEPS, data_seed=0)
    assert our_losses[-1] != our_losses[0]  # optimizer steps took effect


# --------------------- attention variants (GRU/LSTM) ------------------- #


class TorchAttnModel(torch.nn.Module):
    """Reference RNN_Attn parameterization (Attention/rnn_attn{,_LSTM}.py)."""

    def __init__(self, cell):
        super().__init__()
        self.embeddings = torch.nn.Embedding(V, E)
        unit_cls = torch.nn.GRU if cell == "gru" else torch.nn.LSTM
        self.unit = unit_cls(2 * E, H, L, batch_first=True)
        self.linear = torch.nn.Linear(H, V)
        self.init_h = torch.nn.Linear(C, H)
        if cell == "lstm":
            self.init_c = torch.nn.Linear(C, H)
        self.embed = torch.nn.Linear(C, E)

        class Attn(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder_att = torch.nn.Linear(C, A)
                self.decoder_att = torch.nn.Linear(H, A)
                self.full_att = torch.nn.Linear(A, 1)

            def forward(self, img_feat, hidden_state):
                a1 = self.encoder_att(img_feat)
                a2 = self.decoder_att(hidden_state)
                e = self.full_att(torch.nn.functional.leaky_relu(a1 + a2.unsqueeze(1), 0.2)).squeeze(2)
                alpha = torch.softmax(e, dim=1)
                ctx = (img_feat * alpha.unsqueeze(2)).sum(dim=1)
                return ctx, alpha

        self.attn = Attn()


def torch_attention_steps(backbone, lin, bn, model, cell, opt_type, alpha_c, batches):
    """Reference attention training re-enactment (main_attn.py:103-146 +
    rnn_attn.py:60-76): detached spatial features, shrinking-batch time
    loop (hidden rows of finished sequences dropped), packed CE + the
    doubly-stochastic alpha penalty, dead encoder head registered in the
    optimizer but unused in forward (cnn_attn.py:50, main_attn.py:90)."""
    backbone.train(), model.train(), lin.train(), bn.train()
    trainable = list(model.parameters()) + list(lin.parameters()) + list(bn.parameters())
    optim = make_torch_optimizer(opt_type, trainable, _lr(opt_type))
    loss_fn = torch.nn.CrossEntropyLoss()
    losses = []
    for images, captions, lengths in batches:
        xt = torch.from_numpy(np.transpose(images, (0, 3, 1, 2)).copy())
        with torch.no_grad():
            fmap = backbone.features(xt)  # train-mode BN drift, detached
        feats = fmap.reshape(B, C, -1)  # [B, C, P] row-major (cnn_attn.py:49)
        P = feats.shape[2]
        cap_t = torch.from_numpy(captions.astype(np.int64))
        emb = model.embeddings(cap_t)
        hidden = model.init_h(feats.mean(dim=2)).unsqueeze(1).repeat(1, L, 1)
        if cell == "lstm":
            cstate = model.init_c(feats.mean(dim=2)).unsqueeze(1).repeat(1, L, 1)
        preds = torch.zeros(B, T, V)
        alphas = torch.zeros(B, T, P)
        for t in range(T):
            bt = int((lengths > t).sum())
            ctx, alpha = model.attn(feats[:bt].transpose(1, 2), hidden[:bt, -1, :])
            x = torch.cat([emb[:bt, t], model.embed(ctx)], dim=1).unsqueeze(1)
            if cell == "gru":
                out, h2 = model.unit(x, hidden[:bt].transpose(0, 1).contiguous())
                hidden = h2.transpose(0, 1)  # shrinks, like the reference
            else:
                out, (h2, c2) = model.unit(
                    x,
                    (hidden[:bt].transpose(0, 1).contiguous(), cstate[:bt].transpose(0, 1).contiguous()),
                )
                hidden = h2.transpose(0, 1)
                cstate = c2.transpose(0, 1)
            preds_t = model.linear(out.squeeze(1))
            preds = preds.clone()
            alphas = alphas.clone()
            preds[:bt, t] = preds_t
            alphas[:bt, t] = alpha
        packed_preds = torch.nn.utils.rnn.pack_padded_sequence(preds, list(lengths), batch_first=True)[0]
        targets = torch.nn.utils.rnn.pack_padded_sequence(cap_t, list(lengths), batch_first=True)[0]
        loss = loss_fn(packed_preds, targets)
        loss = loss + alpha_c * ((1.0 - alphas.sum(dim=1)) ** 2).mean()
        optim.zero_grad()
        loss.backward()
        optim.step()
        losses.append(float(loss))
    return losses


@pytest.mark.parametrize(
    "cell,opt_type",
    [("gru", "SGD"), ("lstm", "Adam")],
)
def test_attention_lockstep_losses_match(cell, opt_type):
    torch.manual_seed(1)
    backbone, lin, bn = build_torch_encoder()
    model = TorchAttnModel(cell)
    alpha_c = 1.0

    variant = "attn" if cell == "gru" else "attn_lstm"
    cfg = CaptionerConfig(
        variant, 18, E, H, V, L, nos_filters=C, attn_dim=A, alpha_c=alpha_c
    )
    enc_params, enc_state = encoder_params_from_torch(encoder_sd(backbone, lin, bn), cfg.encoder_config())
    params = {"encoder": enc_params, "decoder": attn_decoder_params_from_torch(model.state_dict(), L)}

    batches = make_batches(np.random.RandomState(3), full_first=True)
    ref_losses = torch_attention_steps(
        backbone, lin, bn, model, cell, opt_type, alpha_c,
        [(normalize(im), cap, lens) for im, cap, lens in batches],
    )
    our_losses = run_our_steps(cfg, params, enc_state, opt_type, batches)

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-3, atol=1e-3)
    assert our_losses[-1] != our_losses[0]


class _RecordingLoader:
    """Wraps the real DataLoader; records exactly the batches the train
    loop consumed (per epoch) so the torch re-enactment can replay the
    identical stream regardless of shuffling."""

    def __init__(self, inner):
        self.inner = inner
        self.epochs = []

    def __len__(self):
        return len(self.inner)

    def __iter__(self):
        rec = []
        self.epochs.append(rec)
        for b in self.inner:
            rec.append(b)
            yield b


def _replay_preprocessed(epochs, seed):
    """Re-derive the exact per-step augment keys the jitted train step
    consumed (ts.rng starts at split(PRNGKey(seed))[1]; each step does
    (next_rng, k_aug) = split(rng) — train_step.py) and run the SAME
    device-side preprocessing (random flips + normalize), yielding the
    float images the step saw.  A resume run restarts the chain: the
    checkpoint restores weights/optimizer/BN but not the rng
    (checkpoint.py restore_train_state keeps the fresh ts.rng)."""
    from show_tell_tpu.data.transforms import preprocess_images

    rng = jax.random.split(jax.random.PRNGKey(seed))[1]
    out = []
    for batches in epochs:
        ep = []
        for _, images_u8, captions, lengths in batches:
            rng, k_aug = jax.random.split(rng)
            imgs = np.asarray(preprocess_images(jnp.asarray(images_u8), k_aug, augment=True))
            ep.append((imgs, np.asarray(captions), np.asarray(lengths)))
        out.append(ep)
    return out


def _epoch_losses(out_dir, epoch):
    import pickle

    with open(os.path.join(out_dir, "model_%d_metrics.ckpt" % epoch), "rb") as f:
        return [float(x) for x in pickle.load(f)["train_loss"]]


def test_full_loop_two_epoch_lockstep_with_resume(tmp_path):
    """THE composition check (loop o step o loader): >=2 epochs driven by
    train/loop.py itself on the mini-COCO fixture — crossing epoch-end
    checkpoints, the in-training eval cadence (epoch 2), and a resume
    (faithful epoch-0 restart, main.py:116-170 semantics) — with every
    per-step loss equal to a torch re-enactment of the reference fed the
    identical batches (recorded from the real loader) and the identical
    augmented pixels (replayed from the rng chain).  In-training eval
    must NOT perturb the trajectory (it uses its own key and eval-mode
    BN): epoch 3 still matches after the epoch-2 eval ran."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import build_mini_coco

    from show_tell_tpu.data.dataset import get_data_loader
    from show_tell_tpu.train.loop import train
    from show_tell_tpu.vocab.vocabulary import get_vocabulary

    data_root = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    build_mini_coco(data_root)
    ann = os.path.join(data_root, "annotations", "captions_train2014.json")
    img_dir = os.path.join(data_root, "train2014")
    params = {
        "data_dir": data_root,
        "train_ann_path": "annotations/captions_train2014.json",
        "vocab_path": os.path.join(out_dir, "vocab.pkl"),
        "vocab_threshold": 1,
        "ann_path_train": ann,
        "data_path_train": img_dir,
        "ann_path_test": ann,
        "data_path_test": img_dir,
        "output_dir": out_dir,
        "batch_size": 4,
        "shuffle": 1,
        "num_workers": 0,
        "num_epochs": 3,
        "optimizer_type": "SGD",
        "lr": 0.05,
        "momentum": MOMENTUM,
        "variant": "gru",
        "resnet_version": 18,
        "embedding_length": E,
        "num_hidden_units": H,
        "num_layers": L,
        "seed": 1,
        "resume_training": 0,
        "sub_batch_test": 1,
        "dp": 1,
        "use_pallas": 0,
    }
    vocab = get_vocabulary("MSCOCO", params)
    Vv = len(vocab)

    # Torch twin with identical weights (converted, like the raw-step tests).
    torch.manual_seed(0)
    backbone, lin, bn = build_torch_encoder()
    emb = torch.nn.Embedding(Vv, E)
    unit = torch.nn.GRU(E, H, L, batch_first=True)
    out = torch.nn.Linear(H, Vv)
    enc_sd = encoder_sd(backbone, lin, bn)
    dec_sd = {"embeddings.weight": emb.weight}
    for k, v in unit.state_dict().items():
        dec_sd["unit." + k] = v
    dec_sd["linear.weight"], dec_sd["linear.bias"] = out.weight, out.bias
    cfg = CaptionerConfig("gru", 18, E, H, Vv, L)
    enc_params, enc_state = encoder_params_from_torch(enc_sd, cfg.encoder_config())
    jx_params = {"encoder": enc_params, "decoder": decoder_params_from_torch(dec_sd, L)}

    train_loader = get_data_loader(vocab, params, "train")
    test_loader = get_data_loader(vocab, params, "test")

    rec = _RecordingLoader(train_loader)
    train(params, vocab, rec, test_data_loader=test_loader, eval_every_epochs=2,
          init_params_state=(jx_params, enc_state))
    ours_run1 = [_epoch_losses(out_dir, ep) for ep in (1, 2, 3)]

    # Resume: faithful epoch-0 restart — optimizer/BN/weights restored
    # from model_3, the new epoch overwrites model_1 in the same out dir.
    params2 = dict(params, num_epochs=1, resume_training=1, resume_model_train="auto")
    rec2 = _RecordingLoader(train_loader)
    train(params2, vocab, rec2, init_params_state=None)
    ours_resume = _epoch_losses(out_dir, 1)

    # ---- torch re-enactment over the recorded batches ----
    replay1 = _replay_preprocessed(rec.epochs, params["seed"])
    replay2 = _replay_preprocessed(rec2.epochs, params["seed"])  # fresh rng chain
    backbone.train(), lin.train(), bn.train(), emb.train(), unit.train(), out.train()
    # ONE optimizer for the whole trajectory: our loop keeps a single
    # optimizer across epochs and the resume restores its state from the
    # checkpoint, so torch's momentum buffers must persist across every
    # epoch AND the resume boundary.
    optim = make_torch_optimizer(
        "SGD",
        list(emb.parameters()) + list(unit.parameters()) + list(out.parameters())
        + list(lin.parameters()) + list(bn.parameters()),
        params["lr"],
    )
    ref1, ref2 = [], []
    for replay, sink in ((replay1, ref1), (replay2, ref2)):
        for ep in replay:
            sink.append(
                torch_pooled_steps(backbone, lin, bn, emb, unit, out, "SGD", ep, optim=optim)
            )
    flat_ref1 = [l for ep in ref1 for l in ep]
    flat_ours1 = [l for ep in ours_run1 for l in ep]
    np.testing.assert_allclose(flat_ours1, flat_ref1, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours_resume, ref2[0], rtol=2e-3, atol=2e-3)
    assert flat_ours1[-1] < flat_ours1[0]  # it actually trained


def test_pooled_lockstep_long_run():
    """40-step lockstep (5x the standard case): accumulated divergence
    between our jitted train step and the torch reference stays within
    the same tolerance over a longer trajectory — SGD momentum, BN
    running-stat drift, and masked-CE normalization compound for 40
    optimizer steps without drifting apart."""
    our_losses, _ = _pooled_lockstep("gru", "SGD", steps=40, data_seed=7)
    # The trajectory must actually be training, not flat.
    assert our_losses[-1] < our_losses[0]
