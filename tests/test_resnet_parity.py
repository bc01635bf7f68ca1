"""JAX ResNet vs torch oracle: forward parity, BN train-mode stats, heads."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from show_tell_tpu.models.encoder import (
    EncoderConfig,
    encoder_forward,
    encoder_params_from_torch,
    init_encoder_params,
)
from show_tell_tpu.models.resnet import (
    init_resnet_params,
    resnet_forward,
    resnet_params_from_torch,
)

from torch_resnet_oracle import TorchResNet


def _nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


@pytest.mark.parametrize("version", [18, 50])
def test_backbone_eval_parity(version):
    torch.manual_seed(0)
    model = TorchResNet(version).eval()
    params, state = resnet_params_from_torch(model.state_dict())
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = model.features(torch.from_numpy(_nchw(x))).numpy()  # [B,C,h,w]
    ours, _ = resnet_forward(params, state, version, jnp.asarray(x), training=False)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-4, atol=1e-4)


def test_backbone_train_mode_bn_parity():
    """Train mode: batch-stat normalization + running-stat updates match."""
    version = 18
    torch.manual_seed(1)
    model = TorchResNet(version).train()
    params, state = resnet_params_from_torch(model.state_dict())
    x = np.random.RandomState(1).randn(4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = model.features(torch.from_numpy(_nchw(x))).numpy()
    ours, new_state = resnet_forward(params, state, version, jnp.asarray(x), training=True)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=1e-3, atol=1e-3
    )
    # Running stats after one train-mode step must match torch's update.
    sd = model.state_dict()
    np.testing.assert_allclose(
        np.asarray(new_state["bn1.running_mean"]), sd["bn1.running_mean"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state["layer2.0.bn2.running_var"]),
        sd["layer2.0.bn2.running_var"].numpy(),
        rtol=1e-4,
        atol=1e-5,
    )


def test_encoder_pooled_parity():
    """Full reference cnn.ResNet equivalent: backbone+avgpool+Linear+BN1d."""
    version = 18
    torch.manual_seed(2)
    backbone = TorchResNet(version).eval()

    lin = torch.nn.Linear(512, 32)
    lin.weight.data.normal_(0, 0.05)
    bn = torch.nn.BatchNorm1d(32, momentum=0.01)
    bn.bias.data.fill_(0)
    lin.eval(), bn.eval()

    sd = {}
    # Reference wraps children()[:-1] in Sequential -> model.{0,1,4,5,6,7}.*
    idx_map = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5", "layer3": "6", "layer4": "7"}
    for k, v in backbone.state_dict().items():
        if k.startswith("fc."):
            continue
        root = k.split(".")[0]
        sd["model." + idx_map[root] + k[len(root):]] = v
    for k, v in lin.state_dict().items():
        sd["linear_secondlast_layer." + k] = v
    for k, v in bn.state_dict().items():
        sd["last_layer." + k] = v

    cfg = EncoderConfig(resnet_version=version, embed_dim=32, spatial=False)
    params, state = encoder_params_from_torch(sd, cfg)

    x = np.random.RandomState(2).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        f = backbone.features(torch.from_numpy(_nchw(x)))
        pooled = backbone.avgpool(f).flatten(1)
        ref = bn(lin(pooled)).numpy()
    ours, _ = encoder_forward(params, state, cfg, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_encoder_spatial_layout():
    """Spatial mode returns [B, C, H*W] in torch row-major position order."""
    cfg = EncoderConfig(resnet_version=18, embed_dim=16, spatial=True)
    params, state = init_encoder_params(jax.random.PRNGKey(0), cfg)
    x = np.random.RandomState(3).randn(2, 64, 64, 3).astype(np.float32)
    feats, _ = encoder_forward(params, state, cfg, jnp.asarray(x), training=False)
    fmap, _ = resnet_forward(params["resnet"], state["resnet"], 18, jnp.asarray(x), False)
    B, H, W, C = fmap.shape
    assert feats.shape == (B, C, H * W)
    np.testing.assert_allclose(
        np.asarray(feats)[0, :, 1], np.asarray(fmap)[0, 0, 1, :], rtol=1e-6
    )


def test_init_shapes_match_torch():
    torch.manual_seed(3)
    model = TorchResNet(34)
    params, state = init_resnet_params(jax.random.PRNGKey(0), 34)
    ref_keys = {
        k for k in model.state_dict() if not k.startswith("fc.") and "num_batches" not in k
    }
    ours = set(params) | set(state)
    assert ours == ref_keys
    for k in params:
        ref_shape = tuple(model.state_dict()[k].shape)
        if params[k].ndim == 4:
            h, w, ci, co = params[k].shape
            assert (co, ci, h, w) == ref_shape, k
        else:
            assert tuple(params[k].shape) == ref_shape, k
