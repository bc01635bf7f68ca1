"""GRU / LSTM cells and stacks with PyTorch gate conventions.

The reference's hot loop is cuDNN's fused multi-layer RNN
(``nn.GRU``/``nn.LSTM``, reference rnn.py:24, LSTM/rnn_lstm.py:22).  The
TPU-native equivalent keeps the time dimension inside ``lax.scan`` so XLA
compiles one program per sequence, and computes each cell step as two
MXU matmuls (all gates at once) plus fused VPU elementwise gate math.

Numerics match PyTorch bit-for-bit in fp32 given converted weights:
  * GRU gate order (r, z, n), with the reset gate applied to the
    *hidden-side affine* (torch convention):
        r = sigma(x Wir^T + bir + h Whr^T + bhr)
        z = sigma(x Wiz^T + biz + h Whz^T + bhz)
        n = tanh (x Win^T + bin + r * (h Whn^T + bhn))
        h' = (1 - z) n + z h
  * LSTM gate order (i, f, g, o), double biases.

Weights are stored transposed relative to torch ([in, 3H]/[in, 4H]) so the
step is ``x @ w`` — the layout the MXU wants.  Initialization matches
torch's RNN reset_parameters: U(-1/sqrt(H), 1/sqrt(H)) for every tensor.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=dtype)


def init_rnn_params(
    key: jax.Array,
    cell_type: str,
    input_dim: int,
    hidden_dim: int,
    num_layers: int,
    dtype=jnp.float32,
) -> List[Dict[str, jax.Array]]:
    """Per-layer {w_ih [in,GH], w_hh [H,GH], b_ih [GH], b_hh [GH]}."""
    gates = 3 if cell_type == "gru" else 4
    bound = 1.0 / (hidden_dim ** 0.5)
    layers = []
    for layer in range(num_layers):
        in_dim = input_dim if layer == 0 else hidden_dim
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        layers.append(
            {
                "w_ih": _uniform(k1, (in_dim, gates * hidden_dim), bound, dtype),
                "w_hh": _uniform(k2, (hidden_dim, gates * hidden_dim), bound, dtype),
                "b_ih": _uniform(k3, (gates * hidden_dim,), bound, dtype),
                "b_hh": _uniform(k4, (gates * hidden_dim,), bound, dtype),
            }
        )
    return layers


def gru_cell(layer: Dict[str, jax.Array], x: jax.Array, h: jax.Array) -> jax.Array:
    """One GRU step. x: [B, in], h: [B, H] -> h': [B, H]."""
    H = h.shape[-1]
    gx = jnp.dot(x, layer["w_ih"], preferred_element_type=jnp.float32) + layer["b_ih"]
    gh = jnp.dot(h, layer["w_hh"], preferred_element_type=jnp.float32) + layer["b_hh"]
    r = jax.nn.sigmoid(gx[..., :H] + gh[..., :H])
    z = jax.nn.sigmoid(gx[..., H : 2 * H] + gh[..., H : 2 * H])
    n = jnp.tanh(gx[..., 2 * H :] + r * gh[..., 2 * H :])
    # Accumulate in f32 on the MXU, carry in the incoming state dtype
    # (bf16 in fast-serving mode) so scan carries keep a stable type.
    return ((1.0 - z) * n + z * h).astype(h.dtype)


def lstm_cell(
    layer: Dict[str, jax.Array], x: jax.Array, hc: Tuple[jax.Array, jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """One LSTM step. Returns (h', c')."""
    h, c = hc
    H = h.shape[-1]
    g = (
        jnp.dot(x, layer["w_ih"], preferred_element_type=jnp.float32)
        + layer["b_ih"]
        + jnp.dot(h, layer["w_hh"], preferred_element_type=jnp.float32)
        + layer["b_hh"]
    )
    i = jax.nn.sigmoid(g[..., :H])
    f = jax.nn.sigmoid(g[..., H : 2 * H])
    gg = jnp.tanh(g[..., 2 * H : 3 * H])
    o = jax.nn.sigmoid(g[..., 3 * H :])
    c2 = f * c + i * gg
    h2 = o * jnp.tanh(c2)
    return h2.astype(h.dtype), c2.astype(c.dtype)


def stack_step_gru(layers: List[Dict[str, jax.Array]], x: jax.Array, hs: jax.Array):
    """One step through all layers. hs: [L, B, H]. Returns (top_h, new_hs)."""
    new_hs = []
    inp = x
    for l, layer in enumerate(layers):
        h2 = gru_cell(layer, inp, hs[l])
        new_hs.append(h2)
        inp = h2
    return inp, jnp.stack(new_hs, 0)


def stack_step_lstm(
    layers: List[Dict[str, jax.Array]],
    x: jax.Array,
    state: Tuple[jax.Array, jax.Array],
):
    """One step through all layers. state: (hs [L,B,H], cs [L,B,H])."""
    hs, cs = state
    new_hs, new_cs = [], []
    inp = x
    for l, layer in enumerate(layers):
        h2, c2 = lstm_cell(layer, inp, (hs[l], cs[l]))
        new_hs.append(h2)
        new_cs.append(c2)
        inp = h2
    return inp, (jnp.stack(new_hs, 0), jnp.stack(new_cs, 0))


def init_state(cell_type: str, num_layers: int, batch: int, hidden: int, dtype=jnp.float32):
    hs = jnp.zeros((num_layers, batch, hidden), dtype)
    if cell_type == "gru":
        return hs
    return (hs, jnp.zeros((num_layers, batch, hidden), dtype))


def stack_step(cell_type: str):
    return stack_step_gru if cell_type == "gru" else stack_step_lstm


def _gru_cell_pre(layer, gx, h):
    """GRU step with the x-side affine ``gx`` precomputed."""
    H = h.shape[-1]
    gh = jnp.dot(h, layer["w_hh"], preferred_element_type=jnp.float32) + layer["b_hh"]
    r = jax.nn.sigmoid(gx[..., :H] + gh[..., :H])
    z = jax.nn.sigmoid(gx[..., H : 2 * H] + gh[..., H : 2 * H])
    n = jnp.tanh(gx[..., 2 * H :] + r * gh[..., 2 * H :])
    return ((1.0 - z) * n + z * h).astype(h.dtype)


def _lstm_cell_pre(layer, gx, hc):
    h, c = hc
    H = h.shape[-1]
    g = gx + jnp.dot(h, layer["w_hh"], preferred_element_type=jnp.float32) + layer["b_hh"]
    i = jax.nn.sigmoid(g[..., :H])
    f = jax.nn.sigmoid(g[..., H : 2 * H])
    gg = jnp.tanh(g[..., 2 * H : 3 * H])
    o = jax.nn.sigmoid(g[..., 3 * H :])
    c2 = f * c + i * gg
    h2 = o * jnp.tanh(c2)
    return h2.astype(h.dtype), c2.astype(c.dtype)


def rnn_scan(
    layers: List[Dict[str, jax.Array]],
    cell_type: str,
    inputs: jax.Array,
    state: Any,
    lengths: jax.Array = None,
):
    """Run the stack over time. inputs: [B, T, in] -> outputs [B, T, H].

    Layer-major (cuDNN-style, done the XLA way): per layer, the input-side
    gate affine for ALL timesteps is one big MXU matmul hoisted out of the
    scan ([B*T, in] x [in, gates*H]); only the sequential hidden-side
    matmul + gate math lives in the time loop.  Identical math to the
    step-major form — layer l at time t depends only on layer l-1's
    output at time t.

    When ``lengths`` is given, state updates freeze for finished sequences
    (mask semantics equivalent to torch's shrinking packed batches /
    reference Attention rnn_attn.py:68-74); outputs at t >= length are
    whatever the frozen cell produced and must be masked by the caller.
    """
    is_gru = cell_type == "gru"
    cell_pre = _gru_cell_pre if is_gru else _lstm_cell_pre
    alive_seq = None
    if lengths is not None:
        T = inputs.shape[1]
        alive_seq = (jnp.arange(T)[:, None] < lengths[None, :])[..., None]  # [T, B, 1]

    seq = inputs  # [B, T, in]
    finals = []
    for l, layer in enumerate(layers):
        gx_all = jnp.dot(seq, layer["w_ih"], preferred_element_type=jnp.float32) + layer["b_ih"]
        gx_all = jnp.swapaxes(gx_all, 0, 1)  # [T, B, GH]
        st0 = state[l] if is_gru else (state[0][l], state[1][l])

        def body(st, xt):
            gx, alive = xt if alive_seq is not None else (xt, None)
            new_st = cell_pre(layer, gx, st)
            if alive is not None:
                new_st = jax.tree.map(lambda n, o: jnp.where(alive, n, o), new_st, st)
            top = new_st if is_gru else new_st[0]
            return new_st, top

        xs = (gx_all, alive_seq) if alive_seq is not None else gx_all
        final, outs = jax.lax.scan(body, st0, xs)
        finals.append(final)
        seq = jnp.swapaxes(outs, 0, 1)  # [B, T, H] feeds the next layer

    if is_gru:
        final_state = jnp.stack(finals, 0)
    else:
        final_state = (jnp.stack([f[0] for f in finals], 0), jnp.stack([f[1] for f in finals], 0))
    return seq, final_state
