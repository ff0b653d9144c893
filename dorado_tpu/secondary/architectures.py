"""Secondary (polish/variant) model zoo in JAX.

Re-implements the reference's read-level architectures
(dorado/secondary/architectures/):

  - ModelLatentSpaceLSTM  (model_latent_space_lstm.cpp:122-281)
  - ModelSlotAttentionConsensus (model_slot_attention_consensus.cpp:17-463)
  - ModelVariantPerceiver (model_variant_perceiver.cpp:29-675)

plus `model_factory` matching model_factory.cpp:27-337 kwargs. All models
consume a read-level feature tensor [batch, positions, reads, features] with
a feature-column map naming the base/qual/strand/mapq(/dwell/haplotag/
snp_qv) columns (features/encoder_read_alignment.cpp).

Everything is expressed as fixed-shape jnp ops (scans only inside LSTMs), so
a whole window batch compiles to a single XLA program; the only sequential
host step is the slot-attention model's adjacency phasing pass, which is an
inherently serial argmax walk over positions (kept in numpy, it consumes
softmax outputs, not activations).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

DEFAULT_FEATURE_COLUMNS = {
    "base": 0,
    "qual": 1,
    "strand": 2,
    "mapq": 3,
    "dwell": 4,
    "haplotag": 5,
    "snp_qv": 6,
}

# ---------------------------------------------------------------------------
# shared building blocks
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_linear(key, in_features, out_features, bias=True):
    k1, k2 = jax.random.split(key)
    s = 1.0 / np.sqrt(in_features)
    p = {"w": _uniform(k1, (out_features, in_features), s)}
    if bias:
        p["b"] = _uniform(k2, (out_features,), s)
    return p


def linear(p, x):
    y = x @ p["w"].T
    return y + p["b"] if "b" in p else y


def init_embedding(key, num_embeddings, dim):
    return {"w": jax.random.normal(key, (num_embeddings, dim), jnp.float32)}


def embedding(p, idx):
    return p["w"][idx.astype(jnp.int32)]


def init_layer_norm(dim):
    return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def layer_norm(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["g"] + p["b"]


def init_rms_norm(dim):
    return {"w": jnp.ones((dim,))}


def rms_norm(p, x, eps=1e-5):
    """nn/RMSNorm.cpp:14-18."""
    rstd = jax.lax.rsqrt((x * x).mean(-1, keepdims=True) + eps)
    return x * rstd * p["w"]


def init_conv1d(key, in_ch, out_ch, k):
    k1, k2 = jax.random.split(key)
    s = 1.0 / np.sqrt(in_ch * k)
    return {"w": _uniform(k1, (out_ch, in_ch, k), s), "b": _uniform(k2, (out_ch,), s)}


def conv1d_same(p, x):
    """x [N, C, L] -> [N, C_out, L], symmetric same padding (odd k)."""
    k = p["w"].shape[-1]
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=[((k - 1) // 2, (k - 1) // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + p["b"][None, :, None]


def init_batch_norm(ch):
    return {
        "g": jnp.ones((ch,)),
        "b": jnp.zeros((ch,)),
        "mean": jnp.zeros((ch,)),
        "var": jnp.ones((ch,)),
    }


def batch_norm1d(p, x, eps=1e-5):
    """Inference-mode BatchNorm1d over [N, C, L] (running stats)."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"][None, :, None]) * (inv * p["g"])[None, :, None] + p["b"][
        None, :, None
    ]


def init_read_level_conv(key, num_in, kernel_sizes, channels):
    """Conv1d->ReLU->BatchNorm stack (model_latent_space_lstm.cpp:17-57).
    The reference's optional expansion layer is registered but never applied
    inside the conv forward — callers apply their own expansion linears."""
    layers = []
    keys = jax.random.split(key, len(kernel_sizes))
    in_ch = num_in
    for k, c, kk in zip(kernel_sizes, channels, keys):
        if k % 2 == 0:
            raise ValueError("Kernel sizes must be odd for symmetric padding")
        layers.append({"conv": init_conv1d(kk, in_ch, c, k), "bn": init_batch_norm(c)})
        in_ch = c
    return {"layers": layers}


def read_level_conv(p, x):
    for layer in p["layers"]:
        x = batch_norm1d(layer["bn"], jax.nn.relu(conv1d_same(layer["conv"], x)))
    return x


def init_lstm_layer(key, input_size, hidden):
    keys = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(hidden)
    return {
        "w_ih": _uniform(keys[0], (4 * hidden, input_size), s),
        "w_hh": _uniform(keys[1], (4 * hidden, hidden), s),
        "b_ih": _uniform(keys[2], (4 * hidden,), s),
        "b_hh": _uniform(keys[3], (4 * hidden,), s),
    }


def lstm_direction(p, x, reverse=False):
    """Torch-parity LSTM over [N, T, C] (gate order i, f, g, o)."""
    n, t, _ = x.shape
    hidden = p["w_hh"].shape[1]
    xp = jnp.einsum("ntc,gc->ntg", x, p["w_ih"]) + p["b_ih"] + p["b_hh"]
    if reverse:
        xp = jnp.flip(xp, axis=1)
    xp_t = jnp.swapaxes(xp, 0, 1)

    def step(carry, xg):
        h, c = carry
        gates = xg + h @ p["w_hh"].T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((n, hidden), x.dtype)
    _, hs = jax.lax.scan(step, (h0, h0), xp_t)
    out = jnp.swapaxes(hs, 0, 1)
    return jnp.flip(out, axis=1) if reverse else out


def init_bidir_lstm(key, input_size, hidden, num_layers):
    layers = []
    keys = jax.random.split(key, num_layers * 2)
    in_size = input_size
    for i in range(num_layers):
        layers.append(
            {
                "fwd": init_lstm_layer(keys[2 * i], in_size, hidden),
                "rev": init_lstm_layer(keys[2 * i + 1], in_size, hidden),
            }
        )
        in_size = 2 * hidden
    return {"layers": layers}


def bidir_lstm(p, x):
    for layer in p["layers"]:
        x = jnp.concatenate(
            [
                lstm_direction(layer["fwd"], x),
                lstm_direction(layer["rev"], x, reverse=True),
            ],
            axis=-1,
        )
    return x


def init_gru_cell(key, input_size, hidden):
    keys = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(hidden)
    return {
        "w_ih": _uniform(keys[0], (3 * hidden, input_size), s),
        "w_hh": _uniform(keys[1], (3 * hidden, hidden), s),
        "b_ih": _uniform(keys[2], (3 * hidden,), s),
        "b_hh": _uniform(keys[3], (3 * hidden,), s),
    }


def gru_cell(p, x, h):
    """Torch GRUCell (gate order r, z, n)."""
    xg = x @ p["w_ih"].T + p["b_ih"]
    hg = h @ p["w_hh"].T + p["b_hh"]
    xr, xz, xn = jnp.split(xg, 3, axis=-1)
    hr, hz, hn = jnp.split(hg, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def init_swiglu(key, in_features, hidden_features, bias=False):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, in_features, 2 * hidden_features, bias),
        "fc2": init_linear(k2, hidden_features, in_features, bias),
    }


def swiglu(p, x):
    """model_variant_perceiver.cpp:29-48: fc1 -> (y, gate); silu(gate)*y."""
    t = linear(p["fc1"], x)
    y, gate = jnp.split(t, 2, axis=-1)
    return linear(p["fc2"], jax.nn.silu(gate) * y)


def _scaled_feature(x, column):
    return (x[..., column] / 25.0 - 1.0)[..., None]


def _mean_pool(x, non_empty_mask):
    """MeanPoolerImpl (model_latent_space_lstm.cpp:92-97):
    x [b, d, p, C], mask [b, d] -> [b, p, C]."""
    depths = non_empty_mask.sum(-1)[:, None, None]
    return (x * non_empty_mask[:, :, None, None]).sum(1) / depths


# ---------------------------------------------------------------------------
# ModelLatentSpaceLSTM
# ---------------------------------------------------------------------------


@dataclass
class LatentSpaceLSTMConfig:
    num_classes: int = 5
    lstm_size: int = 128
    cnn_size: int = 128
    kernel_sizes: tuple = (1, 17)
    pooler_type: str = "mean"
    use_dwells: bool = False
    bases_alphabet_size: int = 6
    bases_embedding_size: int = 6
    bidirectional: bool = True
    feature_columns: dict = field(default_factory=lambda: dict(DEFAULT_FEATURE_COLUMNS))


def init_latent_space_lstm(key, cfg: LatentSpaceLSTMConfig) -> Params:
    keys = jax.random.split(key, 7)
    conv_in = cfg.bases_embedding_size + (2 if cfg.use_dwells else 1)
    if not cfg.bidirectional:
        raise NotImplementedError("unidirectional ReversibleLSTM stack: not used by released models")
    return {
        "base_embedder": init_embedding(keys[0], cfg.bases_alphabet_size, cfg.bases_embedding_size),
        "strand_embedder": init_embedding(keys[1], 3, cfg.bases_embedding_size),
        "read_level_conv": init_read_level_conv(
            keys[2], conv_in, cfg.kernel_sizes, [cfg.cnn_size] * len(cfg.kernel_sizes)
        ),
        "pre_pool_expansion_layer": init_linear(keys[3], cfg.cnn_size, cfg.lstm_size),
        "lstm": init_bidir_lstm(keys[4], cfg.lstm_size, cfg.lstm_size, 2),
        "linear": init_linear(keys[5], 2 * cfg.lstm_size, cfg.num_classes),
    }


def latent_space_lstm_forward(params: Params, x: jnp.ndarray, cfg: LatentSpaceLSTMConfig):
    """x [b, p, d, f] -> logits [b, p, num_classes]
    (model_latent_space_lstm.cpp:209-281)."""
    cols = cfg.feature_columns
    non_empty = x.sum(axis=(1, -1)) != 0  # [b, d]

    emb = embedding(params["base_embedder"], x[..., cols["base"]])
    emb = emb + embedding(params["strand_embedder"], x[..., cols["strand"]] + 1)
    feats = [emb, _scaled_feature(x, cols["qual"])]
    if cfg.use_dwells:
        feats.append(x[..., cols["dwell"]][..., None])
    h = jnp.concatenate(feats, axis=-1)  # [b, p, d, C]

    h = jnp.transpose(h, (0, 2, 3, 1))  # [b, d, C, p]
    b, d, c, p = h.shape
    h = h.reshape(b * d, c, p)
    h = read_level_conv(params["read_level_conv"], h)
    h = jnp.transpose(h, (0, 2, 1))  # [b*d, p, cnn]
    h = linear(params["pre_pool_expansion_layer"], h)
    h = h.reshape(b, d, p, cfg.lstm_size)
    h = _mean_pool(h, non_empty)  # [b, p, lstm]
    h = bidir_lstm(params["lstm"], h)
    return linear(params["linear"], h)


# ---------------------------------------------------------------------------
# ModelSlotAttentionConsensus
# ---------------------------------------------------------------------------


@dataclass
class SlotAttentionConfig:
    num_slots: int = 2
    classes_per_slot: int = 5
    read_embedding_size: int = 128
    cnn_size: int = 128
    kernel_sizes: tuple = (1, 17)
    pooler_type: str = "mean"
    use_mapqc: bool = False
    use_dwells: bool = False
    use_haplotags: bool = False
    use_snp_qv: bool = False
    bases_alphabet_size: int = 6
    bases_embedding_size: int = 6
    add_lstm: bool = False
    use_reference: bool = False
    sa_iters: int = 3
    sa_epsilon: float = 1e-8
    sa_hidden_dim: int = 128
    feature_columns: dict = field(default_factory=lambda: dict(DEFAULT_FEATURE_COLUMNS))

    MAX_HAPLOTAGS = 16


def init_slot_attention_block(key, num_slots, dim, hidden_dim):
    keys = jax.random.split(key, 8)
    hidden_dim = max(dim, hidden_dim)
    # xavier-uniform'd logsigma (model_slot_attention_consensus.cpp:28-30)
    bound = float(np.sqrt(6.0 / (1 + dim)))
    return {
        "slots_mu": jax.random.normal(keys[0], (1, 1, dim)),
        "slots_logsigma": _uniform(keys[1], (1, 1, dim), bound),
        "to_q": init_linear(keys[2], dim, dim),
        "to_k": init_linear(keys[3], dim, dim),
        "to_v": init_linear(keys[4], dim, dim),
        "gru": init_gru_cell(keys[5], dim, dim),
        "mlp": {
            "fc1": init_linear(keys[6], dim, hidden_dim),
            "fc2": init_linear(keys[7], hidden_dim, dim),
        },
        "norm_input": init_layer_norm(dim),
        "norm_slots": init_layer_norm(dim),
        "norm_pre_ff": init_layer_norm(dim),
        # deterministic fixed noise; shipped inside trained checkpoints
        # (registered parameter, model_slot_attention_consensus.cpp:53-69)
        "fixed_noise": jnp.asarray(
            np.random.RandomState(42).standard_normal((1, num_slots, dim)), jnp.float32
        ),
    }


def slot_attention(p, x, mask, num_slots, iters=3, epsilon=1e-8):
    """SlotAttentionImpl::forward (model_slot_attention_consensus.cpp:72-146).

    x [B, n, d]; mask [B, n] True = empty position. Returns (slots, attn)."""
    b, n, d = x.shape
    scale = d ** -0.5
    mask3 = jnp.broadcast_to(mask[:, None, :], (b, num_slots, n))
    bias = jnp.where(mask3, -jnp.inf, 0.0)

    slots = p["slots_mu"] + jnp.exp(p["slots_logsigma"]) * p["fixed_noise"]
    slots = jnp.broadcast_to(slots, (b, num_slots, d))

    x = layer_norm(p["norm_input"], x)
    k = linear(p["to_k"], x)
    v = linear(p["to_v"], x)

    attn = jnp.zeros((b, num_slots, n), x.dtype)
    for _ in range(iters):
        slots_prev = slots
        slots = layer_norm(p["norm_slots"], slots)
        q = linear(p["to_q"], slots)
        dots = jnp.einsum("bsd,bnd->bsn", q, k) * scale + bias
        attn = jax.nn.softmax(dots, axis=1) + epsilon  # softmax over SLOTS
        attn = jnp.where(mask3, 0.0, attn)
        denom = jnp.nansum(attn, axis=-1, keepdims=True)
        attn = attn / denom
        updates = jnp.einsum("bsn,bnd->bsd", attn, v)
        slots = gru_cell(
            p["gru"], updates.reshape(-1, d), slots_prev.reshape(-1, d)
        ).reshape(b, num_slots, d)
        ff = linear(p["mlp"]["fc2"], jax.nn.relu(linear(p["mlp"]["fc1"], layer_norm(p["norm_pre_ff"], slots))))
        slots = slots + ff
    return slots, attn


def init_slot_attention_consensus(key, cfg: SlotAttentionConfig) -> Params:
    keys = jax.random.split(key, 8)
    conv_in = cfg.bases_embedding_size + (
        1 + cfg.use_dwells + cfg.use_mapqc + cfg.use_snp_qv
    )
    params = {
        "base_embedder": init_embedding(keys[0], cfg.bases_alphabet_size, cfg.bases_embedding_size),
        "haplotag_embedder": init_embedding(
            keys[1], cfg.MAX_HAPLOTAGS + 1, cfg.bases_embedding_size
        ),
        "strand_embedder": init_embedding(keys[2], 3, cfg.bases_embedding_size),
        "read_level_conv": init_read_level_conv(
            keys[3], conv_in, cfg.kernel_sizes, [cfg.cnn_size] * len(cfg.kernel_sizes)
        ),
        "expansion_layer": init_linear(keys[4], cfg.cnn_size, cfg.read_embedding_size),
        "slot_attention": init_slot_attention_block(
            keys[5], cfg.num_slots, cfg.read_embedding_size, cfg.sa_hidden_dim
        ),
        "slot_classifier": init_linear(keys[6], cfg.read_embedding_size, cfg.classes_per_slot),
    }
    if cfg.add_lstm:
        lstm_size = cfg.num_slots * cfg.read_embedding_size
        lkeys = jax.random.split(keys[7], 4)
        params["lstm"] = [init_lstm_layer(k, lstm_size, lstm_size) for k in lkeys]
    return params


def _reversible_lstm_stack(layers, x):
    """4 alternating ReversibleLSTMs, first reversed
    (model_slot_attention_consensus.cpp:218-223: reverse = !(i % 2))."""
    for i, p in enumerate(layers):
        x = lstm_direction(p, x, reverse=(i % 2 == 0))
    return x


def slot_attention_consensus_forward(
    params: Params, x: jnp.ndarray, cfg: SlotAttentionConfig, phase: bool = True
):
    """x [b, p, d, f] -> per-slot class probabilities [b, p, slots, classes]
    (model_slot_attention_consensus.cpp:306-463 + batch_adjacency_phase)."""
    probs, _ = slot_attention_consensus_forward_impl(params, x, cfg)
    if phase:
        basecalls = np.asarray(x[..., cfg.feature_columns["base"]])
        probs = batch_adjacency_phase(np.asarray(probs), basecalls, lookback=4)
        probs = jnp.asarray(probs)
    return probs


def slot_attention_consensus_forward_impl(params, x, cfg: SlotAttentionConfig):
    cols = cfg.feature_columns
    emb = embedding(params["base_embedder"], x[..., cols["base"]])
    emb = emb + embedding(params["strand_embedder"], x[..., cols["strand"]] + 1)
    if cfg.use_haplotags:
        emb = emb + embedding(params["haplotag_embedder"], x[..., cols["haplotag"]])
    feats = [emb, _scaled_feature(x, cols["qual"])]
    if cfg.use_mapqc:
        feats.append(_scaled_feature(x, cols["mapq"]))
    if cfg.use_dwells:
        feats.append(x[..., cols["dwell"]][..., None])
    if cfg.use_snp_qv:
        feats.append(_scaled_feature(x, cols["snp_qv"]))
    h = jnp.concatenate(feats, axis=-1)

    h = jnp.transpose(h, (0, 2, 3, 1))  # [b, d, C, p]
    b, d, c, p = h.shape
    h = h.reshape(b * d, c, p)
    h = read_level_conv(params["read_level_conv"], h)
    h = h.reshape(b, d, -1, p)
    h = jnp.transpose(h, (0, 3, 1, 2)).reshape(b * p, d, -1)
    h = linear(params["expansion_layer"], h)

    empty_mask = (x[..., cols["base"]] == 0).reshape(b * p, d)
    slots, attn = slot_attention(
        params["slot_attention"], h, empty_mask, cfg.num_slots, cfg.sa_iters, cfg.sa_epsilon
    )
    slots = slots.reshape(b, p, cfg.num_slots, -1)
    attn = attn.reshape(b, p, cfg.num_slots, d)

    if cfg.add_lstm:
        delta = _reversible_lstm_stack(params["lstm"], slots.reshape(b, p, -1))
        slots = slots + delta.reshape(b, p, cfg.num_slots, -1)

    out = linear(params["slot_classifier"], slots)
    out = jax.nn.softmax(out, axis=-1)  # normalise_before_phasing
    return out, attn


def batch_adjacency_phase(
    hap_probs: np.ndarray, basecalls: np.ndarray, lookback: int = 4
) -> np.ndarray:
    """Greedy haplotype phasing by local read support
    (model_slot_attention_consensus.cpp:235-304). Sequential over positions,
    so it runs on host numpy; inputs are the softmax outputs.

    hap_probs [b, p, n_haps(2), n_classes], basecalls [b, p, d]."""
    basecalls = basecalls.copy()
    basecalls[basecalls == 0] = -1  # remap padding
    basecalls[basecalls == 5] = 0  # remap deletions
    n_pos = basecalls.shape[1]
    probs = hap_probs.copy()
    preds = probs.argmax(-1)  # [b, p, haps]

    for pos in range(lookback, n_pos):
        window_preds = preds[:, pos - lookback : pos + 1]  # [b, L+1, haps]
        window_basecalls = basecalls[:, pos - lookback : pos + 1]  # [b, L+1, d]
        # transpose to [b, d, L+1] for comparisons against per-hap windows
        wb = np.swapaxes(window_basecalls, 1, 2)
        preds_flipped = window_preds.copy()
        preds_flipped[:, -1] = preds_flipped[:, -1, ::-1]

        def support(wp):
            s = 0
            for hap in range(wp.shape[-1]):
                s = s + ((wp[:, None, :, hap] == wb).all(-1)).sum(-1)
            return s

        unflip = support(window_preds)
        flip = support(preds_flipped)
        idx = np.nonzero(flip > unflip)[0]
        if len(idx):
            probs[idx, pos] = probs[idx, pos][:, ::-1]
            preds[idx, pos] = preds[idx, pos][:, ::-1]
    return probs


# ---------------------------------------------------------------------------
# ModelVariantPerceiver
# ---------------------------------------------------------------------------


@dataclass
class VariantPerceiverConfig:
    ploidy: int = 2
    num_classes: int = 5
    read_embedding_size: int = 128
    cnn_size: int = 128
    kernel_sizes: tuple = (1, 17)
    dimension: int = 256
    num_blocks: int = 4
    num_heads: int = 8
    use_mapqc: bool = False
    use_dwells: bool = False
    use_haplotags: bool = False
    use_snp_qv: bool = False
    bases_alphabet_size: int = 6
    bases_embedding_size: int = 6
    use_decoder_lstm: bool = False
    update_read_embeddings: bool = False
    max_depth: int = 100
    feature_columns: dict = field(default_factory=lambda: dict(DEFAULT_FEATURE_COLUMNS))

    MAX_HAPLOTAGS = 16


def _rope_pair(q, k, theta=10000.0):
    """RotaryEmbeddingImpl::forward (model_variant_perceiver.cpp:50-127):
    q/k [N, T, S, H, D], rotation over the position dim T, non-interleaved
    half split."""
    d = q.shape[-1]
    t = q.shape[1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = jnp.outer(jnp.arange(t, dtype=jnp.float32), inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [T, D]
    cos = jnp.cos(emb)[None, :, None, None, :]
    sin = jnp.sin(emb)[None, :, None, None, :]

    def rotate_half(x):
        a, b_ = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-b_, a], axis=-1)

    return q * cos + rotate_half(q) * sin, k * cos + rotate_half(k) * sin


def init_cross_attention_block(key, dim, num_heads, max_depth):
    keys = jax.random.split(key, 5)
    return {
        "kv_proj": init_linear(keys[0], dim, 2 * dim, bias=False),
        "q_proj": init_linear(keys[1], dim, dim, bias=False),
        # registered in the reference but unused in forward; kept for
        # checkpoint-shape parity
        "read_embeddings": init_embedding(keys[2], max_depth, dim),
        "out_proj": init_swiglu(keys[3], dim, dim, bias=False),
        "norm1": init_rms_norm(dim),
        "norm2": init_rms_norm(dim),
    }


def cross_attention_block(p, x, cross, num_heads, attn_window=None):
    """MultiSequenceCrossAttentionBlockImpl::forward
    (model_variant_perceiver.cpp:241-287): queries from x, keys/values from
    `cross`; attention runs over flattened (sequence, position) tokens."""
    n, t, n_q, dim = x.shape
    n_kv = cross.shape[2]
    head_dim = dim // num_heads

    q = linear(p["q_proj"], x).reshape(n, t, n_q, num_heads, head_dim)
    kv = linear(p["kv_proj"], cross).reshape(n, t, n_kv, 2, num_heads, head_dim)
    k, v = kv[..., 0, :, :], kv[..., 1, :, :]
    q, k = _rope_pair(q, k)

    # [N, H, S*T, D] with tokens ordered (sequence, position)
    q2 = jnp.transpose(q, (0, 3, 2, 1, 4)).reshape(n, num_heads, n_q * t, head_dim)
    k2 = jnp.transpose(k, (0, 3, 2, 1, 4)).reshape(n, num_heads, n_kv * t, head_dim)
    v2 = jnp.transpose(v, (0, 3, 2, 1, 4)).reshape(n, num_heads, n_kv * t, head_dim)

    logits = jnp.einsum("nhqd,nhkd->nhqk", q2, k2) / np.sqrt(head_dim)
    if attn_window is not None:
        q_pos = jnp.arange(n_q * t) % t
        k_pos = jnp.arange(n_kv * t) % t
        mask = jnp.abs(q_pos[:, None] - k_pos[None, :]) <= attn_window
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nhqk,nhkd->nhqd", attn, v2)
    out = out.reshape(n, num_heads, n_q, t, head_dim)
    out = jnp.transpose(out, (0, 3, 2, 1, 4)).reshape(n, t, n_q, dim)

    x = rms_norm(p["norm1"], x + out)
    x = rms_norm(p["norm2"], swiglu(p["out_proj"], x) + x)
    return x


def init_message_passing_block(key, dim, num_heads, update_read_embeddings, max_depth):
    keys = jax.random.split(key, 4)
    p = {
        "reads_to_haplotypes": init_cross_attention_block(keys[0], dim, num_heads, max_depth),
        "haplotype_self_attention": {
            "self_attention": init_cross_attention_block(keys[1], dim, num_heads, max_depth),
            "norm": init_rms_norm(dim),
        },
    }
    if update_read_embeddings:
        p["haplotypes_to_reads"] = init_cross_attention_block(keys[2], dim, num_heads, max_depth)
    return p


def message_passing_block(p, read_seqs, hap_seqs, num_heads):
    """MessagePassingBlockImpl::forward (model_variant_perceiver.cpp:339-375)."""
    hap_seqs = cross_attention_block(p["reads_to_haplotypes"], hap_seqs, read_seqs, num_heads)
    sa = p["haplotype_self_attention"]
    hap_seqs = rms_norm(
        sa["norm"],
        hap_seqs + cross_attention_block(sa["self_attention"], hap_seqs, hap_seqs, num_heads),
    )
    if "haplotypes_to_reads" in p:
        read_seqs = cross_attention_block(p["haplotypes_to_reads"], read_seqs, hap_seqs, num_heads)
    return read_seqs, hap_seqs


def init_variant_perceiver(key, cfg: VariantPerceiverConfig) -> Params:
    keys = jax.random.split(key, 9 + cfg.num_blocks)
    conv_in = cfg.bases_embedding_size + (
        1 + cfg.use_dwells + cfg.use_mapqc + cfg.use_snp_qv
    )
    params = {
        "base_embedder": init_embedding(keys[0], cfg.bases_alphabet_size, cfg.bases_embedding_size),
        "haplotag_embedder": init_embedding(keys[1], cfg.MAX_HAPLOTAGS + 1, cfg.bases_embedding_size),
        "strand_embedder": init_embedding(keys[2], 3, cfg.bases_embedding_size),
        "read_level_conv": init_read_level_conv(
            keys[3], conv_in, cfg.kernel_sizes, [cfg.cnn_size] * len(cfg.kernel_sizes)
        ),
        "expansion_layer": init_linear(keys[4], cfg.cnn_size, cfg.dimension),
        "latent_init": jax.random.normal(keys[5], (cfg.dimension,)),
        "blocks": [
            init_message_passing_block(
                keys[6 + i],
                cfg.dimension,
                cfg.num_heads,
                cfg.update_read_embeddings and i < cfg.num_blocks - 1,
                cfg.max_depth,
            )
            for i in range(cfg.num_blocks)
        ],
        "output": init_linear(keys[6 + cfg.num_blocks], cfg.dimension, cfg.num_classes * cfg.ploidy),
    }
    if cfg.use_decoder_lstm:
        params["decoder_lstm"] = init_lstm_layer(
            keys[7 + cfg.num_blocks], cfg.dimension, cfg.dimension
        )
    return params


def variant_perceiver_forward(params: Params, x: jnp.ndarray, cfg: VariantPerceiverConfig):
    """x [b, p, d, f] -> logits [b, p, ploidy, num_classes]
    (model_variant_perceiver.cpp:618-675)."""
    cols = cfg.feature_columns
    emb = embedding(params["base_embedder"], x[..., cols["base"]])
    emb = emb + embedding(params["strand_embedder"], x[..., cols["strand"]] + 1)
    if cfg.use_haplotags:
        emb = emb + embedding(params["haplotag_embedder"], x[..., cols["haplotag"]])
    feats = [emb, _scaled_feature(x, cols["qual"])]
    if cfg.use_mapqc:
        feats.append(_scaled_feature(x, cols["mapq"]))
    if cfg.use_dwells:
        feats.append(x[..., cols["dwell"]][..., None])
    if cfg.use_snp_qv:
        feats.append(_scaled_feature(x, cols["snp_qv"]))
    h = jnp.concatenate(feats, axis=-1)

    h = jnp.transpose(h, (0, 2, 3, 1))  # [b, d, C, p]
    b, d, c, p = h.shape
    h = read_level_conv(params["read_level_conv"], h.reshape(b * d, c, p))
    h = h.reshape(b, d, -1, p)
    h = jnp.transpose(h, (0, 3, 1, 2))  # [b, p, d, cnn]
    reads = linear(params["expansion_layer"], h)  # [b, p, d, dim]

    haps = jnp.broadcast_to(
        params["latent_init"][None, None, None, :], (b, p, 1, cfg.dimension)
    )
    for block in params["blocks"]:
        reads, haps = message_passing_block(block, reads, haps, cfg.num_heads)

    haps = haps[:, :, 0]  # squeeze the single latent sequence
    if cfg.use_decoder_lstm:
        haps = lstm_direction(params["decoder_lstm"], haps)
    out = linear(params["output"], haps)
    return out.reshape(b, p, cfg.ploidy, cfg.num_classes)


# ---------------------------------------------------------------------------
# factory (model_factory.cpp:27-337)
# ---------------------------------------------------------------------------


def model_factory(model_type: str, kwargs: dict, key=None):
    """Returns (init_fn() -> params, forward_fn(params, x), config)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    kernel_sizes = kwargs.get("kernel_sizes", (1, 17))
    if isinstance(kernel_sizes, str):
        kernel_sizes = tuple(int(v) for v in kernel_sizes.split(","))

    def b(name, default=False):
        v = kwargs.get(name, default)
        return v == "true" if isinstance(v, str) else bool(v)

    if model_type == "GRUModel":
        from dorado_tpu.secondary.model import gru_forward, init_gru_params

        params = init_gru_params(
            key,
            num_features=int(kwargs["num_features"]),
            num_classes=int(kwargs["num_classes"]),
            gru_size=int(kwargs["gru_size"]),
            num_layers=int(kwargs["n_layers"]),
            bidirectional=b("bidirectional", True),
        )
        return params, gru_forward, None
    if model_type == "LatentSpaceLSTM":
        cfg = LatentSpaceLSTMConfig(
            num_classes=int(kwargs["num_classes"]),
            lstm_size=int(kwargs["lstm_size"]),
            cnn_size=int(kwargs["cnn_size"]),
            kernel_sizes=tuple(kernel_sizes),
            pooler_type=kwargs.get("pooler_type", "mean"),
            use_dwells=b("use_dwells"),
            bases_alphabet_size=int(kwargs.get("bases_alphabet_size", 6)),
            bases_embedding_size=int(kwargs.get("bases_embedding_size", 6)),
            bidirectional=b("bidirectional", True),
        )
        params = init_latent_space_lstm(key, cfg)
        return params, lambda pr, x: latent_space_lstm_forward(pr, x, cfg), cfg
    if model_type == "SlotAttentionConsensus":
        cfg = SlotAttentionConfig(
            num_slots=int(kwargs["num_slots"]),
            classes_per_slot=int(kwargs["classes_per_slot"]),
            read_embedding_size=int(kwargs["read_embedding_size"]),
            cnn_size=int(kwargs["cnn_size"]),
            kernel_sizes=tuple(kernel_sizes),
            pooler_type=kwargs.get("pooler_type", "mean"),
            use_mapqc=b("use_mapqc"),
            use_dwells=b("use_dwells"),
            use_haplotags=b("use_haplotags"),
            use_snp_qv=b("use_snp_qv"),
            bases_alphabet_size=int(kwargs.get("bases_alphabet_size", 6)),
            bases_embedding_size=int(kwargs.get("bases_embedding_size", 6)),
            add_lstm=b("add_lstm"),
            use_reference=b("use_reference"),
        )
        params = init_slot_attention_consensus(key, cfg)
        return params, lambda pr, x: slot_attention_consensus_forward(pr, x, cfg), cfg
    if model_type == "VariantPerceiver":
        cfg = VariantPerceiverConfig(
            ploidy=int(kwargs["ploidy"]),
            num_classes=int(kwargs["num_classes"]),
            read_embedding_size=int(kwargs["read_embedding_size"]),
            cnn_size=int(kwargs["cnn_size"]),
            kernel_sizes=tuple(kernel_sizes),
            dimension=int(kwargs["dimension"]),
            num_blocks=int(kwargs["num_blocks"]),
            num_heads=int(kwargs["num_heads"]),
            use_mapqc=b("use_mapqc"),
            use_dwells=b("use_dwells"),
            use_haplotags=b("use_haplotags"),
            use_snp_qv=b("use_snp_qv"),
            bases_alphabet_size=int(kwargs.get("bases_alphabet_size", 6)),
            bases_embedding_size=int(kwargs.get("bases_embedding_size", 6)),
            use_decoder_lstm=b("use_decoder_lstm"),
            update_read_embeddings=b("update_read_embeddings"),
        )
        params = init_variant_perceiver(key, cfg)
        return params, lambda pr, x: variant_perceiver_forward(pr, x, cfg), cfg
    raise ValueError(f"Unknown model type: {model_type!r}")


def parse_model_config(config_path):
    """Parse a polish/variant model-directory config.toml
    (secondary/architectures/model_config.cpp:94-180): [model] type+kwargs,
    [feature_encoder] type+kwargs, label_scheme, config_version, supported
    basecallers. Sections beyond [model] are optional here so hand-written
    test configs stay valid."""
    import tomllib
    from pathlib import Path

    with open(config_path, "rb") as fh:
        config = tomllib.load(fh)
    if "model" not in config:
        raise ValueError("Model config must include the [model] section.")
    model = config["model"]
    out = {
        "version": config.get("config_version", 1),
        "model_type": model["type"],
        "model_kwargs": model.get("kwargs", {}),
        "model_dir": str(Path(config_path).parent),
        "feature_encoder_type": "",
        "feature_encoder_kwargs": {},
        "label_scheme_type": "",
        "supported_basecallers": set(),
    }
    if "basecaller_model" in config:
        out["supported_basecallers"].add(config["basecaller_model"])
    for name in config.get("supported_basecallers", []):
        out["supported_basecallers"].add(name)
    if "feature_encoder" in config:
        fe = config["feature_encoder"]
        out["feature_encoder_type"] = fe.get("type", "")
        out["feature_encoder_kwargs"] = fe.get("kwargs", {})
    if "label_scheme" in config:
        ls = config["label_scheme"]
        out["label_scheme_type"] = ls.get("type", "") if isinstance(ls, dict) else str(ls)
    return out
