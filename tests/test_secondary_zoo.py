"""Torch parity for the secondary model zoo (architectures transcribed from
dorado/secondary/architectures/*.cpp as inline oracles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dorado_tpu.secondary.architectures import (
    LatentSpaceLSTMConfig,
    SlotAttentionConfig,
    VariantPerceiverConfig,
    batch_adjacency_phase,
    init_latent_space_lstm,
    init_slot_attention_consensus,
    init_variant_perceiver,
    latent_space_lstm_forward,
    model_factory,
    slot_attention_consensus_forward_impl,
    variant_perceiver_forward,
)


def t(x):
    return torch.from_numpy(np.asarray(x))


def load_linear(mod, p):
    mod.weight.data = t(p["w"])
    if "b" in p:
        mod.bias.data = t(p["b"])
    return mod


def make_read_level_conv_torch(p, in_ch):
    layers = []
    for lp in p["layers"]:
        c_out, c_in, k = lp["conv"]["w"].shape
        conv = torch.nn.Conv1d(c_in, c_out, k, padding=(k - 1) // 2)
        conv.weight.data = t(lp["conv"]["w"])
        conv.bias.data = t(lp["conv"]["b"])
        bn = torch.nn.BatchNorm1d(c_out)
        bn.weight.data = t(lp["bn"]["g"])
        bn.bias.data = t(lp["bn"]["b"])
        bn.running_mean.data = t(lp["bn"]["mean"])
        bn.running_var.data = t(lp["bn"]["var"])
        layers += [conv, torch.nn.ReLU(), bn]
    return torch.nn.Sequential(*layers).eval()


def load_lstm_bidir(lstm, layers):
    for i, layer in enumerate(layers):
        for d, key in enumerate(["fwd", "rev"]):
            sfx = f"_l{i}" + ("_reverse" if d else "")
            getattr(lstm, f"weight_ih{sfx}").data = t(layer[key]["w_ih"])
            getattr(lstm, f"weight_hh{sfx}").data = t(layer[key]["w_hh"])
            getattr(lstm, f"bias_ih{sfx}").data = t(layer[key]["b_ih"])
            getattr(lstm, f"bias_hh{sfx}").data = t(layer[key]["b_hh"])
    return lstm


def make_features(rng, b, p, d, use_optional=False):
    """[b, p, d, 7] feature tensor with base/qual/strand/mapq(/dwell/...)"""
    x = np.zeros((b, p, d, 7), np.float32)
    x[..., 0] = rng.randint(0, 6, (b, p, d))  # base (0 = padding)
    x[..., 1] = rng.randint(0, 50, (b, p, d))  # qual
    x[..., 2] = rng.randint(-1, 2, (b, p, d))  # strand in {-1, 0, 1}
    x[..., 3] = rng.randint(0, 60, (b, p, d))  # mapq
    if use_optional:
        x[..., 4] = rng.randn(b, p, d)  # dwell
        x[..., 5] = rng.randint(0, 17, (b, p, d))  # haplotag
        x[..., 6] = rng.randint(0, 50, (b, p, d))  # snp_qv
    # a couple of fully-empty reads to exercise masks
    x[:, :, -1, :] = 0
    return x


class TestLatentSpaceLSTM:
    def test_torch_parity(self):
        cfg = LatentSpaceLSTMConfig(lstm_size=16, cnn_size=12, kernel_sizes=(1, 5))
        params = init_latent_space_lstm(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(0)
        x = make_features(rng, 2, 10, 6)
        ours = np.asarray(latent_space_lstm_forward(params, jnp.asarray(x), cfg))

        # torch oracle (model_latent_space_lstm.cpp:209-281)
        xt = t(x)
        base_emb = torch.nn.Embedding(6, 6)
        base_emb.weight.data = t(params["base_embedder"]["w"])
        strand_emb = torch.nn.Embedding(3, 6)
        strand_emb.weight.data = t(params["strand_embedder"]["w"])
        convs = make_read_level_conv_torch(params["read_level_conv"], 7)
        pre_pool = load_linear(torch.nn.Linear(12, 16), params["pre_pool_expansion_layer"])
        lstm = load_lstm_bidir(
            torch.nn.LSTM(16, 16, num_layers=2, batch_first=True, bidirectional=True),
            params["lstm"]["layers"],
        )
        lin = load_linear(torch.nn.Linear(32, 5), params["linear"])

        with torch.no_grad():
            mask = xt.sum((1, -1)) != 0
            emb = base_emb(xt[..., 0].long()) + strand_emb(xt[..., 2].long() + 1)
            q = (xt[..., 1] / 25 - 1).unsqueeze(-1)
            h = torch.cat([emb, q], -1).permute(0, 2, 3, 1)
            b, d, c, p = h.shape
            h = convs(h.flatten(0, 1)).permute(0, 2, 1)
            h = pre_pool(h).view(b, d, p, 16)
            depths = mask.sum(-1).unsqueeze(-1).unsqueeze(-1)
            pooled = (h * mask.unsqueeze(-1).unsqueeze(-1)).sum(1) / depths
            out = lin(lstm(pooled)[0])
        np.testing.assert_allclose(ours, out.numpy(), atol=3e-5)


class TestSlotAttentionConsensus:
    def test_torch_parity(self):
        cfg = SlotAttentionConfig(
            read_embedding_size=16, cnn_size=12, kernel_sizes=(1, 5),
            sa_hidden_dim=16, add_lstm=True, use_mapqc=True,
        )
        params = init_slot_attention_consensus(jax.random.PRNGKey(1), cfg)
        rng = np.random.RandomState(1)
        x = make_features(rng, 2, 8, 5)
        ours, attn = slot_attention_consensus_forward_impl(params, jnp.asarray(x), cfg)
        ours = np.asarray(ours)

        xt = t(x)
        base_emb = torch.nn.Embedding(6, 6)
        base_emb.weight.data = t(params["base_embedder"]["w"])
        strand_emb = torch.nn.Embedding(3, 6)
        strand_emb.weight.data = t(params["strand_embedder"]["w"])
        convs = make_read_level_conv_torch(params["read_level_conv"], 8)
        expansion = load_linear(torch.nn.Linear(12, 16), params["expansion_layer"])
        classifier = load_linear(torch.nn.Linear(16, 5), params["slot_classifier"])

        sp = params["slot_attention"]
        to_q = load_linear(torch.nn.Linear(16, 16), sp["to_q"])
        to_k = load_linear(torch.nn.Linear(16, 16), sp["to_k"])
        to_v = load_linear(torch.nn.Linear(16, 16), sp["to_v"])
        gru = torch.nn.GRUCell(16, 16)
        gru.weight_ih.data = t(sp["gru"]["w_ih"])
        gru.weight_hh.data = t(sp["gru"]["w_hh"])
        gru.bias_ih.data = t(sp["gru"]["b_ih"])
        gru.bias_hh.data = t(sp["gru"]["b_hh"])
        mlp1 = load_linear(torch.nn.Linear(16, 16), sp["mlp"]["fc1"])
        mlp2 = load_linear(torch.nn.Linear(16, 16), sp["mlp"]["fc2"])

        def ln(p, x):
            return torch.nn.functional.layer_norm(x, (16,), t(p["g"]), t(p["b"]))

        with torch.no_grad():
            emb = base_emb(xt[..., 0].long()) + strand_emb(xt[..., 2].long() + 1)
            q_feat = (xt[..., 1] / 25 - 1).unsqueeze(-1)
            mapqc = (xt[..., 3] / 25 - 1).unsqueeze(-1)
            h = torch.cat([emb, q_feat, mapqc], -1).permute(0, 2, 3, 1)
            b, d, c, p = h.shape
            h = convs(h.flatten(0, 1)).view(b, d, -1, p)
            h = h.permute(0, 3, 1, 2).flatten(0, 1)
            h = expansion(h)
            mask = (xt[..., 0] == 0).flatten(0, 1)

            # SlotAttentionImpl::forward
            n_s = cfg.num_slots
            bias = torch.zeros(mask.shape[0], n_s, mask.shape[1])
            bias.masked_fill_(mask.unsqueeze(1).expand(-1, n_s, -1), float("-inf"))
            slots = t(sp["slots_mu"]).expand(h.shape[0], n_s, -1) + t(
                sp["slots_logsigma"]
            ).exp().expand(h.shape[0], n_s, -1) * t(sp["fixed_noise"]).expand(
                h.shape[0], -1, -1
            )
            hx = ln(sp["norm_input"], h)
            k = to_k(hx)
            v = to_v(hx)
            for _ in range(3):
                slots_prev = slots
                slots = ln(sp["norm_slots"], slots)
                qq = to_q(slots)
                dots = torch.bmm(qq, k.transpose(1, 2)) * (16 ** -0.5) + bias
                at = torch.softmax(dots, 1) + 1e-8
                at = at.masked_fill(mask.unsqueeze(1).expand(-1, n_s, -1), 0)
                at = at / at.nansum(-1, keepdim=True)
                updates = torch.bmm(at, v)
                slots = gru(updates.reshape(-1, 16), slots_prev.reshape(-1, 16))
                slots = slots.reshape(h.shape[0], -1, 16)
                slots = slots + mlp2(torch.relu(mlp1(ln(sp["norm_pre_ff"], slots))))

            slots = slots.view(b, p, n_s, -1)
            lstm_in = slots.flatten(-2)
            delta = lstm_in
            for i, lp in enumerate(params["lstm"]):
                lstm = torch.nn.LSTM(32, 32, batch_first=True)
                lstm.weight_ih_l0.data = t(lp["w_ih"])
                lstm.weight_hh_l0.data = t(lp["w_hh"])
                lstm.bias_ih_l0.data = t(lp["b_ih"])
                lstm.bias_hh_l0.data = t(lp["b_hh"])
                if i % 2 == 0:
                    delta = lstm(delta.flip(1))[0].flip(1)
                else:
                    delta = lstm(delta)[0]
            slots = slots + delta.view(b, p, n_s, -1)
            out = torch.softmax(classifier(slots), -1)
        np.testing.assert_allclose(ours, out.numpy(), atol=3e-5)

    def test_adjacency_phase(self):
        """Phasing swaps haplotypes when the flipped assignment has more
        read support in the local window."""
        rng = np.random.RandomState(2)
        b, p, d = 1, 12, 8
        hap_a = rng.randint(1, 5, p)
        hap_b = (hap_a % 4) + 1  # always different from hap_a
        probs = np.zeros((b, p, 2, 5), np.float32)
        for pos in range(p):
            # swap slot assignment halfway through: unphased input
            ha, hb = (hap_a, hap_b) if pos < 6 else (hap_b, hap_a)
            probs[0, pos, 0, ha[pos]] = 1.0
            probs[0, pos, 1, hb[pos]] = 1.0
        basecalls = np.zeros((b, p, d), np.float32)
        basecalls[0, :, :4] = hap_a[None, :, None].transpose(1, 0, 2)[:, 0, :]
        basecalls[0, :, 4:] = hap_b[None, :, None].transpose(1, 0, 2)[:, 0, :]
        phased = batch_adjacency_phase(probs, basecalls, lookback=4)
        preds = phased.argmax(-1)
        # after phasing, slot 0 tracks hap_a everywhere
        assert (preds[0, :, 0] == hap_a).all()
        assert (preds[0, :, 1] == hap_b).all()


class TestVariantPerceiver:
    def test_torch_parity(self):
        cfg = VariantPerceiverConfig(
            read_embedding_size=16, cnn_size=12, kernel_sizes=(1, 5),
            dimension=16, num_blocks=2, num_heads=4,
            use_decoder_lstm=True, update_read_embeddings=True,
        )
        params = init_variant_perceiver(jax.random.PRNGKey(3), cfg)
        rng = np.random.RandomState(3)
        x = make_features(rng, 2, 6, 4)
        ours = np.asarray(variant_perceiver_forward(params, jnp.asarray(x), cfg))

        xt = t(x)
        base_emb = torch.nn.Embedding(6, 6)
        base_emb.weight.data = t(params["base_embedder"]["w"])
        strand_emb = torch.nn.Embedding(3, 6)
        strand_emb.weight.data = t(params["strand_embedder"]["w"])
        convs = make_read_level_conv_torch(params["read_level_conv"], 7)
        expansion = load_linear(torch.nn.Linear(12, 16), params["expansion_layer"])
        output = load_linear(torch.nn.Linear(16, 10), params["output"])

        def rms(p, x):
            rstd = torch.rsqrt(x.square().mean(-1, True) + 1e-5)
            return x * rstd * t(p["w"])

        def swiglu_t(p, x):
            tt = torch.nn.functional.linear(x, t(p["fc1"]["w"]))
            y, gate = tt.chunk(2, -1)
            return torch.nn.functional.linear(
                torch.nn.functional.silu(gate) * y, t(p["fc2"]["w"])
            )

        def rope(q, k):
            d = q.shape[-1]
            T = q.shape[1]
            inv = 1.0 / (10000.0 ** (torch.arange(0, d, 2).float() / d))
            freqs = torch.outer(torch.arange(T).float(), inv)
            emb = torch.cat([freqs, freqs], -1)
            cos = emb.cos()[None, :, None, None, :]
            sin = emb.sin()[None, :, None, None, :]

            def rh(x):
                a, b_ = x.chunk(2, -1)
                return torch.cat([-b_, a], -1)

            return q * cos + rh(q) * sin, k * cos + rh(k) * sin

        def cross_block(p, x, cross):
            N, T, NQ, dim = x.shape
            NKV = cross.shape[2]
            H, D = 4, dim // 4
            q = torch.nn.functional.linear(x, t(p["q_proj"]["w"])).view(N, T, NQ, H, D)
            kv = torch.nn.functional.linear(cross, t(p["kv_proj"]["w"])).view(
                N, T, NKV, 2, H, D
            )
            k, v = kv.unbind(3)
            q, k = rope(q, k)
            q2 = q.permute(0, 3, 2, 1, 4).reshape(N, H, NQ * T, D)
            k2 = k.permute(0, 3, 2, 1, 4).reshape(N, H, NKV * T, D)
            v2 = v.permute(0, 3, 2, 1, 4).reshape(N, H, NKV * T, D)
            attn = torch.nn.functional.scaled_dot_product_attention(q2, k2, v2)
            attn = attn.view(N, H, NQ, T, D).permute(0, 3, 2, 1, 4).reshape(N, T, NQ, dim)
            x = rms(p["norm1"], x + attn)
            return rms(p["norm2"], swiglu_t(p["out_proj"], x) + x)

        with torch.no_grad():
            emb = base_emb(xt[..., 0].long()) + strand_emb(xt[..., 2].long() + 1)
            q_feat = (xt[..., 1] / 25 - 1).unsqueeze(-1)
            h = torch.cat([emb, q_feat], -1).permute(0, 2, 3, 1)
            b, d, c, p = h.shape
            h = convs(h.flatten(0, 1)).view(b, d, -1, p).permute(0, 3, 1, 2)
            reads = expansion(h)
            haps = t(params["latent_init"])[None, None, None, :].expand(b, p, 1, -1)
            for i, bp in enumerate(params["blocks"]):
                haps = cross_block(bp["reads_to_haplotypes"], haps, reads)
                sa = bp["haplotype_self_attention"]
                haps = rms(sa["norm"], haps + cross_block(sa["self_attention"], haps, haps))
                if "haplotypes_to_reads" in bp:
                    reads = cross_block(bp["haplotypes_to_reads"], reads, haps)
            haps = haps.squeeze(2)
            lstm = torch.nn.LSTM(16, 16, batch_first=True)
            lstm.weight_ih_l0.data = t(params["decoder_lstm"]["w_ih"])
            lstm.weight_hh_l0.data = t(params["decoder_lstm"]["w_hh"])
            lstm.bias_ih_l0.data = t(params["decoder_lstm"]["b_ih"])
            lstm.bias_hh_l0.data = t(params["decoder_lstm"]["b_hh"])
            haps = lstm(haps)[0]
            out = output(haps).view(b, p, 2, 5)
        np.testing.assert_allclose(ours, out.numpy(), atol=3e-5)


class TestFactory:
    def test_all_types(self):
        rng = np.random.RandomState(5)
        x = jnp.asarray(make_features(rng, 1, 6, 4))
        for model_type, kwargs, out_shape in [
            (
                "LatentSpaceLSTM",
                dict(num_classes=5, lstm_size=8, cnn_size=8, kernel_sizes="1,5",
                     pooler_type="mean", use_dwells="false"),
                (1, 6, 5),
            ),
            (
                "SlotAttentionConsensus",
                dict(num_slots=2, classes_per_slot=5, read_embedding_size=8,
                     cnn_size=8, kernel_sizes="1,5", pooler_type="mean",
                     use_mapqc="false", use_dwells="false", use_haplotags="false",
                     add_lstm="false", use_reference="false"),
                (1, 6, 2, 5),
            ),
            (
                "VariantPerceiver",
                dict(ploidy=2, num_classes=5, read_embedding_size=8, cnn_size=8,
                     kernel_sizes="1,5", dimension=8, num_blocks=1, num_heads=2,
                     use_mapqc="false", use_dwells="false", use_haplotags="false",
                     use_decoder_lstm="false", update_read_embeddings="false"),
                (1, 6, 2, 5),
            ),
        ]:
            params, forward, _ = model_factory(model_type, kwargs)
            out = forward(params, x)
            assert out.shape == out_shape, model_type


def test_parse_model_config(tmp_path):
    """Reference polish model config schema (model_config.cpp:94-180)."""
    from dorado_tpu.secondary.architectures import parse_model_config

    p = tmp_path / "config.toml"
    p.write_text(
        'config_version = 1\n'
        'basecaller_model = "dna_r10.4.1_e8.2_400bps_hac@v5.0.0"\n'
        '[model]\ntype = "GRUModel"\n'
        '[model.kwargs]\nnum_features = 10\nnum_classes = 5\n'
        'gru_size = 128\nn_layers = 2\nbidirectional = "true"\n'
        '[feature_encoder]\ntype = "CountsFeatureEncoder"\n'
        '[feature_encoder.kwargs]\nnormalise = "total"\n'
        '[label_scheme]\ntype = "HaploidLabelScheme"\n'
    )
    mc = parse_model_config(p)
    assert mc["model_type"] == "GRUModel"
    assert mc["model_kwargs"]["gru_size"] == 128
    assert mc["feature_encoder_type"] == "CountsFeatureEncoder"
    assert mc["label_scheme_type"] == "HaploidLabelScheme"
    assert "dna_r10.4.1_e8.2_400bps_hac@v5.0.0" in mc["supported_basecallers"]

    p2 = tmp_path / "bad.toml"
    p2.write_text("[feature_encoder]\ntype = 'x'\n")
    with pytest.raises(ValueError):
        parse_model_config(p2)
