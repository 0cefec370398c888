"""Double/single block parity vs. an independent torch oracle.

The oracle is written fresh from the block math (AdaLN modulation -> fused QKV
with QK-RMSNorm -> joint RoPE'd SDPA -> gated residual + tanh-GELU MLP; the
concept stream reuses txt weights and attends over [concept; img]). It shares
no code with the reference or with the JAX implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from conceptattention_tpu.config import configs
from conceptattention_tpu.models.flux.blocks import double_block, last_layer, single_block
from conceptattention_tpu.models.flux.params import _double_block, _single_block
from conceptattention_tpu.ops.attention import ConceptAttentionSpec
from conceptattention_tpu.ops.packing import make_img_ids
from conceptattention_tpu.ops.rope import embed_nd

CFG = configs["flux-tiny"].params
B, T, P, C = 1, 4, 16, 3


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def torch_rope(x, cos, sin):
    # x [B,H,L,D]; cos/sin [B,1,L,D/2]; interleaved pairs
    xf = x.reshape(*x.shape[:-1], -1, 2)
    out0 = cos * xf[..., 0] - sin * xf[..., 1]
    out1 = sin * xf[..., 0] + cos * xf[..., 1]
    return torch.stack([out0, out1], dim=-1).reshape(x.shape)


def torch_rms(x, scale):
    rrms = torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True) + 1e-6)
    return x * rrms * scale


def torch_qkv(x, p, prefix, num_heads):
    # 4D [D, 3, H, Dh] param flattens to the torch fused (K H D) layout
    w = t(p[f"{prefix}_qkv"]["w"])
    h = x @ w.reshape(w.shape[0], -1) + t(p[f"{prefix}_qkv"]["b"]).reshape(-1)
    b, l, _ = h.shape
    h = h.reshape(b, l, 3, num_heads, -1).permute(2, 0, 3, 1, 4)
    q = torch_rms(h[0], t(p[f"{prefix}_qnorm"]))
    k = torch_rms(h[1], t(p[f"{prefix}_knorm"]))
    return q, k, h[2]


def torch_mod(vec, p, name):
    out = F.silu(vec) @ t(p[name]["w"]) + t(p[name]["b"])
    return out[:, None, :].chunk(out.shape[-1] // vec.shape[-1], dim=-1)


def torch_ln(x):
    return F.layer_norm(x, (x.shape[-1],), eps=1e-6)


def torch_mlp(x, p, prefix):
    h = x @ t(p[f"{prefix}_mlp_in"]["w"]) + t(p[f"{prefix}_mlp_in"]["b"])
    h = F.gelu(h, approximate="tanh")
    return h @ t(p[f"{prefix}_mlp_out"]["w"]) + t(p[f"{prefix}_mlp_out"]["b"])


def oracle_double_block(p, img, txt, vec, pe, concepts, cvec, cpe, num_heads):
    img_shift1, img_scale1, img_gate1, img_shift2, img_scale2, img_gate2 = torch_mod(vec, p, "img_mod")
    txt_shift1, txt_scale1, txt_gate1, txt_shift2, txt_scale2, txt_gate2 = torch_mod(vec, p, "txt_mod")
    c_shift1, c_scale1, c_gate1, c_shift2, c_scale2, c_gate2 = torch_mod(cvec, p, "txt_mod")

    img_q, img_k, img_v = torch_qkv((1 + img_scale1) * torch_ln(img) + img_shift1, p, "img", num_heads)
    txt_q, txt_k, txt_v = torch_qkv((1 + txt_scale1) * torch_ln(txt) + txt_shift1, p, "txt", num_heads)
    con_q, con_k, con_v = torch_qkv((1 + c_scale1) * torch_ln(concepts) + c_shift1, p, "txt", num_heads)

    cos, sin = pe
    q = torch_rope(torch.cat([txt_q, img_q], dim=2), cos, sin)
    k = torch_rope(torch.cat([txt_k, img_k], dim=2), cos, sin)
    v = torch.cat([txt_v, img_v], dim=2)
    attn = F.scaled_dot_product_attention(q, k, v)
    txt_attn = attn[:, :, : txt.shape[1]].permute(0, 2, 1, 3).reshape(txt.shape[0], txt.shape[1], -1)
    img_attn = attn[:, :, txt.shape[1] :].permute(0, 2, 1, 3).reshape(img.shape[0], img.shape[1], -1)

    ccos, csin = cpe
    cq = torch_rope(torch.cat([con_q, img_q], dim=2), ccos, csin)
    ck = torch_rope(torch.cat([con_k, img_k], dim=2), ccos, csin)
    cv = torch.cat([con_v, img_v], dim=2)
    cattn = F.scaled_dot_product_attention(cq, ck, cv)
    con_attn = cattn[:, :, : concepts.shape[1]].permute(0, 2, 1, 3).reshape(concepts.shape[0], concepts.shape[1], -1)

    out_img = img + img_gate1 * (img_attn @ t(p["img_proj"]["w"]) + t(p["img_proj"]["b"]))
    out_img = out_img + img_gate2 * torch_mlp((1 + img_scale2) * torch_ln(out_img) + img_shift2, p, "img")
    out_txt = txt + txt_gate1 * (txt_attn @ t(p["txt_proj"]["w"]) + t(p["txt_proj"]["b"]))
    out_txt = out_txt + txt_gate2 * torch_mlp((1 + txt_scale2) * torch_ln(out_txt) + txt_shift2, p, "txt")
    out_con = concepts + c_gate1 * (con_attn @ t(p["txt_proj"]["w"]) + t(p["txt_proj"]["b"]))
    out_con = out_con + c_gate2 * torch_mlp((1 + c_scale2) * torch_ln(out_con) + c_shift2, p, "txt")
    return out_img, out_txt, out_con, img_attn, con_attn, con_q, img_q


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(42)
    keys = jax.random.split(key, 8)
    p = _double_block(keys[0], CFG, jnp.float32)
    img = jax.random.normal(keys[1], (B, P, CFG.hidden_size)) * 0.5
    txt = jax.random.normal(keys[2], (B, T, CFG.hidden_size)) * 0.5
    vec = jax.random.normal(keys[3], (B, CFG.hidden_size)) * 0.5
    concepts = jax.random.normal(keys[4], (B, C, CFG.hidden_size)) * 0.5
    cvec = jax.random.normal(keys[5], (B, CFG.hidden_size)) * 0.5

    img_ids = make_img_ids(4, 4, batch_size=B)
    txt_ids = jnp.zeros((B, T, 3))
    con_ids = jnp.zeros((B, C, 3))
    pe = embed_nd(jnp.concatenate([txt_ids, img_ids], axis=1), CFG.axes_dim, CFG.theta)
    cpe = embed_nd(jnp.concatenate([con_ids, img_ids], axis=1), CFG.axes_dim, CFG.theta)
    return p, img, txt, vec, concepts, cvec, pe, cpe


class TestDoubleBlock:
    def test_matches_torch_oracle(self, setup):
        p, img, txt, vec, concepts, cvec, pe, cpe = setup
        got_img, got_txt, got_con, sal = double_block(
            p, img, txt, vec, pe, CFG.num_heads,
            concepts=concepts, concept_vec=cvec, concept_pe=cpe,
        )
        want = oracle_double_block(
            p, t(img), t(txt), t(vec), (t(pe[0]), t(pe[1])),
            t(concepts), t(cvec), (t(cpe[0]), t(cpe[1])), CFG.num_heads,
        )
        np.testing.assert_allclose(np.asarray(got_img), want[0].numpy(), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_txt), want[1].numpy(), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_con), want[2].numpy(), rtol=2e-4, atol=2e-4)
        # The 4 vector sets (the reference's
        # modified_double_stream_block.py:185-191 taps) against the oracle.
        _, _, _, raw = double_block(
            p, img, txt, vec, pe, CFG.num_heads,
            concepts=concepts, concept_vec=cvec, concept_pe=cpe,
            spec=ConceptAttentionSpec(return_raw_vectors=True),
        )
        for key, w in [
            ("output_space_image_vectors", want[3]),
            ("output_space_concept_vectors", want[4]),
            ("cross_attention_concept_vectors", want[5]),
            ("cross_attention_image_vectors", want[6]),
        ]:
            np.testing.assert_allclose(
                np.asarray(raw[key]), w.numpy(), rtol=2e-4, atol=2e-4, err_msg=key
            )

    def test_saliency_taps_match_vector_einsum(self, setup):
        p, img, txt, vec, concepts, cvec, pe, cpe = setup
        _, _, _, sal = double_block(
            p, img, txt, vec, pe, CFG.num_heads,
            concepts=concepts, concept_vec=cvec, concept_pe=cpe,
            spec=ConceptAttentionSpec(taps=("output", "cross_attention", "value")),
        )
        _, _, _, raw = double_block(
            p, img, txt, vec, pe, CFG.num_heads,
            concepts=concepts, concept_vec=cvec, concept_pe=cpe,
            spec=ConceptAttentionSpec(return_raw_vectors=True),
        )
        want_out = np.einsum(
            "bcd,bpd->bcp",
            np.asarray(raw["output_space_concept_vectors"]),
            np.asarray(raw["output_space_image_vectors"]),
        )
        np.testing.assert_allclose(np.asarray(sal["output"]), want_out, rtol=1e-4, atol=1e-5)
        # cross-attention tap: merged-head q dot products
        cq = np.asarray(raw["cross_attention_concept_vectors"])  # [B,H,C,D]
        iq = np.asarray(raw["cross_attention_image_vectors"])  # [B,H,P,D]
        want_cross = np.einsum("bhcd,bhpd->bcp", cq, iq)
        np.testing.assert_allclose(np.asarray(sal["cross_attention"]), want_cross, rtol=1e-4, atol=1e-5)

    def test_concept_stream_does_not_affect_generation(self, setup):
        p, img, txt, vec, concepts, cvec, pe, cpe = setup
        img_with, txt_with, _, _ = double_block(
            p, img, txt, vec, pe, CFG.num_heads,
            concepts=concepts, concept_vec=cvec, concept_pe=cpe,
        )
        img_without, txt_without, _, _ = double_block(p, img, txt, vec, pe, CFG.num_heads)
        np.testing.assert_allclose(np.asarray(img_with), np.asarray(img_without), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(txt_with), np.asarray(txt_without), rtol=1e-6)

    def test_ablation_branches(self, setup):
        p, img, txt, vec, concepts, cvec, pe, cpe = setup
        outs = {}
        for cross, self_ in [(True, True), (True, False), (False, True), (False, False)]:
            _, _, con, _ = double_block(
                p, img, txt, vec, pe, CFG.num_heads,
                concepts=concepts, concept_vec=cvec, concept_pe=cpe,
                spec=ConceptAttentionSpec(cross_attention=cross, self_attention=self_),
            )
            outs[(cross, self_)] = np.asarray(con)
        # All four ablations produce distinct concept streams
        vals = list(outs.values())
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                assert not np.allclose(vals[i], vals[j])


class TestSingleBlock:
    def test_matches_torch_oracle(self, setup):
        _, img, txt, vec, _, _, pe, _ = setup
        key = jax.random.PRNGKey(7)
        p = _single_block(key, CFG, jnp.float32)
        x = jnp.concatenate([txt, img], axis=1)
        got = single_block(p, x, vec, pe, CFG.num_heads, CFG.mlp_hidden_dim)

        xt, vect = t(x), t(vec)
        shift, scale, gate = torch_mod(vect, p, "mod")
        x_mod = (1 + scale) * torch_ln(xt) + shift
        # Reconstruct the reference's fused linear1/linear2 from the split leaves
        wq = t(p["qkv"]["w"])
        linear1_w = torch.cat([wq.reshape(wq.shape[0], -1), t(p["mlp_in"]["w"])], dim=1)
        linear1_b = torch.cat([t(p["qkv"]["b"]).reshape(-1), t(p["mlp_in"]["b"])])
        h = x_mod @ linear1_w + linear1_b
        d = CFG.hidden_size
        qkv, mlp = h[..., : 3 * d], h[..., 3 * d :]
        b, l, _ = qkv.shape
        qkv = qkv.reshape(b, l, 3, CFG.num_heads, -1).permute(2, 0, 3, 1, 4)
        q = torch_rms(qkv[0], t(p["qnorm"]))
        k = torch_rms(qkv[1], t(p["knorm"]))
        cos, sin = t(pe[0]), t(pe[1])
        q, k = torch_rope(q, cos, sin), torch_rope(k, cos, sin)
        attn = F.scaled_dot_product_attention(q, k, qkv[2])
        attn = attn.permute(0, 2, 1, 3).reshape(b, l, -1)
        linear2_w = torch.cat([t(p["proj"]["w"]), t(p["mlp_out"]["w"])], dim=0)
        out = torch.cat([attn, F.gelu(mlp, approximate="tanh")], dim=-1)
        out = out @ linear2_w + t(p["proj"]["b"])
        want = xt + gate * out
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4, atol=2e-4)


class TestLastLayer:
    def test_adaln_final(self):
        key = jax.random.PRNGKey(11)
        d, out_d = CFG.hidden_size, CFG.in_channels
        k1, k2, k3, k4 = jax.random.split(key, 4)
        p = {
            "adaln": {"w": jax.random.normal(k1, (d, 2 * d)) * 0.02, "b": jnp.zeros(2 * d)},
            "linear": {"w": jax.random.normal(k2, (d, out_d)) * 0.02, "b": jnp.zeros(out_d)},
        }
        x = jax.random.normal(k3, (B, P, d))
        vec = jax.random.normal(k4, (B, d))
        got = last_layer(p, x, vec)
        mod = F.silu(t(vec)) @ t(p["adaln"]["w"]) + t(p["adaln"]["b"])
        shift, scale = mod.chunk(2, dim=1)
        want = (1 + scale[:, None, :]) * torch_ln(t(x)) + shift[:, None, :]
        want = want @ t(p["linear"]["w"]) + t(p["linear"]["b"])
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4, atol=2e-4)
