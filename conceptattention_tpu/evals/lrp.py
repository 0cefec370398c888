"""True epsilon-LRP (alpha1-beta0) relevance propagation for the ViT.

Re-implements the reference's hand-written torch relevance-rule stack
(`chefer_vit_explainability/modules/layers_ours.py:1-280`, `ViT_LRP.py:51-400`,
`ViT_explanation_generator.py:20-43` in manuragkhullar/ConceptAttention) as
explicit JAX propagation rules over a captured forward pass:

  - Linear: alpha1-beta0 (Deep Taylor z+ with negative-weight term),
    layers_ours.py:207-230;
  - matmul (q@kT, A@V): RelPropSimple S=R/Z redistribution, halved per
    operand (ViT_LRP.py:154-177);
  - Add (residuals): sum-preserving rescale between branches
    (layers_ours.py:100-122);
  - Clone: relevance sum over branches; LayerNorm/GELU/Softmax: identity
    pass-through (RelProp base class);
  - input conv/patchify: zB rule with per-image bounds (layers_ours.py:235-257
    first-layer branch);
  - IndexSelect (CLS pool): scatter back to token 0.

Where the reference registers forward hooks on 280 LoC of module subclasses,
the JAX version captures the forward activations functionally and walks the
rules in reverse — same math, no module state.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from conceptattention_tpu.models.vit import ViTConfig, vit_forward
from conceptattention_tpu.ops.norms import layer_norm


def safe_divide(a: jax.Array, b: jax.Array) -> jax.Array:
    """layers_ours.py:10-13 exactly: den = max(b,1e-9)+min(b,1e-9), zero-kept."""
    den = jnp.maximum(b, 1e-9) + jnp.minimum(b, 1e-9)
    den = den + (den == 0).astype(den.dtype) * 1e-9
    return a / den * (b != 0).astype(b.dtype)


def _linear_relprop(R: jax.Array, x: jax.Array, w: jax.Array) -> jax.Array:
    """alpha1-beta0 Linear rule. w is [din, dout] (JAX layout)."""
    pw, nw = jnp.maximum(w, 0), jnp.minimum(w, 0)
    px, nx = jnp.maximum(x, 0), jnp.minimum(x, 0)
    z = px @ pw + nx @ nw
    s = safe_divide(R, z)
    return px * (s @ pw.T) + nx * (s @ nw.T)


def _matmul2_relprop(R, attn, v):
    """A@V einsum rule (per operand, halved)."""
    z = jnp.einsum("bhij,bhjd->bhid", attn, v)
    s = safe_divide(R, z)
    r_attn = attn * jnp.einsum("bhid,bhjd->bhij", s, v) / 2
    r_v = v * jnp.einsum("bhij,bhid->bhjd", attn, s) / 2
    return r_attn, r_v


def _matmul1_relprop(R, q, k):
    """q@kT einsum rule (note: the reference's stored Z is UNSCALED)."""
    z = jnp.einsum("bhid,bhjd->bhij", q, k)
    s = safe_divide(R, z)
    r_q = q * jnp.einsum("bhij,bhjd->bhid", s, k) / 2
    r_k = k * jnp.einsum("bhij,bhid->bhjd", s, q) / 2
    return r_q, r_k


def _add_relprop(R, a_in, b_in):
    """Residual-add rule: per-element S=R/Z split, then branch totals
    rescaled to preserve sum(R) proportionally to |branch sums|.

    All sums are PER SAMPLE (axes 1..n, keepdims) — the reference engine only
    ever sees B=1, but batched vit_relprop calls must not couple images
    through scalar rescale factors."""
    z = a_in + b_in
    s = safe_divide(R, z)
    a = a_in * s
    b = b_in * s
    axes = tuple(range(1, R.ndim))

    def _psum(x):
        return x.sum(axis=axes, keepdims=True)

    a_sum, b_sum = _psum(a), _psum(b)
    denom = jnp.abs(a_sum) + jnp.abs(b_sum)
    a_fact = safe_divide(jnp.abs(a_sum), denom) * _psum(R)
    b_fact = safe_divide(jnp.abs(b_sum), denom) * _psum(R)
    a = a * safe_divide(a_fact, _psum(a))
    b = b * safe_divide(b_fact, _psum(b))
    return a, b


def _clone_relprop(Rs, x):
    s = sum(safe_divide(r, x) for r in Rs)
    return x * s


def _zb_relprop(R, x, w):
    """First-layer zB rule (pixel-bounded); x [B, N, Din], w [Din, Dout].
    Bounds are per-image min/max over ALL elements (layers_ours.py:238-243)."""
    pw, nw = jnp.maximum(w, 0), jnp.minimum(w, 0)
    lo = jnp.min(x, axis=(1, 2), keepdims=True) * jnp.ones_like(x)
    hi = jnp.max(x, axis=(1, 2), keepdims=True) * jnp.ones_like(x)
    za = x @ w - lo @ pw - hi @ nw + 1e-9
    s = R / za
    return x * (s @ w.T) - lo * (s @ pw.T) - hi * (s @ nw.T)


# --------------------------------------------------------------- forward ----
def _capture_forward(params, cfg: ViTConfig, images):
    """Forward pass mirroring models/vit.py, recording every tensor the
    relevance rules need. Python loop over depth (host-side introspection
    path; the jitted vit_forward stays the production path)."""
    b = images.shape[0]
    ps = cfg.patch_size
    g = images.shape[-1] // ps
    patches = images.reshape(b, cfg.in_channels, g, ps, g, ps)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(
        b, g * g, cfg.in_channels * ps * ps
    )
    x = patches @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    embed_out = x
    x = x + params["pos_embed"][:, : x.shape[1]]

    cap: Dict[str, Any] = {"patches": patches, "embed_out": embed_out, "blocks": []}
    hd = cfg.hidden_size // cfg.num_heads
    for i in range(cfg.depth):
        p = jax.tree.map(lambda a: a[i], params["blocks"])
        c: Dict[str, Any] = {"x_in": x}
        n1 = layer_norm(x, eps=1e-6) * p["norm1"]["scale"] + p["norm1"]["bias"]
        c["norm1_out"] = n1
        qkv = (n1 @ p["attn"]["qkv"]["w"] + p["attn"]["qkv"]["b"]).reshape(
            b, -1, 3, cfg.num_heads, hd
        ).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        c["q"], c["k"], c["v"] = q, k, v
        logits = jnp.einsum("bhid,bhjd->bhij", q, k) * (hd**-0.5)
        attn = jax.nn.softmax(logits, axis=-1)
        c["attn"] = attn
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        merged = out.transpose(0, 2, 1, 3).reshape(b, -1, cfg.hidden_size)
        c["attn_merged"] = merged
        attn_out = merged @ p["attn"]["proj"]["w"] + p["attn"]["proj"]["b"]
        x = x + attn_out
        c["x_mid"] = x
        n2 = layer_norm(x, eps=1e-6) * p["norm2"]["scale"] + p["norm2"]["bias"]
        c["norm2_out"] = n2
        h1 = n2 @ p["mlp_in"]["w"] + p["mlp_in"]["b"]
        c["mlp_h"] = h1
        h2 = jax.nn.gelu(h1)
        c["mlp_act"] = h2
        x = x + (h2 @ p["mlp_out"]["w"] + p["mlp_out"]["b"])
        cap["blocks"].append(c)

    cap["pre_norm"] = x
    xn = (
        layer_norm(x, eps=cfg.final_norm_eps) * params["norm"]["scale"]
        + params["norm"]["bias"]
    )
    cap["norm_out"] = xn
    cap["head_in"] = xn[:, 0]
    logits = cap["head_in"] @ params["head"]["w"] + params["head"]["b"]
    cap["logits"] = logits
    return cap


def _attn_gradients(params, cfg: ViTConfig, images, index):
    """d(target logit)/dA per layer via a zero additive delta on the
    attention probabilities (replaces the reference's backward hooks)."""
    b = images.shape[0]
    n = cfg.num_patches + 1
    zeros = jnp.zeros((cfg.depth, b, cfg.num_heads, n, n), images.dtype)

    def score(deltas):
        lg, _ = vit_forward(params, cfg, images, return_attn=True, attn_deltas=deltas)
        return jnp.take_along_axis(lg, index[:, None], axis=-1).sum()

    return jax.grad(score)(zeros)


def _rollout(cams: jax.Array, start_layer: int = 0) -> jax.Array:
    """ViT_LRP.py:38-50's OWN compute_rollout_attention — unlike the
    generator's (ViT_explanation_generator.py:7-18), the row normalization is
    commented out upstream, so the relprop-based methods (rollout /
    transformer_attribution) multiply raw (A + I) matrices. The normalized
    variant lives in evals/baselines.attention_rollout (used by the
    raw-attention rollout baseline, which matches generate_rollout)."""
    n = cams.shape[-1]
    eye = jnp.eye(n)[None]
    a = cams + eye
    joint = a[start_layer]
    for i in range(start_layer + 1, a.shape[0]):
        joint = a[i] @ joint
    return joint


def vit_relprop(
    params,
    cfg: ViTConfig,
    images: jax.Array,
    index: Optional[jax.Array] = None,
    method: str = "transformer_attribution",
    start_layer: int = 0,
    is_ablation: bool = False,
) -> jax.Array:
    """ViT_LRP.VisionTransformer.relprop + LRP.generate_LRP equivalent.

    Returns: [B, N] patch relevance for rollout/transformer_attribution/
    last_layer/last_layer_attn/second_layer; [B, H_img, W_img] pixel
    relevance for "full".
    """
    cap = _capture_forward(params, cfg, images)
    logits = cap["logits"]
    if index is None:
        index = jnp.argmax(logits, axis=-1)

    b, n_cls = logits.shape
    one_hot = jax.nn.one_hot(index, n_cls, dtype=logits.dtype)

    # head -> pool -> norm(identity) backward walk.
    R = _linear_relprop(one_hot, cap["head_in"], params["head"]["w"])  # [B, D]
    R = R[:, None, :]
    # IndexSelect: Z = norm_out[:, 0:1]; scatter S*X back to token 0.
    z = cap["norm_out"][:, 0:1]
    s = safe_divide(R, z)
    n_tokens = cap["norm_out"].shape[1]
    R = jnp.pad(z * s, ((0, 0), (0, n_tokens - 1), (0, 0)))
    # LayerNorm: identity.

    attn_cams: List[jax.Array] = [None] * cfg.depth
    for i in reversed(range(cfg.depth)):
        p = jax.tree.map(lambda a: a[i], params["blocks"])
        c = cap["blocks"][i]
        # add2: inputs (x_mid, mlp_out)
        mlp_out_val = c["mlp_act"] @ p["mlp_out"]["w"] + p["mlp_out"]["b"]
        cam1, cam2 = _add_relprop(R, c["x_mid"], mlp_out_val)
        cam2 = _linear_relprop(cam2, c["mlp_act"], p["mlp_out"]["w"])
        # GELU: identity.
        cam2 = _linear_relprop(cam2, c["norm2_out"], p["mlp_in"]["w"])
        # norm2: identity. clone2 merges.
        R = _clone_relprop([cam1, cam2], c["x_mid"])

        # add1: inputs (x_in, attn_out)
        attn_out_val = c["attn_merged"] @ p["attn"]["proj"]["w"] + p["attn"]["proj"]["b"]
        cam1, cam2 = _add_relprop(R, c["x_in"], attn_out_val)
        cam2 = _linear_relprop(cam2, c["attn_merged"], p["attn"]["proj"]["w"])
        hd = cfg.hidden_size // cfg.num_heads
        cam2 = cam2.reshape(b, -1, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        cam_attn, cam_v = _matmul2_relprop(cam2, c["attn"], c["v"])
        attn_cams[i] = cam_attn
        # softmax: identity.
        cam_q, cam_k = _matmul1_relprop(cam_attn, c["q"], c["k"])
        # fused qkv: stack (3, H, d) -> (b, n, 3*H*d), Linear rule.
        cam_qkv = jnp.stack([cam_q, cam_k, cam_v], axis=0)  # [3, B, H, N, d]
        cam_qkv = cam_qkv.transpose(1, 3, 0, 2, 4).reshape(b, -1, 3 * cfg.hidden_size)
        cam2 = _linear_relprop(cam_qkv, c["norm1_out"], p["attn"]["qkv"]["w"])
        # norm1: identity. clone1 merges.
        R = _clone_relprop([cam1, cam2], c["x_in"])

    if method == "full":
        # add([embed_out, pos_embed]) -> take patch tokens -> zB to pixels.
        cam_x, _ = _add_relprop(
            R, cap["embed_out"],
            jnp.broadcast_to(params["pos_embed"], cap["embed_out"].shape),
        )
        cam_x = cam_x[:, 1:]
        cam_pix = _zb_relprop(cam_x, cap["patches"], params["patch_embed"]["w"])
        # [B, N, C*ps*ps] -> pixel grid, sum over channels (ViT_LRP.py:341-345).
        ps, g = cfg.patch_size, cfg.grid
        cam_pix = cam_pix.reshape(b, g, g, cfg.in_channels, ps, ps)
        cam_pix = cam_pix.transpose(0, 3, 1, 4, 2, 5).reshape(
            b, cfg.in_channels, g * ps, g * ps
        )
        return cam_pix.sum(axis=1)

    if method == "rollout":
        cams = jnp.stack(
            [jnp.mean(jnp.maximum(c, 0), axis=1) for c in attn_cams]
        )  # head-mean of clamped attn relevance
        joint = _rollout(cams, start_layer)
        return joint[:, 0, 1:]

    if method in ("transformer_attribution", "grad"):
        grads = _attn_gradients(params, cfg, images, index)
        cams = jnp.stack([
            jnp.mean(jnp.maximum(g_ * c_, 0), axis=1)
            for g_, c_ in zip(grads, attn_cams)
        ])
        joint = _rollout(cams, start_layer)
        return joint[:, 0, 1:]

    if method in ("last_layer", "second_layer"):
        li = cfg.depth - 1 if method == "last_layer" else 1
        cam = attn_cams[li]
        if is_ablation:
            grads = _attn_gradients(params, cfg, images, index)
            cam = cam * grads[li]
        cam = jnp.mean(jnp.maximum(cam, 0), axis=1)
        return cam[:, 0, 1:]

    if method == "last_layer_attn":
        cam = cap["blocks"][-1]["attn"]
        cam = jnp.mean(jnp.maximum(cam, 0), axis=1)
        return cam[:, 0, 1:]

    raise ValueError(f"unknown method {method!r}")
