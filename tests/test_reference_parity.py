"""Parity vs the ACTUAL reference implementation at /root/reference.

Round-1 tests checked block math against a builder-written torch oracle;
these import the reference's own runnable modules
(`concept_attention/modified_double_stream_block.py`,
`modified_flux_dit.py`, `concept_attention_pipeline.py`) at tiny config on
CPU, export the torch state dict through `weights/convert.py`, and assert
fp32 agreement of block outputs, the 4 concept-attention vector sets, the
final prediction, and the heatmap post-processing.

The reference package needs `entmax` and `torchvision`, which this image
lacks: `torchvision` is stubbed empty (only pulled in by segmentation.py's
image IO, unused here); `entmax` is stubbed with exact sort-based torch
implementations written fresh from the sparsemax / 1.5-entmax closed forms
(Martins & Astudillo 2016 eq. 8; Peters et al. 2019 alg. 2) — independent of
both the entmax package and our JAX ops/sparse.py.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Imported reference modules (skip the whole file if unavailable)."""
    from tests._ref_compat import install_reference

    install_reference()
    try:
        from concept_attention import concept_attention_pipeline
        from concept_attention.modified_double_stream_block import (
            ModifiedDoubleStreamBlock,
        )
        from concept_attention.modified_flux_dit import FluxParams, ModifiedFluxDiT
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    return types.SimpleNamespace(
        pipeline=concept_attention_pipeline,
        DoubleBlock=ModifiedDoubleStreamBlock,
        FluxParams=FluxParams,
        DiT=ModifiedFluxDiT,
    )


# ------------------------------------------------------------- fixtures ----
from conceptattention_tpu.config import configs  # noqa: E402
from conceptattention_tpu.models.flux.blocks import double_block  # noqa: E402
from conceptattention_tpu.models.flux.dit import flux_forward  # noqa: E402
from conceptattention_tpu.ops.attention import ConceptAttentionSpec  # noqa: E402
from conceptattention_tpu.ops.packing import make_img_ids  # noqa: E402
from conceptattention_tpu.ops.rope import embed_nd  # noqa: E402
from conceptattention_tpu.weights.convert import convert_flux_state_dict  # noqa: E402

CFG = configs["flux-tiny"].params
B, T, C = 1, 4, 3
GRID = (4, 4)
P = GRID[0] * GRID[1]


def _j(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.detach().numpy(), jnp.float32)


@pytest.fixture(scope="module")
def ref_dit(ref):
    torch.manual_seed(7)
    params = ref.FluxParams(
        in_channels=CFG.in_channels,
        vec_in_dim=CFG.vec_in_dim,
        context_in_dim=CFG.context_in_dim,
        hidden_size=CFG.hidden_size,
        mlp_ratio=CFG.mlp_ratio,
        num_heads=CFG.num_heads,
        depth=CFG.depth,
        depth_single_blocks=CFG.depth_single_blocks,
        axes_dim=list(CFG.axes_dim),
        theta=CFG.theta,
        qkv_bias=CFG.qkv_bias,
        guidance_embed=CFG.guidance_embed,
    )
    model = ref.DiT(params).float().eval()
    return model


@pytest.fixture(scope="module")
def jax_params(ref_dit):
    sd = {k: v.numpy() for k, v in ref_dit.state_dict().items()}
    return convert_flux_state_dict(sd, CFG, dtype=jnp.float32)


@pytest.fixture(scope="module")
def inputs():
    torch.manual_seed(11)
    img_ids = np.asarray(make_img_ids(*GRID, batch_size=B), np.float32)
    return dict(
        img=torch.randn(B, P, CFG.in_channels),
        img_ids=torch.from_numpy(img_ids),
        txt=torch.randn(B, T, CFG.context_in_dim),
        txt_ids=torch.zeros(B, T, 3),
        concepts=torch.randn(B, C, CFG.context_in_dim),
        concept_ids=torch.zeros(B, C, 3),
        concept_vec=torch.zeros(B, CFG.vec_in_dim),
        timesteps=torch.full((B,), 0.5),
        y=torch.randn(B, CFG.vec_in_dim),
    )


# ----------------------------------------------------------------- tests ----
@pytest.mark.parametrize(
    "cross,self_",
    [(True, True), (True, False), (False, True), (False, False)],
)
def test_double_block_parity(ref, ref_dit, jax_params, inputs, cross, self_):
    """Block outputs + all 4 vector sets vs the reference block, per
    joint_attention_kwargs ablation (modified_double_stream_block.py:126-171)."""
    block = ref_dit.double_blocks[0]
    h = CFG.hidden_size
    torch.manual_seed(3)
    img = torch.randn(B, P, h)
    txt = torch.randn(B, T, h)
    con = torch.randn(B, C, h)
    vec = torch.randn(B, h)
    cvec = torch.randn(B, h)

    pe_t = ref_dit.pe_embedder(torch.cat((inputs["txt_ids"], inputs["img_ids"]), 1))
    cpe_t = ref_dit.pe_embedder(
        torch.cat((inputs["concept_ids"], inputs["img_ids"]), 1)
    )
    with torch.no_grad():
        r_img, r_txt, r_con, r_dict = block(
            img=img.clone(), txt=txt.clone(), vec=vec, pe=pe_t,
            concepts=con.clone(), concept_vec=cvec, concept_pe=cpe_t,
            joint_attention_kwargs={
                "concept_cross_attention": cross,
                "concept_self_attention": self_,
            },
        )

    ids = jnp.concatenate([_j(inputs["txt_ids"]), _j(inputs["img_ids"])], axis=1)
    cids = jnp.concatenate([_j(inputs["concept_ids"]), _j(inputs["img_ids"])], axis=1)
    pe = embed_nd(ids, CFG.axes_dim, CFG.theta)
    cpe = embed_nd(cids, CFG.axes_dim, CFG.theta)
    spec = ConceptAttentionSpec(
        cross_attention=cross, self_attention=self_, return_raw_vectors=True
    )
    p0 = jax.tree.map(lambda x: x[0], jax_params["double"])
    j_img, j_txt, j_con, sal = double_block(
        p0, _j(img), _j(txt), _j(vec), pe, CFG.num_heads,
        concepts=_j(con), concept_vec=_j(cvec), concept_pe=cpe, spec=spec,
    )

    atol = 3e-5
    np.testing.assert_allclose(np.asarray(j_img), r_img.numpy(), atol=atol, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_txt), r_txt.numpy(), atol=atol, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_con), r_con.numpy(), atol=atol, rtol=1e-4)
    for key in (
        "output_space_concept_vectors",
        "output_space_image_vectors",
        "cross_attention_concept_vectors",
        "cross_attention_image_vectors",
    ):
        got = np.asarray(sal[key], np.float32)
        want = r_dict[key].numpy()
        if got.ndim == 4 and want.ndim == 3:  # [B,H,L,D] vs merged [B,L,H*D]
            got = got.transpose(0, 2, 1, 3).reshape(want.shape)
        if want.ndim == 4 and got.ndim == 3:
            want = want.transpose(0, 2, 1, 3).reshape(got.shape)
        np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4, err_msg=key)


def test_dit_forward_parity(ref, ref_dit, jax_params, inputs):
    """Full modified-DiT forward: prediction + stacked per-layer vector sets
    (modified_flux_dit.py:75-163)."""
    with torch.no_grad():
        r_pred, r_dict = ref_dit(**inputs)

    spec = ConceptAttentionSpec(return_raw_vectors=True)
    j_pred, sal = flux_forward(
        jax_params, CFG,
        img=_j(inputs["img"]), img_ids=_j(inputs["img_ids"]),
        txt=_j(inputs["txt"]), txt_ids=_j(inputs["txt_ids"]),
        timesteps=_j(inputs["timesteps"]), y=_j(inputs["y"]),
        concepts=_j(inputs["concepts"]), concept_ids=_j(inputs["concept_ids"]),
        concept_vec=_j(inputs["concept_vec"]), spec=spec,
    )
    np.testing.assert_allclose(
        np.asarray(j_pred), r_pred.numpy(), atol=5e-5, rtol=1e-4
    )
    for key in (
        "output_space_concept_vectors",
        "output_space_image_vectors",
        "cross_attention_concept_vectors",
        "cross_attention_image_vectors",
    ):
        got = np.asarray(sal[key], np.float32)
        want = r_dict[key].numpy()
        if got.ndim == 5 and want.ndim == 4:  # [L,B,H,S,D] vs [L,B,S,H*D]
            got = got.transpose(0, 1, 3, 2, 4).reshape(want.shape)
        if want.ndim == 5 and got.ndim == 4:
            want = want.transpose(0, 1, 3, 2, 4).reshape(got.shape)
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4, err_msg=key)


@pytest.mark.parametrize("norm", ["softmax", "sparsemax", "entmax15"])
@pytest.mark.parametrize("normalize_concepts", [False, True])
def test_heatmaps_parity(ref, norm, normalize_concepts):
    """compute_heatmaps_from_vectors vs the reference post-processing
    (concept_attention_pipeline.py:29-91; patch grid fixed 64x64 there)."""
    from conceptattention_tpu.pipeline.heatmaps import compute_heatmaps_from_vectors

    rng = np.random.default_rng(0)
    t, l, b, p, c, d = 2, 3, 1, 64 * 64, 4, 8
    iv = rng.standard_normal((t, l, b, p, d)).astype(np.float32)
    cv = rng.standard_normal((t, l, b, c, d)).astype(np.float32)
    layer_indices = [0, 2]
    timesteps = [1]

    want = ref.pipeline.compute_heatmaps_from_vectors(
        torch.from_numpy(iv), torch.from_numpy(cv),
        layer_indices=layer_indices, timesteps=timesteps,
        softmax=False, normalize_concepts=normalize_concepts,
        attention_norm=norm,
    ).numpy()
    got = compute_heatmaps_from_vectors(
        jnp.asarray(iv), jnp.asarray(cv),
        layer_indices=layer_indices, timesteps=timesteps,
        softmax=False, normalize_concepts=normalize_concepts,
        attention_norm=norm,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)
