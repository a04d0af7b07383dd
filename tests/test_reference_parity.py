"""End-to-end numeric parity vs the ACTUAL reference torch model.

Builds the reference ``ViT_face_landmark_patch8``
(``/root/reference/face_pre_pro/ViT_face.py:560-795``) and ``DINOHead``
(``vision_transformer.py:265-301``) on CPU torch with random weights, maps
the state_dict through ``import_torch_state_dict``, and asserts the flax
forward reproduces the torch embeddings to cosine ≥ 1 − 1e-3 (the
BASELINE.json interop bar). Covers with_land=True (stn BN stats), the SSL
token path, CosFace logits, and the DINOHead weight-norm.

The reference package needs ``timm`` (absent here) only for DropPath /
trunc_normal_ — stubbed below; eval-mode parity is unaffected (DropPath is
identity in eval).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig  # noqa: E402
from lafs_cvpr2024_tpu.train.checkpoint import (  # noqa: E402
    import_torch_state_dict,
    merge_params,
)


def _stub_timm():
    if "timm.models.layers" in sys.modules:
        return
    import torch.nn as tnn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode identity (parity runs eval only)
            return x

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    layers.DropPath = DropPath
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    # torchvision.models is imported by the reference but only touched in
    # commented-out code paths — a bare stub module suffices
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv.models = tv_models
    sys.modules.update(
        {"timm": timm, "timm.models": models, "timm.models.layers": layers,
         "torchvision": tv, "torchvision.models": tv_models}
    )


@pytest.fixture(scope="module")
def ref():
    if not os.path.isdir(REF):
        pytest.skip("reference repo unavailable")
    _stub_timm()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import face_pre_pro.ViT_face as ref_vit

    return ref_vit


def _cosine_rows(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-12)


DIM, DEPTH, HEADS, MLP = 768, 2, 11, 512
NCLS = 32


def _flax_variables(cfg, sd):
    """Init our model, overlay every imported tensor (merge asserts shapes)."""
    model = PartFViT(cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    labels = jnp.zeros((2,), jnp.int32) if cfg.loss_type != "None" else None
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, labels
    )
    params, stats = import_torch_state_dict(sd)
    new_params = merge_params(variables["params"], params)
    out = {"params": new_params}
    if "batch_stats" in variables:
        out["batch_stats"] = merge_params(variables["batch_stats"], stats)
    # parity requires every torch tensor to have landed in our tree
    return model, out, (params, stats)


def test_with_land_embedding_and_cosface_parity(ref):
    torch.manual_seed(0)
    tm = ref.ViT_face_landmark_patch8(
        loss_type="CosFace", GPU_ID=None, num_class=NCLS, image_size=112,
        patch_size=8, dim=DIM, depth=DEPTH, heads=HEADS, mlp_dim=MLP,
        with_land=True,
    ).eval()
    # randomize BN running stats: at init they are 0/1 in BOTH frameworks,
    # which would mask a batch_stats mapping bug — make them information
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0, 0.5)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)
    cfg = PartFViTConfig(
        dim=DIM, depth=DEPTH, heads=HEADS, mlp_dim=MLP, num_classes=NCLS,
        with_land=True, loss_type="CosFace",
    )
    model, variables, _ = _flax_variables(cfg, tm.state_dict())

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        emb_t = tm(torch.from_numpy(x)).numpy()
    emb_j = np.asarray(
        jax.jit(lambda v, a: model.apply(v, a, train=False))(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
    )
    cos = _cosine_rows(emb_t, emb_j)
    assert cos.min() >= 1 - 1e-3, f"embedding cosine {cos}"

    # CosFace logits (labels path): s·(cosθ − m·y), identical weight rows
    labels = np.array([1, 7])
    with torch.no_grad():
        logits_t, theta_t = tm(torch.from_numpy(x), torch.from_numpy(labels))
    logits_j, theta_j = jax.jit(
        lambda v, a, l: model.apply(v, a, l, train=False)
    )(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(labels))
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), atol=5e-2, rtol=0
    )
    # landmarks themselves must agree (pixels in [0, 111])
    np.testing.assert_allclose(
        np.asarray(theta_j), theta_t.numpy(), atol=0.5, rtol=0
    )


def test_ssl_token_path_parity(ref):
    """with_land=False + pre-gathered tokens — the SSL student/teacher path.
    Covers global (196-token) and local (36-token) crop shapes (the
    pos-embedding [:, :n+1] slice, ViT_face.py:766)."""
    torch.manual_seed(1)
    tm = ref.ViT_face_landmark_patch8(
        loss_type="None", GPU_ID=None, num_class=0, image_size=112,
        patch_size=8, dim=DIM, depth=DEPTH, heads=HEADS, mlp_dim=MLP,
        with_land=False,
    ).eval()
    cfg = PartFViTConfig(
        dim=DIM, depth=DEPTH, heads=HEADS, mlp_dim=MLP, num_classes=0,
        with_land=False, loss_type="None",
    )
    model, variables, _ = _flax_variables(cfg, tm.state_dict())
    rng = np.random.default_rng(5)
    for n_tokens in (196, 36):
        tokens = rng.normal(0, 1, (2, n_tokens, 192)).astype(np.float32)
        with torch.no_grad():
            emb_t = tm(torch.from_numpy(tokens)).numpy()
        emb_j = np.asarray(
            jax.jit(lambda v, a: model.apply(v, a, train=False))(
                variables, jnp.asarray(tokens)
            )
        )
        cos = _cosine_rows(emb_t, emb_j)
        assert cos.min() >= 1 - 1e-3, f"{n_tokens}-token cosine {cos}"


def test_dino_head_parity(ref):
    torch.manual_seed(2)
    import vision_transformer as ref_vits

    th = ref_vits.DINOHead(DIM, 1024, norm_last_layer=True, hidden_dim=64,
                           bottleneck_dim=32).eval()
    from lafs_cvpr2024_tpu.models.heads import DINOHead

    jh = DINOHead(in_dim=DIM, out_dim=1024, hidden_dim=64, bottleneck_dim=32)
    base = jax.jit(jh.init)(jax.random.PRNGKey(0), jnp.zeros((2, DIM)))
    params, _ = import_torch_state_dict(th.state_dict())
    merged = merge_params(base["params"], params)
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (4, DIM)).astype(np.float32)
    with torch.no_grad():
        out_t = th(torch.from_numpy(x)).numpy()
    out_j = np.asarray(jh.apply({"params": merged}, jnp.asarray(x)))
    cos = _cosine_rows(out_t, out_j)
    assert cos.min() >= 1 - 1e-3, f"DINOHead cosine {cos}"
    np.testing.assert_allclose(out_j, out_t, atol=1e-4, rtol=0)


def test_mobile_dino_parity(ref):
    """MobileDINO (mobile_dino, ViT_face.py:1203-1217): stn features →
    mean-pool → Dense(embd_dim), eval-mode outputs match after import."""
    torch.manual_seed(4)
    tm = ref.mobile_dino(embd_dim=64).eval()
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0, 0.5)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)
    from lafs_cvpr2024_tpu.models import MobileDINO

    jm = MobileDINO(embd_dim=64)
    x = np.random.default_rng(11).uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
    base = jax.jit(jm.init)(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    imp = import_torch_state_dict(tm.state_dict(), strict=True)
    variables = {
        "params": merge_params(base["params"], imp.params["landmark"]),
        "batch_stats": merge_params(base["batch_stats"], imp.stats["landmark"]),
    }
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x)).numpy()
    out_j = np.asarray(
        jax.jit(lambda v, a: jm.apply(v, a, train=False))(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
    )
    cos = _cosine_rows(out_t, out_j)
    assert cos.min() >= 1 - 1e-3, f"mobile_dino cosine {cos}"


def test_overlap_vit_parity(ref):
    """ViTs_face_overlap (``ViT_face.py:1506-1613``): Unfold soft-split +
    BatchNorm1d head. Randomized BN running stats so the head's stats
    mapping is actually exercised."""
    from lafs_cvpr2024_tpu.models.partfvit import OverlapViT

    torch.manual_seed(3)
    tm = ref.ViTs_face_overlap(
        loss_type="None", GPU_ID=None, num_class=0, image_size=112,
        patch_size=8, ac_patch_size=12, pad=4, dim=DIM, depth=DEPTH,
        heads=HEADS, mlp_dim=MLP, dropout=0.0, emb_dropout=0.0,
    ).eval()
    # randomize the BN head's running stats (fresh init is 0-mean/1-var,
    # which would hide a stats-mapping bug)
    with torch.no_grad():
        bn = tm.mlp_head[0]
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)

    x = np.random.default_rng(4).uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    with torch.no_grad():
        ref_emb = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    cfg = PartFViTConfig(
        dim=DIM, depth=DEPTH, heads=HEADS, mlp_dim=MLP, num_patches=196,
        with_land=False, loss_type="None", num_classes=0,
        dropout=0.0, emb_dropout=0.0, drop_path_rate=0.0,
    )
    model = OverlapViT(cfg, ac_patch_size=12, pad=4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((2, 112, 112, 3)))
    params, stats = import_torch_state_dict(tm.state_dict())
    merged = {
        "params": merge_params(variables["params"], params),
        "batch_stats": merge_params(variables["batch_stats"], stats),
    }
    emb = np.asarray(model.apply(merged, jnp.asarray(x)))
    cos = _cosine_rows(emb, ref_emb)
    assert cos.min() >= 1 - 1e-3, cos


def test_dino_vit_parity(ref):
    """DINO VisionTransformer (``vision_transformer.py:135-262``) — the
    SSL ``--arch vit_*`` backbone and the official DINO checkpoint dialect
    (``import_dino_vit_state_dict``)."""
    import vision_transformer as ref_vits

    from lafs_cvpr2024_tpu.models.dino_vit import VisionTransformer
    from lafs_cvpr2024_tpu.train.checkpoint import import_dino_vit_state_dict

    torch.manual_seed(5)
    tm = ref_vits.VisionTransformer(
        img_size=[96], patch_size=16, embed_dim=192, depth=2, num_heads=3,
        qkv_bias=True, drop_rate=0.0, attn_drop_rate=0.0,
    ).eval()

    jm = VisionTransformer(
        img_size=96, patch_size=16, embed_dim=192, depth=2, num_heads=3,
    )
    base = jax.jit(jm.init)(jax.random.PRNGKey(0), jnp.zeros((2, 96, 96, 3)))
    imp = import_dino_vit_state_dict(tm.state_dict(), strict=True)
    params, _ = imp
    merged = {"params": merge_params(base["params"], params)}

    x = np.random.default_rng(6).uniform(-1, 1, (2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()  # CLS embedding after norm
    out = np.asarray(jm.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1))))
    cos = _cosine_rows(out, ref_out)
    assert cos.min() >= 1 - 1e-3, cos

    # intermediate hook parity: last self-attention map
    with torch.no_grad():
        attn_t = tm.get_last_selfattention(torch.from_numpy(x)).numpy()
    attn_j = np.asarray(
        jm.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1)),
                 method=jm.get_last_selfattention)
    )
    np.testing.assert_allclose(attn_j, attn_t, atol=2e-4)


def test_global_token_variant_parity(ref):
    """ViT_face_landmark_patch8_global (``ViT_face.py:336-558``): CLS token
    replaced by a projection of the stn features (global_token Sequential →
    our Dense under the same scope)."""
    torch.manual_seed(7)
    tm = ref.ViT_face_landmark_patch8_global(
        loss_type="None", GPU_ID=None, num_class=0, image_size=112,
        patch_size=8, dim=DIM, depth=DEPTH, heads=HEADS, mlp_dim=MLP,
    ).eval()
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0, 0.5)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)

    cfg = PartFViTConfig(
        dim=DIM, depth=DEPTH, heads=HEADS, mlp_dim=MLP, num_classes=0,
        with_land=True, use_global_token=True, loss_type="None",
    )
    model, variables, _ = _flax_variables(cfg, tm.state_dict())

    x = np.random.default_rng(8).uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x))
        emb_t = (out_t[0] if isinstance(out_t, tuple) else out_t).numpy()
    out_j = jax.jit(lambda v, a: model.apply(v, a, train=False))(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    emb_j = np.asarray(out_j[0] if isinstance(out_j, tuple) else out_j)
    cos = _cosine_rows(emb_t, emb_j)
    assert cos.min() >= 1 - 1e-3, cos


def test_global_token_image_noaug_parity(ref):
    """The ``image_noaug`` call option of the global-token variant
    (``ViT_face.py:421,429-431,515-518``): landmarks AND the global token
    come from the CLEAN view, patches are gathered from the AUGMENTED view.
    Deterministic (no Random_prob), so torch and flax must agree exactly."""
    torch.manual_seed(11)
    tm = ref.ViT_face_landmark_patch8_global(
        loss_type="None", GPU_ID=None, num_class=0, image_size=112,
        patch_size=8, dim=DIM, depth=DEPTH, heads=HEADS, mlp_dim=MLP,
    ).eval()
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0, 0.5)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)
    cfg = PartFViTConfig(
        dim=DIM, depth=DEPTH, heads=HEADS, mlp_dim=MLP, num_classes=0,
        with_land=True, use_global_token=True, loss_type="None",
    )
    model, variables, _ = _flax_variables(cfg, tm.state_dict())

    rng = np.random.default_rng(12)
    # INDEPENDENT views: with aug ≈ clean + ε the landmark branch damps the
    # delta below float32 noise and the differs-from-aug-only check below
    # can't distinguish "branch ran" from "branch skipped"
    clean = rng.uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
    aug = rng.uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(aug), image_noaug=torch.from_numpy(clean))
        emb_t = (out_t[0] if isinstance(out_t, tuple) else out_t).numpy()
    emb_j = np.asarray(
        jax.jit(lambda v, a, c: model.apply(v, a, x_noaug=c, train=False))(
            variables,
            jnp.asarray(aug.transpose(0, 2, 3, 1)),
            jnp.asarray(clean.transpose(0, 2, 3, 1)),
        )
    )
    cos = _cosine_rows(emb_t, emb_j)
    assert cos.min() >= 1 - 1e-3, cos
    # NOTE: a differs-from-aug-only check is NOT possible here — at random
    # init the torch reference's stn pooled features are ~5e-9 (hardswish
    # tail), so landmarks/global token are input-independent in BOTH
    # frameworks (measured: torch emb delta 4.8e-7 between noaug and plain).
    # The x_noaug wiring's input-sensitivity is asserted in
    # tests/test_models.py::test_partfvit_global_token_call_options.


def test_iresnet_parity(ref):
    """iResNet-18, canonical insightface head (``iresnet.py:136-229``,
    class IResNet): BN-first blocks, PReLU, NCHW-flatten fc, frozen-scale
    features BN — the layout of published insightface checkpoints. The
    reference forward ships a LIVE pdb.set_trace (iresnet.py:215) —
    neutralized for the test."""
    import pdb as pdb_mod

    import face_pre_pro.iresnet as ref_ires

    from lafs_cvpr2024_tpu.models.iresnet import iresnet18
    from lafs_cvpr2024_tpu.train.checkpoint import import_iresnet_state_dict

    torch.manual_seed(9)
    tm = ref_ires.IResNet(
        ref_ires.IBasicBlock, [2, 2, 2, 2], num_features=64
    ).eval()
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0, 0.5)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)

    jm = iresnet18(num_features=64)
    base = jax.jit(jm.init)(jax.random.PRNGKey(0), jnp.zeros((2, 112, 112, 3)))
    imp = import_iresnet_state_dict(tm.state_dict(), strict=True)
    params, stats = imp
    merged = {
        "params": merge_params(base["params"], params),
        "batch_stats": merge_params(base["batch_stats"], stats),
    }

    x = np.random.default_rng(10).uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
    orig_trace = pdb_mod.set_trace
    pdb_mod.set_trace = lambda *a, **kw: None
    try:
        with torch.no_grad():
            emb_t = tm(torch.from_numpy(x)).numpy()
    finally:
        pdb_mod.set_trace = orig_trace
    emb_j = np.asarray(
        jax.jit(lambda v, a: jm.apply(v, a, train=False))(
            merged, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
    )
    cos = _cosine_rows(emb_t, emb_j)
    assert cos.min() >= 1 - 1e-3, cos


def test_iresnet_avgpool_variant_parity(ref):
    """The reference's SHIPPED factory (``iresnet.py:446-450``) builds
    IResNet_withloss_avg: bn2 → global avg pool → features BN, no fc.
    Ours: ``IResNet(avg_pool=True)``."""
    import pdb as pdb_mod

    import face_pre_pro.iresnet as ref_ires

    from lafs_cvpr2024_tpu.models.iresnet import iresnet18
    from lafs_cvpr2024_tpu.train.checkpoint import import_iresnet_state_dict

    torch.manual_seed(11)
    tm = ref_ires.iresnet18().eval()  # avg variant, 512-wide embedding
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0, 0.5)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)
        # the avg variant TRAINS the features BN scale (the freeze line is
        # commented out in the reference, iresnet.py:385-386) — simulate a
        # drifted checkpoint; the importer must map it, not raise
        tm.features.weight.uniform_(0.8, 1.2)

    jm = iresnet18(avg_pool=True)
    base = jax.jit(jm.init)(jax.random.PRNGKey(0), jnp.zeros((2, 112, 112, 3)))
    params, stats = import_iresnet_state_dict(tm.state_dict(), strict=True)
    merged = {
        "params": merge_params(base["params"], params),
        "batch_stats": merge_params(base["batch_stats"], stats),
    }
    x = np.random.default_rng(12).uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
    orig = pdb_mod.set_trace
    pdb_mod.set_trace = lambda *a, **k: None
    try:
        with torch.no_grad():
            emb_t = tm(torch.from_numpy(x)).numpy()
    finally:
        pdb_mod.set_trace = orig
    emb_j = np.asarray(
        jax.jit(lambda v, a: jm.apply(v, a, train=False))(
            merged, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
    )
    cos = _cosine_rows(emb_t, emb_j)
    assert cos.min() >= 1 - 1e-3, cos


def test_gnn_parity(ref):
    """Reference ``GNN`` (ViT_face.py:228-334): residual gated graph conv
    with edge state, per-edge/per-node BatchNorm1d quirks, softmax-over-
    source gates, relu-after-residual. Eval mode with randomized BN
    running stats; weights mapped by hand (bias-free linears + 2 BNs)."""
    torch.manual_seed(3)
    N, C = 5, 8
    tm = ref.GNN(in_channels=C, num_classes=N).eval()
    with torch.no_grad():
        for bn in (tm.bne1, tm.bnv1):
            bn.weight.copy_(1.0 + 0.2 * torch.randn_like(bn.weight))
            bn.bias.copy_(0.1 * torch.randn_like(bn.bias))
            bn.running_mean.copy_(0.3 * torch.randn_like(bn.running_mean))
            bn.running_var.copy_(
                (1.0 + 0.2 * torch.randn_like(bn.running_var)).abs()
            )
    x_t = torch.randn(2, N, C)
    e_t = torch.randn(2, N * N, C)
    # the reference forward is GPU-only by accident: `start`/`end` are only
    # bound inside `if x.get_device() >= 0:` (ViT_face.py:294-297), so CPU
    # hits UnboundLocalError. Pretend device 0 and make `.to(0)` a no-op so
    # the reference's OWN code path runs unmodified on CPU torch.
    orig_to = torch.Tensor.to
    orig_get_device = torch.Tensor.get_device

    def fake_to(self, *a, **kw):
        if a and isinstance(a[0], int):
            return self
        return orig_to(self, *a, **kw)

    torch.Tensor.to = fake_to
    torch.Tensor.get_device = lambda self: 0
    try:
        with torch.no_grad():
            y_t, edge_t = tm(x_t, e_t)
    finally:
        torch.Tensor.to = orig_to
        torch.Tensor.get_device = orig_get_device

    from lafs_cvpr2024_tpu.models.gnn import GatedGraphConv

    m = GatedGraphConv(C)
    x = jnp.asarray(x_t.numpy())
    e = jnp.asarray(e_t.numpy().reshape(2, N, N, C))

    def k(lin):
        return jnp.asarray(lin.weight.detach().numpy().T)

    params = {
        "A1": {"kernel": k(tm.A1)}, "B1": {"kernel": k(tm.B1)},
        "E1": {"kernel": k(tm.E1)}, "U1": {"kernel": k(tm.U1)},
        "V1": {"kernel": k(tm.V1)},
        "bne1": {"scale": jnp.asarray(tm.bne1.weight.detach().numpy()),
                 "bias": jnp.asarray(tm.bne1.bias.detach().numpy())},
        "bnv1": {"scale": jnp.asarray(tm.bnv1.weight.detach().numpy()),
                 "bias": jnp.asarray(tm.bnv1.bias.detach().numpy())},
    }
    stats = {
        "bne1": {"mean": jnp.asarray(tm.bne1.running_mean.numpy()),
                 "var": jnp.asarray(tm.bne1.running_var.numpy())},
        "bnv1": {"mean": jnp.asarray(tm.bnv1.running_mean.numpy()),
                 "var": jnp.asarray(tm.bnv1.running_var.numpy())},
    }
    y, edge = m.apply(
        {"params": params, "batch_stats": stats}, x, e, train=False
    )
    np.testing.assert_allclose(
        np.asarray(y), y_t.numpy(), atol=2e-5, rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(edge).reshape(2, N * N, C), edge_t.numpy(),
        atol=2e-5, rtol=2e-5,
    )


def test_dino_vit_export_loads_reference_strict(ref):
    """REVERSE interop: a vanilla vit_* teacher trained HERE exports to the
    DINO torch dialect (export_dino_vit_state_dict) and loads into the
    reference's VisionTransformer with strict=True, reproducing our
    embeddings — the hand-checkpoints-back-to-torch-users path."""
    import vision_transformer as ref_vits

    from lafs_cvpr2024_tpu.models.dino_vit import VisionTransformer
    from lafs_cvpr2024_tpu.train.checkpoint import export_dino_vit_state_dict

    jm = VisionTransformer(
        img_size=96, patch_size=16, embed_dim=192, depth=2, num_heads=3,
    )
    v = jax.jit(jm.init)(jax.random.PRNGKey(9), jnp.zeros((2, 96, 96, 3)))
    sd = export_dino_vit_state_dict(v["params"])

    tm = ref_vits.VisionTransformer(
        img_size=[96], patch_size=16, embed_dim=192, depth=2, num_heads=3,
        qkv_bias=True, drop_rate=0.0, attn_drop_rate=0.0,
    ).eval()
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(a)) for k, a in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected

    x = np.random.default_rng(10).uniform(-1, 1, (2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()
    out = np.asarray(jm.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1))))
    cos = _cosine_rows(out, ref_out)
    assert cos.min() >= 1 - 1e-3, cos


def test_iresnet_pth_drives_eval_loader(ref, tmp_path):
    """An insightface-dialect .pth (the published-checkpoint form) drives
    load_eval_model end-to-end: the dialect routes to
    import_iresnet_state_dict, tree_family says iresnet, and the loaded
    apply matches the torch forward — the eval/serving CLIs can consume
    iResNet checkpoints directly."""
    import pdb as pdb_mod

    import face_pre_pro.iresnet as ref_ires

    from lafs_cvpr2024_tpu.eval.loading import load_eval_model

    torch.manual_seed(11)
    tm = ref_ires.IResNet(
        ref_ires.IBasicBlock, [2, 2, 2, 2], num_features=64
    ).eval()
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0, 0.5)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)
    pth = tmp_path / "iresnet18.pth"
    torch.save(tm.state_dict(), str(pth))

    loaded = load_eval_model(str(pth), log=lambda m: None)
    assert loaded.family == "iresnet"
    assert loaded.model.layers == (2, 2, 2, 2)
    assert loaded.model.num_features == 64
    assert loaded.model.avg_pool is False

    x = np.random.default_rng(12).uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
    orig_trace = pdb_mod.set_trace
    pdb_mod.set_trace = lambda *a, **kw: None
    try:
        with torch.no_grad():
            emb_t = tm(torch.from_numpy(x)).numpy()
    finally:
        pdb_mod.set_trace = orig_trace
    emb_j = np.asarray(
        loaded.model.apply(
            loaded.variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
            train=False,
        )
    )
    cos = _cosine_rows(emb_t, emb_j)
    assert cos.min() >= 1 - 1e-3, cos
