"""Eval harness tests: ROC/KFold vs sklearn-equivalent oracles, Umeyama vs
direct construction, IJB aggregation semantics, bin round-trip."""

import io
import pickle

import numpy as np
import pytest
from PIL import Image

from lafs_cvpr2024_tpu.eval import (
    IJBConfig,
    evaluate,
    fuse_features,
    image2template_feature,
    kfold_indices,
    load_bin,
    pair_scores,
    perform_val,
    roc_curve,
    run_ijb_protocol,
    tpr_at_fpr_table,
    umeyama,
    warp_affine,
)


def test_kfold_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.model_selection")
    for n in (20, 23):
        ours = list(kfold_indices(n, 10))
        theirs = list(sklearn.KFold(n_splits=10, shuffle=False).split(np.arange(n)))
        for (tr_a, te_a), (tr_b, te_b) in zip(ours, theirs):
            np.testing.assert_array_equal(tr_a, tr_b)
            np.testing.assert_array_equal(te_a, te_b)


def test_evaluate_separable_embeddings():
    """Same-pairs close, diff-pairs far → accuracy 1.0."""
    rng = np.random.default_rng(0)
    n_pairs = 100
    emb = np.zeros((n_pairs * 2, 8))
    issame = []
    for i in range(n_pairs):
        same = i % 2 == 0
        base = rng.standard_normal(8)
        emb[2 * i] = base
        emb[2 * i + 1] = base + rng.standard_normal(8) * (0.01 if same else 2.0)
        issame.append(same)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    tpr, fpr, acc, thr = evaluate(emb, issame)
    assert acc.mean() > 0.95


def test_evaluate_random_embeddings_chance():
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((400, 8))
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    issame = [i % 2 == 0 for i in range(200)]
    _, _, acc, _ = evaluate(emb, issame)
    assert 0.3 < acc.mean() < 0.7


def test_perform_val_identity_model():
    """embed_fn returns flattened pixels → same images match perfectly."""
    rng = np.random.default_rng(2)
    n_pairs = 40
    imgs = np.zeros((2, n_pairs * 2, 8, 8, 3), np.uint8)
    issame = np.zeros(n_pairs, bool)
    for i in range(n_pairs):
        a = rng.integers(0, 255, (8, 8, 3), np.uint8)
        issame[i] = i % 2 == 0
        b = a if issame[i] else rng.integers(0, 255, (8, 8, 3), np.uint8)
        imgs[0, 2 * i], imgs[0, 2 * i + 1] = a, b
        imgs[1, 2 * i], imgs[1, 2 * i + 1] = a[:, ::-1], b[:, ::-1]

    def embed(batch):
        return batch.reshape(batch.shape[0], -1)

    res = perform_val(embed, imgs, issame, batch_size=16)
    assert res.accuracy > 0.95
    assert res.xnorm > 0


def test_load_bin_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    n_pairs = 4
    bins = []
    for _ in range(n_pairs * 2):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (112, 112, 3), np.uint8)).save(
            buf, format="JPEG"
        )
        bins.append(buf.getvalue())
    issame = [True, False, True, False]
    p = tmp_path / "lfw.bin"
    with open(p, "wb") as f:
        pickle.dump((bins, issame), f)
    data, got_issame = load_bin(str(p))
    assert data.shape == (2, 8, 112, 112, 3)
    np.testing.assert_array_equal(got_issame, issame)
    # flip copy is the horizontal mirror
    np.testing.assert_array_equal(data[1, 0], data[0, 0][:, ::-1])


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(4)
    src = rng.uniform(0, 100, (5, 2)).astype(np.float64)
    angle, scale, t = 0.3, 1.7, np.array([5.0, -3.0])
    R = np.array([[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]])
    dst = scale * src @ R.T + t
    T = umeyama(src, dst)
    got = src @ T[:2, :2].T + T[:2, 2]
    np.testing.assert_allclose(got, dst, atol=1e-8)


def test_umeyama_matches_independent_linear_lsq():
    """Non-skipping oracle twin of the skimage golden below (skimage is
    absent in this env, which would leave that claim resting on a
    permanently-skipped test): a 2-D similarity transform s·R + t with
    det(R)>0 is EXACTLY the linear family [[a,-b],[b,a]]x + t, so the
    least-squares optimum is solvable by plain ``lstsq`` over (a,b,tx,ty)
    — an independent derivation with none of Umeyama's SVD machinery.
    On generic noisy correspondences both must find the same minimizer."""
    rng = np.random.default_rng(7)
    for _ in range(5):
        src = rng.uniform(0, 112, (5, 2))
        dst = rng.uniform(0, 112, (5, 2))  # unrelated points: noisy fit
        # design matrix for dst ≈ [[a,-b],[b,a]] @ src + t
        n = len(src)
        A = np.zeros((2 * n, 4))
        A[0::2, 0] = src[:, 0]
        A[0::2, 1] = -src[:, 1]
        A[0::2, 2] = 1.0
        A[1::2, 0] = src[:, 1]
        A[1::2, 1] = src[:, 0]
        A[1::2, 3] = 1.0
        (a, b, tx, ty), *_ = np.linalg.lstsq(A, dst.ravel(), rcond=None)
        T_lsq = np.array([[a, -b, tx], [b, a, ty], [0.0, 0.0, 1.0]])
        T = umeyama(src, dst)
        np.testing.assert_allclose(T, T_lsq, atol=1e-8)


def test_umeyama_matches_skimage():
    skimage_t = pytest.importorskip("skimage.transform")
    rng = np.random.default_rng(5)
    src = rng.uniform(0, 112, (5, 2))
    dst = rng.uniform(0, 112, (5, 2))
    tf = skimage_t.SimilarityTransform()
    tf.estimate(src, dst)
    T = umeyama(src, dst)
    np.testing.assert_allclose(T, tf.params, atol=1e-8)


def test_warp_affine_identity_and_shift():
    img = np.arange(16 * 16 * 1, dtype=np.float32).reshape(16, 16, 1)
    M = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    out = warp_affine(img, M, (16, 16))
    np.testing.assert_allclose(out, img, atol=1e-4)
    M2 = np.array([[1, 0, 2], [0, 1, 0]], np.float32)  # shift +2 in x
    out2 = warp_affine(img, M2, (16, 16))
    np.testing.assert_allclose(out2[:, 2:], img[:, :-2], atol=1e-4)


def test_roc_curve_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(6)
    scores = rng.standard_normal(500)
    labels = rng.integers(0, 2, 500)
    fpr_sk, tpr_sk, _ = sk.roc_curve(labels, scores)
    fpr, tpr = roc_curve(scores, labels)
    np.testing.assert_allclose(fpr, fpr_sk, atol=1e-12)
    np.testing.assert_allclose(tpr, tpr_sk, atol=1e-12)


def test_template_aggregation():
    feats = np.array([[1.0, 0], [0, 1.0], [0, 1.0], [3.0, 0]])
    templates = np.array([7, 7, 7, 9])
    medias = np.array([1, 2, 2, 5])
    tf, uq = image2template_feature(feats, templates, medias)
    np.testing.assert_array_equal(uq, [7, 9])
    # template 7: media1=[1,0], media2 mean=[0,1]; sum=[1,1] → normalized
    np.testing.assert_allclose(tf[0], [1, 1] / np.sqrt(2))
    np.testing.assert_allclose(tf[1], [1, 0])


def test_full_ijb_scoring_separable():
    rng = np.random.default_rng(7)
    n_ident, per = 100, 4
    d = 16
    centers = rng.standard_normal((n_ident, d))
    feats, templates, medias = [], [], []
    # each identity gets TWO templates (2i, 2i+1) of `per` images each;
    # noise large enough that score distributions overlap (a perfectly
    # separable set degenerates the argmin TPR@FPR lookup — a faithful
    # reference quirk)
    for i in range(n_ident):
        for half in range(2):
            for j in range(per):
                f = centers[i] + rng.standard_normal(d) * 1.5
                feats.append(np.concatenate([f, f]))  # [orig|flip]
                templates.append(2 * i + half)
                medias.append(j)
    feats = np.asarray(feats)
    templates = np.asarray(templates)
    medias = np.asarray(medias)
    p1, p2, labels = [], [], []
    for i in range(n_ident):
        p1.append(2 * i)
        p2.append(2 * i + 1)
        labels.append(1)  # same identity, different templates
        for k in range(1, 6):
            p1.append(2 * i)
            p2.append(2 * ((i + k) % n_ident) + 1)
            labels.append(0)
    table = run_ijb_protocol(
        feats, templates, medias,
        np.asarray(p1), np.asarray(p2), np.asarray(labels),
        faceness_scores=np.ones(len(feats)),
    )
    assert table[1e-1] > 0.8
    assert table[1e-1] >= table[1e-2] >= table[1e-3]  # monotone in FPR target


def test_pair_scores_gram_and_gather_paths_agree():
    """pair_scores picks a gram-matmul path for dense pair lists (the IJB-C
    regime, 15.6M pairs / 23k templates — see benchmarks/bench_ijb_scoring)
    and a buffered gather path for sparse ones; both must equal the naive
    per-pair dot product. Template ids are non-contiguous on purpose."""
    rng = np.random.default_rng(3)
    t, d = 50, 8
    feats = rng.standard_normal((t, d))
    uniq = np.sort(rng.choice(10_000, t, replace=False))
    naive = lambda a, b: np.array(
        [feats[i] @ feats[j] for i, j in zip(a, b)]
    )
    id1 = rng.integers(0, t, 400)
    id2 = rng.integers(0, t, 400)
    # dense: t² = 2500 ≤ 64·400 → gram path
    dense = pair_scores(feats, uniq, uniq[id1], uniq[id2], batch=64)
    np.testing.assert_allclose(dense, naive(id1, id2), atol=1e-12)
    # sparse: 400 pairs over 10× the templates → gather path (force the
    # threshold the other way by repeating feats rows as extra templates)
    big = np.concatenate([feats] + [feats * 0 + 1e-3] * 63)
    big_uniq = np.arange(len(big))
    sparse = pair_scores(big, big_uniq, id1, id2, batch=64)
    np.testing.assert_allclose(sparse, naive(id1, id2), atol=1e-12)


def test_fuse_features_modes():
    feats = np.array([[3.0, 0.0, 1.0, 0.0]])
    cfg = IJBConfig(use_flip_test=True, use_norm_score=True, use_detector_score=False)
    np.testing.assert_allclose(fuse_features(feats, None, cfg), [[4.0, 0.0]])
    cfg2 = IJBConfig(use_flip_test=False, use_norm_score=False, use_detector_score=True)
    out = fuse_features(feats, np.array([0.5]), cfg2)
    np.testing.assert_allclose(out, [[0.5, 0.0]])

def test_bench_ijb_scoring_tiny_scale_gate():
    """The IJB-C-scale scoring dryrun (benchmarks/bench_ijb_scoring.py)
    passes its own exit-code gate at a tiny --scale: every template keeps
    ≥1 image (an over-allocated repeat must not silently drop the tail
    templates, whose pairs would then score against row 0) and the
    assertion TPR uses the exact order statistic (the reference's
    nearest-grid table semantics read 0.0 on a coarse perfectly-separated
    ROC, IJB_evaluation.py:798)."""
    import json
    import os
    import subprocess
    import sys as _sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, os.path.join(root, "benchmarks",
                                       "bench_ijb_scoring.py"),
         "--scale", "0.002"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["scorer_matches_naive"] is True
    assert res["tpr_at_fpr_1e-4_exact"] > 0.95
