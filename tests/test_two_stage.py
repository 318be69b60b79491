"""Two-stage proposal path + learned position embedding + crop aug tests."""

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from egtr_tpu.config import EgtrConfig
from egtr_tpu.data.transforms import preprocess
from egtr_tpu.models.detr import DeformableDetrBase
from egtr_tpu.ops.criterion import detection_criterion
from egtr_tpu.evaluation.postprocess import detection_postprocess

TWO_STAGE = EgtrConfig(
    d_model=64, encoder_layers=1, decoder_layers=2, encoder_ffn_dim=64,
    decoder_ffn_dim=64, num_queries=12, num_labels=5, num_rel_labels=4,
    max_gt_boxes=3, two_stage=True, two_stage_num_proposals=12,
    with_box_refine=True, auxiliary_loss=True, dropout=0.0)


def test_two_stage_forward_and_loss():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    model = DeformableDetrBase(TWO_STAGE)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    k = TWO_STAGE.two_stage_num_proposals
    assert out["logits"].shape == (2, k, 5)
    assert out["enc_outputs_class"].shape[0] == 2
    assert out["init_reference_points"].shape == (2, k, 4)  # 4-dim refs
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()

    targets = {
        "class_labels": rng.integers(0, 5, (2, 3)).astype(np.int32),
        "boxes": rng.uniform(0.3, 0.6, (2, 3, 4)).astype(np.float32),
        "num_boxes": np.array([2, 3], np.int32),
        "rel": np.zeros((2, 3, 3, 4), np.float32),
    }
    total, losses = detection_criterion(
        out, {k2: jnp.asarray(v) for k2, v in targets.items()}, TWO_STAGE)
    assert np.isfinite(float(total))
    assert "loss_ce_enc" in losses and "loss_giou_enc" in losses
    assert "loss_ce_0" in losses  # aux losses too

    # two-stage loss must be differentiable end to end
    def loss_fn(p):
        o = model.apply(p, x)
        t, _ = detection_criterion(
            o, {k2: jnp.asarray(v) for k2, v in targets.items()}, TWO_STAGE)
        return t
    g = jax.grad(loss_fn)(params)
    gn = float(jnp.sqrt(sum(jnp.sum(a * a) for a in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


def test_learned_position_embedding():
    cfg = TWO_STAGE.replace(two_stage=False, with_box_refine=False,
                            auxiliary_loss=False,
                            position_embedding_type="learned")
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 64, 64, 3)), jnp.float32)
    model = DeformableDetrBase(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    assert "row_embeddings" in params["params"]
    out = model.apply(params, x)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_detection_postprocess():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((1, 12, 5)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0.2, 0.6, (1, 12, 4)), jnp.float32)
    sizes = jnp.asarray([[480, 640]], jnp.int32)
    out = detection_postprocess(logits, boxes, sizes, top_k=10)
    assert out["scores"].shape == (1, 10)
    s = np.asarray(out["scores"][0])
    assert (np.diff(s) <= 1e-6).all()  # descending
    # top-1 must equal the max sigmoid prob
    np.testing.assert_allclose(
        s[0], 1 / (1 + np.exp(-np.asarray(logits).max())), rtol=1e-5)
    b = np.asarray(out["boxes"])
    assert (b[..., 0] <= 640).all() and (b[..., 1] <= 480).all()


def test_crop_augmentation_reindexes_relations():
    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 255, (500, 700, 3),
                                       dtype=np.uint8), "RGB")
    # box 0 on the far left, box 1 and 2 on the right
    boxes = np.array([[5, 5, 60, 60], [400, 100, 500, 200],
                      [450, 250, 600, 380]], np.float32)
    labels = np.array([0, 1, 2], np.int32)
    rel = np.array([[0, 1, 1], [1, 2, 2]], np.int32)
    # crop many times; whenever box 0 is cropped out, relation (0,1) must be
    # dropped and indices remapped
    seen_drop = False
    for seed in range(30):
        r = np.random.default_rng(seed)
        s = preprocess(img.copy(), boxes, labels, rel, train=True, rng=r,
                       use_crop=True)
        n = len(s.class_labels)
        assert len(s.boxes) == n
        if len(s.rel):
            assert s.rel[:, :2].max() < n  # indices remapped in-range
        if n < 3:
            seen_drop = True
            # surviving relations must reference surviving labels coherently
            for (a, b, p) in s.rel:
                assert 0 <= a < n and 0 <= b < n
    assert seen_drop, "crop never dropped a box across 30 seeds?"
