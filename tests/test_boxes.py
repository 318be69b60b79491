import jax.numpy as jnp
import numpy as np

from egtr_tpu.ops import boxes


def random_xyxy(rng, n):
    x0y0 = rng.uniform(0, 50, size=(n, 2))
    wh = rng.uniform(1, 50, size=(n, 2))
    return np.concatenate([x0y0, x0y0 + wh], axis=1).astype(np.float32)


def test_cxcywh_roundtrip(rng):
    b = random_xyxy(rng, 17)
    back = boxes.box_cxcywh_to_xyxy(boxes.box_xyxy_to_cxcywh(jnp.array(b)))
    np.testing.assert_allclose(np.asarray(back), b, atol=1e-5)


def test_iou_matches_numpy_oracle(rng):
    a = random_xyxy(rng, 8)
    b = random_xyxy(rng, 5)
    iou, _ = boxes.box_iou(jnp.array(a), jnp.array(b))
    iou = np.asarray(iou)
    # independent numpy oracle
    for i in range(8):
        for j in range(5):
            xx0 = max(a[i, 0], b[j, 0]); yy0 = max(a[i, 1], b[j, 1])
            xx1 = min(a[i, 2], b[j, 2]); yy1 = min(a[i, 3], b[j, 3])
            inter = max(0.0, xx1 - xx0) * max(0.0, yy1 - yy0)
            area_a = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            area_b = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            ref = inter / (area_a + area_b - inter)
            np.testing.assert_allclose(iou[i, j], ref, rtol=1e-5)


def test_giou_range_and_selfiou(rng):
    a = random_xyxy(rng, 10)
    g = np.asarray(boxes.generalized_box_iou(jnp.array(a), jnp.array(a)))
    assert (g <= 1.0 + 1e-6).all() and (g >= -1.0 - 1e-6).all()
    np.testing.assert_allclose(np.diag(g), 1.0, atol=1e-5)


def test_iou_plus1_convention():
    # two identical 1-pixel boxes: area = 1 under the +1 convention
    a = np.array([[3.0, 4.0, 3.0, 4.0]])
    iou = np.asarray(boxes.box_iou_plus1(jnp.array(a), jnp.array(a)))
    np.testing.assert_allclose(iou, 1.0)
    # disjoint boxes
    b = np.array([[10.0, 10.0, 12.0, 12.0]])
    iou = np.asarray(boxes.box_iou_plus1(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(iou, 0.0)


def test_inverse_sigmoid_roundtrip(rng):
    x = rng.uniform(0.01, 0.99, size=(32,)).astype(np.float32)
    y = boxes.inverse_sigmoid(jnp.array(x))
    back = 1.0 / (1.0 + np.exp(-np.asarray(y)))
    np.testing.assert_allclose(back, x, rtol=1e-4)
