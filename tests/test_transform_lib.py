"""Tests for the composable transform library (reference model/transform.py
parity surface)."""

import numpy as np
from PIL import Image

from egtr_tpu.data import transform_lib as T


def make_img(h=60, w=80):
    arr = (np.arange(h * w * 3).reshape(h, w, 3) % 255).astype(np.uint8)
    return Image.fromarray(arr)


def make_target():
    return {
        "boxes": np.array([[10, 10, 30, 30], [50, 20, 70, 50]], np.float32),
        "labels": np.array([1, 2]),
        "rel": np.array([[0, 1, 3]], np.int32),
    }


def test_crop_translates_and_drops_boxes():
    img, tgt = T.crop(make_img(), make_target(), (15, 40, 40, 40))
    assert img.size == (40, 40)
    # box 0 (10..30 x) is fully left of the crop (x>=40): dropped
    assert len(tgt["boxes"]) == 1
    np.testing.assert_allclose(tgt["boxes"][0], [10, 5, 30, 35])
    assert tgt["labels"].tolist() == [2]
    # relation referenced the dropped box: removed
    assert len(tgt["rel"]) == 0


def test_crop_reindexes_relations():
    img, tgt = T.crop(make_img(), make_target(), (0, 40, 60, 40))
    # only box 1 survives, as new index 0
    assert len(tgt["boxes"]) == 1 and len(tgt["rel"]) == 0

    # crop keeping both boxes: relation survives unchanged
    img, tgt = T.crop(make_img(), make_target(), (0, 0, 60, 80))
    assert len(tgt["boxes"]) == 2
    assert tgt["rel"].tolist() == [[0, 1, 3]]


def test_hflip_boxes():
    img, tgt = T.hflip(make_img(), make_target())
    np.testing.assert_allclose(tgt["boxes"][0], [80 - 30, 10, 80 - 10, 30])


def test_resize_scales_boxes():
    img, tgt = T.resize(make_img(), make_target(), 120, max_size=1000)
    assert min(img.size) == 120
    scale = 120 / 60
    np.testing.assert_allclose(tgt["boxes"][0], np.array(
        [10, 10, 30, 30]) * scale)


def test_pad_bottom_right_only():
    img, tgt = T.pad(make_img(), make_target(), (7, 5))
    assert img.size == (87, 65)
    np.testing.assert_allclose(tgt["boxes"], make_target()["boxes"])
    assert tgt["size"] == (65, 87)


def test_random_select_and_compose():
    rng = np.random.default_rng(0)
    pipeline = T.Compose([
        T.RandomSelect(
            T.RandomResize([100], rng),
            T.Compose([T.RandomResize([40], rng),
                       T.RandomSizeCrop(20, 30, rng)]),
            rng),
        T.ToArray(),
        T.Normalize(),
    ])
    img, tgt = pipeline(make_img(), make_target())
    assert isinstance(img, np.ndarray) and img.ndim == 3
    if len(tgt["boxes"]):
        assert (tgt["boxes"] <= 1.0).all() and (tgt["boxes"] >= 0.0).all()


def test_center_crop():
    img, tgt = T.CenterCrop((40, 40))(make_img(), make_target())
    assert img.size == (40, 40)


def test_random_erasing_erases_inside():
    rng = np.random.default_rng(3)
    arr = np.zeros((60, 80, 3), np.float32)
    out, _ = T.RandomErasing(rng, p=1.0)(arr, None)
    assert (out != 0).any()     # something was erased with noise
    assert (arr == 0).all()     # input untouched (copy-on-write)


def test_random_pad_and_crop_bounds():
    rng = np.random.default_rng(1)
    img, tgt = T.RandomPad(10, rng)(make_img(), make_target())
    assert img.width >= 80 and img.height >= 60
    img2, _ = T.RandomCrop((30, 30), rng)(make_img(), make_target())
    assert img2.size == (30, 30)


def test_normalize_matches_production_preprocess():
    """The library pipeline reproduces transforms.preprocess eval output."""
    from egtr_tpu.data.transforms import preprocess

    img = make_img(100, 150)
    boxes = np.array([[20, 20, 60, 80]], np.float32)
    labels = np.array([1])
    rel = np.zeros((0, 3), np.int32)

    sample = preprocess(img, boxes, labels, rel, train=False,
                        size=90, max_size=200)

    pipe = T.Compose([lambda im, tg: T.resize(im, tg, 90, 200),
                      T.ToArray(), T.Normalize()])
    arr, tgt = pipe(img, {"boxes": boxes, "labels": labels})
    np.testing.assert_allclose(arr, sample.image, atol=1e-6)
    np.testing.assert_allclose(tgt["boxes"], sample.boxes, atol=1e-6)
