"""Mesh construction, including the multi-slice (DCN) device ordering."""

from types import SimpleNamespace

import jax
import numpy as np
import pytest

from egtr_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS,
                                    _mesh_device_order, make_mesh)


def _fake(i, slice_index):
    return SimpleNamespace(id=i, slice_index=slice_index)


def test_single_slice_order_unchanged():
    devs = [_fake(i, 0) for i in (3, 1, 2, 0)]
    assert _mesh_device_order(devs, 2) == devs  # no multi-slice -> as-is


def test_multislice_order_is_slice_major():
    # two slices interleaved in the flat list, as jax.devices() can return
    devs = [_fake(0, 0), _fake(4, 1), _fake(1, 0), _fake(5, 1),
            _fake(2, 0), _fake(6, 1), _fake(3, 0), _fake(7, 1)]
    ordered = _mesh_device_order(devs, 2)
    assert [d.slice_index for d in ordered] == [0] * 4 + [1] * 4
    assert [d.id for d in ordered] == [0, 1, 2, 3, 4, 5, 6, 7]
    # with data outer / model inner, every model group stays in one slice
    arr = np.asarray(ordered).reshape(4, 2)   # (data, model)
    for row in arr:
        assert len({d.slice_index for d in row}) == 1


def test_multislice_rejects_model_groups_crossing_dcn():
    devs = [_fake(i, i // 3) for i in range(6)]   # 3 devices per slice
    with pytest.raises(ValueError, match="model axis"):
        _mesh_device_order(devs, 2)               # 2 does not divide 3


def test_make_mesh_axes_on_cpu():
    mesh = make_mesh(dp=4, mp=2, devices=jax.devices())
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert mesh.devices.shape == (4, 2)
