"""Unit tests for the shared CLI mesh-resolution logic (`cli/common.py`).

`resolve_inference_mesh` is the one place the evaluate and predict CLIs
turn `--whole` / `--space` / `--data-parallel` / batch size into a mesh;
the slow CLI tests exercise it end-to-end, these pin its decision table
directly on the 8-device CPU mesh.
"""

import argparse
import logging

import pytest

import jax

from ccnet_tpu.cli.common import resolve_inference_mesh, str2bool

logger = logging.getLogger("test_cli_common")


def _args(whole=False, space=1, data_parallel=True):
    return argparse.Namespace(whole=whole, space=space,
                              data_parallel=data_parallel)


def test_str2bool():
    assert all(str2bool(v) for v in ("yes", "TRUE", "t", "1", True))
    assert not any(str2bool(v) for v in ("no", "false", "0", "", None))


def test_sliding_shards_tile_batch_over_full_mesh():
    mesh, spatial = resolve_inference_mesh(_args(), logger, batch_size=1)
    assert not spatial
    assert dict(mesh.shape) == {"data": len(jax.devices()), "space": 1}


def test_sliding_data_parallel_off_means_no_mesh():
    mesh, spatial = resolve_inference_mesh(_args(data_parallel=False),
                                           logger, batch_size=1)
    assert mesh is None and not spatial


def test_whole_batch1_single_chip_worth_of_work_gets_no_mesh():
    # batch 1, no --space: a mesh would only GSPMD-pad the size-1 batch
    mesh, spatial = resolve_inference_mesh(_args(whole=True), logger,
                                           batch_size=1)
    assert mesh is None and not spatial


def test_whole_image_batch_mesh_is_rightsized_to_the_batch():
    mesh, spatial = resolve_inference_mesh(_args(whole=True), logger,
                                           batch_size=4)
    assert not spatial
    assert dict(mesh.shape) == {"data": 4, "space": 1}


def test_whole_image_batch_mesh_caps_at_device_count():
    mesh, _ = resolve_inference_mesh(_args(whole=True), logger,
                                     batch_size=100)
    assert dict(mesh.shape) == {"data": len(jax.devices()), "space": 1}


def test_whole_space_shards_height_and_rightsizes_data_axis():
    mesh, spatial = resolve_inference_mesh(_args(whole=True, space=2),
                                           logger, batch_size=1)
    assert spatial
    assert dict(mesh.shape) == {"data": 1, "space": 2}

    mesh, spatial = resolve_inference_mesh(_args(whole=True, space=2),
                                           logger, batch_size=8)
    assert spatial
    assert dict(mesh.shape) == {"data": len(jax.devices()) // 2, "space": 2}


def test_space_without_whole_is_rejected():
    with pytest.raises(SystemExit):
        resolve_inference_mesh(_args(space=2), logger, batch_size=1)


def test_space_must_divide_devices():
    with pytest.raises(SystemExit):
        resolve_inference_mesh(_args(whole=True, space=3), logger,
                               batch_size=1)
