"""Mesh-sharded label generation == single-device (8-dev CPU mesh).

The multi-chip inference story: the clustering batch shards over the
'data' axis and the joint k-means reduces across chips; results must be
bit-identical to the unsharded program."""

import numpy as np
import jax
import jax.numpy as jnp

from spalign_tpu.config import LabelGenConfig, SuperpixelConfig
from spalign_tpu.data.synthetic import SyntheticRoadScenes
from spalign_tpu.parallel import data_sharding, make_mesh
from spalign_tpu.pipeline.label_gen import (SpalignLabelGenerator,
                                            spalign_cluster)


def test_sharded_cluster_equals_unsharded(rng):
    b, h, w = 8, 64, 64
    fmaps = jnp.asarray(rng.randn(b, 8, 8, 16).astype(np.float32))
    sps = jnp.asarray(
        (np.arange(h)[None, :, None] // 16 * 4
         + np.arange(w)[None, None, :] // 16
         + np.zeros((b, 1, 1), int)).astype(np.int32))
    key = jax.random.key(0)

    kwargs = dict(n_anchors=10, num_segments=32, append_pos=True, k=3,
                  n_iter=100, prior_params=(0.75, 0.5, 0.1, 0.1))
    road1, cluster1, assign1, _ = spalign_cluster(fmaps, sps, key,
                                                  **kwargs)

    mesh = make_mesh(8)
    sh = data_sharding(mesh)
    road8, cluster8, assign8, _ = spalign_cluster(
        jax.device_put(fmaps, sh), jax.device_put(sps, sh), key, **kwargs)

    np.testing.assert_array_equal(np.asarray(road1), np.asarray(road8))
    np.testing.assert_array_equal(np.asarray(assign1),
                                  np.asarray(assign8))


def test_generator_with_mesh(tmp_path):
    cfg = LabelGenConfig(
        batchsize=8, resize_shape=(112, 112),
        superpixel=SuperpixelConfig(method="slic", n_slic_segments=40,
                                    slic_iters=3, max_superpixels=128),
        out_dir=str(tmp_path), save_masks=False)
    ds = SyntheticRoadScenes(n=8, full_shape=(128, 256), seed=17)

    gen1 = SpalignLabelGenerator(cfg)
    rec1 = gen1.process_dataset(ds, save=False)

    gen8 = SpalignLabelGenerator(cfg, mesh=make_mesh(8))
    rec8 = gen8.process_dataset(ds, save=False)

    assert len(rec1) == len(rec8) == 8
    for a, b in zip(rec1, rec8):
        np.testing.assert_allclose(a["road_iou"], b["road_iou"],
                                   rtol=1e-6)
        assert a["TP"] == b["TP"] and a["FP"] == b["FP"]


def test_fused_slic_generator_with_mesh(tmp_path):
    """The flagship single-dispatch pipeline (SLIC fused into the
    program) sharded over the 8-device mesh must match the unsharded
    run — images shard over 'data' and every stage (SLIC, DRN, align,
    joint k-means) stays inside one pjit program."""
    cfg = LabelGenConfig(
        batchsize=8, resize_shape=(112, 112),
        superpixel=SuperpixelConfig(method="slic", n_slic_segments=40,
                                    slic_iters=3, max_superpixels=128,
                                    slic_enforce_connectivity=False),
        out_dir=str(tmp_path), save_masks=False)
    ds = SyntheticRoadScenes(n=8, full_shape=(128, 256), seed=17)

    gen1 = SpalignLabelGenerator(cfg)
    rec1 = gen1.process_dataset(ds, save=False)

    gen8 = SpalignLabelGenerator(cfg, mesh=make_mesh(8))
    rec8 = gen8.process_dataset(ds, save=False)

    assert len(rec1) == len(rec8) == 8
    for a, b in zip(rec1, rec8):
        np.testing.assert_allclose(a["road_iou"], b["road_iou"],
                                   rtol=1e-6)
        assert a["TP"] == b["TP"] and a["FP"] == b["FP"]
