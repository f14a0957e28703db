"""DRN + SegNet model tests: shapes, and torch->flax numeric parity
(the reference's conversion bar: convert_pth2ch.py:64-73, agreement to
~1e-4 on random input)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spalign_tpu.convert import convert_drn_state_dict
from spalign_tpu.convert.pth_to_jax import verify_against_init
from spalign_tpu.models import (SegNet, SegNetBasic, drn_c_26, drn_d_22,
                                preprocess_imagenet)
from spalign_tpu.models.segnet import predict_labels


class TestDRNShapes:
    def test_drn_c_26_output_stride_8(self):
        model = drn_c_26(out_map=True, out_middle=True)
        x = jnp.zeros((1, 224, 224, 3))
        variables = model.init(jax.random.key(0), x)
        out, maps = model.apply(variables, x)
        assert out.shape == (1, 28, 28, 1000)
        assert len(maps) == 8
        assert maps[7].shape == (1, 28, 28, 512)  # the pipeline's map
        # stage widths (16,32,64,128,256,512,512,512), strides 1,2,2,2,...
        widths = [m.shape[-1] for m in maps]
        assert widths == [16, 32, 64, 128, 256, 512, 512, 512]
        hs = [m.shape[1] for m in maps]
        assert hs == [224, 112, 56, 28, 28, 28, 28, 28]

    def test_drn_classifier_head(self):
        model = drn_c_26(out_map=False, out_middle=False, num_classes=10)
        x = jnp.zeros((2, 64, 64, 3))
        variables = model.init(jax.random.key(0), x)
        out, maps = model.apply(variables, x)
        assert out.shape == (2, 10)
        assert maps == ()


@pytest.mark.parametrize("name,jax_factory,torch_factory", [
    # all 7 public pretrained variants (drn_pytorch.py:259-305): a
    # layout bug in any factory pairing (Bottleneck-C de-gridding, the
    # deeper D nets) must fail the converter parity gate, not ship
    ("drn_c_26", "drn_c_26", "torch_drn_c_26"),
    ("drn_c_42", "drn_c_42", "torch_drn_c_42"),
    ("drn_c_58", "drn_c_58", "torch_drn_c_58"),
    ("drn_d_22", "drn_d_22", "torch_drn_d_22"),
    ("drn_d_38", "drn_d_38", "torch_drn_d_38"),
    ("drn_d_54", "drn_d_54", "torch_drn_d_54"),
    ("drn_d_105", "drn_d_105", "torch_drn_d_105"),
])
class TestTorchParity:
    def test_converted_outputs_match(self, name, jax_factory, torch_factory):
        import torch

        from spalign_tpu.convert import torch_drn
        from spalign_tpu.models import drn as jdrn

        tmodel = getattr(torch_drn, torch_factory)(num_classes=17)
        tmodel.eval()
        # randomize BN running stats so parity exercises them
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.5, 0.5)
                    m.running_var.uniform_(0.5, 2.0)

        arch = "C" if "_c_" in name else "D"
        variables = convert_drn_state_dict(tmodel.state_dict(), arch=arch)
        jmodel = getattr(jdrn, jax_factory)(num_classes=17, out_map=True,
                                            out_middle=True)
        n_leaves = verify_against_init(variables, jmodel,
                                       input_hw=(64, 64))
        assert n_leaves > 50

        rng = np.random.RandomState(0)
        x = rng.randn(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            tout, tmaps = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        variables = jax.tree.map(lambda a: np.asarray(a, np.float32),
                                 variables)
        jout, jmaps = jmodel.apply(variables, jnp.asarray(x), train=False)

        np.testing.assert_allclose(
            np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4)
        assert len(jmaps) == len(tmaps)
        for jm, tm in zip(jmaps, tmaps):
            np.testing.assert_allclose(
                np.asarray(jm), tm.numpy().transpose(0, 2, 3, 1),
                rtol=1e-3, atol=1e-4)


class TestBottleneckParity:
    def test_small_bottleneck_drn(self):
        """Bottleneck blocks (expansion 4, downsample 1x1s) vs torch —
        a small custom config so the test stays fast (drn_d_105's real
        depth shares exactly these block types)."""
        import torch

        from spalign_tpu.convert.torch_drn import (TorchBottleneck,
                                                   TorchDRN)
        from spalign_tpu.models.drn import DRN, Bottleneck

        layers = [1, 1, 2, 2, 2, 2, 1, 1]
        tmodel = TorchDRN(TorchBottleneck, layers, arch="D",
                          num_classes=5)
        tmodel.eval()
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.5, 0.5)
                    m.running_var.uniform_(0.5, 2.0)
        variables = convert_drn_state_dict(tmodel.state_dict(), arch="D")
        jmodel = DRN(Bottleneck, tuple(layers), arch="D", num_classes=5,
                     out_map=True, out_middle=True)
        verify_against_init(variables, jmodel, input_hw=(64, 64))

        rng = np.random.RandomState(1)
        x = rng.randn(1, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            tout, _ = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        variables = jax.tree.map(lambda a: np.asarray(a, np.float32),
                                 variables)
        jout, _ = jmodel.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(
            np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4)


class TestPreprocess:
    def test_imagenet_normalization(self):
        x = np.full((1, 4, 4, 3), 128.0, np.float32)
        y = np.asarray(preprocess_imagenet(jnp.asarray(x)))
        want = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225])
        np.testing.assert_allclose(y[0, 0, 0], want, rtol=1e-5)


class TestSegNets:
    def test_segnet_basic_shapes(self):
        model = SegNetBasic(n_class=2)
        x = jnp.zeros((2, 64, 128, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 64, 128, 2)
        # parameter inventory: 8 convs 7x7x64 no bias + classifier w/ bias
        p = variables["params"]
        assert p["conv1"]["kernel"].shape == (7, 7, 3, 64)
        assert "bias" not in p["conv1"]
        assert p["conv_classifier"]["kernel"].shape == (1, 1, 64, 2)
        assert "bias" in p["conv_classifier"]
        # BN beta initialized to 0.001 (reference initial_beta)
        np.testing.assert_allclose(p["conv1_bn"]["bias"], 0.001)

    def test_segnet_basic_train_mode_updates_stats(self):
        model = SegNetBasic(n_class=2)
        x = jnp.ones((1, 32, 32, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        out, mutated = model.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
        assert out.shape == (1, 32, 32, 2)
        before = variables["batch_stats"]["conv1_bn"]["mean"]
        after = mutated["batch_stats"]["conv1_bn"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_segnet_full_shapes(self):
        model = SegNet(n_class=2)
        x = jnp.zeros((1, 64, 128, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 64, 128, 2)

    def test_predict_labels_resize(self):
        model = SegNetBasic(n_class=2)
        x = jnp.zeros((1, 32, 64, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        labels, score = predict_labels(
            lambda v, im, train: model.apply(v, im, train=train),
            variables, x, pred_shape=(64, 128), return_score=True)
        assert labels.shape == (1, 64, 128)
        assert score.shape == (1, 64, 128, 2)
        s = np.asarray(score)
        np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-3)


class TestAllFactories:
    @pytest.mark.parametrize("name", ["drn_c_42", "drn_c_58", "drn_d_38",
                                      "drn_d_54", "drn_d_105"])
    def test_factory_builds_and_runs(self, name):
        from spalign_tpu.models.drn import DRN_FACTORIES

        model = DRN_FACTORIES[name](out_map=True, out_middle=True,
                                    num_classes=3)
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.key(0), x)
        out, maps = model.apply(variables, x)
        assert out.shape == (1, 4, 4, 3)  # stride 8
        assert len(maps) == 8
        assert maps[7].shape[1:3] == (4, 4)
