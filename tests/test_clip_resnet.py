"""Parity of the flax CLIP-RN blocks against the reference's OWN torch
modules (reference src/ir/encoder/vdr_crossmodal_image.py:21-101),
executed on identical random weights/stats and inputs.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_reference_parity import (_import_reference_vdr,
                                         remove_reference_stubs)
from vsearch_tpu.models.clip_resnet import (AttentionPool2d, Bottleneck,
                                            convert_attnpool_params,
                                            convert_bottleneck_params)


@pytest.fixture(scope="module")
def ref_img_mod():
    _import_reference_vdr()  # stubs torchvision/wordcloud + sys.path
    import importlib

    mod = importlib.import_module("src.ir.encoder.vdr_crossmodal_image")
    yield mod
    remove_reference_stubs()


def _randomized_state_dict(module, seed):
    """Random weights AND random BatchNorm running stats so inference
    mode is exercised with non-trivial statistics."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    out = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            out[k] = v
        elif k.endswith("running_var"):
            out[k] = 0.5 + torch.rand(v.shape, generator=g)
        else:
            out[k] = torch.randn(v.shape, generator=g) * 0.1
    module.load_state_dict(out)
    return {k: v.numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize("stride,inplanes,planes", [
    (1, 64, 16),   # identity shortcut (inplanes == planes*4)
    (2, 64, 32),   # avgpool + conv downsample shortcut
])
def test_bottleneck_matches_reference(ref_img_mod, stride, inplanes,
                                      planes):
    ref = ref_img_mod.Bottleneck(inplanes, planes, stride=stride).eval()
    sd = _randomized_state_dict(ref, seed=stride * 100 + planes)

    x = np.random.default_rng(3).standard_normal(
        (2, 8, 8, inplanes)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()

    ours = Bottleneck(planes=planes, stride=stride)
    variables = convert_bottleneck_params(sd)
    y = np.asarray(ours.apply(variables, x))
    np.testing.assert_allclose(np.transpose(y, (0, 3, 1, 2)), y_ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("output_dim", [None, 24])
def test_attnpool_matches_reference(ref_img_mod, output_dim):
    spacial, embed, heads = 4, 32, 4
    ref = ref_img_mod.AttentionPool2d(spacial, embed, heads,
                                      output_dim=output_dim).eval()
    sd = _randomized_state_dict(ref, seed=7 if output_dim else 8)

    x = np.random.default_rng(5).standard_normal(
        (3, spacial, spacial, embed)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()

    ours = AttentionPool2d(spacial_dim=spacial, embed_dim=embed,
                           num_heads=heads, output_dim=output_dim)
    variables = convert_attnpool_params(sd)
    y = np.asarray(ours.apply(variables, x))
    assert y.shape == y_ref.shape == (3, output_dim or embed)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)
